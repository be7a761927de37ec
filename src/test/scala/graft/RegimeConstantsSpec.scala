package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the adaptive-knob ↔ static-oracle lockstep (CLAUDE.md
  * "Adaptive index sizing vs static oracle") at `sbt test` time instead
  * of driver-t2 time: the oracle SQL for the LSH / IVF / incremental
  * families hard-codes the constants these runtime formulas produce at
  * the sf0.01 regime (n = 500). If any formula drifts, this spec fails
  * BEFORE a commit, naming the oracle constant that must move with it.
  * Pure-arithmetic spec — no SparkSession, runs in microseconds. */
class RegimeConstantsSpec extends AnyFunSuite {

  test("sf0.01 regime: numPlanes(500) == 8 (the static LSH oracle's plane count)") {
    assert(ext.Similarity.numPlanes(500L) === 8)
  }

  test("sf0.01 regime: ivfCells(500) == 16 (the static IVF oracle's cell count)") {
    assert(ext.Similarity.ivfCells(500L) === 16)
  }

  test("sf0.01 regime: incSplit(500) == 250 (the incremental oracle's corpus/batch split)") {
    assert(ext.Dedup.incSplit(500L) === 250L)
  }

  test("minhash banding constants: 32 hashes folded into 8 bands of 4") {
    assert(ext.Dedup.NumHashes === 32)
    assert(ext.Dedup.Bands === 8)
    // band-sweep's (8,4) row must re-derive the production config exactly
    assert(ext.Dedup.NumHashes / ext.Dedup.Bands === 4)
  }

  test("numPlanes clamps: floor 8 below n=2048, ceiling 20 above n≈8.4M") {
    assert(ext.Similarity.numPlanes(1L) === 8)
    assert(ext.Similarity.numPlanes(2048L) === 8)
    assert(ext.Similarity.numPlanes(2049L) === 9)
    assert(ext.Similarity.numPlanes(Long.MaxValue / 4) === 20)
  }

  test("ivfCells clamps: floor 16 below n=512, linear n/32, ceiling 4096 past n=131072") {
    assert(ext.Similarity.ivfCells(1L) === 16)
    assert(ext.Similarity.ivfCells(512L) === 16)
    assert(ext.Similarity.ivfCells(513L) === 17)
    assert(ext.Similarity.ivfCells(131072L) === 4096)
    assert(ext.Similarity.ivfCells(10L * 1000 * 1000) === 4096)
  }
}
