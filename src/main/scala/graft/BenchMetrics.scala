package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Executor task-metric accumulation for [[Bench]] — round-4 verdict
  * task 1: wall time alone could not decompose a 13× cross-harness gap
  * on the dedup family (anchors equal, family skewed), so every bench
  * run now records per-query shuffle bytes, spill, peak execution
  * memory, GC and task time. Counters are cumulative and snapshotted
  * before/after each query (the bus is flushed first — see
  * [[org.apache.spark.GraftSpark.flushListenerBus]]); peak execution
  * memory is a read-and-reset high-water mark so each query reports its
  * own heaviest task, not the session's. */
final class BenchMetrics extends SparkListener {

  private val shufRead  = new AtomicLong
  private val shufWrite = new AtomicLong
  private val memSpill  = new AtomicLong
  private val diskSpill = new AtomicLong
  private val taskMs    = new AtomicLong
  private val gcMs      = new AtomicLong
  private val nTasks    = new AtomicLong
  private val peakMem   = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      taskMs.addAndGet(m.executorRunTime)
      gcMs.addAndGet(m.jvmGCTime)
      nTasks.incrementAndGet()
      peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      ()
    }
  }

  /** Cumulative counter snapshot (order matches [[BenchMetrics.Keys]]). */
  private def counters: Array[Long] =
    Array(shufRead.get, shufWrite.get, memSpill.get, diskSpill.get,
          taskMs.get, gcMs.get, nTasks.get)

  /** Flush the bus, then diff cumulative counters against `before` and
    * take (and reset) the peak-memory high-water mark. */
  def delta(sc: SparkContext, before: Array[Long]): Map[String, Long] = {
    org.apache.spark.GraftSpark.flushListenerBus(sc)
    val after = counters
    val d = BenchMetrics.Keys.zip(after.zip(before).map { case (a, b) => a - b })
    (d :+ ("peak_exec_mem" -> peakMem.getAndSet(0L))).toMap
  }

  def snapshot(sc: SparkContext): Array[Long] = {
    org.apache.spark.GraftSpark.flushListenerBus(sc)
    counters
  }
}

object BenchMetrics {
  val Keys: Array[String] =
    Array("shuffle_read_b", "shuffle_write_b", "mem_spill_b", "disk_spill_b",
          "task_ms", "gc_ms", "n_tasks")
}
