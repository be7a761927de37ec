package graft

/** Integer power iteration vs a double-precision reference: the
  * milli-quantization + integer centering + two renormalized rounds must
  * land close to the true top principal component (the oracle hash pins
  * cross-engine equality; this pins that the answer is RIGHT). */
class PcaSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("integer power rounds raise the Rayleigh quotient toward the top eigenvalue") {
    // The synthetic embeddings are near-isotropic (lam1/lam2 ~ 1.01 at
    // sf0.01), so EIGENVECTOR alignment is ill-posed for any fixed round
    // count — the sound power-iteration invariant is the monotone
    // Rayleigh quotient: rho(v2) must clearly beat the all-ones start
    // and reach a solid fraction of the (reference-estimated) lam1.
    val v2 = ext.Similarity.pcaPower(spark, sf001).collect()
      .map(r => r.getInt(0) -> r.getLong(2).toDouble).sortBy(_._1).map(_._2)
    assert(v2.length === 64)
    assert(v2.map(math.abs).max === 100.0, "renormalization must pin max|v| to 100")
    val rows = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val dims = rows.head.length
    val mean = Array.tabulate(dims)(j => rows.map(_(j)).sum / n)
    val c = rows.map(r => Array.tabulate(dims)(j => r(j) - mean(j)))
    def rho(v: Array[Double]): Double = {
      val s = c.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      s.map(x => x * x).sum / v.map(x => x * x).sum
    }
    // lam1 proxy: 50 double-precision power rounds from the same start
    var v = Array.fill(dims)(1.0)
    for (_ <- 1 to 50) {
      val s = c.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val u = Array.tabulate(dims)(j => c.zip(s).map { case (row, si) => row(j) * si }.sum)
      val nrm = math.sqrt(u.map(x => x * x).sum)
      v = u.map(_ / nrm)
    }
    val (r0, r2, rTop) = (rho(Array.fill(dims)(1.0)), rho(v2), rho(v))
    assert(r2 > r0 * 1.2,
           s"2 integer rounds did not clearly improve Rayleigh: $r0 -> $r2")
    assert(r2 >= rTop * 0.6,
           s"integer estimate too far from converged reference: $r2 vs $rTop")
  }

  test("projection spreads the data wider than the all-ones direction") {
    val rows = ext.Similarity.pcaProject(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val nEmb = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.length.toLong === nEmb, "one score per embedding")
    assert(rows.map(_._2).distinct.length > 10, "degenerate projection")
    // per-unit-norm variance is what the top PC maximizes: the learned
    // direction must beat the round-0 all-ones direction on the same
    // float-centered data
    val v2 = ext.Similarity.pcaPower(spark, sf001).collect()
      .map(r => r.getInt(0) -> r.getLong(2).toDouble).sortBy(_._1).map(_._2)
    val x = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = x.head.length
    val mean = Array.tabulate(dims)(j => x.map(_(j)).sum / x.length)
    val c = x.map(r => Array.tabulate(dims)(j => r(j) - mean(j)))
    def perNormVar(v: Array[Double]): Double = {
      val s = c.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val m = s.sum / s.length
      s.map(t => (t - m) * (t - m)).sum / s.length / v.map(t => t * t).sum
    }
    val gain = perNormVar(v2) / perNormVar(Array.fill(dims)(1.0))
    assert(gain > 1.2,
           s"learned direction does not clearly beat all-ones: gain = $gain")
  }

  test("deflated second component is near-orthogonal, renormalized, and informative") {
    val rows = ext.Similarity.pcaTop2(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length === 64)
    val v = rows.map(_._2.toDouble)
    val w = rows.map(_._3.toDouble)
    assert(w.map(math.abs).max === 100.0, "renormalization must pin max|w| to 100")
    // iterate-level integer orthogonalization is exact only up to the
    // div truncation (±1 per unit of the 100-scale) — bound the angle,
    // don't demand zero
    def n2(a: Array[Double]): Double = math.sqrt(a.map(x => x * x).sum)
    val cosVW = math.abs(v.zip(w).map { case (a, b) => a * b }.sum) / (n2(v) * n2(w))
    assert(cosVW < 0.1, s"second component not near-orthogonal: |cos| = $cosVW")
    // the deflated direction must still capture real variance: compare
    // Rayleigh quotients on the float-centered data (near-isotropic
    // corpus: lam2 ~ lam1, so w2's quotient should be the same order)
    val x = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = x.head.length
    val mean = Array.tabulate(dims)(j => x.map(_(j)).sum / x.length)
    val c = x.map(r => Array.tabulate(dims)(j => r(j) - mean(j)))
    def rho(dir: Array[Double]): Double = {
      val s = c.map(row => row.zip(dir).map { case (a, b) => a * b }.sum)
      s.map(t => t * t).sum / dir.map(t => t * t).sum
    }
    val (rv, rw) = (rho(v), rho(w))
    assert(rw > 0.5 * rv,
      s"second component captures too little variance: rho(w)=$rw vs rho(v)=$rv")
    assert(rw <= rv * 1.05,
      s"deflated quotient should not exceed the top component's: $rw vs $rv")
  }

  test("integer pca is exactly rerun-deterministic") {
    val a = ext.Similarity.pcaPower(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = ext.Similarity.pcaPower(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
