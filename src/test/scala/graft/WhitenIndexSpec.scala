package graft

import org.apache.spark.sql.DataFrame

/** The whiten→index closure's capability claim: per-dimension z-score
  * whitening makes coarse IVF assignment INVARIANT to any one
  * dimension's raw scale (z = (x−μ)/σ is unchanged when x, μ, σ all
  * scale together), while raw-cosine assignment is NOT — inflate one
  * dimension 1000× and some vector's nearest seed flips. This is the
  * reason to normalize before building the index. */
class WhitenIndexSpec extends SparkSpec {

  private val base: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1.0f, 5.0f, 0.0f, 0.0f),
    1L -> Seq(9.0f, 0.0f, 5.0f, 0.0f),
    2L -> Seq(9.0f, 5.0f, 1.0f, 0.0f),
    3L -> Seq(9.0f, 2.5f, 2.5f, 1.0f),
    4L -> Seq(1.0f, 2.5f, 2.5f, 1.0f),
    5L -> Seq(5.0f, 4.0f, 1.0f, 2.0f),
    6L -> Seq(5.0f, 1.0f, 4.0f, 2.0f),
    7L -> Seq(3.0f, 3.0f, 3.0f, 3.0f))
  private def inflated: Seq[(Long, Seq[Float])] =
    base.map { case (id, v) => id -> (v.head * 1000.0f +: v.tail) }

  private def frame(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def assignments(rows: Seq[(Long, Seq[Float])]): Map[Long, Long] =
    ext.Similarity.ivfAssignWhitenedOf(
        ext.Similarity.whitenOf(frame(rows)), cells = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side raw-cosine argmax against the vec_id<2 seeds — the
    * un-whitened baseline the operator improves on. */
  private def rawArgmax(rows: Seq[(Long, Seq[Float])]): Map[Long, Long] = {
    val vecs = rows.toMap.map { case (id, v) => id -> v.map(_.toDouble).toArray }
    val seeds = vecs.filter(_._1 < 2)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    vecs.map { case (id, v) =>
      id -> seeds.toSeq.sortBy { case (sid, sv) => (-cos(v, sv), sid) }.head._1
    }
  }

  test("whitened assignment is invariant under 1000x inflation of one dimension") {
    assert(assignments(base) === assignments(inflated))
  }

  test("raw-cosine assignment is NOT scale-invariant (the problem whitening fixes)") {
    val b = rawArgmax(base)
    val i = rawArgmax(inflated)
    assert(b !== i, "inflating dim 0 must flip at least one raw nearest-seed")
    assert(b(4L) === 0L && i(4L) === 1L,
      "the crafted flip vector: small-dim profile says seed 0, inflated dim-0 ratio says seed 1")
  }

  test("every vector gets exactly one home cell and seeds self-assign") {
    val a = assignments(base)
    assert(a.keySet === base.map(_._1).toSet)
    assert(a(0L) === 0L && a(1L) === 1L,
      "a seed's whitened vector is identical to its own centroid -> csim 1")
  }
}
