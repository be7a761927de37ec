package graft

import org.apache.spark.sql.functions._

/** Proof that the engine's skew story is not just hand-salting: with AQE
  * skew-join enabled (production default), a hot join key is split at
  * runtime — the plan itself carries `skew=true`. Thresholds are lowered
  * to test scale; the mechanism is identical at 100 TB. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> util.Try(conf.get(k)).toOption.flatMap(Option(_))).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // force SMJ (no broadcast) and make the skew detector fire on KBs
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // one hot key (0) carrying ~1/3 of all bytes; every other key unique.
      // The consumer is a GLOBAL aggregate over the payload: it imposes no
      // distribution requirement on the join output (a groupBy on the join
      // key would forbid the skew split) and keeps the fat column in the
      // shuffle so the skewed partition exceeds the detection threshold.
      val fact = spark.range(0, 60000)
        .select(when(col("id") % 3 =!= 0, col("id")).otherwise(0L).as("k"),
                concat(lit("payload-"), lpad(col("id").cast("string"), 50, "x"))
                  .as("payload"))
      val dim = spark.range(0, 60000).select(col("id").as("k"))
      val joined = fact.join(dim, Seq("k"))
        .agg(sum(length(col("payload"))).as("bytes"), count(lit(1)).as("n"))
      val row = joined.collect().head // materialize -> AQE finalizes THIS plan
      assert(row.getAs[Long]("n") === 60000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
      assert(finalPlan.contains("skew=true"),
             s"AQE did not mark the skewed join:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
