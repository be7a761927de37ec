package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` surface (standard extension-library
  * idiom): build a `Column` from a raw Catalyst `Expression` and register
  * expression builders on the session's function registry, so custom
  * expressions like `graft.functions.PolyHash` are usable from both the
  * Column API and SQL without requiring `SparkSessionExtensions` at
  * session-build time (the driver constructs plain sessions).
  */
object GraftSql {

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** The RDD backing a `localCheckpoint()`ed Dataset (a `LogicalRDD`
    * leaf), if any. `Dataset.unpersist` cannot free a local checkpoint
    * (it is cached at the RDD level, not through the cache manager);
    * unpersisting this RDD does. CAUTION: the data is gone afterwards —
    * a LogicalRDD has no lineage to recompute from, so only free frames
    * no caller retains. */
  def checkpointRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: execution.LogicalRDD => l.rdd
    }
}
