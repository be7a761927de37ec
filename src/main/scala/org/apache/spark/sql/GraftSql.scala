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
}
