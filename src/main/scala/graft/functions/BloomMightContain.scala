package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime Bloom-filter membership probe as a native codegen'd
  * `Expression` — the fact-side half of a runtime-filter join (the
  * pattern Spark's own `spark.sql.optimizer.runtime.bloomFilter.*`
  * injects, built explicitly here so the operator works on a plain
  * session and the pruning site is visible in the plan).
  *
  * The filter object is carried on the expression (not as a child
  * column) and shipped to executors once via the codegen reference
  * array — `doGenCode` binds it with `addReferenceObj`, so the hot loop
  * is a single virtual call per row against the already-deserialized
  * `org.apache.spark.util.sketch.BloomFilter`, never a per-row
  * `readFrom`. False positives are by-design: the downstream equi-join
  * re-checks exactly, so query results are identical to the unfiltered
  * plan — only the shuffle volume changes.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires an integral key, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long    => bloom.mightContainLong(l)
    case i: java.lang.Integer => bloom.mightContainLong(i.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bf.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {

  /** Column-API sugar: `key` probed against the pre-built `bloom`. */
  def col(key: Column, bloom: BloomFilter): Column =
    GraftSql.column(BloomMightContain(GraftSql.expression(key), bloom))
}
