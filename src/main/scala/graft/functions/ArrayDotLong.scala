package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact BIGINT dot product as a native codegen `Expression` — the
  * integer twin of [[ArrayDot]] for the micronized-coordinate vectors
  * (JL projections), where the probe×corpus candidate join evaluates
  * one 16-term integer dot per pair: the O(n·probes) inner loop of the
  * JL serve at scale. Replaces the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)`
  * HOF chain ("HOFs are interpreted" — the ArrayDot/SuffixPairs
  * discipline; the HOF form stays as the spec reference and
  * ArrayDotLongSpec pins value identity).
  *
  * VALUE-IDENTICAL to the HOF form: exact int64 sum (order-irrelevant),
  * and the same null semantics — `zip_with` pads a length mismatch with
  * nulls and a null element poisons the fold, so mismatched lengths or
  * any null element yield NULL ([[ArrayDot.valid]]'s rule). Overflow
  * uses java.lang.Math exact ops so an out-of-envelope product throws
  * (ANSI parity) instead of wrapping — the callers' micronized
  * coordinates stay orders of magnitude inside the envelope.
  *
  * The squared norm Σx² is the `col(a, a)` instance — no separate
  * expression needed.
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // length mismatch → null

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot_long requires ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (!ArrayDot.valid(la, ra)) null
    else ArrayDotLong.dot(la, ra)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"""
         |if (!graft.functions.ArrayDot.valid($l, $r)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.ArrayDotLong.dot($l, $r);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot_long"
}

object ArrayDotLong {

  /** Column-API sugar (the JL serve's entry point). */
  def col(a: Column, b: Column): Column =
    GraftSql.column(ArrayDotLong(GraftSql.expression(a), GraftSql.expression(b)))

  /** Exact int64 fold; Math.*Exact so overflow throws (ANSI parity)
    * rather than wrapping. Public so generated code can call it. */
  def dot(l: ArrayData, r: ArrayData): Long = {
    val n = l.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = Math.addExact(acc, Math.multiplyExact(l.getLong(i), r.getLong(i)))
      i += 1
    }
    acc
  }
}
