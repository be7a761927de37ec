package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered suffix pairs (a, b) of a sorted id array as a native
  * codegen `Expression` — the whole-stage-codegen replacement for the
  * interpreted higher-order-function chain
  *
  *   flatten(transform(ids, (x, i) ->
  *     transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))
  *
  * (`Dedup.pairExpr`). Spark's HOFs have no `doGenCode` — every element
  * pays interpreted lambda dispatch, and `slice` materializes a fresh
  * suffix array per outer element, so a df-capped hot shingle
  * (df = 100) allocated ~100 slices + 4950 boxed structs through the
  * interpreter per posting list. Round-19 StageProfile measured the
  * pair-expansion stage as the single hottest stage of the bench
  * (dedup_ngram_jaccard: 28 s of the query's 42 s task CPU at sf0.1).
  * This expression emits the identical row multiset in identical order
  * — (i ascending, then j ascending, a = ids[i], b = ids[j], j > i) —
  * in one compiled pass with no per-pair interpreter frames
  * (SuffixPairsSpec pins value equality against the HOF form, the
  * ArrayDot/PolyHashMod discipline). In-plan only: downstream consumers
  * group by (a, b), and the oracle SQL never sees this expression.
  *
  * Input arrays come from bounded collect-set aggregators (posting
  * lists capped at MaxShingleDf / MaxChunkDf), so n(n−1)/2 stays tiny;
  * a defensive require guards the int-index envelope anyway. */
case class SuffixPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = SuffixPairs.OutType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull = false REQUIRED (ADVICE r19): pairs() reads every
      // slot with getLong, so a null element would silently become 0
      // where the HOF reference yields null struct fields — production
      // posting lists from BoundedCollectSet are null-free, so this
      // only tightens the contract
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "suffix_pairs requires ARRAY<BIGINT> (containsNull = false) " +
          s"input, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    SuffixPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SuffixPairs.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): SuffixPairs =
    copy(child = newChild)

  override def prettyName: String = "suffix_pairs"
}

object SuffixPairs {

  private[functions] val OutType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
                   StructField("b", LongType, nullable = false))),
    containsNull = false)

  /** Column-API sugar used by the dedup/multimodal pair stages. */
  def col(c: Column): Column = GraftSql.column(SuffixPairs(GraftSql.expression(c)))

  /** Public so generated code can call it. One pass, (i asc, j asc). */
  def pairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val m = n.toLong * (n - 1) / 2
    require(m <= Int.MaxValue, s"suffix_pairs input too large: $n elements")
    val out = new Array[Any](m.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](a, ids.getLong(j))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
