package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector dot product as a native Catalyst `Expression` with whole-stage
  * codegen — the hot inner loop of the similarity family.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) have no
  * `doGenCode`: each 64-dim cosine previously paid interpreted lambda
  * dispatch per element plus an intermediate zipped array. This
  * expression is one tight primitive loop (no allocation, no boxing),
  * VALUE-IDENTICAL to the HOF form it replaces
  * (`aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, x) => acc + x)`):
  *
  *  - same op sequence: products accumulated left-to-right in double, so
  *    the IEEE result is bit-identical and every DuckDB oracle is
  *    unchanged;
  *  - same null semantics: `zip_with` pads a length mismatch with nulls
  *    and a null product poisons the fold, so mismatched lengths or any
  *    null element yield NULL — `valid` reproduces exactly that.
  *
  * Elements may be FLOAT or DOUBLE arrays, independently per side
  * (embeddings are float; trained/derived centroids are double).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch → null

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean = elemType(e) == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (!ArrayDot.valid(la, ra)) null
    else ArrayDot.dot(la, ra, isFloat(left), isFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val lf = if (isFloat(left)) "true" else "false"
      val rf = if (isFloat(right)) "true" else "false"
      s"""
         |if (!graft.functions.ArrayDot.valid($l, $r)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.ArrayDot.dot($l, $r, $lf, $rf);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

object ArrayDot {

  /** Column-API sugar (the similarity operators' entry point). */
  def col(a: Column, b: Column): Column =
    GraftSql.column(ArrayDot(GraftSql.expression(a), GraftSql.expression(b)))

  /** HOF-equivalent definedness: equal lengths, no null elements. Public
    * so generated code can call it. */
  def valid(l: ArrayData, r: ArrayData): Boolean = {
    val n = l.numElements()
    if (n != r.numElements()) return false
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Left-to-right double accumulation — the identical op sequence to the
    * HOF fold. Public so generated code can call it. */
  def dot(l: ArrayData, r: ArrayData, lf: Boolean, rf: Boolean): Double = {
    val n = l.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) l.getFloat(i).toDouble else l.getDouble(i)
      val y = if (rf) r.getFloat(i).toDouble else r.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
