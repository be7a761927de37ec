package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Modular polynomial string hash as a native Catalyst `Expression` with
  * whole-stage codegen:
  *
  *   h(s) = fold over codepoints: acc ← (acc·base + cp) mod m,  acc₀ = 0
  *
  * This is the cross-engine-portable hash the dedup operators
  * (`graft.ext.Dedup`) pair with a DuckDB `list_reduce` oracle — the
  * single-pass expression replaces a `transform(sequence(...),
  * i -> ascii(substr(s, i, 1)))` higher-order-function chain that was
  * O(len²) per string (substr re-scans the prefix each step) and
  * dominated the MinHash/SimHash bench times. Value-identical to the
  * HOF form: Spark's `ascii(substr(s, i, 1))` yields the i-th CHARACTER's
  * codepoint, so the fold here iterates codepoints, with a branch-free
  * fast path over bytes for pure-ASCII input.
  *
  * `mod` must be < 2^31 so `acc·base + cp` stays well inside a signed
  * 64-bit range (no overflow, ANSI-irrelevant: this is JVM arithmetic).
  */
case class PolyHashMod(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  require(mod > 0 && mod < (1L << 31), s"mod out of range: $mod")
  require(base > 0 && base < (1L << 31), s"base out of range: $base")

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash_mod requires STRING input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHashMod.hashString(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHashMod.hashString($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashMod =
    copy(child = newChild)

  override def prettyName: String = "poly_hash_mod"
}

object PolyHashMod {

  /** Column-API sugar used by the dedup operators. */
  def col(c: Column, base: Long, mod: Long): Column =
    GraftSql.column(PolyHashMod(GraftSql.expression(c), base, mod))

  /** Public so generated code can call it. One pass; byte fast path for
    * ASCII (byte == codepoint), codepoint loop otherwise. */
  def hashString(s: UTF8String, base: Long, mod: Long): Long = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (i < bytes.length) {
      if (bytes(i) < 0) { ascii = false; i = bytes.length }
      else i += 1
    }
    var h = 0L
    if (ascii) {
      i = 0
      while (i < bytes.length) {
        h = (h * base + bytes(i)) % mod
        i += 1
      }
    } else {
      val str = s.toString
      i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        h = (h * base + cp) % mod
        i += Character.charCount(cp)
      }
    }
    h
  }
}
