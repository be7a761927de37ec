package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (Rabin-style CDC) as a native
  * Catalyst `Expression` with whole-stage codegen.
  *
  * A position `i` (1-based, `window ≤ i ≤ len`) is a boundary iff the
  * polynomial hash of the `window`-codepoint span ENDING at `i` —
  * exactly [[PolyHashMod]] of `substring(s, i-window+1, window)` —
  * satisfies `h % divisor == 0`. Returns the sorted INT array of
  * boundary positions.
  *
  * This is the chunking rule rsync/LBFS-style storage dedup uses: a
  * boundary depends only on the local window CONTENT, so inserting or
  * deleting bytes early in a document shifts chunk positions but leaves
  * every later boundary (and therefore every later chunk digest)
  * intact — the property that lets chunk-level dedup catch
  * shifted duplicates that fixed-size blocking (`mm_dedup_chunks`)
  * structurally cannot (MmCdcSpec proves both halves).
  *
  * O(n) single pass via the rolling update
  * `h' = ((h − c_out·base^(window−1))·base + c_in) mod m` (the naive
  * per-position window re-hash is O(n·window) — kept as the independent
  * HOF reference in MmCdcSpec, the IvfRecallSpec pattern). `mod` < 2^31
  * keeps every intermediate inside signed 64-bit; the subtraction is
  * re-normalized into [0, m) so the value equals the nonnegative
  * [[PolyHashMod]] fold exactly — which is what the DuckDB oracle's
  * per-window `list_reduce` computes.
  */
case class CdcBoundaries(child: Expression, window: Int, base: Long,
                         mod: Long, divisor: Long)
    extends UnaryExpression {

  require(window >= 2, s"window too small: $window")
  require(mod > 0 && mod < (1L << 31), s"mod out of range: $mod")
  require(base > 0 && base < (1L << 31), s"base out of range: $base")
  require(divisor > 0, s"divisor out of range: $divisor")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_boundaries requires STRING input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(
      input.asInstanceOf[UTF8String], window, base, mod, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcBoundaries.boundaries($c, $window, ${base}L, " +
      s"${mod}L, ${divisor}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)

  override def prettyName: String = "cdc_boundaries"
}

object CdcBoundaries {

  /** Column-API sugar. */
  def col(c: Column, window: Int, base: Long, mod: Long, divisor: Long): Column =
    GraftSql.column(
      CdcBoundaries(GraftSql.expression(c), window, base, mod, divisor))

  /** Public so generated code can call it. Byte fast path for ASCII
    * (byte == codepoint), codepoint array otherwise — same dual path as
    * [[PolyHashMod.hashString]], and hash-identical to it per window. */
  def boundaries(s: UTF8String, window: Int, base: Long, mod: Long,
                 divisor: Long): GenericArrayData = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) { ascii = false; i = bytes.length } else i += 1
    }
    val cps: Array[Int] =
      if (ascii) {
        val a = new Array[Int](bytes.length)
        var j = 0
        while (j < a.length) { a(j) = bytes(j); j += 1 }
        a
      } else {
        val str = s.toString
        val buf = new scala.collection.mutable.ArrayBuffer[Int](str.length)
        var j = 0
        while (j < str.length) {
          val cp = str.codePointAt(j)
          buf += cp
          j += Character.charCount(cp)
        }
        buf.toArray
      }
    val n = cps.length
    if (n < window) return new GenericArrayData(Array.emptyIntArray)
    // base^(window-1) mod m — the out-going codepoint's weight
    var pow = 1L
    var k = 0
    while (k < window - 1) { pow = (pow * base) % mod; k += 1 }
    var h = 0L
    k = 0
    while (k < window) { h = (h * base + cps(k)) % mod; k += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    if (h % divisor == 0) out += window
    var end = window // 1-based position of the window's last codepoint
    while (end < n) {
      val outCp = cps(end - window)
      val inCp = cps(end)
      h = (((h - outCp * pow % mod + mod) % mod) * base + inCp) % mod
      end += 1
      if (h % divisor == 0) out += end
    }
    new GenericArrayData(out.toArray)
  }
}
