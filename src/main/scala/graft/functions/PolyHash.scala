package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string column — a native Catalyst
  * `Expression` with whole-stage codegen (`doGenCode`), used for document
  * fingerprinting (`graft.ext.TextOps`) where a 64-bit order-sensitive
  * content hash is wanted without the md5 cost.
  *
  * hash(s) = Σ s[i] · B^i  mod M   (B = 131, M = 2^61 − 1, Mersenne)
  *
  * Preference order per SURVEY §4: built-ins don't provide a rolling
  * hash; a custom `Expression` beats a Scala UDF (no serialization,
  * codegen inlined, null handling from UnaryExpression).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash requires STRING input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "poly_hash"
}

object PolyHash {
  final val Base = 131L
  final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** mulmod via 128-bit split (no overflow for operands < 2^61). */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (x mod 2^61) + (x >> 61)
    var r = (lo & Mod) + ((hi << 3) | (lo >>> 61))
    if (r >= Mod) r -= Mod
    r
  }

  /** Public so generated code can call it. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var p = 1L
    var i = 0
    while (i < bytes.length) {
      h = (h + mulMod(bytes(i) & 0xffL, p)) % Mod
      p = mulMod(p, Base)
      i += 1
    }
    h
  }
}
