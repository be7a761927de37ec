package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** `SparkSessionExtensions` injector for the engine's custom Catalyst
  * expressions — the production registration path (SURVEY §4 preference
  * order: session extension > runtime registry > UDF):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * registers `poly_hash(str)` (rolling 2^61−1 hash, `PolyHash`) and
  * `poly_hash_mod(str, base, mod)` (portable modular hash, `PolyHashMod`)
  * for every session of the application — SQL, views, and thrift clients
  * included. `GraftSql.register` remains the per-session runtime
  * fallback for driver-constructed plain sessions (the test driver
  * builds sessions without configs, so the oracle queries use the
  * Column API directly).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit2Long(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _)    => v
    case Literal(v: Int, _)     => v.toLong
    case other =>
      throw new IllegalArgumentException(
        s"poly_hash_mod: $what must be an integer literal, got $other")
  }

  private def requireArity(name: String, children: Seq[Expression], n: Int): Unit =
    if (children.size != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${children.size}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => {
        requireArity("poly_hash", children, 1)
        PolyHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => {
        requireArity("array_dot", children, 2)
        ArrayDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("array_l1"),
      new ExpressionInfo(classOf[ArrayL1].getName, "array_l1"),
      (children: Seq[Expression]) => {
        requireArity("array_l1", children, 2)
        ArrayL1(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("poly_hash_mod"),
      new ExpressionInfo(classOf[PolyHashMod].getName, "poly_hash_mod"),
      (children: Seq[Expression]) => {
        requireArity("poly_hash_mod", children, 3)
        PolyHashMod(
          children.head,
          lit2Long(children(1), "base"),
          lit2Long(children(2), "mod"))
      }))
  }
}
