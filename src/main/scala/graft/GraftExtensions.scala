package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.funcs._

/** SQL surface for the engine's native Catalyst expressions — the
  * `SparkSessionExtensions` registration the Spark-first design calls
  * for: a deployment adds
  *
  * {{{
  *   --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`) and
  * every codegen'd kernel becomes a plain SQL function —
  * `SELECT nfc_normalize(text)`, `word_shingles(split(text, ' '), 3)`,
  * `minhash_sig(sh, 12)`, `simhash_fp(g)`, `dot_product(a, b)`,
  * `int8_dot(qa, qb)`, `tag_scope(html, '<div class="x">', 'div')`,
  * `first_groups(el, 'regex1', 'regex2')` — usable from `spark.sql`,
  * views, and thriftserver clients with no Scala imports.
  *
  * Structural parameters (shingle width, minhash k, tag strings, regex
  * lists) must be LITERALS — they parameterize the generated code, not
  * the per-row data — and a non-literal argument fails at analysis time
  * with a message naming the function, not at runtime inside codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    // the native whole-operator rung: the as-of join's planner strategy
    // (API callers get it idempotently via experimental.extraStrategies)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def strLit(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  private def info(clazz: Class[_], name: String) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  private def arity(fn: String, n: String): Nothing =
    throw new IllegalArgumentException(s"$fn expects $n argument(s)")

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("nfc_normalize"), info(classOf[NfcNormalize], "nfc_normalize"),
        { case Seq(c) => NfcNormalize(c); case _ => arity("nfc_normalize", "1") }),
      (FunctionIdentifier("word_shingles"), info(classOf[WordShingles], "word_shingles"),
        { case Seq(c, n) => WordShingles(c, intLit(n, "word_shingles", "n"))
          case _ => arity("word_shingles", "2") }),
      (FunctionIdentifier("minhash_sig"), info(classOf[MinHashSig], "minhash_sig"),
        { case Seq(c, k) => MinHashSig(c, intLit(k, "minhash_sig", "k"))
          case _ => arity("minhash_sig", "2") }),
      (FunctionIdentifier("simhash_fp"), info(classOf[SimHashFp], "simhash_fp"),
        { case Seq(c) => SimHashFp(c); case _ => arity("simhash_fp", "1") }),
      (FunctionIdentifier("dot_product"), info(classOf[DotProduct], "dot_product"),
        { case Seq(a, b) => DotProduct(a, b); case _ => arity("dot_product", "2") }),
      (FunctionIdentifier("int8_dot"), info(classOf[Int8Dot], "int8_dot"),
        { case Seq(a, b) => Int8Dot(a, b); case _ => arity("int8_dot", "2") }),
      (FunctionIdentifier("morton"), info(classOf[MortonInterleave], "morton"),
        { case Seq(a, b) => MortonInterleave(a, b); case _ => arity("morton", "2") }),
      (FunctionIdentifier("tag_scope"), info(classOf[TagScope], "tag_scope"),
        { case Seq(c, open, tag) =>
            TagScope(c, strLit(open, "tag_scope", "openTag"), strLit(tag, "tag_scope", "tag"))
          case _ => arity("tag_scope", "3") }),
      (FunctionIdentifier("first_groups"), info(classOf[FirstGroups], "first_groups"),
        { case args if args.size >= 2 =>
            FirstGroups(args.head, args.tail.map(strLit(_, "first_groups", "regex")))
          case _ => arity("first_groups", "2+") }),
      // aggregate: injectFunction hands the ANALYZED child to the builder,
      // and returning the AggregateFunction directly is how Spark's own
      // FunctionRegistry registers declarative/imperative aggregates — the
      // analyzer wraps it in AggregateExpression.
      (FunctionIdentifier("misra_gries"), info(classOf[MisraGriesAgg], "misra_gries"),
        { case Seq(c, m) => MisraGriesAgg(c, intLit(m, "misra_gries", "capacity"))
          case _ => arity("misra_gries", "2") }),
      (FunctionIdentifier("top_k"), info(classOf[TopKAgg], "top_k"),
        { case Seq(s, i, k) => TopKAgg(s, i, intLit(k, "top_k", "k"))
          case _ => arity("top_k", "3") }))
}
