package graft.funcs

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: does ANY element of an `array<string>`
  * column possibly belong to a broadcast [[BloomFilter]]? The per-row
  * kernel of [[graft.queries.DataOps.decontaminateBloom]] — a tight
  * early-exit loop over the shingle array against filter bits that ride
  * to every task as one reference object, turning decontamination's
  * corpus side into a ZERO-SHUFFLE scan.
  *
  * Bloom semantics surface directly: `true` means "possibly in the set"
  * (false positives at the filter's fpp), `false` is definitive. Probes
  * use the UTF-8 bytes of each element — the same rendition
  * `DataFrameStatFunctions.bloomFilter` inserts for string columns, so a
  * filter built there is probe-compatible by construction.
  *
  * An optional CONFIRM filter closes the sketch's aliasing floor: Spark's
  * `BloomFilterImpl` derives all k probe positions from one 32-bit
  * double-hash pair (`h1 + i·h2 mod m`), so a probe whose step aliases
  * the bit array (~1/m of probes) collapses onto few positions and
  * false-positives at ~the fill ratio no matter how low the requested
  * fpp — an fpp-INDEPENDENT floor ≈ probes·fill/m (measured: identical
  * FP counts at 1e-6/1e-9/1e-12). When `confirm` is set, an element
  * counts only if BOTH filters might contain it, the second probed under
  * a salt prefix — independent (h1, h2) draws, so the per-element floor
  * SQUARES (measured: 3 → 0 aliased shingles on the sf0.01 corpus) while
  * false negatives stay impossible (both filters hold every true item).
  *
  * The filter objects are constructor arguments, not child expressions:
  * they are query-constant state (like a broadcast hash table), and
  * keeping them out of the expression tree means codegen embeds plain
  * JVM references instead of re-deserializing filter bytes per batch.
  */
case class BloomAnyContains(child: Expression, bloom: BloomFilter,
                            confirm: Option[(BloomFilter, String)] = None)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_any"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<string> argument, got ${t.catalogString}")
    }

  // UTF8String salt so eval and codegen concatenate identical bytes
  @transient private lazy val confirmSalt: UTF8String =
    UTF8String.fromString(confirm.map(_._2).getOrElse(""))

  // A null ELEMENT is skipped (treated as a non-member): the input type
  // admits containsNull arrays, and a filter can never contain null —
  // probing it would NPE the task. Mirrored in codegen below.
  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    var found = false
    while (i < n && !found) {
      if (!arr.isNullAt(i)) {
        val u = arr.getUTF8String(i)
        found = bloom.mightContainBinary(u.getBytes) && (confirm match {
          case Some((bf2, _)) =>
            bf2.mightContainBinary(UTF8String.concat(confirmSalt, u).getBytes)
          case None => true
        })
      }
      i += 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    val u8 = classOf[UTF8String].getName
    val confirmCheck = confirm match {
      case Some((bf2, _)) =>
        val bf2Ref = ctx.addReferenceObj("confirmFilter", bf2,
          classOf[BloomFilter].getName)
        val saltRef = ctx.addReferenceObj("confirmSalt", confirmSalt, u8)
        (u: String, found: String) =>
          s"""
             |if ($found) {
             |  $found = $bf2Ref.mightContainBinary(
             |    $u8.concat($saltRef, $u).getBytes());
             |}
           """.stripMargin
      case None => (_: String, _: String) => ""
    }
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val found = ctx.freshName("found")
      val u = ctx.freshName("u")
      s"""
         |int $n = $arr.numElements();
         |boolean $found = false;
         |for (int $i = 0; $i < $n && !$found; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $u8 $u = $arr.getUTF8String($i);
         |    $found = $bf.mightContainBinary($u.getBytes());
         |    ${confirmCheck(u, found)}
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomAnyContains =
    copy(child = newChild)
}

object BloomAnyContains {
  /** Column-API binding, single filter. */
  def apply(shingles: Column, bloom: BloomFilter): Column =
    GraftSql.column(BloomAnyContains(GraftSql.expression(shingles), bloom))

  /** Column-API binding with an aliasing-floor CONFIRM filter: an element
    * counts only if `bloom` might contain its bytes AND `confirm` might
    * contain `salt + element` — see the class scaladoc for why this
    * squares the sketch's fpp-independent floor.
    */
  def apply(shingles: Column, bloom: BloomFilter,
            confirm: BloomFilter, salt: String): Column =
    GraftSql.column(BloomAnyContains(GraftSql.expression(shingles), bloom,
      Some((confirm, salt))))
}
