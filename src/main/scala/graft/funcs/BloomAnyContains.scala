package graft.funcs

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
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
  * The filter object is a constructor argument, not a child expression:
  * it is query-constant state (like a broadcast hash table), and keeping
  * it out of the expression tree means codegen embeds ONE JVM reference
  * instead of re-deserializing filter bytes per batch.
  */
case class BloomAnyContains(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_any"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<string> argument, got ${t.catalogString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    var found = false
    while (i < n && !found) {
      found = bloom.mightContainBinary(arr.getUTF8String(i).getBytes)
      i += 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val found = ctx.freshName("found")
      s"""
         |int $n = $arr.numElements();
         |boolean $found = false;
         |for (int $i = 0; $i < $n && !$found; $i++) {
         |  $found = $bf.mightContainBinary($arr.getUTF8String($i).getBytes());
         |}
         |${ev.value} = $found;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomAnyContains =
    copy(child = newChild)
}

object BloomAnyContains {
  /** Column-API binding. */
  def apply(shingles: Column, bloom: BloomFilter): Column =
    GraftSql.column(BloomAnyContains(GraftSql.expression(shingles), bloom))
}
