package graft.funcs

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the 32-bit SimHash fingerprint of a
  * feature set in ONE per-row pass — for each feature, bit k of
  * `md5("sim:" || feature)`'s first 4 bytes votes ±1; fingerprint bit k
  * is set iff the vote sum is positive.
  *
  * Exactly the integers of the explode + groupBy form
  * (`sum(when(shiftright(h, k) & 1 === 1, 1).otherwise(-1))` over 32 vote
  * columns, then the bit fold — kept as the executable specification in
  * `DataOps.simhashFpSpec` and equality-tested), but with ZERO shuffle:
  * the groupBy path moves every hashed feature across the cluster to
  * re-associate it with its doc, this computes the fingerprint where the
  * row already is. The DuckDB oracle (unnest + groupBy) is unchanged —
  * the output integers are identical.
  */
case class SimHashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash_fp"

  // SQL-facing since GraftExtensions: reject wrong-typed input at
  // analysis (ExpectsInputTypes is private[sql] in 4.x).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashFp.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.funcs.SimHashFp.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

object SimHashFp {
  private val Salt = "sim:".getBytes("UTF-8")

  /** Static so generated code calls it directly: one MessageDigest per
    * row, one digest per feature, int votes — no exploded rows, no
    * 32-column aggregate.
    */
  def compute(features: ArrayData): Long = {
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    val m = features.numElements()
    while (i < m) {
      md.reset()
      md.update(Salt)
      md.update(features.getUTF8String(i).getBytes)
      val d = md.digest()
      // first 8 hex digits of the md5 = first 4 bytes, big-endian unsigned
      // (identical to conv(substring(md5(..), 1, 8), 16, 10))
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      var k = 0
      while (k < 32) {
        if (((h >> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 32) {
      if (votes(k) > 0) fp |= 1L << k
      k += 1
    }
    fp
  }

  /** Column-API binding. */
  def apply(features: Column): Column =
    GraftSql.column(SimHashFp(GraftSql.expression(features)))
}
