package graft.funcs

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Native Catalyst expression: EXACT integer dot product of two
  * int8-quantized vector columns (`array<tinyint>`, the
  * [[graft.queries.DataOps.quantizeEmbeddings]] storage form).
  *
  * A 64-dim int8 dot is bounded by 64 · 127² < 2²⁰, so a long
  * accumulator is exact — no float rounding anywhere, and the quantized
  * cosine `dot/(‖a‖·‖b‖)` needs the per-vector scales not at all (they
  * cancel). Same tight-loop codegen rationale as [[DotProduct]]; this is
  * the SIMD-friendly inner product a 100 TB vector store actually runs.
  *
  * Contract mirrors [[DotProduct]]: element nulls not expected, unequal
  * lengths dot the common prefix.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot8"

  // SQL-facing since GraftExtensions: reject wrong-typed input at
  // analysis (ExpectsInputTypes is private[sql] in 4.x) — an
  // array<int> argument would otherwise CCE inside codegen at runtime.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<tinyint> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $x.getByte($i)) * ((long) $y.getByte($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object Int8Dot {
  /** Column-API binding. */
  def apply(a: Column, b: Column): Column =
    GraftSql.column(Int8Dot(GraftSql.expression(a), GraftSql.expression(b)))
}
