package graft.funcs

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: double-precision dot product of two
  * float-array columns, accumulated left-to-right.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions are
  * `CodegenFallback` — every row pays interpreted lambda dispatch per
  * element and allocates the zipped intermediate array. This expression
  * emits a tight primitive loop via `doGenCode`, stays inside whole-stage
  * codegen, and allocates nothing. Semantics are IDENTICAL to the fold
  * (`cast(x AS double) * cast(y AS double)` accumulated in array order
  * from 0.0), so results — and the DuckDB oracle — are unchanged.
  *
  * Contract: element nulls are not expected (embedding vectors are
  * dense); unequal lengths dot the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float> (the embedding column type); call sites
  // are library-internal, so no ExpectsInputTypes (private[sql] in 4.x).
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  // SQL-facing since GraftExtensions: reject wrong-typed input at
  // analysis (ExpectsInputTypes is private[sql] in 4.x).
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API binding. */
  def apply(a: Column, b: Column): Column =
    GraftSql.column(DotProduct(GraftSql.expression(a), GraftSql.expression(b)))
}
