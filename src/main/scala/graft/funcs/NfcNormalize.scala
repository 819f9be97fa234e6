package graft.funcs

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition — e + U+0301 → é), the first step of
  * [[graft.text.TextOps.normalize]]. Spark ships no NFC builtin; a Scala
  * UDF would pay Row boxing per value, while this stays inside
  * whole-stage codegen and — the hot-path win — skips the NORMALIZED
  * REWRITE and its re-encode for text that is already NFC
  * (`Normalizer.isNormalized` is a scan; the unavoidable cost on the
  * fast path is the one UTF8String→String decode it scans, and real
  * corpora are overwhelmingly already composed). Mirrors
  * DuckDB's `nfc_normalize` — both implement Unicode canonical
  * composition, so outputs are byte-identical.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  // SQL-facing since GraftExtensions: reject wrong-typed input at
  // analysis (ExpectsInputTypes is private[sql] in 4.x).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.funcs.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API binding. */
  def apply(c: Column): Column =
    GraftSql.column(NfcNormalize(GraftSql.expression(c)))
}
