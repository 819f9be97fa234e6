package graft.funcs

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: first-match group 1 of N regexes over one
  * string, in one pass — element i is exactly
  * `nullif(regexp_extract(s, regexes(i), 1), '')` (null when the regex
  * does not match or the group is empty). One UTF8String→String
  * conversion and N matchers per row, versus N separate `regexp_extract`
  * expressions each re-materializing the row's string; the per-field
  * built-in form stays in `HtmlExtract.grp` as the executable
  * specification and is equality-tested.
  */
case class FirstGroups(child: Expression, regexes: Seq[String])
    extends UnaryExpression {

  @transient private lazy val compiled: Array[Pattern] =
    regexes.map(Pattern.compile).toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "graft_first_groups"

  // SQL-facing since GraftExtensions: reject wrong-typed input at
  // analysis (ExpectsInputTypes is private[sql] in 4.x).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    FirstGroups.compute(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("patterns", compiled, "java.util.regex.Pattern[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.funcs.FirstGroups.compute($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): FirstGroups =
    copy(child = newChild)
}

object FirstGroups {
  /** Static so generated code calls it directly. */
  def compute(el: UTF8String, ps: Array[Pattern]): ArrayData = {
    val s = el.toString
    val out = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) {
      val m = ps(i).matcher(s)
      if (m.find()) {
        val g = m.group(1)
        if (g != null && g.nonEmpty) out(i) = UTF8String.fromString(g)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API binding. */
  def apply(el: Column, regexes: Seq[String]): Column =
    GraftSql.column(FirstGroups(GraftSql.expression(el), regexes))
}
