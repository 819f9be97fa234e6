package graft.funcs

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the k-element MinHash signature of a
  * shingle set in ONE pass — element j is the lexicographic minimum of
  * `md5("j:" || shingle)` hex digests over the set, exactly what
  * `array_min(transform(sh, s -> md5(concat('j:', s))))` computes per j
  * (k interpreted CodegenFallback array scans). Byte-identical output:
  * lowercase-hex MD5 min under UTF8String binary order == the built-in
  * string min, so the DuckDB oracle is unchanged.
  *
  * An empty shingle set yields an all-null signature, matching
  * `array_min` over an empty array.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "graft_minhash_sig"

  // SQL-facing since GraftExtensions: reject wrong-typed input at
  // analysis (ExpectsInputTypes is private[sql] in 4.x).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<string> argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.funcs.MinHashSig.compute($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexChars(bytes(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Static so generated code calls it directly: one MessageDigest per
    * row, k digests per shingle, running minima — no per-element
    * expression dispatch and no intermediate k arrays.
    */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Any](k)
    val md = MessageDigest.getInstance("MD5")
    val salts = Array.tabulate(k)(j => s"$j:".getBytes("UTF-8"))
    var i = 0
    val m = shingles.numElements()
    while (i < m) {
      val s = shingles.getUTF8String(i).getBytes
      var j = 0
      while (j < k) {
        md.reset()
        md.update(salts(j))
        md.update(s)
        val h = hex(md.digest())
        if (mins(j) == null || h.compareTo(mins(j).asInstanceOf[UTF8String]) < 0)
          mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-API binding. */
  def apply(shingles: Column, k: Int): Column =
    GraftSql.column(MinHashSig(GraftSql.expression(shingles), k))
}
