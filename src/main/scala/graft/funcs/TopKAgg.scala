package graft.funcs

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native grouped top-k aggregate: the k highest (score, id) pairs per
  * group as ONE partial-aggregable aggregate — the operator behind
  * every "top N per key" query this library otherwise hand-builds as a
  * two-phase salted window ([[graft.queries.DataOps.stratifiedSample]],
  * `keywordSearch`, `hostCap`…).
  *
  * Why it beats the window form at 100 TB: `row_number().over(Window
  * .partitionBy(key))` shuffles and SORTS every row of every group —
  * a hot key funnels its whole volume through one task (hence the
  * hand-salting everywhere). This aggregate keeps a k-bounded buffer
  * per (group, map partition) and combines buffers pairwise, so
  *   - the shuffle carries ≤ groups × partitions × k entries, never
  *     the corpus;
  *   - NO task ever holds more than k entries per group — skew safety
  *     without salt, from the partial-aggregation contract itself;
  *   - no global sort exists anywhere: maintenance is an amortized
  *     O(log k)-ish bounded-buffer insert (batched compaction).
  *
  * Ordering is (score DESC, id ASC) with ties broken by id, so the
  * result is deterministic under any partitioning or merge tree —
  * unlike Misra–Gries this summary is EXACT (top-k is a commutative,
  * associative fold), which is why `topk_per_key` can grade against a
  * plain window oracle. Output is the sorted array<struct<score, id>>;
  * explode + posexplode recover rank.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k >= 1, s"k must be positive, got $k")

  override def prettyName: String = "graft_top_k"

  override def children: Seq[Expression] = score :: id :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType = TopKAgg.OutputType

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint score, bigint id), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // a null score or id carries no rankable row — skipped, like
    // aggregate functions skip nulls
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
      if (buf.size >= 2 * k) buf.compact(k)
    }
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    buf.addAll(other)
    if (buf.size >= 2 * k) buf.compact(k)
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    buf.compact(k)
    new GenericArrayData(buf.toRows)
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    buf.compact(k)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKAgg.Buffer
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  val OutputType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Parallel-array buffer of candidate pairs; `compact` keeps the best
    * k under (score desc, id asc). Amortized: compaction runs once per
    * k inserts and is O(n log n) on ≤ 2k entries.
    */
  final class Buffer {
    private[TopKAgg] var scores: ArrayBuffer[Long] = ArrayBuffer.empty
    private[TopKAgg] var ids: ArrayBuffer[Long] = ArrayBuffer.empty

    def size: Int = scores.length

    def add(s: Long, i: Long): Unit = { scores += s; ids += i }

    def addAll(other: Buffer): Unit = {
      scores ++= other.scores; ids ++= other.ids
    }

    def compact(k: Int): Unit = if (size > k) {
      val order = (0 until size).toArray
        .sortBy(j => (-scores(j), ids(j))).take(k)
      val (ns, ni) = (ArrayBuffer.fill(order.length)(0L), ArrayBuffer.fill(order.length)(0L))
      var j = 0
      while (j < order.length) { ns(j) = scores(order(j)); ni(j) = ids(order(j)); j += 1 }
      scores = ns; ids = ni
    } else sortInPlace()

    private def sortInPlace(): Unit = {
      val order = (0 until size).toArray.sortBy(j => (-scores(j), ids(j)))
      val (ns, ni) = (ArrayBuffer.fill(order.length)(0L), ArrayBuffer.fill(order.length)(0L))
      var j = 0
      while (j < order.length) { ns(j) = scores(order(j)); ni(j) = ids(order(j)); j += 1 }
      scores = ns; ids = ni
    }

    def toRows: Array[Any] = {
      val out = new Array[Any](size)
      var j = 0
      while (j < size) {
        out(j) = new GenericInternalRow(Array[Any](scores(j), ids(j))); j += 1
      }
      out
    }
  }

  def apply(score: Column, id: Column, k: Int): Column =
    GraftSql.column(
      TopKAgg(GraftSql.expression(score), GraftSql.expression(id), k)
        .toAggregateExpression())
}
