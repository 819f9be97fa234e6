package graft.funcs

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra–Gries heavy-hitter aggregate: the top of the token
  * frequency distribution in ONE map-side pass with a bounded buffer —
  * the first NON-scalar native expression in the library (a
  * `TypedImperativeAggregate`, the Catalyst class Spark's own
  * `count_min_sketch`/`approx_percentile` are built on).
  *
  * Why it exists: `groupBy(token).count` shuffles the whole vocabulary —
  * at 100 TB that is billions of distinct n-grams moving per query even
  * though only the head of the distribution is wanted. The MG summary
  * caps the shuffle at `capacity` entries PER MAP PARTITION (partial
  * aggregation runs `update` executor-side; only buffers cross the
  * wire), turning vocabulary-sized shuffles into constant-sized ones.
  *
  * Guarantees (Misra & Gries 1982; merge per Agarwal et al., PODS 2012
  * "Mergeable Summaries"): with capacity m over N tokens,
  *   - every decrement event removes ≥ (m+1)·δ total count, so the
  *     accumulated decrement `dec` ≤ N/(m+1) under any merge tree;
  *   - each surviving entry's true count is in [cnt_lo, cnt_lo + dec]
  *     (`cnt_hi` in the output);
  *   - every item with true count > N/(m+1) SURVIVES — the superset
  *     property that makes a sketch-shortlist + exact-rescore top-k
  *     composition exact ([[graft.queries.DataOps.topkFrequent]]).
  *
  * The summary multiset is merge-order-sensitive (inherent to MG — the
  * bounds above are order-invariant, the residual counts are not), so
  * this is a shortlist/diagnostic primitive, not an oracle-graded
  * output; eval orders entries by (cnt_lo desc, token) for stable
  * presentation. Update cost is O(1) amortized per row (a HashMap hit);
  * eviction subtracts the current minimum from every entry — each such
  * sweep is O(m) and pays for ≥ m inserted rows.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buffer] {

  require(capacity >= 1, s"capacity must be positive, got $capacity")

  override def prettyName: String = "graft_misra_gries"

  override def children: Seq[Expression] = child :: Nil

  override def nullable: Boolean = false

  override def dataType: DataType = MisraGriesAgg.OutputType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): MisraGriesAgg.Buffer =
    new MisraGriesAgg.Buffer

  override def update(buf: MisraGriesAgg.Buffer, input: InternalRow): MisraGriesAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      // copy: the UTF8String may point into a reused scan buffer
      val t = v.asInstanceOf[UTF8String]
      val cur = buf.counts.getOrElse(t, 0L)
      if (cur > 0L) buf.counts.update(t, cur + 1L)
      else {
        buf.counts.update(t.clone(), 1L)
        if (buf.counts.size > capacity) MisraGriesAgg.shrink(buf, capacity)
      }
    }
    buf
  }

  override def merge(buf: MisraGriesAgg.Buffer, other: MisraGriesAgg.Buffer): MisraGriesAgg.Buffer = {
    other.counts.foreach { case (t, c) =>
      buf.counts.update(t, buf.counts.getOrElse(t, 0L) + c)
    }
    buf.dec += other.dec
    if (buf.counts.size > capacity) MisraGriesAgg.shrink(buf, capacity)
    buf
  }

  override def eval(buf: MisraGriesAgg.Buffer): Any = {
    val rows = buf.counts.toArray
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        new GenericInternalRow(Array[Any](t, c, c + buf.dec)): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MisraGriesAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.dec)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MisraGriesAgg.Buffer
    buf.dec = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {

  val OutputType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt_lo", LongType, nullable = false),
    StructField("cnt_hi", LongType, nullable = false))), containsNull = false)

  /** Aggregation buffer: residual counts + the accumulated decrement. */
  final class Buffer {
    val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty
    var dec: Long = 0L
  }

  /** MG decrement step, generalized for merge: subtract the (cap+1)-th
    * largest count from every entry and drop the non-positive — removes
    * ≥ (cap+1)·δ of total count per call, which is what bounds `dec`.
    */
  private[funcs] def shrink(buf: Buffer, cap: Int): Unit = {
    val vals = buf.counts.values.toArray
    java.util.Arrays.sort(vals)
    val delta = vals(vals.length - (cap + 1)) // (cap+1)-th largest
    buf.dec += delta
    buf.counts.filterInPlace((_, c) => c > delta)
    buf.counts.mapValuesInPlace((_, c) => c - delta)
  }

  def apply(token: Column, capacity: Int): Column =
    GraftSql.column(
      MisraGriesAgg(GraftSql.expression(token), capacity).toAggregateExpression())
}
