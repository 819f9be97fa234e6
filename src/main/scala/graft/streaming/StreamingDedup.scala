package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.DataOps
import graft.text.TextOps

/** Streaming near-duplicate CANDIDATE detection — the real-time form of
  * the batch MinHash-LSH dedup: documents arrive on an unbounded stream,
  * each lands in its 4 band buckets (the SAME digests as
  * `DataOps.lshCandidates`, via the shared `bandDigests` builder), and a
  * stateful per-bucket membership list emits a candidate pair the moment
  * a new doc collides with one already seen — across micro-batches,
  * without ever re-scanning history. Downstream, candidates feed the
  * exact Jaccard verifier per micro-batch exactly as in the batch path.
  *
  * State is BOUNDED at `cap` doc ids per bucket (the streaming analog of
  * the batch hot-band cap; here the cap keeps the first `cap`
  * ARRIVALS — arrival order, not id order, is what a stream can know).
  * A doc arriving after its bucket is full still pairs against the
  * retained members but is not remembered, so a later duplicate arrival
  * may re-emit the same pair — harmless, because candidates are
  * `distinct`-ed and exactly verified downstream in both forms.
  * [[candidates]] keeps `NoTimeout` (right for the drain-and-stop
  * ingest model, where the stream ends); [[candidatesExpiring]] is the
  * unbounded-stream form — watermark + `EventTimeTimeout` evict idle
  * buckets so total state is bounded by the active set, not corpus
  * history.
  *
  * Scale shape: one shuffle on (band, digest) per micro-batch — the
  * same key the batch join shuffles on — and O(cap) state per bucket.
  */
object StreamingDedup {

  final case class BandArrival(b: Int, h: String, doc_id: Long)
  final case class Candidate(doc_a: Long, doc_b: Long)

  /** Per-bucket fold: emit (seen, new) pairs, remember the first `cap`
    * arrivals. In-batch arrivals are sorted by doc_id so a batch's
    * internal pairs are deterministic regardless of partition order.
    * Membership checks go through a hash set (the retained list is the
    * persisted state; `Seq.contains` would make a hot bucket's fold
    * O(m·cap) list traversals on the per-trigger hot path). Pure — the
    * two state wrappers ([[candidates]]' plain list,
    * [[candidatesExpiring]]'s list + newest-arrival clock) share it.
    */
  private[streaming] def collideFold(retained0: Seq[Long], arrivals: Seq[Long],
                                     cap: Int): (Seq[Long], Seq[Candidate]) = {
    var retained = retained0.toVector
    val member = scala.collection.mutable.HashSet[Long](retained: _*)
    val out = Seq.newBuilder[Candidate]
    arrivals.distinct.sorted.foreach { d =>
      if (!member.contains(d)) {
        retained.foreach { s =>
          out += Candidate(math.min(s, d), math.max(s, d))
        }
        member += d
        if (retained.size < cap) retained = retained :+ d
      }
    }
    (retained, out.result())
  }

  private[streaming] def collide(rows: Iterator[BandArrival],
                                 state: GroupState[Seq[Long]],
                                 cap: Int): Iterator[Candidate] = {
    val (retained, out) = collideFold(
      state.getOption.getOrElse(Seq.empty), rows.map(_.doc_id).toSeq, cap)
    state.update(retained)
    out.iterator
  }

  /** Bind over a (doc_id, text) frame — batch or streaming. The default
    * cap is the SAME constant as the batch hot-band cap, so the two
    * forms' bucket bounds cannot drift apart.
    */
  def candidates(docs: DataFrame,
                 cap: Int = DataOps.BandBucketCap): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    val sh = DataOps.shingledOn(docs)
    DataOps.bandDigests(sh).as[BandArrival]
      .groupByKey(r => (r.b, r.h))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandArrival], st: GroupState[Seq[Long]]) =>
          collide(rows, st, cap)
      }
  }

  final case class BandArrivalTs(b: Int, h: String, doc_id: Long,
                                 ts: java.sql.Timestamp)

  /** [[candidatesExpiring]] state: retained members plus the bucket's
    * newest arrival time — the idle clock. Kept IN state (not derived
    * from the current batch) so a late-but-admissible arrival with an
    * older timestamp can never pull the eviction horizon backwards.
    */
  final case class BucketState(ids: Seq[Long], newestMs: Long)

  /** The UNBOUNDED-stream form: same per-bucket collision state, but
    * buckets EXPIRE. The input carries an event-time column `ts`; a
    * watermark (`lateness`) bounds disorder, and each bucket arms an
    * `EventTimeTimeout` at (its newest arrival + `idle`). When the
    * watermark passes that with no new arrivals, the bucket's state is
    * dropped — total state is bounded by ACTIVE buckets within the idle
    * horizon, not by every (band, digest) the corpus has ever produced
    * (the [[candidates]] scaladoc's documented gap, closed here). The
    * recall trade is explicit: a duplicate arriving more than `idle`
    * after its bucket went quiet no longer pairs with the expired
    * members — on an unbounded stream some horizon is the PRICE of
    * bounded state; pick `idle` to cover the dedup window the pipeline
    * actually promises.
    */
  def candidatesExpiring(docs: DataFrame,
                         cap: Int = DataOps.BandBucketCap,
                         lateness: String = "10 minutes",
                         idleMillis: Long = 3600000L): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    require(idleMillis > 0, "idle horizon must be positive")
    val wm = docs.withWatermark("ts", lateness)
    val sh = DataOps.shingledOn(wm, passthrough = Seq("ts"))
    DataOps.bandDigests(sh, passthrough = Seq("ts")).as[BandArrivalTs]
      .groupByKey(r => (r.b, r.h))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), rows: Iterator[BandArrivalTs], st: GroupState[BucketState]) =>
          if (st.hasTimedOut) {
            st.remove() // idle past the horizon: drop the bucket entirely
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val prev = st.getOption.getOrElse(BucketState(Seq.empty, Long.MinValue))
            val (ids, out) = collideFold(prev.ids, batch.map(_.doc_id), cap)
            // the idle clock is the newest arrival EVER seen, not this
            // batch's max: a late in-order-window arrival must not pull
            // the horizon backwards and evict early
            val newest = math.max(prev.newestMs, batch.map(_.ts.getTime).max)
            st.update(BucketState(ids, newest))
            // re-arm every invocation (timeouts clear on each call); must
            // sit strictly above the current watermark
            st.setTimeoutTimestamp(
              math.max(newest + idleMillis, st.getCurrentWatermarkMs + 1))
            out.iterator
          }
      }
  }
}
