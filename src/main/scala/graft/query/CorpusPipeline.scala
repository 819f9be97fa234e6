package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.sink.SignatureIndex
import graft.text.TextOps

/** The DAILY corpus run as one library call — the orchestration a
  * training-data team actually schedules, composing the graded operators
  * in production order:
  *
  *  1. canonical text NORMALIZATION ([[TextOps.normalize]]) — so
  *     encoding variants collide in every later signature;
  *  2. per-document GATES — the repetition (Gopher) and quality filters,
  *     evaluated on the normalized text; gated-out docs never reach the
  *     index (garbage must not pollute history's signatures);
  *  3. INCREMENTAL near-dup dedup against the persisted
  *     [[SignatureIndex]] ([[DataOps.dedupIncrementalOn]] — history
  *     never rescanned, batch appended for tomorrow);
  *  4. SELECTION — a new doc that near-dups ANY history doc drops
  *     (history already holds the content); within the batch the
  *     smallest id of each pair survives;
  *  5. a one-row REPORT of the flow's attrition, the numbers the
  *     curator's dashboard charts per day.
  *
  * Every step is the same code the graded queries run — this object adds
  * ordering and the drop policy, nothing else, so the oracle-checked
  * semantics carry over verbatim. CorpusPipelineSpec drives two days
  * end-to-end: cross-day dedup, in-batch dedup, gating, and the
  * normalization-dependent catch (an NFD-encoded clone of a day-1 doc
  * drops ONLY because step 1 runs first).
  */
object CorpusPipeline {

  /** One day's outcome: survivors (doc_id, text — normalized), the
    * verified near-dup pairs behind the drops, and the one-row report.
    */
  final case class DailyRun(kept: DataFrame, pairs: DataFrame, report: DataFrame)

  /** Run one day's batch (doc_id, text) through the flow against `idx`.
    * The index gains the GATED batch's signatures (step 3), so the next
    * run sees today's accepted docs as history.
    */
  def runDaily(idx: SignatureIndex, batch: DataFrame): DailyRun = {
    val norm = batch.select(col("doc_id"),
      TextOps.normalize(col("text")).as("text"))
    val toks = norm.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
    val gateOk = DataOps.docRepetitionOn(toks)
      .filter(col("kept")).select(col("doc_id"))
      .join(DataOps.docQualityOn(toks).filter(col("kept")).select(col("doc_id")),
        "doc_id")
    val gated = norm.join(gateOk, "doc_id")

    val pairs = DataOps.dedupIncrementalOn(idx, gated)

    // drop policy: the batch-side doc of every history pair; the larger
    // id of every in-batch pair
    val batchIds = gated.select(col("doc_id"))
    val dropHist = pairs.filter(col("pair_type") === "new_hist")
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .join(batchIds, Seq("doc_id"), "left_semi")
    val dropNew = pairs.filter(col("pair_type") === "new_new")
      .select(col("doc_b").as("doc_id"))
    val dropped = dropHist.unionByName(dropNew).distinct()
    val kept = gated.join(dropped, Seq("doc_id"), "left_anti")

    val nIn = batch.count()
    val nGated = gated.count()
    val nKept = kept.count()
    val report = batch.sparkSession.createDataFrame(Seq(
      (nIn, nIn - nGated, nGated - nKept, nKept)))
      .toDF("n_in", "n_gated_out", "n_dup_dropped", "n_kept")
    DailyRun(kept, pairs, report)
  }
}
