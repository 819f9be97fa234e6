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
  *  3. INCREMENTAL near-dup pair computation against the persisted
  *     [[SignatureIndex]] (history never rescanned);
  *  4. SELECTION — a new doc that near-dups ANY history doc drops
  *     (history already holds the content); in-batch duplicates resolve
  *     by CONNECTED COMPONENT — each near-dup component keeps exactly
  *     its smallest id, the library's established cluster-dedup policy
  *     ([[DataOps.dedupCluster]]). Deliberately conservative: a chain
  *     A~B~C is ONE component and keeps only A, even though C never
  *     directly near-dups A — the transitive-closure trade every
  *     cluster dedup makes, and unlike pair-based dropping the decision
  *     depends only on component structure, never on which pairs the
  *     candidate generation happened to emit;
  *  5. the index gains ONLY the KEPT docs' signatures — dropped
  *     duplicates must not accumulate (a boilerplate page re-crawled
  *     daily would otherwise fill its buckets past the `rk <= cap`
  *     bound and crowd real history out of candidate generation);
  *  6. a one-row REPORT of the flow's attrition, the numbers the
  *     curator's dashboard charts per day.
  *
  * DIALECT: this pipeline signs NORMALIZED text, so the index it
  * maintains must hold normalized-text signatures everywhere — bootstrap
  * history with [[bootstrap]] (which normalizes first), NOT with the raw
  * [[SignatureIndex.appendDocuments]]; an index mixing dialects silently
  * misses cross-dialect duplicates. Every step is the same code the
  * graded queries run — this object adds ordering and policy, nothing
  * else. CorpusPipelineSpec drives two days end-to-end: gating,
  * component-based in-batch dedup (one keeper per component, chain and
  * forest cases), cross-day dedup, the normalization-dependent catch,
  * and the index-growth bound (dropped docs never indexed).
  */
object CorpusPipeline {

  /** One day's outcome: survivors (doc_id, text — normalized), the
    * verified near-dup pairs behind the drops, and the one-row report.
    */
  final case class DailyRun(kept: DataFrame, pairs: DataFrame, report: DataFrame)

  /** Bootstrap an index for [[runDaily]] from existing history docs
    * (doc_id, text): NORMALIZES first, so the stored signatures speak
    * the same dialect the daily runs sign with.
    */
  def bootstrap(idx: SignatureIndex, docs: DataFrame): Unit =
    idx.appendDocuments(docs.select(col("doc_id"),
      TextOps.normalize(col("text")).as("text")))

  /** Run one day's batch (doc_id, text) through the flow against `idx`. */
  def runDaily(idx: SignatureIndex, batch: DataFrame): DailyRun = {
    val norm = batch.select(col("doc_id"),
      TextOps.normalize(col("text")).as("text"))
    val toks = norm.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
    val gateOk = DataOps.docRepetitionOn(toks)
      .filter(col("kept")).select(col("doc_id"))
      .join(DataOps.docQualityOn(toks).filter(col("kept")).select(col("doc_id")),
        "doc_id")
    // Materialized once: the gate lineage (normalize → tokenize → two
    // O(L²) per-row folds → joins) feeds the shingling, the drop joins,
    // the report counts AND the caller's reads of `kept` — recomputing
    // it per consumer would pay the heaviest per-row scan ~5×.
    val gated = norm.join(gateOk, "doc_id").localCheckpoint(true)

    val gatedSh = DataOps.shingledOn(gated)
    gatedSh.cache()
    val (pairs, kept) =
      try {
        val gatedBands = DataOps.bandDigests(gatedSh)
          .withColumn("pb", SignatureIndex.pb(col("h")))
        val pairs = DataOps
          .dedupIncrementalPairs(idx, gatedSh, gatedBands, DataOps.BandBucketCap)
          .localCheckpoint(true)

        // history wins: the batch-side doc of every history pair drops
        val batchIds = gated.select(col("doc_id"))
        val dropHist = pairs.filter(col("pair_type") === "new_hist")
          .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .join(batchIds, Seq("doc_id"), "left_semi")
        // in-batch duplicates resolve per CONNECTED COMPONENT among the
        // docs history didn't already claim: each component keeps its
        // minimum id (the dedup_cluster policy; a chain A~B~C is one
        // component keeping only A — the transitive-closure trade)
        val nnEdges = pairs.filter(col("pair_type") === "new_new")
          .select(col("doc_a"), col("doc_b"))
          .join(dropHist.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
          .join(dropHist.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
        val sym = nnEdges.select(col("doc_a"), col("doc_b")).unionByName(
          nnEdges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        val dropNew = DataOps.minLabelPropagate(sym)
          .filter(col("doc_id") =!= col("rep")).select(col("doc_id"))
        val dropped = dropHist.unionByName(dropNew).distinct()
        val kept = gated.join(dropped, Seq("doc_id"), "left_anti")
          .localCheckpoint(true)

        // the index learns ONLY the kept docs (selection before append)
        val keptIds = kept.select(col("doc_id"))
        idx.append(
          gatedSh.join(keptIds, Seq("doc_id"), "left_semi"),
          gatedBands.join(keptIds, Seq("doc_id"), "left_semi"))
        (pairs, kept)
      } finally { gatedSh.unpersist(blocking = false); () }

    val nIn = batch.count()
    val nGated = gated.count()
    val nKept = kept.count()
    val report = batch.sparkSession.createDataFrame(Seq(
      (nIn, nIn - nGated, nGated - nKept, nKept)))
      .toDF("n_in", "n_gated_out", "n_dup_dropped", "n_kept")
    DailyRun(kept, pairs, report)
  }

  /** Publish a run's kept corpus as a doc_id-bucketed CATALOG table
    * ([[graft.sink.BucketedCorpus]]) — the serving step that makes every
    * downstream join-back (enrichment, scoring, decontamination flags)
    * one-sided: the published corpus never shuffles again; only each
    * consumer's derived frame moves. The publish pays one hash
    * partitioning — the same work a single unbucketed join would have
    * paid, amortized over every read (the BucketedCorpus maintenance
    * argument, applied at the point the pipeline actually produces a
    * reread-many table).
    */
  def publish(run: DailyRun, table: String, path: String): Unit =
    graft.sink.BucketedCorpus.writeTable(run.kept, table, path, "doc_id")
}
