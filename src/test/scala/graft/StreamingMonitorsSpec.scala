package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational, Tables}
import graft.streaming.StreamingMonitors

/** The streaming faces of the r12 monitoring family (hourly_profile,
  * anomalous_days, lang_confusion) are spec-pinned EQUIVALENT to their
  * graded batch queries: the input is sliced into interleaved
  * micro-batches (pmod over the id, so every slice touches every
  * hour/day/language cell — the additive merge is genuinely exercised,
  * not a partition-per-batch special case), drained across TWO
  * AvailableNow invocations resuming from one checkpoint, and the
  * derived monitor must equal the batch query over the same rows.
  */
class StreamingMonitorsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Land each slice as one flat parquet file under the watched dir. */
  private def land(watched: String, name: String, slice: DataFrame): Unit = {
    val stage = tmpDir("mon-stage")
    slice.repartition(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(watched, s"$name.parquet"))
    ()
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Drive one monitor end-to-end: slice `src` 3 ways on `idCol`, drain
    * slice 0, then slices 1+2 (checkpoint resume, 1 file per batch), and
    * compare the derived monitor against `truth`. A final drain with no
    * new files must leave the state byte-identical (exactly-once).
    */
  private def drive(src: DataFrame, idCol: String,
                    maintain: (DataFrame, String, String) => Unit,
                    read: String => DataFrame, truth: DataFrame): Unit = {
    val watched = tmpDir("mon-in")
    val state = tmpDir("mon-state") + "/state"
    val ckpt = tmpDir("mon-ckpt") + "/ckpt"
    val schema = src.schema
    def drain(): Unit = maintain(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(watched), state, ckpt)
    land(watched, "s0", src.filter(pmod(col(idCol), lit(3)) === 0))
    drain()
    land(watched, "s1", src.filter(pmod(col(idCol), lit(3)) === 1))
    land(watched, "s2", src.filter(pmod(col(idCol), lit(3)) === 2))
    drain()
    rows(read(state)) shouldBe rows(truth)
    val before = rows(read(state))
    drain() // no new files: nothing reprocessed, monitor unchanged
    rows(read(state)) shouldBe before
  }

  test("streaming hourly_profile equals the graded batch query") {
    drive(Tables(spark, sf, "events"), "event_id",
      StreamingMonitors.maintainHourlyProfile,
      StreamingMonitors.hourlyProfile(spark, _),
      Relational.hourlyProfile(spark, sf))
  }

  test("streaming anomalous_days equals the graded batch query") {
    drive(Tables(spark, sf, "events"), "event_id",
      StreamingMonitors.maintainAnomalousDays,
      StreamingMonitors.anomalousDays(spark, _),
      Relational.anomalousDays(spark, sf))
  }

  test("streaming lang_confusion equals the graded batch query") {
    drive(Tables(spark, sf, "documents"), "doc_id",
      StreamingMonitors.maintainLangConfusion,
      StreamingMonitors.langConfusion(spark, _),
      graft.queries.DataOps.langConfusion(spark, sf))
  }

  test("streaming hll registers equal the graded batch sketch (max-merge)") {
    // the one monitor whose additive merge is MAX: interleaved slices
    // write overlapping registers, and the read-side max must land on
    // exactly the batch sketch (sans the exact-count join)
    drive(Tables(spark, sf, "events"), "event_id",
      StreamingMonitors.maintainHllRegisters,
      StreamingMonitors.hllSketch(spark, _),
      graft.queries.RefOps.hllDistinctOn(Tables(spark, sf, "events")))
  }

  test("streaming hll register warehouse serves the trailing-7d window equal to the graded batch face") {
    // r13 verdict #8 wired end-to-end: maintain per-(day, type) partial
    // registers per micro-batch, serve the trailing window FROM STATE —
    // must equal hll_sliding_7d's estimate columns exactly (n_exact is
    // the batch entry's fidelity line; it needs raw events by
    // definition and is dropped from the comparison, not approximated)
    drive(Tables(spark, sf, "events"), "event_id",
      StreamingMonitors.maintainHllDailyRegisters,
      StreamingMonitors.hllSliding7d(spark, _),
      graft.queries.RefOps.hllSliding(spark, sf)
        .drop("n_exact"))
  }

  test("streaming cms registers equal the graded batch sketch (sum-merge)") {
    // the SUM-merge sibling: interleaved document slices each count
    // their own tokens into partial 4x512 counters; the re-summed cells
    // must equal the whole-corpus registers exactly
    drive(Tables(spark, sf, "documents"), "doc_id",
      StreamingMonitors.maintainCmsRegisters,
      StreamingMonitors.cmsRegisters(spark, _),
      DataOps.cmsRegistersOf(DataOps.cmsTokenCounts(spark, sf)))
  }

  test("streaming quantile registers equal the graded batch sketch (sum-merge)") {
    // r14: interleaved lineitem slices each bucket their own rows into
    // partial (flag, shift, sub) counts; the re-summed state must equal
    // the whole-corpus register frame exactly — the same merge law the
    // batch spec pins on parity splits, exercised across micro-batches
    val cents = Tables(spark, sf, "lineitem").select(
      col("l_returnflag").as("flag"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    drive(Tables(spark, sf, "lineitem"), "l_orderkey",
      StreamingMonitors.maintainQuantileRegisters,
      StreamingMonitors.quantileRegisters(spark, _),
      graft.queries.RefOps.quantileRegistersOf(cents))
  }

  test("streaming weighted quantile registers serve estimates equal to the graded batch face") {
    // r15 (r14 verdict #8): interleaved document slices each land
    // partial (lang, shift, sub) WEIGHT sums via the register half the
    // batch face shares; the sum-merged state served through the shared
    // derive must equal weighted_quantile_sketch's estimate columns
    // (exact_v/err_ppm are the batch entry's fidelity lines — they need
    // raw rows by definition and are dropped, not approximated)
    drive(Tables(spark, sf, "documents"), "doc_id",
      StreamingMonitors.maintainWeightedQuantileRegisters,
      StreamingMonitors.weightedQuantileEstimate(spark, _),
      graft.queries.RefOps.weightedQuantileSketch(spark, sf)
        .drop("exact_v", "err_ppm"))
  }

  test("streaming drift/trend family equals the graded batch queries off one daily state") {
    // r13n: ONE maintained (event_type, d, n) cell state serves all
    // three derive halves — cusum peak, Theil-Sen slope, Mann-Kendall
    // sign test — each equal to its graded batch query
    drive(Tables(spark, sf, "events"), "event_id",
      StreamingMonitors.maintainDailyByType,
      StreamingMonitors.cusumDays(spark, _),
      Relational.cusumDays(spark, sf))
    drive(Tables(spark, sf, "events"), "event_id",
      StreamingMonitors.maintainDailyByType,
      StreamingMonitors.theilSen(spark, _),
      Relational.theilSen(spark, sf))
    drive(Tables(spark, sf, "events"), "event_id",
      StreamingMonitors.maintainDailyByType,
      StreamingMonitors.mannKendall(spark, _),
      Relational.mannKendall(spark, sf))
  }

  test("streaming doremi cells serve the identical mixture trajectory (r15 verdict #6)") {
    // r16: interleaved document slices are each scored against the SAME
    // frozen Stupid-Backoff model the graded batch entry scores against
    // (trained on the full corpus — DoReMi's fixed-proxy regime), land
    // partial (lang, toks, sppm) cells across a checkpoint resume, and
    // the serve path's exponentiated-gradient loop over the sum-merged
    // cells must equal doremi_mixture row for row — trajectory, excess
    // and iterate average included (shared loop code, shared loss code,
    // equivalence still pinned end-to-end here).
    val counts = DataOps.sbNgramCounts(spark, sf).localCheckpoint(true)
    drive(Tables(spark, sf, "documents"), "doc_id",
      (df, state, ckpt) =>
        StreamingMonitors.maintainDoremiCells(df, counts, state, ckpt),
      StreamingMonitors.doremiMixtureServe(spark, _),
      DataOps.doremiMixture(spark, sf))
  }
}
