package graft

import org.apache.spark.sql.functions._

import graft.query.CorpusPipeline
import graft.sink.SignatureIndex
import graft.streaming.StreamingCorpusPipeline

/** The streaming daily pipeline must be the BATCH pipeline plus delivery
  * bookkeeping and nothing else: drain(day1) + restart + drain(day2)
  * through [[StreamingCorpusPipeline]] produces exactly the kept /
  * pairs / attrition-report output of two direct
  * [[CorpusPipeline.runDaily]] calls on a fresh index, with the
  * persisted [[SignatureIndex]] as the sole cross-run state (the
  * second drain resumes from the checkpoint — day1's files are not
  * re-delivered, and its near-dups are caught via the INDEX, not
  * memory).
  */
class StreamingCorpusPipelineSpec extends SparkSpec {

  private val clean1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val clean2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val clean3 = "one two three four five six seven eight nine ten"

  test("drain/restart/drain equals two one-shot batch runDaily days") {
    import spark.implicits._
    // day 1: two keepers, one in-batch clone, one repetition-gated doc;
    // day 2: one keeper, one cross-day clone of day-1's doc 10, one
    // normalization-dependent clone of doc 11 (the CorpusPipelineSpec
    // fixture, so the streaming path exercises gating, in-batch
    // components, cross-day index hits, AND the normalization catch)
    val day1 = Seq(
      (10L, clean1), (11L, clean2), (12L, clean2),
      (13L, Seq.fill(40)("spam").mkString(" "))).toDF("doc_id", "text")
    val day2 = Seq(
      (20L, clean3), (21L, clean1),
      (22L, "\u200B" + clean2.toUpperCase + "  \t")).toDF("doc_id", "text")

    // batch truth: two sequential days on a fresh index
    val bIdx = new SignatureIndex(spark, tmpDir("scp-batch-idx"))
    val b1 = CorpusPipeline.runDaily(bIdx, day1)
    val b2 = CorpusPipeline.runDaily(bIdx, day2)

    // streaming: land day1, drain, land day2, drain from the SAME
    // checkpoint (a restarted query) into the SAME index
    val sIdx = new SignatureIndex(spark, tmpDir("scp-stream-idx"))
    val landing = tmpDir("scp-landing")
    val out = tmpDir("scp-out")
    val ckpt = tmpDir("scp-ckpt")
    day1.coalesce(1).write.mode("append").parquet(landing)
    StreamingCorpusPipeline.runAvailableNow(spark, sIdx, landing, out, ckpt)
    day2.coalesce(1).write.mode("append").parquet(landing)
    StreamingCorpusPipeline.runAvailableNow(spark, sIdx, landing, out, ckpt)

    val (kept, pairs, report) = StreamingCorpusPipeline.results(spark, out)

    // two micro-batches ran, in landing order
    val batchIds = report.select("batch_id").as[Long].collect().toSeq
    batchIds.length shouldBe 2

    // kept: per-day sets equal the batch runs' (batch_id partitions the
    // provenance; day1's batch id is the smaller)
    def keptSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.select("doc_id", "text").as[(Long, String)].collect().toSet
    keptSet(kept.filter(col("batch_id") === batchIds.min)) shouldBe keptSet(b1.kept)
    keptSet(kept.filter(col("batch_id") === batchIds.max)) shouldBe keptSet(b2.kept)

    // pairs: identical verified near-dup evidence per day
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
      df.select("doc_a", "doc_b", "pair_type").as[(Long, Long, String)]
        .collect().toSet
    pairSet(pairs.filter(col("batch_id") === batchIds.min)) shouldBe pairSet(b1.pairs)
    pairSet(pairs.filter(col("batch_id") === batchIds.max)) shouldBe pairSet(b2.pairs)

    // attrition reports equal, day for day
    def rep(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.select("n_in", "n_gated_out", "n_dup_dropped", "n_kept")
        .collect().head.toSeq
    rep(report.filter(col("batch_id") === batchIds.min)) shouldBe rep(b1.report)
    rep(report.filter(col("batch_id") === batchIds.max)) shouldBe rep(b2.report)

    // the index is the sole cross-run state, and it converged to the
    // batch index's content: same signed doc set
    import spark.implicits.newLongEncoder
    sIdx.shingles.select("doc_id").distinct().as[Long].collect().toSet shouldBe
      bIdx.shingles.select("doc_id").distinct().as[Long].collect().toSet

    // an empty third drain is a no-op: no new batch dirs, index untouched
    val nShingles = sIdx.shingles.count()
    StreamingCorpusPipeline.runAvailableNow(spark, sIdx, landing, out, ckpt)
    StreamingCorpusPipeline.results(spark, out)._3.count() shouldBe 2L
    sIdx.shingles.count() shouldBe nShingles
  }
}
