package graft

import org.apache.spark.sql.functions._

import graft.query.CorpusPipeline
import graft.sink.SignatureIndex

/** Two days through [[CorpusPipeline.runDaily]]: gating, in-batch dedup,
  * cross-day dedup against the index, and the catch that exists ONLY
  * because normalization runs before signatures — an NFD-encoded clone
  * of a day-1 doc. Report arithmetic pinned against the frames.
  */
class CorpusPipelineSpec extends SparkSpec {

  private val clean1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val clean2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val clean3 = "one two three four five six seven eight nine ten"

  test("two daily runs: gates, in-batch dedup, cross-day dedup, normalization catch") {
    import spark.implicits._
    val idx = new SignatureIndex(spark, tmpDir("cp-idx"))

    // day 1: two good docs, one in-batch clone (12 > 11 drops), one
    // repetition-gated doc (one word over and over)
    val day1 = Seq(
      (10L, clean1),
      (11L, clean2),
      (12L, clean2),
      (13L, Seq.fill(40)("spam").mkString(" ")))
      .toDF("doc_id", "text")
    val r1 = CorpusPipeline.runDaily(idx, day1)
    val kept1 = r1.kept.select("doc_id").as[Long].collect().toSet
    kept1 shouldBe Set(10L, 11L)
    r1.report.collect().head.toSeq shouldBe Seq(4L, 1L, 1L, 2L)

    // day 2: a fresh doc (kept), an exact clone of day-1 doc 10 (dropped
    // as history), and a zero-width-polluted, uppercased, padded rendition
    // of day-1 doc 11 (identical CONTENT, alien raw shingles) — caught
    // ONLY because normalization runs before signatures
    val pollutedClone = "\u200B" + clean2.toUpperCase + "  \t"
    val day2 = Seq(
      (20L, clean3),
      (21L, clean1),
      (22L, pollutedClone))
      .toDF("doc_id", "text")
    val r2 = CorpusPipeline.runDaily(idx, day2)
    val kept2 = r2.kept.select("doc_id").as[Long].collect().toSet
    kept2 shouldBe Set(20L)
    r2.report.collect().head.toSeq shouldBe Seq(3L, 0L, 2L, 3L - 2L)
    // both drops are history pairs: the day-1 keeper is on each pair
    val p2 = r2.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    p2 should contain((10L, 21L, "new_hist"))
    p2 should contain((11L, 22L, "new_hist"))

    // the survivors' text is the NORMALIZED form
    r1.kept.filter(col("doc_id") === 11L).select("text").as[String].head() shouldBe clean2
  }
}
