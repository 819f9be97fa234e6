package graft

import org.apache.spark.sql.functions._

import graft.query.CorpusPipeline
import graft.sink.SignatureIndex

/** Days through [[CorpusPipeline.runDaily]]: gating, component-based
  * in-batch dedup (one keeper per near-dup component, chain + forest),
  * cross-day dedup against the index, the catch that exists ONLY because
  * normalization runs before signatures, the dialect-safe [[CorpusPipeline.bootstrap]],
  * and the index-growth bound (dropped duplicates are never indexed).
  * Report arithmetic pinned against the frames.
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

    // dropped/gated docs are NOT indexed: only the two keepers' rows
    idx.shingles.count() shouldBe 2L

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
    r2.report.collect().head.toSeq shouldBe Seq(3L, 0L, 2L, 1L)
    // both drops are history pairs: the day-1 keeper is on each pair
    val p2 = r2.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    p2 should contain((10L, 21L, "new_hist"))
    p2 should contain((11L, 22L, "new_hist"))
    idx.shingles.count() shouldBe 3L // only doc 20 joined the index

    // the survivors' text is the NORMALIZED form
    r1.kept.filter(col("doc_id") === 11L).select("text").as[String].head() shouldBe clean2
  }

  test("publish: the kept corpus lands bucketed; a join-back shuffles only the derived side") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.allowNonEmptyLocationInCTAS", "true")
    val idx = new SignatureIndex(spark, tmpDir("cp-pub-idx"))
    val day = Seq((10L, clean1), (11L, clean2), (12L, clean3))
      .toDF("doc_id", "text")
    val run = CorpusPipeline.runDaily(idx, day)
    val path = tmpDir("cp-pub-tbl")
    CorpusPipeline.publish(run, "graft_cp_published", s"$path/corpus")
    // round trip: the catalog table holds exactly the kept rows
    val table = spark.table("graft_cp_published")
    table.exceptAll(run.kept).count() shouldBe 0L
    run.kept.exceptAll(table).count() shouldBe 0L
    // a downstream consumer's derived join-back (per-doc scores, forced
    // through an aggregation) moves only the derived frame: one Exchange
    // for its groupBy + one to meet the table's bucketing — the corpus
    // scan itself feeds the join Exchange-free
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val derived = run.kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))
      val joined = graft.sink.BucketedCorpus.joinBack(spark, "graft_cp_published", derived)
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      withClue(plan) {
        exchanges shouldBe 2
        plan should include("Bucketed: true")
      }
      joined.count() shouldBe run.kept.count()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("a near-dup chain is ONE component with one keeper (the dedup_cluster policy)") {
    import spark.implicits._
    // 40-token base; B differs from A in token 5, C differs from B in
    // token 35 — A~B and B~C sit above the 0.8 Jaccard threshold while
    // A~C (two edits apart) falls below it
    val base = (1 to 40).map(i => s"w$i").toVector
    def doc(edits: Map[Int, String]) =
      base.zipWithIndex.map { case (t, i) => edits.getOrElse(i, t) }.mkString(" ")
    val idx = new SignatureIndex(spark, tmpDir("cp-chain-idx"))
    val r = CorpusPipeline.runDaily(idx,
      Seq((1L, doc(Map.empty)),
        (2L, doc(Map(5 -> "xx"))),
        (3L, doc(Map(5 -> "xx", 35 -> "yy")))).toDF("doc_id", "text"))
    val pairs = r.pairs.collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    withClue(s"fixture must form a chain, got pairs $pairs: ") {
      pairs shouldBe Set((1L, 2L), (2L, 3L))
    }
    // min-label propagation resolves {1,2,3} as ONE component with
    // keeper 1 (the transitive-closure trade); the decision depends only
    // on component structure, so a FOREST of two chains keeps two
    val keepers = r.kept.select("doc_id").as[Long].collect().toSet
    keepers shouldBe Set(1L)
    r.report.collect().head.toSeq shouldBe Seq(3L, 0L, 2L, 1L)

    val idx2 = new SignatureIndex(spark, tmpDir("cp-forest-idx"))
    val other = (1 to 40).map(i => s"v$i").toVector
    def doc2(edits: Map[Int, String]) =
      other.zipWithIndex.map { case (t, i) => edits.getOrElse(i, t) }.mkString(" ")
    val r2 = CorpusPipeline.runDaily(idx2,
      Seq((1L, doc(Map.empty)), (2L, doc(Map(5 -> "xx"))),
        (7L, doc2(Map.empty)), (8L, doc2(Map(9 -> "zz")))).toDF("doc_id", "text"))
    r2.kept.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 7L)
  }

  test("bootstrap signs the pipeline's dialect: raw-cased history still catches clones") {
    import spark.implicits._
    val idx = new SignatureIndex(spark, tmpDir("cp-boot-idx"))
    // history arrives RAW-cased; bootstrap normalizes before signing
    CorpusPipeline.bootstrap(idx,
      Seq((1L, clean1.toUpperCase + "  ")).toDF("doc_id", "text"))
    val r = CorpusPipeline.runDaily(idx,
      Seq((2L, clean1)).toDF("doc_id", "text"))
    r.kept.count() shouldBe 0L
    r.pairs.collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getString(2)))
      .toSet shouldBe Set((1L, 2L, "new_hist"))
  }
}
