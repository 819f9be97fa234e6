package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.{DataOps, Relational, Tables}

/** Semantic pins for the r10 event-analytics additions (the DuckDB
  * hash-compare covers exact values at sf0.01; these pin the shapes the
  * oracle can't see — the zero-fill path on a corpus with no silent
  * days, blocking losslessness, cube cell algebra).
  */
class EventAnalyticsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def eventsFixture(rows: Seq[(Long, String, Long)]): String = {
    val dir = tmpDir("evfix")
    val data = rows.map { case (id, ts, uid) =>
      Row(id, java.sql.Timestamp.valueOf(ts), uid, "view", 1.0, "{}")
    }
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(data).asJava), eventsSchema)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("gap_fill: silent days appear as zero with the last active count carried") {
    val dir = eventsFixture(Seq(
      (1L, "2024-03-01 10:00:00", 1L),
      (2L, "2024-03-01 11:00:00", 1L),
      (3L, "2024-03-02 09:00:00", 2L),
      // 03-03 and 03-04 silent
      (4L, "2024-03-05 23:59:59", 3L)))
    val out = Relational.gapFill(spark, dir)
      .orderBy("day").collect()
    out.map(_.getString(0)) shouldBe Array(
      "2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04", "2024-03-05")
    out.map(_.getLong(1)) shouldBe Array(2L, 1L, 0L, 0L, 1L)
    out.map(_.getLong(2)) shouldBe Array(2L, 1L, 1L, 1L, 1L)
  }

  test("gap_fill: spine spans exactly min..max day and totals are preserved") {
    val out = Relational.gapFill(spark, sf).cache()
    val e = Tables(spark, sf, "events")
    out.agg(sum(col("n_events"))).head.getLong(0) shouldBe e.count()
    val days = e.agg(
      datediff(max(date_trunc("day", col("ts"))),
               min(date_trunc("day", col("ts"))))).head.getInt(0)
    out.count() shouldBe days + 1L
    // LOCF is never null (day 1 always has events) and never zero
    out.filter(col("n_locf").isNull || col("n_locf") === 0).count() shouldBe 0L
    out.unpersist()
  }

  test("islands_coverage: merging is exact on a hand-built stream") {
    val dir = eventsFixture(Seq(
      // user 1: two islands — 3 events within 30 min, then a 2 h gap
      (1L, "2024-03-01 10:00:00", 1L),
      (2L, "2024-03-01 10:20:00", 1L),
      (3L, "2024-03-01 10:40:00", 1L),
      (4L, "2024-03-01 13:00:00", 1L),
      // user 2: one single-event island (zero covered span)
      (5L, "2024-03-01 10:00:00", 2L)))
    val out = Relational.islandsCoverage(spark, dir)
      .orderBy("user_id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) shouldBe
      Array((1L, 2L, 2400L * 1000000, 4L), (2L, 1L, 0L, 1L))
  }

  test("islands_coverage: invariants against the corpus") {
    val out = Relational.islandsCoverage(spark, sf).cache()
    val e = Tables(spark, sf, "events")
    out.agg(sum(col("n_events"))).head.getLong(0) shouldBe e.count()
    out.count() shouldBe e.select("user_id").distinct().count()
    // covered span never exceeds the user's full first-to-last span
    val span = e.groupBy("user_id")
      .agg((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
        .as("full_span"))
    out.join(span, "user_id")
      .filter(col("covered_us") > col("full_span")).count() shouldBe 0L
    out.filter(col("n_islands") < 1).count() shouldBe 0L
    out.unpersist()
  }

  test("cube_events: the four grouping sets agree with each other") {
    val out = Relational.cubeEvents(spark, sf).cache()
    val grand = out.filter(col("g_type") === 1 && col("g_day") === 1)
    grand.count() shouldBe 1L
    val n = grand.head.getLong(4)
    n shouldBe Tables(spark, sf, "events").count()
    // each partial rollup re-sums to the grand total
    for ((gt, gd) <- Seq((0, 1), (1, 0), (0, 0)))
      withClue(s"slice g_type=$gt g_day=$gd: ") {
        out.filter(col("g_type") === gt && col("g_day") === gd)
          .agg(sum(col("n"))).head.getLong(0) shouldBe n
      }
    // the flags, not the nulls, carry the semantics — but on this corpus
    // (no null keys) they must coincide
    out.filter(col("g_type") === 1 && col("event_type").isNotNull)
      .count() shouldBe 0L
    out.filter(col("g_type") === 0 && col("event_type").isNull)
      .count() shouldBe 0L
    out.unpersist()
  }

  test("k_anonymity: suppression set is exactly the membership of at-risk groups") {
    val groups = DataOps.kAnonymity(spark, sf).cache()
    val sup = DataOps.kAnonymitySuppress(spark, sf).cache()
    // group counts re-derived from the doc-level output match the audit
    val rederived = sup.groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("m"))
    rederived.join(groups, Seq("lang", "source", "len_bucket"))
      .filter(col("m") =!= col("n") || !col("at_risk")).count() shouldBe 0L
    // every at-risk group is represented, every suppressed group is < K
    rederived.count() shouldBe groups.filter(col("at_risk")).count()
    sup.groupBy("lang", "source", "len_bucket").count()
      .filter(col("count") >= 5).count() shouldBe 0L
    // audit covers every document exactly once
    groups.agg(sum(col("n"))).head.getLong(0) shouldBe
      Tables(spark, sf, "documents").count()
    groups.unpersist(); sup.unpersist()
  }

  test("props_stats: every event parses and the k range is sane") {
    val out = Relational.propsStats(spark, sf).cache()
    // the fixture generator always writes {"k": int} — n must cover all
    // events (a parse regression shows up as dropped nulls here)
    out.agg(sum(col("n"))).head.getLong(0) shouldBe
      Tables(spark, sf, "events").count()
    out.filter(col("min_k") > col("max_k")).count() shouldBe 0L
    out.filter(col("n_distinct_k") > col("n")).count() shouldBe 0L
    out.unpersist()
  }

  test("percentiles_by_type: rank-selected values are actual members in order") {
    val out = Relational.percentilesByType(spark, sf).cache()
    out.filter(col("p50") > col("p95")).count() shouldBe 0L
    // each percentile is a value that genuinely occurs for that type
    val e = Tables(spark, sf, "events").select("event_type", "value")
    for (c <- Seq("p50", "p95"))
      withClue(s"$c: ") {
        out.select(col("event_type"), col(c).as("value"))
          .join(e, Seq("event_type", "value"), "left_anti")
          .count() shouldBe 0L
      }
    out.unpersist()
  }

  test("asof mirror: backward and forward picks bracket each click in time") {
    import graft.queries.RefOps
    val e = Tables(spark, sf, "events")
    val pTimes = e.filter(col("event_type") === "purchase")
      .groupBy(col("event_id").as("p_ref")).agg(max(col("ts")).as("p_ts"))
    def times(df: org.apache.spark.sql.DataFrame, matchCol: String) =
      df.join(pTimes, col(matchCol) === col("p_ref"))
        .select(col("event_id"), col("ts_s"), col("p_ts"))
    // every backward match happened at or before the click, every
    // forward match at or after — the inclusive-at-equality mirror
    times(RefOps.asofJoin(spark, sf), "prior_purchase")
      .filter(date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss") > col("ts_s"))
      .count() shouldBe 0L
    times(RefOps.asofJoinForward(spark, sf), "next_purchase")
      .filter(date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss") < col("ts_s"))
      .count() shouldBe 0L
    // both sides cover the same click set
    RefOps.asofJoinForward(spark, sf).count() shouldBe
      RefOps.asofJoin(spark, sf).count()
  }

  test("training_set: the manifest is consistent with its component stages") {
    val out = DataOps.trainingSet(spark, sf).cache()
    val total = out.agg(sum(col("n_docs"))).head.getLong(0)
    // never more docs than the hygiene gate keeps, and the decontaminate
    // stage's held-out eval cohort (doc_id % 97 == 0) is entirely absent
    val kept = DataOps.cleanCorpus(spark, sf).filter(col("kept")).count()
    total should be <= kept
    total should be > 0L
    // all three splits appear and train dominates (90/5/5 hash split)
    val bySplit = out.groupBy("split").agg(sum(col("n_docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySplit.keySet shouldBe Set("train", "val", "test")
    bySplit("train") should be > bySplit("val") + bySplit("test")
    out.unpersist()
  }

  test("corpus_drift: cell mass covers the corpus; identical cohorts read zero") {
    val out = DataOps.corpusDrift(spark, sf).cache()
    out.agg(sum(col("n_a") + col("n_b"))).head.getLong(0) shouldBe
      Tables(spark, sf, "documents").count()
    out.filter(col("drift_milli") < 0 || col("drift_milli") > 1000)
      .count() shouldBe 0L
    out.unpersist()
    // self-vs-self drift is identically zero: duplicate the corpus into
    // both cohorts via a source rename that lands every doc in A and B
    val dir = tmpDir("drift")
    val d = Tables(spark, sf, "documents")
    d.withColumn("source", lit("src1"))
      .unionByName(d.withColumn("source", lit("src11")))
      .write.parquet(s"$dir/documents.parquet")
    DataOps.corpusDrift(spark, dir)
      .filter(col("drift_milli") =!= 0).count() shouldBe 0L
  }

  test("corpus_drift: an empty cohort yields NULL drift, not an error") {
    // Degenerate source distribution: every document on the A side of the
    // substr(source,4)<10 split. Unguarded, Spark's div nulls while
    // DuckDB's // raises — the nullif guard pins both engines to the same
    // defined answer (NULL drift for a cohortless comparison).
    val dir = tmpDir("drift-degenerate")
    Tables(spark, sf, "documents")
      .withColumn("source", lit("src1"))
      .write.parquet(s"$dir/documents.parquet")
    val out = DataOps.corpusDrift(spark, dir).cache()
    out.count() should be > 0L
    out.filter(col("drift_milli").isNotNull).count() shouldBe 0L
    out.agg(sum(col("n_b"))).head.getLong(0) shouldBe 0L
    out.unpersist()
  }

  test("corpus_manifest: the content hash is a function of the SET, not the order") {
    val base = DataOps.corpusManifest(spark, sf)
    // identical input content under a hostile physical layout (different
    // partitioning, reversed intra-partition order) must hash identically
    val dir = tmpDir("manifest")
    Tables(spark, sf, "documents")
      .repartition(7, col("source"))
      .sortWithinPartitions(col("doc_id").desc)
      .write.parquet(s"$dir/documents.parquet")
    val shuffled = DataOps.corpusManifest(spark, dir)
    shuffled.except(base).count() shouldBe 0L
    base.except(shuffled).count() shouldBe 0L
    // and a single changed document changes its language's hash
    Tables(spark, sf, "documents").limit(1).select("lang")
      .collect().headOption.foreach { r =>
      val lang = r.getString(0)
      val dir2 = tmpDir("manifest2")
      Tables(spark, sf, "documents")
        .withColumn("text",
          when(col("doc_id") === Tables(spark, sf, "documents")
            .agg(min(col("doc_id"))).head.getLong(0),
            concat(col("text"), lit("!"))).otherwise(col("text")))
        .write.parquet(s"$dir2/documents.parquet")
      val tampered = DataOps.corpusManifest(spark, dir2)
      tampered.except(base).count() should be > 0L
      val _ = lang
    }
  }

  test("edit_distance_block: length-bucket blocking is lossless vs brute force") {
    val d = Tables(spark, sf, "documents")
      .select(col("lang"), col("doc_id"), substring(col("text"), 1, 80).as("p"))
    val a = d.select(col("lang"), col("doc_id").as("a_id"), col("p").as("a_p"))
    val b = d.select(col("lang"), col("doc_id").as("b_id"), col("p").as("b_p"))
    val brute = a.join(b, "lang")
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_p"), col("b_p"), 2).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 2)
      .select("a_id", "b_id", "dist")
    val blocked = DataOps.editDistanceBlock(spark, sf)
    blocked.except(brute).count() shouldBe 0L
    brute.except(blocked).count() shouldBe 0L
  }
}
