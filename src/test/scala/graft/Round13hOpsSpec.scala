package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Tables}

/** r13h operator batch — evaluation/privacy/candidate-generation faces:
  * PR operating points, distinct l-diversity, sorted-neighborhood
  * dedup, sorted batching, HHI source concentration. Exact cross-engine
  * equality is the driver's DuckDB oracle; these pin the definitional
  * laws (curve monotonicity, AUC consistency, SNM-vs-LSH agreement,
  * the sorted-batching padding win, HHI bounds).
  */
class Round13hOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("pr_curve: recall is non-increasing and counts are consistent in threshold") {
    val rows = DataOps.prCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    rows.length shouldBe DataOps.PrThresholds
    rows.sliding(2).foreach { case Array((_, p1, t1), (_, p2, t2)) =>
      p2 should be <= p1 // raising the cut can only shrink predictions
      t2 should be <= t1
      ()
    }
    rows.foreach { case (_, nPred, tp) => tp should be <= nPred }
    // threshold 0 predicts everything: recall_ppm = 1e6 there
    val r0 = DataOps.prCurve(spark, sf)
      .filter(col("thr") === 0).select(col("recall_ppm")).head().getLong(0)
    r0 shouldBe 1000000L
  }

  test("l_diversity: distinct-l law against a row-level recompute") {
    val got = DataOps.lDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val docs = Tables(spark, sf, "documents")
      .select(col("lang"), expr(s"n_chars div ${DataOps.LDivLenBucket}"),
        col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expect = docs.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      val l = ds.map(_._3).distinct.length.toLong
      k -> ((ds.length.toLong, l, l >= DataOps.LDiversityL))
    }
    got shouldBe expect
  }

  test("snm_dedup: agrees with the banded-LSH pair set on this corpus") {
    // both candidate generators verify with the SAME exact-Jaccard rule;
    // on the planted near-dups (shared prefixes) SNM reaches full recall
    val snm = DataOps.snmDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DataOps.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    snm shouldBe lsh
  }

  test("bucketed_batching: sorted batches waste no more padding than natural order") {
    val base = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        org.apache.spark.sql.functions.size(split(col("text"), " "))
          .cast("long").as("n_tokens"),
        pmod(col("doc_id"), lit(32)).cast("long").as("shard"))
    val sorted = DataOps.batchPadding(base, sortByLength = true)
      .agg(sum(col("padding"))).head().getLong(0)
    val natural = DataOps.batchPadding(base, sortByLength = false)
      .agg(sum(col("padding"))).head().getLong(0)
    sorted should be <= natural
    sorted should be < natural // strictly better on this corpus
  }

  test("source_hhi: bounds and the uniform/concentrated extremes") {
    val rows = DataOps.sourceHhi(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nSources, hhi, eff) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // 1/n_sources <= HHI <= 1 (ppm), up to ppm quantization slack
      hhi should be <= 1000000L
      hhi.toDouble should be >= 1000000.0 / nSources - 2000
      // effective sources between 1 and n_sources (milli, with slack)
      eff should be >= 1000L
      eff.toDouble should be <= nSources * 1000.0 + 2000
    }
    // a single-source language would score HHI = 1e6 — synthesize one
    import spark.implicits._
    val one = Seq(("zz", "s1"), ("zz", "s1"), ("zz", "s1"))
      .toDF("lang", "source")
    val h = one.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("c"))
    h.select(expr("(1000000 * c) div 3").as("p"))
      .agg(expr("sum(p * p) div 1000000")).head().getLong(0) shouldBe 1000000L
  }
}
