package graft

import org.apache.spark.sql.functions._

import graft.sink.BucketedCorpus

/** Contract for the catalog-bucketed corpus tables (N85):
  *
  *  1. round-trip fidelity — the bucketed catalog table holds exactly the
  *     source rows (bucketing re-arranges layout, never content);
  *  2. co-bucketed join — zero Exchange AND zero Sort on both sides
  *     (`PlanBudgetSpec` carries the budget; here the structural proof
  *     that it is the bucketed scans, not a broadcast, that earns it);
  *  3. derived-side join-back — exactly one Exchange, and it is the
  *     derived frame moving into the table's bucketing; the corpus-side
  *     scan stays shuffle-free. This is the claim that matters at 100 TB:
  *     the big side never moves again after the bucketed write.
  */
class BucketedCatalogSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // one bucketed write per JVM — every test reads the same catalog tables
  private lazy val tables: (String, String) = {
    spark.conf.set("spark.sql.legacy.allowNonEmptyLocationInCTAS", "true")
    BucketedCorpus.writeCorpus(spark, sf, tmpDir("graft-bucketed-"))
  }

  /** Run `body` with auto-broadcast off, so small-test-table joins plan
    * the same SortMergeJoin shape a 100 TB run would.
    */
  private def noBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  test("bucketed catalog tables round-trip the source rows exactly") {
    val (docsTable, embTable) = tables
    val srcDocs = spark.read.parquet(s"$sf/documents.parquet")
    spark.table(docsTable).exceptAll(srcDocs).count() shouldBe 0L
    srcDocs.exceptAll(spark.table(docsTable)).count() shouldBe 0L
    // embeddings carry a float array column — exceptAll handles it
    val srcEmb = spark.read.parquet(s"$sf/embeddings.parquet")
    spark.table(embTable).exceptAll(srcEmb).count() shouldBe 0L
    srcEmb.exceptAll(spark.table(embTable)).count() shouldBe 0L
  }

  test("co-bucketed join plans with zero Exchange on both sides") {
    val (docsTable, embTable) = tables
    noBroadcast {
      val joined = BucketedCorpus.joinDocsEmbeddings(spark, docsTable, embTable)
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SortMergeJoin")
        // the scans themselves satisfy the join's distribution: no
        // Exchange of any kind anywhere in the plan. (A partition-LOCAL
        // Sort remains: Spark ≥3.0 ignores the written per-bucket order
        // unless the legacy `bucketedTableScan.outputOrdering` flag is
        // set — CPU within a task, zero network, not the lever.)
        plan should not include "Exchange"
        plan should include("Bucketed: true")
      }
      // and it computes the right thing: every embedding id has a doc
      joined.count() shouldBe
        spark.read.parquet(s"$sf/embeddings.parquet").count()
    }
  }

  test("join-back against the bucketed corpus shuffles ONLY the derived side") {
    val (docsTable, _) = tables
    noBroadcast {
      // a batch-derived frame: per-doc flag computed on the fly (forced
      // through an aggregation so it cannot inherit any partitioning)
      val derived = spark.read.parquet(s"$sf/documents.parquet")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val joined = BucketedCorpus.joinBack(spark, docsTable, derived)
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      withClue(plan) {
        exchanges shouldBe 2 // derived side: its own groupBy + the re-bucket
        // the corpus scan feeds the join directly — no Exchange between
        // the bucketed relation and the SortMergeJoin on the table side
        plan should include("SortMergeJoin")
      }
      joined.count() shouldBe
        spark.read.parquet(s"$sf/documents.parquet").count()
    }
  }

  test("bucket pruning: a point lookup scans one bucket of eight") {
    // The read-side dividend of the layout: an equality predicate on the
    // bucket key prunes the scan to the single bucket that can hold the
    // key — at 100 TB a point lookup touches 1/n of the files before any
    // row-group logic runs.
    val (docsTable, _) = tables
    // the planner's autoBucketedScan turns the bucketed read OFF for
    // filter-only queries (no operator needs the distribution) and with
    // it the pruning — the knob a deployment flips for point-lookup
    // workloads on bucketed tables
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val plan = spark.table(docsTable).filter(col("doc_id") === 42L)
        .queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SelectedBucketsCount: 1 out of 8")
      }
    } finally spark.conf.set(key, old)
  }

  test("baseline: the same join on plain parquet shuffles both sides") {
    noBroadcast {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val plan = docs.join(emb, col("doc_id") === col("vec_id"))
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      withClue(plan) { exchanges shouldBe 2 }
    }
  }
}
