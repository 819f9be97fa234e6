package graft

import graft.queries.{DataOps, Relational, RefOps}

/** Physical-plan pins for the properties that matter at 100 TB: filters
  * reaching the parquet scan, small dimensions broadcast. A semantics-
  * preserving refactor that silently un-pushes a filter or turns a
  * broadcast join into a shuffle fails here, not in a benchmark three
  * rounds later.
  */
class PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("incremental_filter: the cutoff is a pushed parquet filter, columns pruned") {
    val df = RefOps.incrementalFilter(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // native-type rewrite: the cutoff reaches the scan as a comparison on
    // the stored column — a plain long for the nanos flavor, an NTZ bound
    // for the r9+ flavor (row-group pruning either way); filtering the
    // CONVERTED timestamp instead would push only IsNotNull and read every
    // row group. The ReadSchema pin proves column pruning survives both
    // flavors (ts is bigint or timestamp_ntz depending on the writer).
    plan should include("GreaterThanOrEqual(ts")
    plan should include regex
      "ReadSchema: struct<event_id:bigint,ts:(bigint|timestamp_ntz),user_id:bigint>"
  }

  test("q3_shipping: dimension sides broadcast, no shuffle of the big fact side twice") {
    val df = Relational.q3ShippingPriority(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("keyword_search: no unpartitioned window — every Window node has a partition spec") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    // AQE hides the final plan behind AdaptiveSparkPlanExec/QueryStageExec
    // wrappers whose inner plans are not `children` — unwrap explicitly
    def windows(p: SparkPlan): Seq[WindowExec] = p.collect {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case q: QueryStageExec => windows(q.plan)
      case w: WindowExec => Seq(w)
    }.flatten
    val df = DataOps.keywordSearch(spark, sf)
    df.collect()
    val ws = windows(df.queryExecution.executedPlan)
    ws should not be empty
    ws.foreach { w =>
      withClue(s"unpartitioned window (global sort funnel): $w\n") {
        w.partitionSpec should not be empty
      }
    }
  }

  test("q1_pricing: shipdate predicate reaches the lineitem scan") {
    val df = Relational.q1PricingSummary(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("LessThanOrEqual(l_shipdate")
  }

  test("dedup_paragraphs: partial-aggregable winners, no window over the hash") {
    val withPs = DataOps.paragraphFrame(spark, sf)
    val paras = DataOps.paragraphExplode(withPs)
    val df = DataOps.dedupParagraphsCore(withPs, paras)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the keep-first winner is a map-side-combinable min, never a window
    // funnel through the boilerplate paragraphs' hot hash
    plan should include("partial_min")
    plan should not include "Window"
    plan should not include "NestedLoop"
  }

  test("doc_rarity: the vocab side of the score join is broadcast") {
    val tok = DataOps.docRarityTokens(spark, sf)
    val df = DataOps.docRarityCore(tok)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("dup_windows: keyed equi-join on window text, no nested loop") {
    val df = DataOps.dupWindowsCore(DataOps.windowFrame(spark, sf))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("partial_count")
    plan should not include "NestedLoop"
    plan should not include "Cartesian"
  }

  test("decontaminate_bloom: the corpus side never shuffles — zero Exchanges") {
    // pin the PRE-checkpoint plan via the test hook: the public operator's
    // eager checkpoint collapses its visible plan to a bare RDD scan
    val sh = DataOps.shingledOn(
      spark.read.parquet(s"$sf/documents.parquet"), passthrough = Seq("lang"))
    val df = DataOps.decontaminateBloomFlags(spark, sf, sh, 1e-6)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the whole point of the binding: two pushed-down scans + union with a
    // per-row Bloom probe — no shingle explode shuffle, no join at all
    plan should not include "Exchange"
    plan should include("graft_bloom_any")
    plan should include("Union")
  }

  test("token_counts_bpe: the type-table join broadcasts, one keyed aggregation") {
    val df = DataOps.tokenCountsBpe(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should include("partial_count")
  }

  test("sb_score: all five n-gram lookups broadcast — no sort-merge join anywhere") {
    // The scale argument of the scorer (DataOps.sbScoreOn scaladoc): the
    // n-gram tables are language-bounded, so every lookup against the
    // per-position explode must be a broadcast hash join. A silent flip
    // to SortMergeJoin would shuffle the exploded corpus five times.
    val counts = DataOps.sbNgramCounts(spark, sf).cache()
    try {
      val df = DataOps.sbScoreOn(spark, sf, counts)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.take(40).mkString("\n")) {
        "BroadcastHashJoin".r.findAllIn(plan).length should be >= 5
        plan should not include "SortMergeJoin"
      }
    } finally { counts.unpersist(blocking = false); () }
  }

  test("quantile_sketch: register build is ONE partial-aggregable shuffle over a pruned 2-column scan") {
    // The 100 TB claim of the sketch: rows collapse map-side onto the
    // bounded (flag, shift, sub) key in a single Exchange, and the scan
    // reads exactly the two columns the registers need. Pinned on the
    // register half (the public operator eagerly checkpoints its 9-row
    // result; the register build is where corpus-scale work lives).
    val cents = queries.Tables(spark, sf, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_returnflag").as("flag"),
        org.apache.spark.sql.functions
          .expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    val df = RefOps.quantileRegistersOf(cents)
    df.collect()
    // AQE renders Final AND Initial plans in one string — count the
    // Final section only or the one Exchange double-counts
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    withClue(plan.linesIterator.take(30).mkString("\n")) {
      "Exchange".r.findAllIn(plan).length shouldBe 1
      plan should include("partial_count")
      plan should include("ReadSchema: struct<l_extendedprice:double,l_returnflag:string>")
    }
  }

  test("soft_dedup: no static broadcast HINT on the corpus-proportional weight joins") {
    // r16 verdict #4: the weight attach joined `broadcast(sized)` — one
    // row per clustered doc, 30–80% of a real web corpus — forcing a
    // driver-killing broadcast at 100 TB. The joins must reach the
    // optimizer UNHINTED; AQE electing a broadcast from MEASURED size at
    // a small SF is the correct dynamic policy, so the pin is on the
    // optimized logical plan's hints, not the physical join choice.
    // Pinned on the pre-checkpoint core (the public operator eagerly
    // localCheckpoints) with a synthetic cluster frame, so the pin is
    // exactly the weight-attach joins, free of upstream LSH lineage.
    import spark.implicits._
    val cl = Seq((1L, 1L), (2L, 1L), (5L, 5L)).toDF("doc_id", "cluster_rep")
    val docsDf = Seq((1L, "en"), (2L, "en"), (3L, "de"), (5L, "fr"))
      .toDF("doc_id", "lang")
    val df = DataOps.softDedupWeightsCore(cl, docsDf)
    df.collect()
    val logical = df.queryExecution.optimizedPlan.toString
    withClue(logical.linesIterator.take(30).mkString("\n")) {
      logical should not include "strategy=broadcast"
    }
  }

  test("sb_doc_score keeps the five n-gram lookups broadcast (the sbScore contract)") {
    // The graded integer face rides the SAME scale argument as the
    // float scorer: a silent flip of any lookup to SortMergeJoin would
    // shuffle the per-position explode five times over. Pinned on the
    // pre-checkpoint body (the public operator eagerly checkpoints).
    val counts = DataOps.sbNgramCounts(spark, sf).cache()
    try {
      val df = DataOps.sbDocScoreOn(spark, sf, counts)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.take(40).mkString("\n")) {
        "BroadcastHashJoin".r.findAllIn(plan).length should be >= 5
        plan should not include "SortMergeJoin"
      }
    } finally { counts.unpersist(blocking = false); () }
  }
}
