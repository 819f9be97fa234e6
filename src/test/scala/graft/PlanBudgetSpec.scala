package graft

/** Shuffle budgets for headline graded queries: each query's physical
  * plan may not contain MORE Exchanges than the count its design calls
  * for (the values asserted here are today's actual plans). A failing
  * budget means an edit introduced a shuffle the operator's scaladoc
  * does not account for — the regression this spec exists to catch
  * before a 100 TB run does. (Eagerly-checkpointed operators expose a
  * collapsed public plan and are budgeted elsewhere, on their
  * pre-checkpoint plans, in PlanShapeSpec.)
  */
class PlanBudgetSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def shuffles(name: String): Int = {
    // budgets are claims about the canonical COLD plan — a sibling
    // suite's leftover cache substitutes InMemoryRelations with their
    // own partitioning into matching subtrees and shifts the count
    spark.catalog.clearCache()
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    ("Exchange hashpartitioning".r.findAllIn(p).length
      + "Exchange rangepartitioning".r.findAllIn(p).length
      + "Exchange SinglePartition".r.findAllIn(p).length)
  }

  private val budgets = Seq(
    "dedup_exact" -> 1,        // one keyed shuffle on the content hash
    "doc_quality" -> 0,        // per-row fold, no shuffle
    "token_counts" -> 0,       // per-row fold, no shuffle
    "corpus_select" -> 2,      // quality join + near-dup anti side
    "window_hopping" -> 2,     // partial + distinct expand
    "rolling_active_7d" -> 6,  // user-day distinct + two distinct counts
    "event_transitions" -> 3,  // per-user window + cell agg + normalize
    "dsir_counts" -> 1,        // one bounded-key histogram shuffle
    "classifier_infer" -> 2,   // featurize agg + per-doc reduce
    "host_cap" -> 2,           // salted cut + per-host rank
    "mixture_select" -> 2,     // histogram + bounded layer window
    "table_profile" -> 2,      // one expand pass + the one-row stack
    "chunk_cdc" -> 1,          // per-doc boundary window + reassembly
    "cluster_sizes" -> 2,      // clusters → size classes
    "sb_ngram_counts" -> 3,    // one partial-aggregable groupBy per order
    // sketch pass: partial MG buffers → one global row (SinglePartition);
    // rescore: broadcast semi-join + shortlist-bounded agg + final rank
    "topk_frequent" -> 3,
    // salt-cell window + global top-(K+1) + the one-row τ broadcast
    "priority_sample" -> 3,
    // the heap aggregate's point: ONE partial-aggregable hash shuffle
    // of ≤ langs x partitions x k pairs — no window, no salt
    "topk_per_key" -> 1,
    // daily agg + the day-spine window (SinglePartition over days only)
    "gap_fill" -> 2,
    // the whole query is one user_id key family: windows and both
    // aggregations reuse a single hash partitioning
    "islands_coverage" -> 1,
    // Expand feeds ONE partial-aggregable shuffle of grouping-set cells
    "cube_events" -> 1,
    // (lang, len-bucket) equi-join: AQE broadcasts at test scale (0);
    // at corpus scale both sides shuffle on the block key (2)
    "edit_distance_block" -> 2,
    // one partial-aggregable shuffle on the QI tuple
    "k_anonymity" -> 1,
    // type-keyed agg + the countDistinct expand pass
    "props_stats" -> 2,
    // window and final agg share the event_type partitioning
    "percentiles_by_type" -> 1,
    // two distinct scans + the semi/anti joins (AQE broadcasts at toy
    // scale; both set ops shuffle their key columns at corpus scale)
    "set_ops_parts" -> 4,
    // the RANGE frame rides ONE customer-keyed window partitioning
    "rolling_revenue_range" -> 1,
    // the two tree-hash levels: (lang, bucket) then lang
    "corpus_manifest" -> 2,
    // native AsOfJoinExec: one keyed Exchange per side, the purchase
    // pre-agg reusing the right side's user_id partitioning
    "asof_join_forward" -> 2,
    // r12 additions — checkpointed bounded intermediates collapse the
    // corpus side to ONE pass; the visible Exchanges below move only
    // alphabet- or orders-bounded frames
    "q7_nation_flows" -> 2,    // orders⋈lineitem + final (pair, year) agg
    "q10_returned" -> 1,       // one keyed join family + TakeOrdered
    "trimmed_stats" -> 1,      // rank window + agg share the type keying
    "trend_slope" -> 2,        // (type, day) totals + bounded moments
    "interevent_gaps" -> 1,    // lag/rank/agg share the user_id keying
    "adaptive_sessionize" -> 4, // gaps + median + breaks + event counts,
                                // all inside the user_id key family
    "pareto_front" -> 2,       // score histogram + its bounded window
    "lang_confusion" -> 1,     // row totals over the checkpointed cells
    "dup_degree_hist" -> 2,    // degree + histogram over the pair set
    "conversion_latency" -> 2, // touch-type repartition of attribution
    "hourly_profile" -> 1,     // totals over the checkpointed cells
    "lang_source_lift" -> 3,   // two marginals + join, all cell-bounded
    "mad_outliers" -> 8,       // cum/median/dev/outlier passes, every
                               // one over the ≤ lengths×langs histogram
    "basket_affinity" -> 7,    // marginals/total/pair self-join over the
                               // checkpointed (order, type) projection
    "kmv_union_est" -> 8,      // exact-side distinct + marginals + co-user
                               // join; sketch side is ≤ k·salts·|types|
    "order_gaps" -> 1,         // lag/rank/agg share the o_custkey keying
    "grouping_sets_events" -> 1, // ONE Expand feeding one partial agg
    "attribution_first_touch" -> 2, // (user, bucket) range join + argmin
    "session_stats" -> 11,     // rank picks over session-bounded
                               // histograms of the checkpointed rollup
    "anomalous_days" -> 6,     // day-bounded median/MAD rank picks
    // r13: visible plan AFTER the checkpointed doubling rounds (3 keyed
    // shuffles per INNER round; the final round skips the dense relabel
    // — its pair join stays visible): final-round join + dup-class agg
    // + covered join + the per-doc span window
    "substring_dedup" -> 7,
    // user window + cell agg + bounded prefix-total window
    "event_trigrams" -> 3,
    // pre-agg FIRST is the plan's point: 1 at toy scale (AQE broadcasts
    // the rare-tail probes into both joins); at corpus scale the two
    // joins shuffle their keyed sides (5)
    "q18_large_orders" -> 5,
    // the substring_dedup tail (final-round join + dup agg + cov join +
    // span window) + span-list agg + the cut's per-doc left join
    "remove_dup_spans" -> 8,
    // r13b: per-order pre-agg + orders join + priority agg
    "q4_priority_late" -> 3,
    // part-side projection join + the month agg
    "q14_promo_share" -> 2,
    // brand-pruned join + the single-row final agg
    "q19_bracket_revenue" -> 2,
    // 1-row threshold agg + anti join (both sides) + nation agg
    "q22_idle_balances" -> 4,
    // price-domain histogram + ONE flag partitioning for both window
    // frames and the final agg
    "weighted_median" -> 2,
    // 3 bucketed ranks x (bucket histogram + bounded-bases window +
    // per-bucket rank) + the custkey assembly joins + the 1-row count;
    // the per-customer base is checkpointed once for its five consumers
    "rfm_segments" -> 17,
    // doc-keyed gram/winnow windows share one Exchange; distinct + agg
    "winnowing" -> 2,
    // r13c: the remaining TPC-H shapes. Toy-scale AQE broadcasts shrink
    // several joins; the budgets below are the corpus-scale counts.
    // pushed-filter scan + ONE partial-agg row per partition
    "q6_forecast_revenue" -> 1,
    // orders join (2 at corpus scale; toy broadcasts, 1) + bucket agg
    "q12_service_by_delay" -> 3,
    // outer join (2) + histogram; the per-customer count reuses the
    // join's c_custkey partitioning — no third fact shuffle
    "q13_customer_distribution" -> 3,
    // supplier agg + 1-row max + winners⋈supplier (2 at corpus scale)
    "q15_top_supplier" -> 5,
    // pair-distinct + part join (2 at scale) + countDistinct expand
    "q16_part_supplier_counts" -> 5,
    // per-part pre-agg + part join + the joined cut's single-row agg
    "q17_small_quantity" -> 4,
    // pre-shrunk dimension probes + orders join (toy AQE broadcasts
    // part/custkeys/suppflag: 3) + year agg; corpus scale adds the
    // orders-side shuffle pair
    "q8_market_share" -> 5,
    // every dimension broadcastable at toy scale (1 = final agg);
    // corpus scale shuffles the orders join pair
    "q9_product_profit" -> 3,
    // supplier-filtered fact agg + 1-row totals + the value self-probe
    "q11_important_parts" -> 3,
    // two aggregates of one filtered scan joined on the part key +
    // winner distinct + dimension probes
    "q20_excess_suppliers" -> 5,
    // one orderkey family: per-(order,supp) agg + per-order frame +
    // join-back + strictness agg + per-supplier count + name join
    "q21_waiting_suppliers" -> 7,
    // r13e: register cell agg + per-type fold + exact-side distinct
    // expand + the type join
    "hll_distinct" -> 4,
    // (lang, score) histogram + ONE lang partitioning shared by the
    // base window and the final agg
    "quality_auc" -> 2,
    // two salted top-k arms (local + global each) + the keyword postings
    // agg + the bounded fused-frame window
    "rrf_fusion" -> 7,
    // the substring_dedup tail with the rep carried INSIDE the same dup
    // aggregate — no extra shuffle over the remove-all variant
    "substring_spans_keep_one" -> 7,
    // the banded LSH pair pipeline + two id-keyed split joins + the
    // 3x3-bounded bucket agg
    "split_leakage" -> 12,
    // assignment is a MAP-ONLY argmax expression; the report is one
    // bounded shuffle onto 16 cells
    "rendezvous_shards" -> 1,
    // r13f: member + probe distincts, the per-(type, user) probe agg,
    // the final per-type counts, the 1-row bit count — the bit frame
    // itself rides broadcasts only
    "bloom_prune_audit" -> 8,
    // r13g: map-only codegen assignment + ONE bounded shuffle onto
    // <= 64 file cells
    "zorder_audit" -> 1,
    // one partial-aggregable per-type shuffle; the sample flag is
    // per-row scan-side work
    "hash_sample_est" -> 1,
    // r13h: ONE partial-distinct aggregation on the QI tuple
    "l_diversity" -> 2,
    // the ONE corpus shuffle is the (lang, source) cell count; the
    // per-lang totals, share join and final fold all move the bounded
    // cell frame (alphabet x sources rows)
    "source_hhi" -> 4,
    // per-(lang, shard) rank window + the batch agg share one keying
    "bucketed_batching" -> 2,
    // r13i: (day, type) register cells + the bounded max-merge + the
    // derive fold + the day-count distinct pass + the type join
    "hll_sketch_cube" -> 7,
    // 3 candidates x (per-lhs distinct agg + the single-row fold)
    "fd_audit" -> 12,
    // r13k: the (type, day) collapse + the mean broadcast; cumsum and
    // peak windows ride the one event_type partitioning
    "cusum_days" -> 4,
    // r13l: assignment is a MAP-ONLY filter+min over the 128-literal
    // ring; the report is one bounded shuffle onto <= 16 cells
    "ring_shards" -> 1,
    // map-only native Int8Dot against 16 constant sign vectors — the
    // explode is scan-side, NO shuffle at all
    "rand_projection" -> 0,
    // r13m/n: the histogram/cell-frame family — each collapses the
    // corpus to a bounded frame in ONE shuffle and checkpoints the
    // result, so the public plan is flat (0); source_gini exposes its
    // cell shuffle + the lang re-fold
    "source_gini" -> 2,
    "mann_kendall" -> 0,
    "equi_depth_hist" -> 0,
    "rank_sum" -> 0,
    "kn_continuation" -> 0,
    "exact_allocation" -> 0,
    "benford_audit" -> 0,
    "jaccard_days" -> 0,
    "ks_test" -> 0,
    "host_triangles" -> 0,
    // r13o: l_moments rides one event_type keying (rank window + fold);
    // the other three checkpoint their bounded tails
    "l_moments" -> 2,
    "type_cosine" -> 0,
    "ks_matrix" -> 0,
    "hll_sliding_7d" -> 0,
    // r13p: funnel rides one user_id keying (assignment window +
    // session fold; final one-row fold is the SinglePartition pair);
    // the other two checkpoint bounded tails
    "session_funnel" -> 2,
    "revenue_lorenz" -> 0,
    "minhash_estimate" -> 0,
    // r13q: bitmap_distinct is exactly two partial-aggregable shuffles
    // (the (day, word) bit_or cells, then the day popcount collapse);
    // the other three r13q operators checkpoint bounded tails
    "bitmap_distinct" -> 2)
  // r13j: bfs_hosts / theil_sen are eagerly checkpointed — BFS is 2
  // host-table shuffles per round (join + min-fold), checkpointed per
  // round like every iterative operator; theil_sen's tail runs entirely
  // over the bounded (type, day) frame (pair join + two median windows)
  // pr_curve / snm_dedup are eagerly checkpointed (cachedScope /
  // explicit localCheckpoint): pr_curve collapses the corpus to the
  // score histogram then joins two bounded frames; snm_dedup's tail is
  // the cell rank window + 3 rank-offset equi-joins + the candidate
  // verification joins
  // cms_topk_est / oph_minhash are eagerly checkpointed (cachedScope) —
  // cms's pre-checkpoint shape is pinned in Round13fOpsSpec; oph's tail
  // is two id-keyed joins + one pair agg over the nested graded pair set
  // corpus_drift is eagerly checkpointed (cachedScope) — its public plan
  // collapses to an RDD scan; its pre-checkpoint shape (one cell shuffle
  // + the 1-row totals broadcast) is pinned in EventAnalyticsSpec

  budgets.foreach { case (name, budget) =>
    test(s"shuffle budget: $name stays within $budget Exchanges") {
      shuffles(name) should be <= budget
    }
  }

  test("shuffle budget: co-bucketed catalog join stays at 0 Exchanges") {
    // The bucketBy write paid the hash-partitioning once; every repeated
    // doc_id join on the catalog tables must stay Exchange-free (the
    // 100 TB recurring-cost lever — see BucketedCorpus scaladoc). Ran
    // with broadcast off so the tiny test tables plan the SortMergeJoin
    // shape a full-scale run would.
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.legacy.allowNonEmptyLocationInCTAS", "true")
    val (docsTable, embTable) =
      graft.sink.BucketedCorpus.writeCorpus(spark, sf, tmpDir("graft-budget-"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val p = graft.sink.BucketedCorpus
        .joinDocsEmbeddings(spark, docsTable, embTable)
        .queryExecution.executedPlan.toString
      val n = ("Exchange hashpartitioning".r.findAllIn(p).length
        + "Exchange rangepartitioning".r.findAllIn(p).length
        + "Exchange SinglePartition".r.findAllIn(p).length)
      withClue(p) { n shouldBe 0 }
    } finally spark.conf.set(key, old)
  }
}
