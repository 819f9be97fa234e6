package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.funcs.Funcs

/** The reference pipeline's operator inventory (SURVEY.md §2), re-targeted
  * at the driver's `events` table so every entry is DuckDB-oracle-checkable:
  * `ts` plays publish-time, `user_id`/`event_id` play the article key.
  *
  * Cross-engine determinism rules used throughout (Spark vs DuckDB):
  * timestamps are rendered to second-granular strings (parquet ns truncates
  * to µs in Spark but not DuckDB); sums/avgs of doubles are rounded;
  * windows and top-Ns always carry a unique tie-break key.
  */
object RefOps {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  private def tsStr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** T1 — top-N serving query: newest first, key tie-break
    * (reference: database_utils/database_methods.py:109-130).
    * TakeOrderedAndProject: per-partition bounded heap, no global sort.
    */
  def topn(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .orderBy(col("ts").desc, col("event_id"))
      .limit(10)
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"), tsStr(col("ts")).as("ts_s"))

  /** S5/A1 — watermark read: day-trunc'd MAX with cold-start fallback
    * (reference: database_utils/database_methods.py:40-66).
    */
  def watermarkMax(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).agg(
      coalesce(date_format(Funcs.truncToDay(max(col("ts"))),
                           "yyyy-MM-dd'T'HH:mm:ss"),
               lit("2025-07-25T00:00:00")).as("watermark"),
      max(col("ts")).isNotNull.as("is_incremental"))

  /** Q3 — incremental cutoff: strict `<` drops, `>=` passes
    * (reference: PhocusWire/PhocusWireSource.py:180-185). The cutoff is
    * applied via [[Tables.eventsSince]] to the RAW nanos column so it
    * reaches the parquet scan as a pushable long comparison (row-group
    * pruning on old data) — filtering the converted timestamp pushes
    * only IsNotNull.
    */
  def incrementalFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsSince(spark, dir,
        java.sql.Timestamp.valueOf("2024-01-25 00:00:00"))
      .select(col("event_id"), col("user_id"), tsStr(col("ts")).as("ts_s"))

  /** Q4 — keyed dedup keeping the newest row per key
    * (reference: PhocusWire/PhocusWireSource.py:156-158; newest-first page
    * order makes first-wins = newest-wins).
    */
  def dedupKeepLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), tsStr(col("ts")).as("ts_s"))
  }

  /** U1 — bag union of two per-source batches, tagged
    * (reference: ingestion.ipynb extend calls).
    */
  def unionSources(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val a = e.filter(col("event_type") === "click")
      .select(col("event_id"), lit("src_click").as("source_name"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), lit("src_purchase").as("source_name"))
    a.unionByName(b)
  }

  /** F1 — URL-derived MD5 identity (reference: helper_utils/helpers.py:40-50). */
  def md5Id(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      Funcs.articleId(concat(lit("https://example.com/article/"),
                             col("event_id"))).as("article_id"))

  /** F2 — dual-format date parsing, null on failure
    * (reference: helper_utils/helpers.py:4-24). Round-trips each event ts
    * through the PhocusWire month-name format and ISO, then re-parses.
    */
  def parseDateMulti(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select(
      col("event_id"),
      date_format(col("ts"), "MMMM d, yyyy").as("phocus_raw"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_raw"))
    e.select(
      col("event_id"),
      date_format(try_to_timestamp(col("phocus_raw"), lit("MMMM d, yyyy")),
                  "yyyy-MM-dd HH:mm:ss").as("phocus_parsed"),
      date_format(try_to_timestamp(col("iso_raw")),
                  "yyyy-MM-dd HH:mm:ss").as("iso_parsed"),
      try_to_timestamp(lit("garbage")).isNull.as("garbage_is_null"))
  }

  /** F3 — timezone *dropping* (not conversion)
    * (reference: helper_utils/helpers.py:26-38): synthesize offset-suffixed
    * ISO strings, drop the offset, keep wall-clock time.
    */
  def dropTz(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select(
      col("event_id"),
      concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
             when(col("event_id") % 2 === 0, lit("+05:00"))
               .otherwise(lit("Z"))).as("iso_offset"))
    e.select(col("event_id"),
             tsStr(Funcs.dropTimezone(col("iso_offset"))).as("naive"))
  }

  /** P5 — author cleanup: strip the "By " prefix
    * (reference: PhocusWire/PhocusWireSource.py:160-163).
    */
  def authorClean(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      Funcs.cleanAuthor(concat(lit("By User"), col("user_id"))).as("author"))

  /** P6 — byline split: date is the trimmed 2nd '|' segment
    * (reference: PhocusWire/PhocusWireSource.py:166-173).
    */
  def splitExtract(spark: SparkSession, dir: String): DataFrame = {
    val byline = concat(lit("By User"), col("user_id"), lit(" | "),
                        date_format(col("ts"), "MMMM d, yyyy"))
    events(spark, dir).select(
      col("event_id"), Funcs.bylineDate(byline).as("byline_date"))
  }

  /** K1 — keyed upsert as anti-join + union
    * (reference: database_utils/database_methods.py:68-107): "stored" is
    * each user's newest first-half event, the "batch" is the newest
    * second-half event; batch rows win. Batch side is broadcast — the
    * stored (big) side never shuffles.
    */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    def latestPerUser(df: DataFrame) = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), tsStr(col("ts")).as("ts_s"))
    }
    val stored = latestPerUser(e.filter(col("ts") < cut))
    val batch = latestPerUser(e.filter(col("ts") >= cut))
    stored.join(broadcast(batch.select("user_id")), Seq("user_id"), "left_anti")
      .unionByName(batch)
  }

  /** Session-scoped store paths for [[timeTravelGraded]] — one temp
    * [[graft.sink.ArticleStore]] per (session, corpus), bootstrapped
    * with two deterministic merge batches ([[SessionTemp]]-registered
    * for shutdown cleanup).
    */
  private val ttMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Deterministic articles derived from the documents table for the
    * time-travel fixture: phase 1 covers doc_id % 10 ∈ [0, 5); phase 2
    * overlaps it on % 10 ∈ [3, 7] with updated titles, so version 2
    * exercises BOTH upsert outcomes (replaced keys 3–4, surviving keys
    * 0–2, inserted keys 5–7) while version 1 must keep serving every
    * phase-1 original. All column values are SQL-expressible so the
    * DuckDB oracle replays both batches from the documents table alone.
    */
  private def ttBatch(spark: SparkSession, dir: String,
                      phase: Int): DataFrame = {
    import graft.model.ArticleSchema
    val d = Tables(spark, dir, "documents")
    val m = col("doc_id") % 10
    val keep = if (phase == 1) m < 5 else m >= 3 && m <= 7
    d.filter(keep).select(
      md5(concat(lit("tt:"), col("doc_id").cast("string")))
        .as(ArticleSchema.ArticleId),
      concat(lit("https://example.com/tt/"), col("doc_id").cast("string"))
        .as(ArticleSchema.NewsLink),
      concat(lit(s"v$phase title "), col("doc_id").cast("string"))
        .as(ArticleSchema.NewsTitle),
      when(col("doc_id") % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("User "), (col("doc_id") % 50).cast("string")))
        .as(ArticleSchema.AuthorName),
      (lit("2024-01-01 00:00:00").cast("timestamp") +
        expr("make_interval(0, 0, 0, 0, CAST(doc_id % 720 AS INT), 0, 0)"))
        .as(ArticleSchema.NewsPublishedTime),
      col("lang").as(ArticleSchema.SourceName))
  }

  /** The GRADED face of [[graft.sink.ArticleStore.readAt]] time travel
    * (N30, r15 verdict #4): two deterministic merges build versions 1
    * and 2 of a real manifest-versioned store, and the query serves BOTH
    * version reads — version 1 must still show every pre-update row
    * AFTER version 2 replaced keys under it (the retained-manifest
    * promise), and version 2 must show exactly the upsert outcome. The
    * DuckDB oracle replays both batches from the documents table
    * (version 2 = phase-1 rows whose key phase 2 did not touch, plus
    * phase 2 — the anti-join-union merge law), so a store that
    * re-pointed, leaked, or GC'd a bucket under the old manifest
    * hash-mismatches. `Processed_at` is merge-stamped wall clock (F6,
    * nondeterministic by design) and stays out of the graded columns.
    */
  def timeTravelGraded(spark: SparkSession, dir: String): DataFrame = {
    val path = ttMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$dir",
      _ => {
        val p = SessionTemp.createDir("graft-tt-")
        val store = new graft.sink.ArticleStore(spark, p)
        store.merge(ttBatch(spark, dir, 1))
        store.merge(ttBatch(spark, dir, 2))
        p
      })
    val store = new graft.sink.ArticleStore(spark, path)
    import graft.model.ArticleSchema
    Seq(1L, 2L).map { v =>
      store.readAt(v).select(
        lit(v).as("version"),
        col(ArticleSchema.ArticleId).as("article_id"),
        col(ArticleSchema.NewsLink).as("news_link"),
        col(ArticleSchema.NewsTitle).as("news_title"),
        col(ArticleSchema.AuthorName).as("author_name"),
        date_format(col(ArticleSchema.NewsPublishedTime),
          "yyyy-MM-dd HH:mm:ss").as("published_s"),
        col(ArticleSchema.SourceName).as("source_name"))
    }.reduce(_ unionByName _)
  }

  /** Q1/Q2 — null-guard filters (reference: PhocusWire/PhocusWireSource.py:143-151):
    * synthesize nulls with nullif, then drop them.
    */
  def nullFilters(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"),
              nullif(col("event_type"), lit("error")).as("et"))
      .filter(col("et").isNotNull)
      .groupBy(col("et")).agg(count(lit(1)).as("n"))

  /** Event-time AS-OF join: each click joined to the user's latest
    * purchase at-or-before it, served by the NATIVE operator
    * ([[graft.plans.AsOfJoin]]: custom LogicalPlan → Strategy →
    * AsOfJoinExec) — the plan you want at scale: both sides shuffle and
    * sort on the key exactly once (a SortMergeJoin's requirement, elided
    * entirely on bucketed inputs) and merge with ONE buffered row of
    * state, where the composed union+window alternative
    * ([[asofJoinComposed]], kept as the executable spec) pushes the
    * union of both inputs through a window buffer. Purchases collapse
    * to one row per (user, ts) first (max event_id) so the at-tie
    * winner is deterministic in both engines; the operator's `<=` match
    * is tie-inclusive, matching ASOF's `>=` convention.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val (c, p) = asofSides(spark, dir)
    graft.plans.AsOfJoin.asof(c, "user_id", "ts", p, "p_user", "p_ts")
      .select(col("event_id"), col("user_id"), tsStr(col("ts")).as("ts_s"),
        col("p_id").as("prior_purchase"))
  }

  /** The click/purchase sides shared by both as-of directions: purchases
    * deduped to one row per (user, ts), right-side columns re-named so
    * the self-derived join is unambiguous. The purchase side is
    * pre-clustered on user_id ALONE before the (user, ts) dedup:
    * HashPartitioning(user_id) satisfies the aggregation's
    * ClusteredDistribution(user_id, ts) AND the as-of exec's
    * ClusteredDistribution(user_id), so the right side pays ONE
    * Exchange reused by both operators instead of an (user, ts) agg
    * shuffle followed by a user_id re-shuffle — the exchange-reuse
    * discipline that matters when the purchase table is 100 TB.
    */
  private def asofSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("p_id"))
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("p_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    (c, p)
  }

  /** The union + last-ignoring-nulls window encoding of [[asofJoin]] —
    * the Spark-first composition (one keyed shuffle, linear per-user
    * scan, no quadratic range-join blow-up) retained as the executable
    * specification the native operator is equivalence-tested against
    * (`AsOfJoinNativeSpec`). At equal timestamps the purchase sorts
    * before the click (kind ordinal), matching ASOF's `>=`.
    */
  def asofJoinComposed(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("p_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val tagged = p.select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("p_id"), lit(null).cast("bigint").as("event_id"))
      .unionByName(c.select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast("bigint").as("p_id"), col("event_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("prior_purchase", last(col("p_id"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), tsStr(col("ts")).as("ts_s"),
        col("prior_purchase"))
  }

  /** FORWARD as-of: each click matched to the user's NEXT purchase at or
    * after it — [[asofJoin]]'s mirror (lead-time / time-to-conversion
    * analytics where backward as-of is attribution), served by the SAME
    * native operator through time negation ([[graft.plans.AsOfJoin
    * .asofForward]]: forward-asof(t) ≡ backward-asof(−t), inclusivity
    * preserved). Identical scale shape as the backward entry: one keyed
    * Exchange + Sort per side, constant-memory merge.
    */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    val (c, p) = asofSides(spark, dir)
    graft.plans.AsOfJoin.asofForward(c, "user_id", "ts", p, "p_user", "p_ts")
      .select(col("event_id"), col("user_id"), tsStr(col("ts")).as("ts_s"),
        col("p_id").as("next_purchase"))
  }

  /** The reversed-frame union+window encoding of [[asofJoinForward]] —
    * executable spec for the native forward path (`AsOfJoinNativeSpec`).
    * Frame is (current row → unbounded following) with
    * `first(ignoreNulls)`; the tie order flips to `kind DESC` so a
    * same-microsecond purchase sorts AFTER the click inside the frame
    * and the match stays INCLUSIVE at equality, mirroring the backward
    * form's same-ts semantics.
    */
  def asofJoinForwardComposed(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("p_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val tagged = p.select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("p_id"), lit(null).cast("bigint").as("event_id"))
      .unionByName(c.select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast("bigint").as("p_id"), col("event_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("next_purchase", first(col("p_id"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), tsStr(col("ts")).as("ts_s"),
        col("next_purchase"))
  }

  /** KMV (k-minimum-values) distinct-count sketch, k=32: the estimate is
    * (k−1) / h_(k) where h_(k) is the k-th smallest md5-derived hash
    * fraction of the distinct values. Demonstrates sketch mechanics with
    * an EXACTLY-reproducible estimator (HLL's approx_count_distinct — the
    * real 100 TB choice — cannot hash-match a cross-engine oracle).
    * Output carries the exact distinct count alongside for error
    * inspection.
    */
  private[queries] val KmvK = 32
  private val KmvSalts = 32

  /** The KMV machinery shared by [[approxDistinctKmv]] and
    * [[kmvUnionEst]]: the distinct md5-hash-fraction frame per
    * event_type and its k-smallest survivor set.
    *
    * 15 hex digits = 60 bits; the bigint→double cast rounds identically
    * (IEEE nearest) in both engines, and 2^60 is an exact double.
    * Survivor selection is the KMV pre-aggregation (the real sketch
    * merge): k-smallest per (key, salt cell) first. Any global
    * k-smallest hash is k-smallest in its cell, so survivors ⊇ the
    * global k minimum — and the per-task sort is bounded at
    * |cell| ≈ distinct/salts instead of one task ordering EVERY distinct
    * hash of a hot key (r3's few-key skew: ~5 event types ⇒ 5 tasks
    * sorting everything at 100 TB). The final per-key windows downstream
    * order ≤ k·salts survivors.
    */
  private def kmvFrames(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val h = events(spark, dir).select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("bigint").as("hb"))
      .distinct()
      .select(col("event_type"), col("hb"),
        (col("hb") / pow(lit(2), lit(60))).as("h"))
    val cell = Window.partitionBy(col("event_type"), pmod(col("hb"), lit(KmvSalts)))
      .orderBy(col("h"))
    val survivors = h
      .withColumn("crn", row_number().over(cell)).filter(col("crn") <= KmvK)
      .select(col("event_type"), col("h"))
    (h, survivors)
  }

  def approxDistinctKmv(spark: SparkSession, dir: String): DataFrame = {
    val k = KmvK
    val e = events(spark, dir)
    val (h, survivors) = kmvFrames(spark, dir)
    // Sketch size per key is a tiny grouped aggregate, not a window.
    val cnts = h.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    // under-full sketch (< k distinct values): it holds them all, so the
    // estimate IS the exact count (when cnt < k every row survives the
    // cell filter, so the cnt-th survivor exists).
    val kth = survivors
      .withColumn("rn", row_number().over(w))
      .join(cnts, Seq("event_type"))
      .filter(col("rn") === least(lit(k), col("cnt")))
      .select(col("event_type"),
        when(col("cnt") < k, col("cnt").cast("double"))
          .otherwise(round(lit(k - 1) / col("h"), 2)).as("est_distinct"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(kth, Seq("event_type"))
  }

  /** KMV sketch MERGE — the property that makes sketches worth shipping
    * at 100 TB: per event-type pair, the union's distinct-user estimate
    * computed ONLY from the two types' k-value survivor sets (the
    * k smallest of a union are a subset of the union of each side's
    * k smallest), with the exact union count alongside for error
    * inspection. A real deployment stores the ≤ k-row sketches and
    * merges them driver-side without touching the corpus again; here
    * both live in one plan so the oracle can grade the merge rule.
    *
    * Scale shape: survivors are ≤ k·salts rows per type (skew-safe, see
    * [[kmvFrames]]); every pair-level frame below is alphabet²·k-bounded
    * and the pair list broadcasts. The exact side is one distinct
    * (type, user) projection feeding marginals and the co-user
    * intersection equi-join — corpus bytes move once. Under-full merge:
    * if the merged distinct hash set has < k values both inputs were
    * under-full, so the estimate IS the merged count (exactly the
    * single-sketch rule).
    */
  def kmvUnionEst(spark: SparkSession, dir: String): DataFrame = {
    val k = KmvK
    val e = events(spark, dir)
    val (_, survivors0) = kmvFrames(spark, dir)
    // ≤ k·salts·|types| rows, eagerly materialized: feeds both sides of
    // the pair expansion below
    val survivors = survivors0.localCheckpoint(true)
    val types = survivors.select(col("event_type")).distinct()
    val pairs = types.as("a").join(types.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
    val merged = pairs.join(broadcast(survivors),
        col("event_type") === col("type_a") || col("event_type") === col("type_b"))
      .select(col("type_a"), col("type_b"), col("h")).distinct()
    val wp = Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("h"))
    val mcnt = merged.groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("cnt"))
    val est = merged
      .withColumn("rn", row_number().over(wp))
      .join(broadcast(mcnt), Seq("type_a", "type_b"))
      .filter(col("rn") === least(lit(k), col("cnt")))
      .select(col("type_a"), col("type_b"),
        when(col("cnt") < k, col("cnt").cast("double"))
          .otherwise(round(lit(k - 1) / col("h"), 2)).as("est_union"))
    val tu = e.select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint(true)
    val ct = tu.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val inter = tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("i"))
    est
      .join(broadcast(ct.select(col("event_type").as("type_a"), col("c").as("ca"))),
        "type_a")
      .join(broadcast(ct.select(col("event_type").as("type_b"), col("c").as("cb"))),
        "type_b")
      .join(inter, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        (col("ca") + col("cb") - coalesce(col("i"), lit(0L)))
          .as("n_exact_union"),
        col("est_union"))
  }

  /** Event-time RANGE join: every (click, purchase) pair of the same
    * user within ±1 hour. The naive inequality join plans a nested loop
    * at any scale; the scale-right form buckets event time by the window
    * width W and EQUI-joins on (user, bucket) with each purchase
    * replicated into its 3 adjacent buckets — |t_c − t_p| ≤ W forces
    * bucket(p) ∈ {bucket(c)−1, bucket(c), bucket(c)+1}, so the exact
    * |dt| filter after the hash join is lossless. One shuffle on
    * (user, bucket), 3× replication of the smaller side. All arithmetic
    * in integer MICROSECONDS (`unix_micros` / oracle `epoch_us`) — the
    * corpus timestamps are sub-second, and a seconds-truncating
    * comparison would disagree with the oracle at window edges.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val winUs = 3600L * 1000000L
    val e = events(spark, dir)
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts"),
        expr(s"unix_micros(ts) div $winUs").as("bk"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withColumn("bk", explode(array(Seq(-1L, 0L, 1L).map(d =>
        expr(s"unix_micros(p_ts) div $winUs") + lit(d)): _*)))
    c.join(p, Seq("user_id", "bk"))
      .filter(abs(unix_micros(col("ts")) - unix_micros(col("p_ts"))) <= winUs)
      .select(col("c_id"), col("user_id"), tsStr(col("ts")).as("c_ts_s"),
        col("p_id"), tsStr(col("p_ts")).as("p_ts_s"),
        (unix_micros(col("ts")) - unix_micros(col("p_ts"))).as("dt_us"))
  }

  /** The 100 TB binding of [[approxDistinctKmv]]: HyperLogLog++ via
    * `approx_count_distinct` — one pass, partial-aggregable, fixed-size
    * state per key. Sketch estimates are engine-specific, so this is
    * spec-bounded against the exact count (documented rsd) rather than
    * oracle-hashed; the KMV entry stays the exactly-reproducible graded
    * demonstration of sketch mechanics.
    */
  def approxDistinctHll(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    events(spark, dir).groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), rsd).as("n_hll"))

  /** Register-level HyperLogLog (Flajolet et al. 2007), ORACLE-graded —
    * unlike [[approxDistinctHll]] (the built-in binding, engine-specific
    * state), this one exposes the sketch's own mathematics so a DuckDB
    * oracle reproduces it bit-for-bit: the shared 60-bit md5 hash (the
    * KMV definition), p = 8 ⇒ 256 registers, register value ρ = leading
    * zeros of the remaining 52 bits + 1 (computed INTEGER-exactly as
    * 53 − length(bin(w)), no float log anywhere), and the raw estimate
    * α·m²/Σ2^(−ρ_j) assembled from an exact BIGINT sum (each register
    * contributes 2^(53−ρ) and empty registers 2^53, so the Σ is integer
    * and the only float op is one constant division both engines perform
    * on identical operands). v_zero ships alongside so a serving layer
    * can apply the linear-counting small-range correction (ln is
    * libm-dependent — deliberately NOT in the graded columns).
    *
    * Scale: register max is partial-aggregable onto the ≤ |types|·256
    * cell key — the whole reason HLL wins at 100 TB: per-key state is
    * 256 bytes regardless of cardinality, and the register frame IS the
    * mergeable sketch (max is the merge).
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .join(hllDistinctOn(e), Seq("event_type"))
  }

  /** The sketch half on an explicit events frame — split out so the
    * merge property (registers are duplicate- and order-invariant) is
    * directly testable on a doubled input.
    */
  private[graft] def hllDistinctOn(e: DataFrame): DataFrame =
    hllFromRegisters(hllRegistersOf(e))

  /** The ADDITIVE half (the [[graft.streaming.StreamingMonitors]]
    * factoring): per-(type, bucket) max ρ — partial registers. Registers
    * computed over ANY slicing of the input merge by plain max, which is
    * what makes this sketch maintainable per micro-batch and shippable
    * between clusters.
    */
  private[graft] def hllRegistersOf(e: DataFrame): DataFrame =
    hllRegistersKeyed(e, Seq("event_type"))

  /** The register build under arbitrary partition keys — the sketch-cube
    * generalization ([[hllSketchCube]] adds a day key; max-merging the
    * extra key away MUST reproduce the direct registers, which is the
    * associativity law the cube grades).
    */
  private[graft] def hllRegistersKeyed(e: DataFrame,
                                       keys: Seq[String]): DataFrame = {
    val m = 256L
    val k = keys.map(col)
    e.select(k :+
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("hb"): _*)
      .select(k :+ pmod(col("hb"), lit(m)).as("bucket") :+
        expr("hb div 256").as("w"): _*)
      .select(k :+ col("bucket") :+
        when(col("w") === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(col("w"))).cast("long"))
          .as("rho"): _*)
      .groupBy(k :+ col("bucket"): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** The DERIVE half on a complete register frame. */
  private[graft] def hllFromRegisters(regs: DataFrame): DataFrame =
    hllFromRegistersKeyed(regs, Seq("event_type"))

  /** The derive half under arbitrary grouping keys — the sliding-window
    * face groups by (day, event_type); the sketch arithmetic is
    * identical.
    */
  private[graft] def hllFromRegistersKeyed(regs: DataFrame,
                                           keys: Seq[String]): DataFrame = {
    val m = 256L
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("m_used"),
        sum(expr("shiftleft(cast(1 as bigint), cast(53 - r as int))"))
          .as("sum_used"))
      .select(keys.map(col) :+ (lit(m) - col("m_used")).as("v_zero") :+
        (col("sum_used") + (lit(m) - col("m_used")) * lit(1L << 53))
          .as("sum_pow"): _*)
      .withColumn("est_raw",
        round(lit(HllAlphaScaled) / col("sum_pow"), 2))
  }

  /** Trailing-7-day distinct-user estimate per (day, type) from the HLL
    * register warehouse — the SERVING face of [[hllSketchCube]]'s
    * associativity law: the same per-(day, type) registers the cube
    * maintains answer ANY trailing window by max-merging ≤ 7 daily
    * register sets, never touching an event again. Each daily register
    * row is exploded to the ≤ 7 window-end days it serves (an
    * equi-grouped scatter, not a range join), capped to observed days.
    * The exact trailing distinct count is graded alongside — the
    * estimator's fidelity is itself a graded value (the hash_sample_est
    * discipline); a deployment drops that side and the window query
    * moves register rows only.
    *
    * Scale shape: one corpus shuffle builds the daily registers
    * (bounded: days × types × 256); the scatter multiplies that bounded
    * frame by 7. The exact side pays the (day, type, user) distinct —
    * the cost whose removal is this operator's entire point.
    */
  def hllSliding(spark: SparkSession, dir: String): DataFrame = {
    val e = withEpochDay(events(spark, dir))
    // the daily register frame is bounded (days × types × 256) —
    // cached so the day spine and the scatter reuse ONE register build
    val daily = hllRegistersKeyed(e, Seq("d", "event_type"))
    daily.cache()
    try {
      val spine = daily.select(col("d")).distinct()
        .withColumnRenamed("d", "day")
      val exact = e.select(col("d"), col("event_type"), col("user_id"))
        .distinct()
        .withColumn("day", explode(sequence(col("d"), col("d") + 6)))
        .join(broadcast(spine), "day")
        .groupBy(col("day"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      hllServeTrailing(daily)
        .join(exact, Seq("day", "event_type"))
        .localCheckpoint(true)
    } finally { daily.unpersist(blocking = false); () }
  }

  /** Epoch-day column shared by the batch sliding face and the
    * streaming register maintenance — ONE definition, so the maintained
    * state and the graded query cannot drift on the day key.
    */
  private[graft] def withEpochDay(e: DataFrame): DataFrame =
    e.withColumn("d",
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long"))

  /** The SERVE half of [[hllSliding]] on a complete per-(d, type)
    * register frame — the piece that runs identically over the batch
    * build and the streaming-maintained register warehouse
    * ([[graft.streaming.StreamingMonitors.hllSliding7d]]): scatter each
    * daily register row to the ≤ 7 window-end days it serves (capped to
    * observed days), max-merge per (day, type, bucket), derive. The
    * small-range (linear counting) correction is the piece the raw
    * full-corpus sketches never need but a 7-day window at low traffic
    * does: with v zero registers, est = m·ln(m/v) (Flajolet et al. 2007
    * §4); the branch compares the ROUNDED raw estimate so both engines
    * pick the same side. Register rows only — no event is ever touched.
    */
  private[graft] def hllServeTrailing(daily: DataFrame): DataFrame = {
    val spine = daily.select(col("d")).distinct()
      .withColumnRenamed("d", "day")
    val tgt = daily
      .withColumn("day", explode(sequence(col("d"), col("d") + 6)))
      .join(broadcast(spine), "day")
      .groupBy(col("day"), col("event_type"), col("bucket"))
      .agg(max(col("r")).as("r"))
    hllFromRegistersKeyed(tgt, Seq("day", "event_type"))
      .withColumn("est",
        when(col("est_raw") <= 640.0 && col("v_zero") > 0L,
          round(lit(256.0) * log(lit(256.0) / col("v_zero")), 2))
          .otherwise(col("est_raw")))
  }

  /** α_256 · 256² · 2^53 as ONE Scala-computed double constant — the
    * oracle SQL interpolates `HllAlphaScaled.toString` so both engines
    * parse the identical IEEE value and the single float division in
    * [[hllDistinct]] is deterministic cross-engine.
    */
  private[graft] val HllAlphaScaled: Double =
    0.7213 / (1 + 1.079 / 256) * 65536 * 9007199254740992.0

  /** Sub-bucket bits for [[quantileSketch]]: 5 ⇒ each power-of-two level
    * splits into 32 equal cells, relative error ≤ 2⁻⁵ = 3.125%, register
    * ceiling (64 − 5)·2⁵ ≈ 1.9k per group (in practice ≤ ~300 on the
    * price domain — the level span is log2(max/min) ≈ 7).
    */
  private[graft] val QSketchSubBits = 5

  /** Register-level log-histogram quantile sketch (the HdrHistogram /
    * DDSketch family — Masson, Lee & Rhodes, VLDB 2019), ORACLE-graded:
    * the last sketch in the suite without a register-graded face (the
    * t-digest binding is float-centroid state, definitionally
    * un-hashable cross-engine; a base-2 sub-bucketed histogram is
    * all-integer, so the registers, the rank arithmetic and the
    * recovered quantiles grade exactly). Value = l_extendedprice in
    * exact cents (round(p·100) — the lossless integer recovery argument
    * from embedding_moments); register key = (shift, sub) with
    * level = ⌊log2 v⌋ as integer bin-length (the [[hllDistinct]] idiom,
    * no float log), shift = max(level − [[QSketchSubBits]], 0),
    * sub = v >> shift. Registers tile the value axis in disjoint
    * [sub·2^shift, (sub+1)·2^shift) cells, so ordering by the lower
    * edge is value order and the rank-r estimate is the upper edge of
    * the first register whose cumulative count reaches r — always ≥ the
    * true rank value, so err_ppm is nonnegative and ≤ 2⁻⁵ relative
    * (spec-pinned). The EXACT rank value is graded alongside — the
    * hash_sample_est / [[hllSliding]] fidelity discipline: the
    * estimator's error is itself a graded value, and the exact side is
    * precisely the cost a deployment deletes.
    *
    * Scale shape: the register build is ONE partial-aggregable shuffle
    * onto the bounded (flag, shift, sub) key — the map side collapses
    * everything, and registers MERGE by adding counts (cell-wise; the
    * doubled-input spec pins it), so per-shard or per-day register
    * frames roll up without re-reading rows: mergeable quantiles at
    * 100 TB for ~300 BIGINTs per group. The derive half moves only the
    * register frame; the exact side pays one (flag, cents) shuffle and
    * a per-flag cumulative window — linear, absent in production.
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame =
    quantileSketchOn(Tables(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v")))

  /** The sketch on an explicit (flag, v) cents frame — split out so the
    * doubled-input invariance (n and rank double, est/exact unmoved) is
    * directly testable.
    */
  private[graft] def quantileSketchOn(cents: DataFrame): DataFrame = {
    // the register frame is BOUNDED (~300 rows per group) yet feeds
    // four consumers (totals, ranks, the cumulative tiling, the
    // estimate join) — cached so the corpus-scale register build and
    // its lineitem scan run ONCE, not once per consumer (the first
    // plan replicated the scan 4×, measured)
    val regs = quantileRegistersOf(cents)
    regs.cache()
    try {
      val est = quantileEstOf(regs)
      val rk = est.select(col("flag"), col("q"), col("rank"))
      val cumv = cents.groupBy(col("flag"), col("v")).agg(count(lit(1)).as("cv"))
        .withColumn("cumv", sum(col("cv")).over(
          Window.partitionBy(col("flag")).orderBy(col("v"))))
      val exact = cumv.join(broadcast(rk), "flag")
        .filter(col("cumv") >= col("rank"))
        .groupBy(col("flag"), col("q"))
        .agg(min(col("v")).as("exact_v"))
      est.join(broadcast(exact), Seq("flag", "q"))
        .select(col("flag"), col("q"), col("n"), col("n_registers"),
          col("rank"), col("est_hi"), col("exact_v"),
          expr("(1000000 * (est_hi - exact_v)) div exact_v").as("err_ppm"))
        .localCheckpoint(true)
    } finally { regs.unpersist(blocking = false); () }
  }

  /** The DERIVE half on a complete (flag, shift, sub, c) register
    * frame — ceiling ranks, cumulative value-ordered tiling, upper-edge
    * pick. Shared by the direct sketch, the cube roll-up and the
    * streaming warehouse serve: one derive, no drift.
    */
  private[graft] def quantileEstOf(regs: DataFrame): DataFrame = {
    val tot = regs.groupBy(col("flag"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_registers"))
    val ranks = tot.select(col("flag"), col("n"), col("n_registers"),
        explode(expr("array(50L, 90L, 99L)")).as("q"))
      .withColumn("rank", expr("(q * n + 99) div 100"))
    val rk = ranks.select(col("flag"), col("q"), col("rank"))
    val cum = regs
      .withColumn("lo", expr("shiftleft(sub, CAST(shift AS INT))"))
      .withColumn("hi", expr("shiftleft(sub + 1, CAST(shift AS INT)) - 1"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("flag")).orderBy(col("lo"))))
    val sel = cum.join(broadcast(rk), "flag")
      .filter(col("cum") >= col("rank"))
      .groupBy(col("flag"), col("q"))
      .agg(expr("min_by(hi, lo)").as("est_hi"))
    ranks.join(broadcast(sel), Seq("flag", "q"))
      .select(col("flag"), col("q"), col("n"), col("n_registers"),
        col("rank"), col("est_hi"))
  }

  /** Quantile-register CUBE with the roll-up law graded — the
    * [[hllSketchCube]] twin for order statistics: registers are built
    * per (ship-month, flag), the month key is summed away (counts ADD —
    * the sketch's merge), and the derive over the rolled-up frame must
    * reproduce the direct sketch's estimates exactly. This is the
    * warehouse contract at 100 TB: persist per-partition register
    * frames once, answer any coarser grouping by cell-wise addition,
    * never re-read a row. n_months audits the cube width.
    */
  def quantileSketchCube(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        date_format(col("l_shipdate"), "yyyy-MM").as("m"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    val cube = li
      .select(col("flag"), col("m"), col("v"),
        (length(bin(col("v"))) - 1).cast("long").as("level"))
      .select(col("flag"), col("m"),
        expr(s"greatest(level - $QSketchSubBits, 0)").as("shift"),
        expr(s"shiftright(v, CAST(greatest(level - $QSketchSubBits, 0) AS INT))")
          .as("sub"))
      .groupBy(col("flag"), col("m"), col("shift"), col("sub"))
      .agg(count(lit(1)).as("c"))
    cube.cache()
    try {
      val merged = cube.groupBy(col("flag"), col("shift"), col("sub"))
        .agg(sum(col("c")).as("c"))
      val months = cube.select(col("flag"), col("m")).distinct()
        .groupBy(col("flag")).agg(count(lit(1)).as("n_months"))
      broadcast(months).join(quantileEstOf(merged), Seq("flag"))
        .localCheckpoint(true)
    } finally { cube.unpersist(blocking = false); () }
  }

  /** The ADDITIVE register half on an explicit (flag, v) cents frame —
    * counts from ANY slicing of the input merge by plain sum (the
    * [[hllRegistersOf]] contract), which is what the doubled-input and
    * split-merge specs pin.
    */
  private[graft] def quantileRegistersOf(cents: DataFrame): DataFrame =
    cents
      .select(col("flag"), col("v"),
        (length(bin(col("v"))) - 1).cast("long").as("level"))
      .select(col("flag"),
        expr(s"greatest(level - $QSketchSubBits, 0)").as("shift"),
        expr(s"shiftright(v, CAST(greatest(level - $QSketchSubBits, 0) AS INT))")
          .as("sub"))
      .groupBy(col("flag"), col("shift"), col("sub"))
      .agg(count(lit(1)).as("c"))

  /** WEIGHTED quantile sketch over documents — the curation statistic a
    * token-budgeted pipeline actually thresholds on: "the median TOKEN
    * lives in a document of length X" (length quantiles weighted by
    * token mass), which row-quantiles get wrong by exactly the
    * long-doc skew a web corpus always has. Same register algebra as
    * [[quantileSketch]] with the count register generalized to a WEIGHT
    * sum — still cell-wise mergeable, still all-integer: value =
    * n_chars, weight = whitespace token count, per-language groups,
    * rank_w = ceil(q·W/100) against the cumulative register weight,
    * exact weighted rank value graded alongside (err_ppm, same 2⁻⁵
    * bound — spec-pinned on the shared laws via the unweighted twin).
    *
    * Scale shape: identical to [[quantileSketch]] — one
    * partial-aggregable shuffle onto bounded (lang, shift, sub) cells
    * (weights SUM map-side), derive over register rows, the exact side
    * linear and deletable.
    */
  def weightedQuantileSketch(spark: SparkSession, dir: String): DataFrame =
    quantileSketchWeightedOn(Tables(spark, dir, "documents")
      .select(col("lang").as("flag"), col("n_chars").cast("long").as("v"),
        size(split(col("text"), " ")).cast("long").as("wt")))

  /** The ADDITIVE register half of the WEIGHTED sketch — counts
    * generalized to Σweight, still cell-wise mergeable from any slicing
    * of the input (the [[quantileRegistersOf]] contract). Shared by the
    * graded batch face and the streaming warehouse
    * ([[graft.streaming.StreamingMonitors.maintainWeightedQuantileRegisters]])
    * so the maintained state and the batch sketch cannot drift.
    */
  private[graft] def quantileRegistersWeightedOf(vw: DataFrame): DataFrame =
    vw
      .select(col("flag"), col("v"), col("wt"),
        (length(bin(col("v"))) - 1).cast("long").as("level"))
      .select(col("flag"), col("wt"),
        expr(s"greatest(level - $QSketchSubBits, 0)").as("shift"),
        expr(s"shiftright(v, CAST(greatest(level - $QSketchSubBits, 0) AS INT))")
          .as("sub"))
      .groupBy(col("flag"), col("shift"), col("sub"))
      .agg(sum(col("wt")).as("c"))

  /** The weighted core: [[quantileSketchOn]] with count → Σweight. */
  private[graft] def quantileSketchWeightedOn(vw: DataFrame): DataFrame = {
    val regs = quantileRegistersWeightedOf(vw)
    regs.cache()
    try {
      val tot = regs.groupBy(col("flag"))
        .agg(sum(col("c")).as("w_total"), count(lit(1)).as("n_registers"))
      val ranks = tot.select(col("flag"), col("w_total"), col("n_registers"),
          explode(expr("array(50L, 90L, 99L)")).as("q"))
        .withColumn("rank", expr("(q * w_total + 99) div 100"))
      val rk = ranks.select(col("flag"), col("q"), col("rank"))
      val cum = regs
        .withColumn("lo", expr("shiftleft(sub, CAST(shift AS INT))"))
        .withColumn("hi", expr("shiftleft(sub + 1, CAST(shift AS INT)) - 1"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("flag")).orderBy(col("lo"))))
      val sel = cum.join(broadcast(rk), "flag")
        .filter(col("cum") >= col("rank"))
        .groupBy(col("flag"), col("q"))
        .agg(expr("min_by(hi, lo)").as("est_hi"))
      val cumv = vw.groupBy(col("flag"), col("v")).agg(sum(col("wt")).as("cv"))
        .withColumn("cumv", sum(col("cv")).over(
          Window.partitionBy(col("flag")).orderBy(col("v"))))
      val exact = cumv.join(broadcast(rk), "flag")
        .filter(col("cumv") >= col("rank"))
        .groupBy(col("flag"), col("q"))
        .agg(min(col("v")).as("exact_v"))
      ranks.join(broadcast(sel), Seq("flag", "q"))
        .join(broadcast(exact), Seq("flag", "q"))
        .select(col("flag"), col("q"), col("w_total"), col("n_registers"),
          col("rank"), col("est_hi"), col("exact_v"),
          // guard: v = n_chars can legitimately be 0 (empty doc); a rank
          // landing there must degrade to NULL in BOTH engines, not
          // NULL-here / div-by-zero-error in DuckDB
          expr("""CASE WHEN exact_v > 0
                  THEN (1000000 * (est_hi - exact_v)) div exact_v END""")
            .as("err_ppm"))
        .localCheckpoint(true)
    } finally { regs.unpersist(blocking = false); () }
  }

  private[graft] val BloomBits = 16384L
  private[graft] val BloomHashes = 3

  /** Register-level Bloom filter, oracle-graded (Bloom 1970) — the
    * sketch mathematics behind the N66 broadcast-Bloom binding, graded
    * the way r13e graded HLL's registers: the blocklist cohort
    * (user_id ≡ 0 mod 8 — the deterministic stand-in for an external
    * abuse list, a scale-free ~12% of users at every SF) sets
    * [[BloomHashes]] md5-derived positions each in an m = [[BloomBits]]
    * bit space; the filter IS the distinct-position frame. The probe
    * side asks, per event type, how many of its distinct users the
    * filter would pass (all k probe positions set) next to the exact
    * member count — `n_bloom_pass >= n_member` is the no-false-negative
    * guarantee carried into the graded values, and the pass/member gap
    * over `n_bits` is the filter's realized false-positive behavior
    * (formula-checked in the spec). m is sized so the sf1 cohort
    * (~1.9k members) loads the filter to ~30% — real FP behavior at
    * scale, near-zero FP at sf0.01, never saturated.
    *
    * Scale shape: this is the join-pruning pattern at 100 TB — the bit
    * frame is bounded (≤ m rows) and broadcasts everywhere, so probing
    * is k broadcast-hash lookups per row with NO shuffle of the big
    * side; only the per-(type, user) distinct and the final per-type
    * counts shuffle, both keyed aggregations the audit itself needs.
    */
  def bloomPruneAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    def positions(user: Column): Column = array((1 to BloomHashes).map { j =>
      pmod(conv(substring(md5(concat(lit(s"bloom:$j:"),
        user.cast("string"))), 1, 15), 16, 10).cast("long"), lit(BloomBits))
    }: _*)
    val members = e.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(8)) === 0)
    val bits = members
      .select(explode(positions(col("user_id"))).as("pos")).distinct()
    val nBits = bits.agg(count(lit(1)).as("n_bits"))
    val probe = e.select(col("event_type"), col("user_id")).distinct()
    val passed = probe
      .withColumn("pos", explode(positions(col("user_id"))))
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy(col("event_type"), col("user_id"))
      .agg((count(col("hit")) === BloomHashes).as("bloom_pass"))
    passed
      .join(members.withColumn("is_member", lit(true)), Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        count(when(col("bloom_pass"), 1)).as("n_bloom_pass"),
        count(col("is_member")).as("n_member"))
      .crossJoin(broadcast(nBits))
  }

  /** HLL sketch cube: registers maintained per (day, event_type)
    * partition — the layout a sketch warehouse stores so ANY day range
    * can be estimated without touching events — then max-merged across
    * days and derived with the shared [[hllFromRegisters]] half. Max is
    * associative, commutative and idempotent, so the merged estimate
    * MUST equal the direct whole-input sketch ([[hllDistinct]]): the
    * oracle recomputes the partitioned+merged path from scratch and the
    * spec pins cube = direct equality — the merge law graded
    * cross-engine, not just asserted. `n_days` carries how many
    * partitions the merge folded.
    *
    * Scale shape: one keyed register shuffle (now onto (day, type)
    * cells), a merge over the bounded register frame, and the
    * day-count distinct — events are scanned once per path.
    */
  def hllSketchCube(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val merged = hllRegistersKeyed(e, Seq("day", "event_type"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("r")).as("r"))
    val days = e.groupBy(col("event_type"))
      .agg(countDistinct(col("day")).as("n_days"))
    days.join(hllFromRegisters(merged), Seq("event_type"))
  }

  private[graft] val CmsJRows = 4
  private[graft] val CmsJWidth = 512L
  private[graft] val AmsRows = 5

  /** Join-size (self-join F2) estimation, the cardinality number a
    * cost-based optimizer needs before shuffling a user-keyed join —
    * BOTH classic sketches, graded side by side from the same (type,
    * user) histogram:
    *
    *  - `est_cm`: Count-Min register inner product, min over
    *    [[CmsJRows]] rows (Cormode & Muthukrishnan 2005 §4). ONE-SIDED
    *    (collisions only ADD cross terms — `is_over` carries the
    *    guarantee) but with additive error ~ F1²/w: on a FLAT histogram
    *    (F1² ≫ w·F2 — exactly this corpus at sf1, where it lands ~20×
    *    high) the bias dominates. Graded because the one-sidedness and
    *    the bias are both definitional — this is the honest face of the
    *    cheap sketch.
    *  - `est_ams`: the AMS Tug-of-War estimate (Alon, Matias & Szegedy
    *    1996) as a signed count-sketch: per row a ±1 md5 sign per user,
    *    register = Σ s·c, estimate = Σ reg², MEDIAN over [[AmsRows]]
    *    rows (odd, so the median is the 3rd order statistic — integer
    *    and engine-exact). Unbiased with std ≈ F2·√(2/w) (~6% at
    *    w = 512; ±25% spec-pinned), which is why the variance-optimal
    *    estimator every CBO paper cites is the SIGNED one.
    *
    * At 100 TB the registers are the only thing two sides of a
    * cross-cluster join exchange to size it. Scale shape: ONE corpus
    * shuffle onto the (type, user) histogram; both sketch builds, the
    * estimates and the exact fold all aggregate that keyed frame.
    */
  def cmsJoinEst(spark: SparkSession, dir: String): DataFrame = {
    val hist = events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    def h60(salt: String): Column =
      conv(substring(md5(concat(lit(salt),
        col("user_id").cast("string"))), 1, 15), 16, 10).cast("long")
    hist.cache()
    try {
      val cmRegs = hist
        .withColumn("u", explode(array((0 until CmsJRows).map { j =>
          struct(lit(j.toLong).as("j"),
            pmod(h60(s"cmsj:$j:"), lit(CmsJWidth)).as("b"))
        }: _*)))
        .groupBy(col("event_type"), col("u.j").as("j"), col("u.b").as("b"))
        .agg(sum(col("c")).as("reg"))
      val estCm = cmRegs
        .groupBy(col("event_type"), col("j"))
        .agg(sum(col("reg") * col("reg")).as("e"))
        .groupBy(col("event_type")).agg(min(col("e")).as("est_cm"))
      val amsRegs = hist
        .withColumn("u", explode(array((0 until AmsRows).map { j =>
          struct(lit(j.toLong).as("j"),
            pmod(h60(s"amsb:$j:"), lit(CmsJWidth)).as("b"),
            (pmod(h60(s"amss:$j:"), lit(2)) * 2 - 1).as("s"))
        }: _*)))
        .groupBy(col("event_type"), col("u.j").as("j"), col("u.b").as("b"))
        .agg(sum(col("c") * col("u.s")).as("reg"))
      val estAms = amsRegs
        .groupBy(col("event_type"), col("j"))
        .agg(sum(col("reg") * col("reg")).as("e"))
        .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
          .Window.partitionBy(col("event_type")).orderBy(col("e"), col("j"))))
        .filter(col("rn") === (AmsRows + 1) / 2)
        .select(col("event_type"), col("e").as("est_ams"))
      hist.groupBy(col("event_type"))
        .agg(sum(col("c") * col("c")).as("f2_exact"))
        .join(estCm, Seq("event_type"))
        .join(estAms, Seq("event_type"))
        .withColumn("is_over", col("est_cm") >= col("f2_exact"))
        .localCheckpoint(true)
    } finally { hist.unpersist(blocking = false); () }
  }

  /** Data-quality expectations — the validation gate a production
    * pipeline runs before promoting a batch: each check is one
    * aggregate (all partial-aggregable counts, no shuffle beyond the
    * final 1-row agg per check) and the result is a per-check violation
    * count + verdict. A failed check blocks the merge in a real
    * deployment; here the checks are the graded output.
    */
  def dataExpectations(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val d = Tables(spark, dir, "documents")
    // One aggregation pass per table (not one scan per check), split into
    // per-check rows afterward. count(when(cond, 1)) — not sum(when) —
    // because count is 0 on an empty table where sum is NULL, and the
    // DuckDB oracle's `count(*) FILTER` is 0 there too.
    def split(agg: DataFrame, checks: (String, String)*): DataFrame =
      agg.select(explode(array(checks.map { case (name, c) =>
          struct(lit(name).as("check"), col(c).cast("long").as("violations"))
        }: _*)).as("s"))
        .select(col("s.check").as("check"), col("s.violations").as("violations"),
          (col("s.violations") === 0).as("pass"))
    val dupKeys = e.groupBy(col("event_id")).count().filter(col("count") > 1)
      .agg(count(lit(1)).as("dup_keys"))
    val eAgg = e.agg(
      count(when(col("ts").isNull, 1)).as("ts_null"),
      count(when(!col("event_type").isin(
        "click", "view", "purchase", "signup", "error"), 1)).as("bad_type"))
    val dAgg = d.agg(
      count(when(col("n_chars") =!= length(col("text")), 1)).as("bad_len"),
      count(when(!col("lang").isin("de", "en", "es", "fr", "zh"), 1)).as("bad_lang"))
    split(dupKeys, "events_event_id_unique" -> "dup_keys")
      .unionByName(split(eAgg,
        "events_ts_not_null" -> "ts_null", "events_type_in_domain" -> "bad_type"))
      .unionByName(split(dAgg,
        "docs_n_chars_consistent" -> "bad_len", "docs_lang_in_domain" -> "bad_lang"))
  }

  /** JSONL round-trip — the training-data interchange format: synthesize
    * one JSON object per event (integer/string fields only: float
    * rendering differs across engines), parse it back through a typed
    * schema with `from_json`, project the parsed fields, and filter on
    * one. The parse is per-row codegen'd work; a corrupt line yields
    * nulls rather than failing the scan (PERMISSIVE semantics), probed
    * here with a planted malformed line every 500th event.
    */
  def jsonlParse(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val raw = e.select(col("event_id"),
      when(col("event_id") % 500 === 0, lit("{not json"))
        .otherwise(concat(
          lit("{\"user\":"), col("user_id"),
          lit(",\"type\":\""), col("event_type"),
          lit("\",\"n\":"), col("event_id") % 1000, lit("}"))).as("line"))
    raw.select(col("event_id"),
        from_json(col("line"), lit("user BIGINT, type STRING, n BIGINT")).as("j"))
      .select(col("event_id"), col("j.user").as("user"),
        col("j.type").as("type"), col("j.n").as("n"))
      .filter(col("n") < 500 || col("n").isNull)
  }

  /** Session-scoped paths for [[csvQuarantine]]'s synthesized fixture —
    * one rendered CSV corpus per (session, corpus dir).
    */
  private val csvMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The GRADED face of the CSV malformed-row contract
    * ([[graft.source.CsvSource]], N80): render the events table to a
    * real CSV file with a corruption planted on every event_id ≡ 0
    * (mod 500) row (a non-numeric user field — the truncated-line class
    * a crawl-scale ingest always sees), read it back through the
    * PERMISSIVE quarantine reader, and grade the contract's three
    * promises as integers: the quarantined row COUNT is exactly the
    * planted set, the raw lines survive byte-for-byte
    * (`raw_chars` = Σ length of the planted lines — a parser that
    * clipped or re-rendered them moves the sum), and the clean rows
    * parse losslessly (`user_sum` over parsed user_id). The DuckDB twin
    * recomputes all three from the events table and the planting rule —
    * the oracle never reads the file, so agreement proves the WHOLE
    * file round trip: render → write → permissive parse → quarantine
    * split. The synthesis (one coalesced text file, header row keyed
    * first) is the test harness; production reads CSV that already
    * exists, split-parallel with no shuffle.
    */
  def csvQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val path = csvMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$dir",
      _ => {
        val p = SessionTemp.createDir("graft-csvq-") + "/events_csv"
        // Clean rows render via concat over explicit casts, NOT
        // concat_ws: concat_ws silently DROPS a null field, which would
        // emit a 2-field line the reader quarantines while the oracle
        // counts it clean (r15 ADVICE #3) — concat nulls the whole line
        // instead, and the raise_error guard turns that data-contract
        // breach into a loud failure at fixture-render time.
        val lines = events(spark, dir).select(
          when(col("event_id") % 500 === 0,
            concat(col("event_id"), lit(",noise,"), col("event_type")))
            .otherwise(concat(
              col("event_id").cast("string"), lit(","),
              when(col("user_id").isNull, raise_error(
                lit("csvQuarantine fixture requires non-null user_id")))
                .otherwise(col("user_id").cast("string")), lit(","),
              col("event_type")))
            .as("line"),
          col("event_id").as("k"))
        // Long.MinValue, not -1: the header must sort before every data
        // row even if a corpus ever carries negative event_ids.
        val header = spark.range(1).select(
          lit("event_id,user_id,event_type").as("line"),
          lit(Long.MinValue).as("k"))
        header.unionByName(lines)
          .coalesce(1).sortWithinPartitions(col("k"))
          .select(col("line")).write.mode("overwrite").text(p)
        p
      })
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    val cc = graft.source.CsvSource.CorruptColumn
    // CACHE before the split — the CsvSource scaladoc's own rule: a
    // downstream count() prunes the aggregate columns away, leaving a
    // raw-file query that references ONLY _corrupt_record, which Spark
    // rejects at analysis (QUERY_ONLY_CORRUPT_RECORD_COLUMN). The cache
    // materializes the parsed columns once; the split reads from it.
    val parsed = graft.source.CsvSource.read(spark, path, schema)
      .select(col("user_id"), col(cc).as("cr"))
    parsed.cache()
    try {
      parsed.select(
          when(col("cr").isNotNull, "quarantined").otherwise("clean")
            .as("kind"),
          col("user_id"), col("cr"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(col("cr").isNull, col("user_id"))), lit(0L))
            .as("user_sum"),
          coalesce(sum(length(col("cr"))), lit(0L)).as("raw_chars"))
        .localCheckpoint(true)
    } finally { parsed.unpersist(blocking = false); () }
  }

  /** Gap-based sessionization, batch form: a new session starts when the
    * gap to the user's previous event exceeds 30 minutes. Classic
    * lag + running-sum over one key-partitioned window — a single
    * shuffle on user_id; ties broken by event_id in both engines. The
    * streaming form with custom state lives in
    * [[graft.streaming.Sessionizer]] and is equivalence-tested against
    * this query.
    */
  /** Per-event session assignment — the pre-rollup half of
    * [[sessionize]], factored so [[sessionFunnel]] shares the EXACT
    * session rule (gap compared in exact MICROSECONDS: the earlier
    * whole-second form disagreed with DuckDB's fractional epoch() on
    * gaps inside [1800 s, 1801 s) — invisible at sf0.01, 17 flipped
    * sessions at sf1; both engines now compare the same integer micros
    * quantity).
    */
  private def sessionAssign(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    e.withColumn("new_s",
        when(prev.isNull ||
          unix_micros(col("ts")) - unix_micros(prev) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionAssign(events(spark, dir))
      .groupBy(col("user_id"), col("session_id"))
      .agg(tsStr(min(col("ts"))).as("start_s"), tsStr(max(col("ts"))).as("end_s"),
        count(lit(1)).as("n_events"))

  /** Within-session conversion funnel — [[sessionize]] composed with
    * the funnel question the way a product pipeline actually asks it:
    * a session CONVERTS when its first view strictly precedes its first
    * purchase (exact micros; same-instant does not convert — the rule
    * both engines encode identically). The cross-session funnel (N34)
    * answers "did this user ever"; this answers "did the visit" — the
    * difference IS the session boundary, so the graded value exercises
    * the session rule end-to-end.
    *
    * Scale shape: the assignment window and the per-session fold ride
    * ONE user_id partitioning; the final one-row report is a broadcast
    * fold.
    */
  def sessionFunnel(spark: SparkSession, dir: String): DataFrame =
    sessionAssign(events(spark, dir))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(when(col("event_type") === "view",
          unix_micros(col("ts")))).as("v_tu"),
        min(when(col("event_type") === "purchase",
          unix_micros(col("ts")))).as("p_tu"))
      .agg(count(lit(1)).as("n_sessions"),
        count(col("v_tu")).as("n_view"),
        count(col("p_tu")).as("n_purchase"),
        count(when(col("v_tu") < col("p_tu"), 1)).as("n_converted"))
      .withColumn("conv_ppm", expr("(1000000 * n_converted) div n_sessions"))

  /** Corpus-level session statistics — the one-row report on top of
    * [[sessionize]]: session count, exact lower-median / ceil-rank-p95 /
    * max DURATION (whole seconds, computed from the session rollup's own
    * second-truncated strings so the oracle — which nests the graded
    * sessionize SQL verbatim — sees identical integers), and the
    * lower-median session SIZE. Rank selections run on the duration/size
    * HISTOGRAM frames (distinct values ≪ sessions — the madOutliers
    * split), so no session-count-sized global sort exists in the plan;
    * the bounded single-partition cumulative windows are the documented
    * exception.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val s = sessionize(spark, dir)
      .select((unix_timestamp(col("end_s")) - unix_timestamp(col("start_s")))
        .as("dur_s"), col("n_events"))
      .localCheckpoint(true) // sessions ≪ events; five consumers below
    val n = s.agg(count(lit(1)).as("n_sessions"))
    def rankPick(v: String, rankExpr: String, out: String): DataFrame = {
      val hist = s.groupBy(col(v)).agg(count(lit(1)).as("c"))
      hist.withColumn("cum", sum(col("c")).over(
          Window.orderBy(col(v))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(n))
        .filter(col("cum") >= expr(rankExpr))
        .agg(min(col(v)).as(out))
    }
    n.crossJoin(broadcast(rankPick("dur_s", "(n_sessions + 1) div 2", "median_dur_s")))
      .crossJoin(broadcast(rankPick("dur_s", "(95 * n_sessions + 99) div 100", "p95_dur_s")))
      .crossJoin(broadcast(s.agg(max(col("dur_s")).as("max_dur_s"))))
      .crossJoin(broadcast(rankPick("n_events", "(n_sessions + 1) div 2", "median_events")))
  }

  /** The full articles-pipeline analog on events, end-to-end: watermark
    * from the "stored" half, strict-< cutoff on the "incoming" half, keyed
    * dedup, upsert, top-N — the reference's whole notebook as one plan
    * (reference: ingestion.ipynb cell 498c25c4).
    */
  def ingestRun(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val cut = lit("2024-01-20 00:00:00").cast("timestamp")
    val stored = e.filter(col("ts") < cut)
    // watermark = date_trunc(DAY, max(stored.ts)) — computed as a scalar
    // subquery-free literal-ish plan: cross-join a 1-row agg (broadcast).
    val wm = stored.agg(Funcs.truncToDay(max(col("ts"))).as("wm"))
    val incoming = e.filter(col("ts") >= cut)
      .join(broadcast(wm))
      .filter(col("ts") >= col("wm"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val batch = incoming
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), tsStr(col("ts")).as("ts_s"))
    val storedLatest = {
      val ws = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      stored.withColumn("rn", row_number().over(ws)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), tsStr(col("ts")).as("ts_s"))
    }
    storedLatest
      .join(broadcast(batch.select("user_id")), Seq("user_id"), "left_anti")
      .unionByName(batch)
      .orderBy(col("ts_s").desc, col("event_id"))
      .limit(5)
  }
}
