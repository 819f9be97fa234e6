package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational capability showcase on the TPC-H-ish test tables —
  * joins, grouped/distinct aggregation, windows, set ops. The reference
  * needs none of these (SURVEY.md §2.5), but a complete engine does.
  *
  * Scale notes: small dimensions (region/nation, and filtered
  * customer/supplier sides where applicable) are explicitly broadcast so
  * the fact table (`lineitem`) never shuffles for them; grouped
  * aggregations rely on partial (map-side) aggregation, which Spark plans
  * automatically for all algebraic aggregates used here.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, n: String) = Tables(spark, dir, n)

  /** TPC-H Q1-style pricing summary: the canonical wide-agg scan.
    * Doubles are rounded at the edge for cross-engine hash stability.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style: 3-way join, revenue per order, top 10.
    * No broadcast hint on customer: the BUILDING segment grows linearly
    * with SF, so a hardcoded broadcast OOMs at scale — AQE picks broadcast
    * at small SF and SMJ/SHJ at large SF from runtime stats. The
    * orders↔lineitem join shuffles on the natural key.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-06-01 00:00:00").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-06-01 00:00:00").cast("timestamp"))
    // Join order: orders⋈customer first — both are ~1/8 of lineitem, and
    // the segment filter cuts the result to ~20% of orders, so the big
    // lineitem side joins ONE pre-shrunk build input (AQE broadcasts it at
    // small SF; at 100 TB both joins shuffle on their natural keys with
    // the smallest possible intermediate either way).
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(li, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_orderkey"),
               date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
               col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: 6-way star join, revenue per nation. Only region and
    * nation are scale-invariant (25/5 rows at every SF) → broadcast hints;
    * supplier and customer grow linearly with SF, so they carry no hint —
    * AQE broadcasts them at small SF and falls back to shuffled joins at
    * scale, where a hardcoded broadcast would OOM the executors.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
    val sup = t(spark, dir, "supplier")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey") &&
        cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Window ranking: top-3 customers by account balance per nation.
    * Single shuffle on the partition key; rank ties broken by key.
    */
  def windowTopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, dir, "customer")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("rk"), col("c_custkey"),
              round(col("c_acctbal"), 2).as("acctbal"))
  }

  /** Anti join: customers with no orders. Broadcast the distinct key set
    * of the probe side is not safe at 100 TB — keep it a shuffled
    * left-anti on the key (Catalyst picks SMJ/SHJ), which scales.
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"),
            "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Semi join: parts that ship in any lineitem with quantity > 45. */
  def partsWithBigShipments(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .join(t(spark, dir, "lineitem").filter(col("l_quantity") > 45),
            col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))

  /** Distinct aggregation: suppliers and parts per return flag. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
           countDistinct(col("l_partkey")).as("n_parts"),
           count(lit(1)).as("n_rows"))

  /** Grouped rollup: order counts and totals by status and priority. */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("o_totalprice")), 2).as("total"))

  /** Pivot: per-user event counts with the event types as columns. The
    * pivot value list is EXPLICIT — the two-argument `pivot(col)` form
    * first collects the distinct values to the driver, a hidden job and
    * an unbounded column explosion on a high-cardinality key at scale.
    * Absent cells are 0, not null (`na.fill`), matching the oracle's
    * FILTER counts.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
      .na.fill(0, types)
  }

  /** Correlated-style existence via join + agg: per-customer order stats
    * joined back to customer attributes (broadcast dim side).
    */
  def customerOrderStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("spend"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_orders"), col("spend"))

  private val FunnelStepUs = 86400000000L // each step within 24 h of the last

  /** Conversion funnel view → click → purchase: each user's FIRST view,
    * first click within 24 h after it, first purchase within 24 h after
    * that — `stage` counts how far they got. Event-sequence analytics in
    * three min-aggregates and two same-key joins: every shuffle is on
    * `user_id` (co-partitioned end to end), integer-µs arithmetic
    * throughout, no window over a user's full history. Ordering is by µs
    * timestamp alone — verified collision-free per user at every SF, so
    * the min() picks are deterministic.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tu"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("tu")).as("vt"))
    val c = e.join(v, "user_id")
      .filter(col("event_type") === "click" &&
        col("tu") > col("vt") && col("tu") <= col("vt") + FunnelStepUs)
      .groupBy("user_id").agg(min(col("tu")).as("ct"))
    val p = e.join(c, "user_id")
      .filter(col("event_type") === "purchase" &&
        col("tu") > col("ct") && col("tu") <= col("ct") + FunnelStepUs)
      .groupBy("user_id").agg(min(col("tu")).as("pt"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("vt"), col("ct"), col("pt"),
        (lit(1) + col("ct").isNotNull.cast("int")
          + col("pt").isNotNull.cast("int")).as("stage"))
  }

  /** Weekly retention cohorts: users grouped by their first active day,
    * counted per relative week of activity. Two aggregations, both
    * partial-aggregable; the only shuffles are on `user_id` then on the
    * (cohort, week) cell — day/week indices are integer-µs divisions, so
    * the cells are identical in both engines.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val f = e.groupBy("user_id").agg(min(date_trunc("day", col("ts"))).as("d0"))
    e.join(f, "user_id")
      .select(date_format(col("d0"), "yyyy-MM-dd").as("cohort"),
        expr("(unix_micros(date_trunc('day', ts)) - unix_micros(d0)) div 604800000000")
          .cast("int").as("wk"),
        col("user_id"))
      .distinct()
      .groupBy("cohort", "wk").agg(count(lit(1)).as("n_users"))
  }

  /** Cumulative distinct users by day — the canonical growth curve,
    * computed dedup-aware: each user counts once, on their FIRST active
    * day (a per-user min, partial-aggregable), days then aggregate new
    * users (partial-aggregable) and one ordered window over the DAY
    * table accumulates — the window runs over days, not events, so its
    * single-partition sort touches ~hundreds of rows at any corpus
    * size (days grow with time, never with volume).
    */
  def dailyActive(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts"))).as("d0"))
    val perDay = firstDay.groupBy(date_format(col("d0"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** Join-key skew diagnostic — the query you run BEFORE deciding to
    * salt: the ten hottest keys with row counts and integer per-mille
    * share of the table. Partial-aggregable groupBy, then a global
    * top-10 by `orderBy + limit` — Spark plans `TakeOrderedAndProject`
    * (per-partition heaps + driver merge of 10 rows), NOT a
    * single-partition window sort, so the diagnostic itself is safe on
    * the skewed data it measures. The total is a one-row broadcast.
    */
  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val total = e.agg(count(lit(1)).as("tot"))
    e.groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("user_id"), col("n_rows"),
        expr("(1000 * n_rows) div tot").as("share_milli"))
      .orderBy(col("n_rows").desc, col("user_id"))
      .limit(10)
  }

  /** Hopping-window aggregation: per (1-hour window, event type), event
    * and distinct-user counts, with the window sliding every 30 minutes —
    * each event lands in exactly size/slide = 2 windows. This is the
    * batch form of the Structured Streaming `window()` aggregation
    * ([[graft.streaming.StreamingIngest.windowedCounts]] is the streaming
    * binding with a real watermark); tumbling windows are the slide ==
    * size special case. One keyed shuffle on (window, type) with partial
    * aggregation; the 2× row expansion happens map-side before the
    * combine, so the shuffle carries window CELLS, not events. Counts
    * only — exact integers in both engines (a float `sum(value)` is
    * order-dependent in its last ulp and can flip a rounding boundary).
    */
  def windowHopping(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
                .as("window_start"),
              col("event_type"), col("n_events"), col("n_users"))

  /** Count-min-sketch frequency estimates for the hottest join keys —
    * the constant-space binding of [[keySkew]], completing the sketch
    * suite (KMV/HLL for distinct counts, t-digest for quantiles, Bloom
    * for membership, CMS for frequency). One aggregate pass folds the
    * whole table into a fixed (depth × width) counter grid (partial-
    * aggregable: sketches merge by cell-wise add), the 10 candidate keys
    * come from the exact diagnostic, and the estimates read off the
    * sketch on the driver. CMS never under-counts (every hash cell only
    * gains mass), and over-counts by at most ε·N with probability 1−δ —
    * both bounds spec-pinned against the exact counts. Deterministic:
    * fixed seed, integer counters.
    */
  def keySkewSketch(spark: SparkSession, dir: String): DataFrame = {
    val bytes = t(spark, dir, "events")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val top = keySkew(spark, dir).select("user_id", "n_rows").collect()
    import spark.implicits._
    top.map(r => (r.getLong(0), r.getLong(1), cms.estimateCount(r.getLong(0))))
      .toSeq.toDF("user_id", "n_true", "n_est")
  }

  /** Column-level table profile — the data-quality report run before
    * anything else touches a new table: per column, row/null/distinct
    * counts plus min/max for the integer key columns. ONE pass: a single
    * wide aggregate then `stack` to long form, so the table is scanned
    * once (the multi-distinct aggregate plans Spark's standard expand —
    * one map-side expansion, no extra scans). Timestamp distinctness is
    * counted on epoch MICROS explicitly (the nanos→µs conversion is the
    * table's read dialect; counting on the raw column would let the two
    * engines disagree on sub-µs aliasing). At 100 TB the exact distinct
    * counts swap for the KMV/HLL bindings (N16) — same report shape.
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    e.agg(
        count(lit(1)).as("n"),
        sum(col("event_id").isNull.cast("long")).as("nn_event_id"),
        countDistinct(col("event_id")).as("nd_event_id"),
        sum(col("ts").isNull.cast("long")).as("nn_ts"),
        countDistinct(unix_micros(col("ts"))).as("nd_ts"),
        sum(col("user_id").isNull.cast("long")).as("nn_user_id"),
        countDistinct(col("user_id")).as("nd_user_id"),
        sum(col("event_type").isNull.cast("long")).as("nn_event_type"),
        countDistinct(col("event_type")).as("nd_event_type"),
        sum(col("value").isNull.cast("long")).as("nn_value"),
        countDistinct(col("value")).as("nd_value"),
        sum(col("props").isNull.cast("long")).as("nn_props"),
        countDistinct(col("props")).as("nd_props"),
        min(col("event_id")).as("mn_event_id"), max(col("event_id")).as("mx_event_id"),
        min(col("user_id")).as("mn_user_id"), max(col("user_id")).as("mx_user_id"))
      .selectExpr(
        """stack(6,
             'event_id', n, nn_event_id, nd_event_id, mn_event_id, mx_event_id,
             'ts', n, nn_ts, nd_ts, cast(null AS bigint), cast(null AS bigint),
             'user_id', n, nn_user_id, nd_user_id, mn_user_id, mx_user_id,
             'event_type', n, nn_event_type, nd_event_type, cast(null AS bigint), cast(null AS bigint),
             'value', n, nn_value, nd_value, cast(null AS bigint), cast(null AS bigint),
             'props', n, nn_props, nd_props, cast(null AS bigint), cast(null AS bigint)
           ) AS (col_name, n_rows, n_nulls, n_distinct, min_id, max_id)""")
  }

  /** The salted-join demonstration on an ENGINEERED hot key: half the
    * events collapse onto key 0 (the "celebrity" shape AQE's skew split
    * exists for), the dimension is the distinct key set with a derived
    * cohort attribute, and the join runs through [[Skew.saltedJoin]] —
    * dim replicated 16×, fact scattered by a hash of its unique id — so
    * the hot key occupies 16 tasks instead of one. The salt cancels out
    * by construction, so the graded output (per-cohort counts) equals
    * the PLAIN join's result, which is exactly what the oracle computes:
    * the grade proves the rewrite is semantics-preserving, the spec pins
    * the salted plan shape ([[SkewSpec]]).
    */
  def saltedJoinHot(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events").select(
      when(pmod(col("user_id"), lit(10)) < 5, 0L).otherwise(col("user_id")).as("k"),
      col("event_id"))
    val dim = e.select(col("k")).distinct()
      .withColumn("cohort", pmod(col("k"), lit(7)))
    Skew.saltedJoin(e, dim, "k", hash(col("event_id")), 16)
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("k")).as("n_keys"))
  }

  /** Per-user event-sequence transition counts (the first-order Markov
    * table behind next-event prediction and funnel discovery): for each
    * ordered pair of consecutive events of one user, count (prev_type →
    * next_type), with an integer per-mille transition probability
    * normalized per prev_type. Sequence order is (event-time µs,
    * event_id) — the id tiebreak makes the sequence, and therefore the
    * graded counts, deterministic even under same-microsecond events.
    * The `lead` window partitions by user (millions of small partitions —
    * the well-behaved window case), the count is one partial-aggregable
    * shuffle on the (prev, next) cell, and the probability normalization
    * windows over the ≤ |types|² result table, which is bounded by the
    * type alphabet at any corpus size.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val g = e.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    g.withColumn("tot",
        sum(col("n_transitions")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n_transitions"),
        expr("(1000 * n_transitions) div tot").cast("long").as("p_milli"))
  }

  /** Trailing 7-day distinct active users per day (the rolling-DAU/WAU
    * curve), next to the plain daily count. A distinct count over a
    * sliding event-time range has no partial-aggregable window form, so
    * the scalable shape is contribute-then-count: reduce events to the
    * distinct (day, user) table (one keyed shuffle — the big one, and it
    * carries one row per user-day, not per event), expand each user-day
    * map-side to the exactly 7 report days it can serve, and count
    * distinct users per report day (second shuffle, bounded by 7× the
    * user-day table). Report days are restricted to OBSERVED days via a
    * broadcast of the tiny day table — a day with no events reports
    * nothing rather than a phantom trailing count.
    */
  def rollingActive(spark: SparkSession, dir: String): DataFrame = {
    val du = t(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = du.select(col("day")).distinct()
    // du is already distinct (day, user): plain count, no second
    // distinct-aggregation pass over the operator's biggest intermediate
    val d1 = du.groupBy(col("day"))
      .agg(count(lit(1)).as("n_users_1d"))
    val rolled = du
      .select(explode(sequence(lit(0), lit(6))).as("k"), col("day"), col("user_id"))
      .select(date_add(col("day"), col("k")).as("day"), col("user_id"))
      .join(broadcast(days), "day")
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("n_users_7d"))
    rolled.join(d1, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_users_1d"), col("n_users_7d"))
  }

  /** Per-type value outliers by RANK: the top 1% of events by `value`
    * within each event type (ceil, so every type flags at least one
    * row). Rank-based rather than threshold-based deliberately — an
    * interpolated p99 is a float whose last ulp can differ between
    * engines and flip a boundary row, while ranks over (value DESC,
    * event_id) are exact integers in both.
    *
    * Scale note: the per-type window funnels each type through one task,
    * and event types are FEW by nature — at 100 TB this op becomes
    * threshold-based (`approx_percentile` per type, broadcast the
    * thresholds, filter — no window), trading boundary exactness for the
    * sketch; the rank form graded here is the exact-semantics reference.
    */
  def valueOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val byType = Window.partitionBy(col("event_type"))
    val w = byType.orderBy(col("value").desc, col("event_id"))
    e.select(col("event_id"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(byType))
      .filter(col("rn") <= expr("(n + 99) div 100"))
      .select(col("event_id"), col("event_type"), col("value"), col("rn"))
  }

  /** INTERSECT/EXCEPT set algebra on derived key sets: parts that ship
    * in bulk (qty > 45) split by whether they ALSO ever ship deeply
    * discounted — `intersect` tags both-sets members, `except` the
    * bulk-only remainder. Spark plans both as left-semi/anti HashJoins
    * over the two distinct scans (the same keyed-shuffle family), and
    * the tagged union keeps the graded output one frame. Both inputs
    * prune to a single BIGINT column before the set op — at 100 TB the
    * set algebra moves keys, never rows.
    */
  def setOpsParts(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val bulk = l.filter(col("l_quantity") > 45).select(col("l_partkey")).distinct()
    val disc = l.filter(col("l_discount") > 0.08).select(col("l_partkey")).distinct()
    bulk.intersect(disc).select(col("l_partkey"), lit("bulk_and_discounted").as("tag"))
      .unionByName(
        bulk.except(disc).select(col("l_partkey"), lit("bulk_only").as("tag")))
  }

  /** RANGE-frame window: per customer, each order's trailing-30-day
    * revenue — `rangeBetween` over an integer DAY column (a RANGE frame
    * needs a numeric ordering key; epoch-days keeps it exact), revenue
    * in BIGINT cents so the frame sum is integer-exact in both engines
    * (a double sum's addition order is frame-dependent). Per-customer
    * windows are the well-behaved millions-of-small-partitions case;
    * the frame scan is linear per partition (Spark maintains a sliding
    * frame, not a per-row rescan).
    */
  def rollingRevenueRange(spark: SparkSession, dir: String): DataFrame = {
    // o_orderdate arrives NTZ, LTZ, or raw nanos-as-long depending on the
    // writer generation (see Tables.eventTimeColumns — orders is
    // deliberately unnormalized). The LongType branch matters: a
    // bigint→timestamp CAST would interpret the value as SECONDS and
    // yield garbage days silently, so nanos divide straight to epoch-days
    // in integer space; for the timestamp flavors the cast accepts both
    // and the UTC session makes epoch-days exact.
    val raw = t(spark, dir, "orders")
    val dayCol = raw.schema("o_orderdate").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("o_orderdate div 86400000000000")
      case _ =>
        expr("unix_micros(CAST(o_orderdate AS timestamp)) div 86400000000")
    }
    val o = raw
      .select(col("o_custkey"), col("o_orderkey"),
        dayCol.as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    o.withColumn("rev30_cents", sum(col("cents")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        col("cents"), col("rev30_cents"))
  }

  /** Semi-structured metadata extraction: the `props` JSON column parsed
    * per row (`get_json_object` — codegen'd, no UDF, no shuffle for the
    * parse) and aggregated per event type. The standard "filter/group on
    * a JSON attribute" pipeline op; at 100 TB the parse cost is the
    * scan-side map work and the aggregate is one partial-aggregable
    * shuffle on the small type alphabet. A field missing from a
    * document's JSON nulls out (get_json_object contract) and drops from
    * the aggregates rather than failing the row.
    */
  def propsStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"),
        countDistinct(col("k")).as("n_distinct_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Exact per-type discrete percentiles (p50/p95) of `value` by RANK
    * over (value, event_id) — the valueOutliers argument: an
    * interpolated percentile is a float whose last ulp can differ
    * between engines, while a rank-selected ACTUAL value is exact in
    * both. Index arithmetic is pure integer: idx_q = ceil(q·n) =
    * (q_num·n + q_den − 1) div q_den.
    *
    * Scale note: the per-type window funnels each type through one task
    * — acceptable because event types are alphabet-bounded; at 100 TB
    * this swaps for `approx_percentile` (t-digest binding, N10) exactly
    * as valueOutliers documents.
    */
  def percentilesByType(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val w = byType.orderBy(col("value"), col("event_id"))
    t(spark, dir, "events")
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(byType))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("value"))).as("p95"))
  }

  /** Time-series gap fill: the complete calendar of days from the
    * corpus's first to last event, each with its event count (0 on
    * silent days) and the last non-silent day's count carried forward
    * (LOCF — the standard dashboard treatment for sparse series).
    *
    * Scale shape: the heavy work is ONE partial-aggregable count per
    * day; the calendar spine is `sequence()` over a 2-row bound
    * aggregate — its length grows with elapsed TIME, never with event
    * volume, so the spine build, the left join against it (broadcast:
    * the day table is tiny by construction), and the single LOCF window
    * over days all stay constant-cost as the corpus scales. The LOCF
    * window is unpartitioned but runs over the DAY spine, not events —
    * the same bounded-table argument as daily_active's cumulative sum.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n_events"))
    val spine = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("d"))
    // The LOCF window orders by the formatted day string — identical
    // order to the timestamp (fixed yyyy-MM-dd) and already in scope
    // after the rename.
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(broadcast(daily), Seq("d"), "left")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .withColumn("n_locf",
        last(when(col("n_events") > 0, col("n_events")), ignoreNulls = true)
          .over(w))
  }

  /** Gaps-and-islands: each user's event stream merged into activity
    * islands (events ≤ 30 min apart coalesce), reported per user as
    * island count, total covered span, and events inside islands. The
    * island id is the classic cumulative sum of new-island flags over a
    * per-user window; all arithmetic in integer µs.
    *
    * Scale shape: both windows partition by `user_id` — millions of
    * small partitions, the well-behaved window case — and the two
    * aggregations shuffle on `user_id` (+island), so the whole query is
    * one key family end to end; AQE coalesces the tiny per-user
    * partitions. No global sort, no driver collection.
    */
  def islandsCoverage(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val flagged = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tu"))
      .withColumn("fresh",
        (col("tu") - lag(col("tu"), 1).over(w) > gapUs).cast("long"))
      .withColumn("island",
        sum(coalesce(col("fresh"), lit(1L))).over(w))
    flagged.groupBy(col("user_id"), col("island"))
      .agg(min(col("tu")).as("t0"), max(col("tu")).as("t1"),
           count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
           sum(col("t1") - col("t0")).as("covered_us"),
           sum(col("n")).as("n_events"))
  }

  /** CUBE over (event_type, day): all four grouping-set combinations in
    * one pass, with explicit per-column `grouping()` flags — the flags,
    * not null-masquerading, distinguish "the ALL row" from a genuinely
    * null key, and single-argument `grouping()` has identical semantics
    * in Spark and DuckDB (the multi-column grouping_id bit orders do
    * not, so the query never emits one).
    *
    * Scale shape: Spark plans CUBE as a map-side Expand (4 rows out per
    * input row) feeding ONE partial-aggregable count/sum — a single
    * shuffle of pre-aggregated cells, total cells ≤ 4 × |types| × |days|
    * regardless of event volume.
    */
  def cubeEvents(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value"))
      .cube(col("event_type"), col("day"))
      .agg(grouping(col("event_type")).cast("long").as("g_type"),
           grouping(col("day")).cast("long").as("g_day"),
           count(lit(1)).as("n"),
           round(sum(col("value")), 2).as("total"))
      .select(col("event_type"), col("day"), col("g_type"), col("g_day"),
        col("n"), col("total"))

  /** Peak concurrency per day — the sweep-line maximum of overlapping
    * 30-minute activity intervals (each event opens a session
    * [ts, ts+30min)), the "how many users at once" capacity statistic.
    *
    * Scale shape: the naive form is one GLOBAL running sum over every
    * interval endpoint — an `Exchange SinglePartition` at any scale. This
    * plan splits it exactly the [[graft.queries.DataOps.epochShuffle]]
    * way: per-day delta totals (one partial-aggregable shuffle onto the
    * bounded day key) feed a days-sized cumulative window (broadcast
    * back as each day's carry-over base), and the within-day running sum
    * partitions by day. End-exclusive sessions: at an equal instant the
    * −1 sorts before the +1 (delta ascending), and the (t, delta,
    * event_id) total order makes every intermediate prefix — hence the
    * max — engine-identical. A skewed single day re-buckets by hour with
    * the same base-offset trick.
    */
  /** SCD2 validity intervals — the slowly-changing-dimension type-2
    * build every warehouse runs: each user's event_type treated as a
    * state, CONSECUTIVE equal states collapsed into one row carrying
    * [valid_from, valid_to) and an is_current flag (valid_to = the next
    * state's first timestamp; NULL while current). N30's time travel
    * versions STORAGE snapshots; this derives the row-validity history
    * from the data itself.
    *
    * Scale shape: classic gaps-and-islands — a lag() change marker and
    * a running change-count group the runs, then lead() over the
    * collapsed runs closes each interval. All three windows and the
    * run aggregation share ONE user_id hash partitioning (Spark plans a
    * single Exchange; the later sorts reorder within partitions), and
    * per-user partitions are the well-behaved millions-of-small case.
    * Ties at an instant are totally ordered by (ts, event_id), so run
    * boundaries are engine-identical.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val marked = ev
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = marked.groupBy(col("user_id"), col("grp"), col("event_type"))
      .agg(min(col("ts")).as("t0"), count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("grp"))
    runs
      .withColumn("t_next", lead(col("t0"), 1).over(w2))
      .select(col("user_id"), col("event_type"),
        date_format(col("t0"), "yyyy-MM-dd HH:mm:ss").as("valid_from_s"),
        date_format(col("t_next"), "yyyy-MM-dd HH:mm:ss").as("valid_to_s"),
        col("n_events"), col("t_next").isNull.as("is_current"))
  }

  private[graft] val AttributionWindowUs: Long = 7L * 24 * 3600 * 1000000L

  /** Last-touch attribution — each purchase credited to the user's most
    * recent preceding touch (click or view) within a 7-day lookback:
    * the marketing-analytics twin of the as-of join (N15 joins two
    * FRAMES as-of; this runs inside ONE event stream, so the union-
    * tagged carry-forward is cheaper than building join sides). A
    * purchase with no in-window touch reports NULLs and
    * attributed = false — unattributed conversions are a monitored
    * cohort, not dropped rows.
    *
    * Scale shape: one user_id hash partitioning carries the whole
    * plan — the three `last(ignoreNulls)` carry-forwards share a
    * single window frame, and ties at an instant are totally ordered
    * by (tu, kind, event_id) with touches sorting before the purchase
    * they may serve (same-instant touch counts, matching the as-of
    * convention). Per-user frames are the well-behaved millions-of-
    * small case; no self-join, no second shuffle.
    */
  def attributionLastTouch(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
    val tagged = e.filter(col("event_type").isin("click", "view", "purchase"))
      .withColumn("kind",
        when(col("event_type") === "purchase", 1).otherwise(0))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tu"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carry(c: org.apache.spark.sql.Column) =
      last(when(col("kind") === 0, c), ignoreNulls = true).over(w)
    tagged
      .withColumn("t_id", carry(col("event_id")))
      .withColumn("t_type", carry(col("event_type")))
      .withColumn("t_tu", carry(col("tu")))
      .filter(col("kind") === 1)
      .withColumn("attributed",
        col("t_tu").isNotNull &&
          col("tu") - col("t_tu") <= AttributionWindowUs)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("tu").as("p_tu"),
        when(col("attributed"), col("t_id")).as("touch_id"),
        when(col("attributed"), col("t_type")).as("touch_type"),
        when(col("attributed"), col("t_tu")).as("touch_tu"),
        col("attributed"))
  }

  def concurrencyPeak(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val pts = ev.select(col("event_id"), col("ts").as("tt"), lit(1L).as("delta"))
      .unionByName(ev.select(col("event_id"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("tt"),
        lit(-1L).as("delta")))
      .withColumn("day", date_format(date_trunc("day", col("tt")), "yyyy-MM-dd"))
    val base = pts.groupBy(col("day")).agg(sum(col("delta")).as("dsum"))
      .withColumn("base", coalesce(sum(col("dsum")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("base"))
    val run = Window.partitionBy(col("day"))
      .orderBy(col("tt"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.join(broadcast(base), "day")
      .withColumn("running", col("base") + sum(col("delta")).over(run))
      .groupBy(col("day"))
      .agg(max(col("running")).as("peak_concurrent"))
  }

  /** TPC-H Q7-style bilateral trade volume: revenue flowing between one
    * nation PAIR (supplier side ↔ customer side), per direction per ship
    * year. The 6-way join every warehouse benchmark stresses.
    *
    * Scale shape: nation (25 rows at every SF) broadcasts onto supplier
    * and customer FIRST, and the pair filter cuts each to ~2/25 of its
    * rows before the fact table sees them — the filtered builds carry no
    * broadcast hint (they grow linearly with SF; AQE broadcasts at small
    * SF, shuffles on the natural keys at scale). The shipdate range
    * filter pushes to the lineitem scan.
    */
  def q7NationFlows(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val nation = t(spark, dir, "nation")
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey"), col("n_name"))
    val sup = t(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      // revenue in integer cents, rounded PER ROW: the per-row double
      // product is bit-identical in both engines, so the BIGINT sum is
      // exact where round(sum(double), 2) diverges by one cent when the
      // sum's addition order lands on a .005 ridge (observed on
      // q10_returned at sf0.01)
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
        100).cast("long")).as("revenue_cents"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q10-style returned-item reporting: customers ranked by revenue
    * lost to returns in one quarter, top 20 with their nation. The
    * lineitem flag filter and the orders quarter filter both push to the
    * scans; nation broadcasts; customer carries no hint (linear growth —
    * AQE decides). Top-20 plans as TakeOrderedAndProject: per-partition
    * heads then a 20-row driver merge, never a global sort.
    */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      // integer-cents discipline — see q7NationFlows' rationale
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
        100).cast("long")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  /** Trimmed (5%–95%) per-type value statistics in integer cents — the
    * robust-mean companion to [[valueOutliers]]' flagging: drop each
    * type's bottom and top 5% by exact rank, then sum/mean what's left.
    * Rank bounds are integer expressions ((5·n) div 100 exclusive,
    * (95·n) div 100 inclusive) over the (cents, event_id) total order,
    * so the kept set is engine-identical — no interpolation anywhere.
    * Cents are round(value·100): both engines round half away from zero
    * on identical IEEE doubles (the int8_codes precedent).
    *
    * Scale shape: the rank window and the final aggregation share ONE
    * event_type hash partitioning (single Exchange); per-type corpus
    * sort is the same documented trade as percentilesByType, with the
    * same t-digest escape hatch at 100 TB.
    */
  def trimmedStats(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events").select(col("event_type"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))
    val wt = Window.partitionBy(col("event_type"))
    val ranked = e
      .withColumn("rn", row_number().over(
        wt.orderBy(col("cents"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(wt))
    ranked
      .filter(col("rn") > expr("(5 * n) div 100") &&
        col("rn") <= expr("(95 * n) div 100"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), sum(col("cents")).as("sum_cents"))
      .withColumn("mean_cents", expr("sum_cents div n_kept"))
  }

  /** Per-type revenue trend as an EXACT rational OLS slope — daily cent
    * totals regressed on epoch-day, reported as (numerator, denominator)
    * BIGINT pair: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). Keeping the
    * rational avoids the cross-engine float division entirely; the
    * consumer divides (or compares num·den' vs num'·den). Magnitudes:
    * x ~ 2·10⁴ (epoch days), daily cents ~ 10⁷ at sf1 ⇒ n·Σxy ~ 10¹⁵,
    * five orders under BIGINT overflow. (The intercept's Σy·Σx² crosses
    * 10¹⁸ at sf10 — deliberately NOT reported.)
    *
    * Scale shape: daily totals are one partial-aggregable shuffle onto
    * the bounded (type, day) key; the regression moments aggregate that
    * bounded frame onto the type alphabet. Corpus bytes move once.
    */
  def trendSlope(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"),
        datediff(date_trunc("day", col("ts")).cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("x"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
    daily.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"),
        (col("n_days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
  }

  /** Per-user inter-event gap distribution: exact lower-median, p95
    * (ceil-rank), and max gap in whole seconds. The cadence profile that
    * feeds [[adaptiveSessionize]]'s thresholds. Rank selection over the
    * (gap, event_id) total order — exact integers, no interpolation.
    *
    * Scale shape: the lag() window, the rank window, and the final
    * aggregation all share ONE user_id hash partitioning (Spark plans a
    * single Exchange; later sorts reorder within partitions), and
    * per-user partitions are the well-behaved millions-of-small case.
    */
  def intereventGaps(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val gaps = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tu"))
      .withColumn("prev", lag(col("tu"), 1).over(wo))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), col("event_id"),
        expr("(tu - prev) div 1000000").as("gap_s"))
    val ranked = gaps
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("gap_s"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
    ranked.groupBy(col("user_id")).agg(
      max(col("n")).as("n_gaps"),
      max(when(col("rn") === expr("(n + 1) div 2"), col("gap_s")))
        .as("median_gap_s"),
      max(when(col("rn") === expr("(95 * n + 99) div 100"), col("gap_s")))
        .as("p95_gap_s"),
      max(col("gap_s")).as("max_gap_s"))
  }

  /** Sessionization with a PER-USER adaptive idle threshold — fixed-gap
    * sessionize (N17) mis-splits both the clicky user and the browser:
    * here each user's threshold is 3× their own median gap, clamped to
    * [60 s, 3600 s], and their session count is 1 + gaps exceeding it.
    * Single-event users (no gaps) report one session at the clamp floor.
    * All integer seconds, the same lower-median rank as
    * [[intereventGaps]] — engine-exact end to end.
    *
    * Scale shape: every stage — lag, rank, median, break count, event
    * count — keys on user_id; the median/break frames are per-user
    * aggregates (tiny) rejoining the same partitioning. No global
    * anything.
    */
  def adaptiveSessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tu"))
    val wo = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val gaps = e.withColumn("prev", lag(col("tu"), 1).over(wo))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), col("event_id"),
        expr("(tu - prev) div 1000000").as("gap_s"))
    val med = gaps
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("gap_s"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("user_id"))
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("gap_s"))).as("med"))
      .withColumn("threshold_s",
        least(greatest(lit(3L) * col("med"), lit(60L)), lit(3600L)))
    val breaks = gaps.join(med, "user_id")
      .filter(col("gap_s") > col("threshold_s"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_breaks"))
    e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .join(med.select(col("user_id"), col("threshold_s")), Seq("user_id"), "left")
      .join(breaks, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"),
        coalesce(col("threshold_s"), lit(60L)).as("threshold_s"),
        (lit(1L) + coalesce(col("n_breaks"), lit(0L))).as("n_sessions"))
  }

  /** Market-basket affinity over part types: for every unordered type
    * pair, how many orders contain BOTH, with an exact per-mille lift
    * (1000·c_ab·N ÷ (c_a·c_b) — >1000 means the pair co-occurs more than
    * independence predicts). The recommender-ish analytics staple, and
    * the relational twin of N124's token PMI.
    *
    * Scale shape: the corpus collapses to distinct (order, type) FIRST —
    * output ≤ orders × |type alphabet| — so the per-order pair self-join
    * fans out by the per-order type count (≤ 6 here), never by lineitem
    * count; pair and marginal counts are partial-aggregable onto
    * alphabet-bounded keys, and the marginals broadcast back. Integer
    * note (the N124 discipline): 1000·c_ab·N overflows BIGINT around
    * 10⁹ orders — at that scale bind the per-mille to the log-domain
    * float form.
    */
  def basketAffinity(spark: SparkSession, dir: String): DataFrame = {
    // the distinct (order, type) projection is eagerly materialized —
    // it feeds FOUR consumers (marginals, total, both self-join sides)
    // and the lazy form re-ran the lineitem⋈part distinct per consumer;
    // its size is ≤ orders × per-order type count (≤ 6), two narrow
    // columns — the standard price of a basket pass
    val ot = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      .join(t(spark, dir, "part").select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_type")).distinct()
      .localCheckpoint(true)
    val marg = ot.groupBy(col("p_type")).agg(count(lit(1)).as("c"))
    val total = ot.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    ot.as("a").join(ot.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.p_type") < col("b.p_type"))
      .groupBy(col("a.p_type").as("type_a"), col("b.p_type").as("type_b"))
      .agg(count(lit(1)).as("c_ab"))
      .join(broadcast(marg.select(col("p_type").as("type_a"),
        col("c").as("c_a"))), "type_a")
      .join(broadcast(marg.select(col("p_type").as("type_b"),
        col("c").as("c_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("c_ab"),
        expr("(1000 * c_ab * n_orders) div (c_a * c_b)").as("lift_milli"))
  }

  /** Conversion-latency distribution — the serving statistic on top of
    * [[attributionLastTouch]]: among ATTRIBUTED purchases, seconds from
    * touch to purchase, summarized per touch type as exact lower-median,
    * ceil-rank p95, and max (the [[intereventGaps]] rank discipline).
    * The oracle nests the graded attribution SQL verbatim, so attribution
    * drift fails both entries together.
    *
    * Scale shape: attribution's output is purchase-bounded (≪ events);
    * the rank window and aggregation repartition it once onto the
    * touch-type alphabet. The documented per-type-sort trade of
    * percentilesByType applies within that bounded frame.
    */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val a = attributionLastTouch(spark, dir).filter(col("attributed"))
      .select(col("touch_type"), col("purchase_id"),
        expr("(p_tu - touch_tu) div 1000000").as("lat_s"))
    val wt = Window.partitionBy(col("touch_type"))
    val ranked = a
      .withColumn("rn", row_number().over(
        wt.orderBy(col("lat_s"), col("purchase_id"))))
      .withColumn("n", count(lit(1)).over(wt))
    ranked.groupBy(col("touch_type")).agg(
      max(col("n")).as("n_conversions"),
      max(when(col("rn") === expr("(n + 1) div 2"), col("lat_s")))
        .as("median_lat_s"),
      max(when(col("rn") === expr("(95 * n + 99) div 100"), col("lat_s")))
        .as("p95_lat_s"),
      max(col("lat_s")).as("max_lat_s"))
  }

  /** Hour-of-day activity profile per event type with exact per-mille
    * share — the seasonality fingerprint behind capacity planning and
    * anomaly baselines. One partial-aggregable shuffle onto the bounded
    * (type, hour) key; per-type totals aggregate that ≤ |types|·24 frame
    * and broadcast back.
    */
  def hourlyProfile(spark: SparkSession, dir: String): DataFrame =
    // ≤ |types|·24 rows, eagerly materialized: one stream pass feeds
    // both the totals and the join
    hourlyProfileFrom(hourlyCellsOf(t(spark, dir, "events")).localCheckpoint(true))

  /** The additive half of [[hourlyProfile]]: (type, hour) partial counts
    * from any slice of the events table. Cells ADD across slices, which
    * is what lets [[graft.streaming.StreamingMonitors]] maintain the
    * profile incrementally per micro-batch.
    */
  private[graft] def hourlyCellsOf(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n_events"))

  /** The derive half of [[hourlyProfile]], on an eagerly-materialized
    * complete cell frame (it is consumed twice: totals + join).
    */
  private[graft] def hourlyProfileFrom(cells: DataFrame): DataFrame = {
    val tot = cells.groupBy(col("event_type")).agg(sum(col("n_events")).as("n_type"))
    cells.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("hr"), col("n_events"),
        expr("(1000 * n_events) div n_type").as("share_milli"))
  }

  /** Per-customer reorder intervals — the retention statistic behind
    * "is this customer's cadence slowing": exact lower-median and max
    * days between CONSECUTIVE orders, customers with ≥ 2 orders. The
    * [[intereventGaps]] rank discipline on the orders table: the lag
    * window, rank window, and aggregation share one o_custkey hash
    * partitioning; gaps are integer epoch-day differences.
    */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"), col("o_orderkey"))
    val gaps = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(date_trunc("day", col("o_orderdate")).cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("d"))
      .withColumn("prev", lag(col("d"), 1).over(wo))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        (col("d") - col("prev")).as("gap_d"))
    val ranked = gaps
      .withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("gap_d"), col("o_orderkey"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_custkey"))))
    ranked.groupBy(col("o_custkey")).agg(
      max(col("n")).as("n_gaps"),
      max(when(col("rn") === expr("(n + 1) div 2"), col("gap_d")))
        .as("median_gap_d"),
      max(col("gap_d")).as("max_gap_d"))
  }

  /** First-touch attribution — [[attributionLastTouch]]'s mirror: each
    * purchase credited to the EARLIEST touch inside the 7-day lookback
    * (brand-awareness credit where last-touch measures the closer). The
    * carry-forward trick that made last-touch one window does NOT apply
    * — "earliest within a bounded lookback" needs the window's leading
    * edge — so this takes the N27 bucketed range-join shape: touch time
    * bucketed by the window width W, purchases replicated into their 2
    * adjacent buckets, equi-join on (user, bucket), the exact
    * 0 ≤ p − t ≤ W filter lossless after the hash join, then one
    * min-struct argmin per purchase over the (t_tu, event_id) total
    * order. Unattributed purchases survive the left join as the
    * monitored NULL cohort, exactly like last-touch.
    */
  def attributionFirstTouch(spark: SparkSession, dir: String): DataFrame = {
    val w = AttributionWindowUs
    val e = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
    val touches = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("t_type"), col("tu").as("t_tu"),
        expr(s"tu div $w").as("bk"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("tu").as("p_tu"))
    val probed = purchases
      .withColumn("bk", explode(array(expr(s"p_tu div $w") - 1,
        expr(s"p_tu div $w"))))
      .join(touches, Seq("user_id", "bk"))
      .filter(col("t_tu") <= col("p_tu") &&
        col("p_tu") - col("t_tu") <= w)
      .groupBy(col("purchase_id"))
      .agg(min(struct(col("t_tu"), col("t_id"), col("t_type"))).as("ft"))
      .select(col("purchase_id"), col("ft.t_id").as("touch_id"),
        col("ft.t_type").as("touch_type"), col("ft.t_tu").as("touch_tu"))
    purchases.join(probed, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("p_tu"),
        col("touch_id"), col("touch_type"), col("touch_tu"),
        col("touch_tu").isNotNull.as("attributed"))
  }

  /** Daily-volume anomaly detection — the [[graft.queries.DataOps
    * .madOutliers]] discipline applied to the TIME axis: a day is
    * anomalous when its event count deviates from the corpus-median
    * daily count by more than 3 MADs. The ops-monitoring query a
    * pipeline runs before trusting a new day's crawl. The day frame is
    * calendar-bounded (≤ days in the corpus), so the two global median
    * rank selections run on a tiny frame — the deliberate bounded
    * exception, same as qualityDeciles.
    */
  def anomalousDays(spark: SparkSession, dir: String): DataFrame =
    anomalousDaysFrom(dailyCountsOf(t(spark, dir, "events"))
      .localCheckpoint(true)) // days-bounded; four consumers below

  /** Additive half of [[anomalousDays]]: per-day partial counts from any
    * slice of the events table (cells add across slices / micro-batches).
    */
  private[graft] def dailyCountsOf(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))

  /** Derive half of [[anomalousDays]] on an eagerly-materialized complete
    * daily frame (four consumers below).
    */
  private[graft] def anomalousDaysFrom(daily: DataFrame): DataFrame = {
    val n = daily.agg(count(lit(1)).as("n_days"))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame =
      df.withColumn("rn", row_number().over(
          Window.orderBy(col(v), col("day"))))
        .crossJoin(broadcast(n))
        .filter(col("rn") === expr("(n_days + 1) div 2"))
        .select(col(v).as(out))
    val med = lowerMedian(daily, "n_events", "med_events")
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("deviation", abs(col("n_events") - col("med_events")))
    val mad = lowerMedian(
      dev.select(col("deviation").as("n_events"), col("day")),
      "n_events", "mad_events")
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("n_events"), col("deviation"),
        (col("deviation") > lit(3L) * col("mad_events")).as("is_anomaly"))
  }

  /** Third-order path mining — [[eventTransitions]]' bigram model
    * extended one step: counts of CONSECUTIVE event-type triples per
    * user (by event time, event_id tie-break) with the exact per-mille
    * continuation share — P(e3 | e1→e2), the statistic behind "after
    * search→click, what happens next". Same single user-keyed window
    * partitioning as the bigram form (two leads ride one sort), then one
    * partial-aggregable shuffle onto the ≤ |types|³ cell key; prefix
    * totals aggregate that bounded frame.
    */
  def eventTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val g = e
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n_paths"))
    g.withColumn("tot", sum(col("n_paths")).over(
        Window.partitionBy(col("e1"), col("e2"))))
      .select(col("e1"), col("e2"), col("e3"), col("n_paths"),
        expr("(1000 * n_paths) div tot").cast("long").as("p_milli"))
  }

  /** TPC-H Q18 shape — large-volume orders: customers whose order sums
    * more than 300 units across its line items. The Q18 plan lesson is
    * the PRE-aggregation: lineitem collapses to per-order totals and the
    * HAVING cuts to the rare tail BEFORE any join, so the join probes
    * are a tiny fraction of orders and AQE broadcasts them — never
    * join-then-aggregate, which would shuffle the full lineitem×orders
    * width. Quantities are integral doubles; the cast to BIGINT after
    * the exact integral sum grades engine-exactly.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
      .filter(col("total_qty") > 300L)
    big
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("total_qty"))
  }

  /** TPC-H Q2's correlated-subquery shape, Spark-first: for each part,
    * the single cheapest purchase line (integer cents; ties broken by
    * the (cents, suppkey, orderkey) total order) with its supplier and
    * nation. Where SQL writes `WHERE cost = (SELECT min(cost) ...
    * correlated)`, the declarative plan is ONE min-struct argmin per
    * part key — a partial-aggregable shuffle, no per-row subquery, no
    * second scan — then the dimension joins hang off the
    * already-aggregated (parts-sized) frame, nation broadcast.
    */
  def partBestSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val best = li.groupBy(col("l_partkey"))
      .agg(min(struct(col("cents"), col("l_suppkey"), col("l_orderkey")))
        .as("b"))
      .select(col("l_partkey"), col("b.cents").as("best_cents"),
        col("b.l_suppkey").as("best_suppkey"))
    best
      .join(t(spark, dir, "part").select(col("p_partkey"), col("p_name")),
        col("p_partkey") === col("l_partkey"))
      .join(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
        col("s_suppkey") === col("best_suppkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("best_cents"),
        col("s_name"), col("n_name"))
  }

  /** Explicit GROUPING SETS — the third face of multi-level aggregation
    * next to [[rollupOrders]] (hierarchy) and the events CUBE (all
    * combinations): exactly the requested set list
    * ((type, day), (type), ()) — the daily detail, the per-type total,
    * and the grand total, WITHOUT the per-day-across-types level a CUBE
    * would force. Exercised through the SQL surface (`spark.sql`), the
    * API a warehouse user actually writes grouping sets in. Catalyst
    * plans ONE scan + Expand (3 replicas) + a single partial-aggregable
    * shuffle — not three scans; the NULL patterns of the two key
    * columns identify the grouping set (day is never NULL in the data,
    * so the encoding is unambiguous).
    */
  def groupingSetsEvents(spark: SparkSession, dir: String): DataFrame = {
    val view = "events_grouping_sets"
    t(spark, dir, "events").createOrReplaceTempView(view)
    spark.sql(
      s"""SELECT event_type,
            date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
            count(*) AS n_events
          FROM $view
          GROUP BY GROUPING SETS (
            (event_type, date_format(date_trunc('day', ts), 'yyyy-MM-dd')),
            (event_type), ())""")
  }

  /** TPC-H Q4's EXISTS shape — order-priority service check: orders with
    * at least one line item shipped more than 60 days after the order
    * date, counted per priority class. SQL writes a correlated EXISTS;
    * the declarative plan pre-aggregates lineitem to ONE row per order
    * (max ship date — partial-aggregable, so the map side collapses each
    * scan partition to its distinct orders before the shuffle) and joins
    * that orders-sized frame once. The per-row correlated probe never
    * exists, and the 60-day cut is a post-join filter on two columns of
    * the same row — no second scan of either table.
    */
  def q4PriorityLate(spark: SparkSession, dir: String): DataFrame = {
    val lastShip = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("last_ship"))
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      .join(lastShip, col("o_orderkey") === col("l_orderkey"))
      .filter(col("last_ship") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_late"))
  }

  /** TPC-H Q14's promo-share shape, per ship month. The classic form
    * divides two SUMs into a percentage — a float whose last digit
    * depends on addition order; here BOTH sums stay integer cents
    * (per-row-rounded, the q7 discipline) so the hash is engine-exact and
    * the caller divides. Part collapses to a (partkey, is_promo) boolean
    * projection before the join — the narrowest possible build side; no
    * hardcoded broadcast (part grows linearly with SF — AQE broadcasts at
    * small SF, shuffles at large).
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val promo = t(spark, dir, "part")
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy(col("month"))
      .agg(sum(when(col("is_promo"), col("cents")).otherwise(0L))
          .as("promo_cents"),
        sum(col("cents")).as("total_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q19's disjunctive-bracket shape: revenue from three
    * (brand, size-range, quantity-range) brackets OR-ed together. The
    * plan point is predicate placement: the brand IN-list (the union of
    * the brackets' part-side domains) pushes INTO the part scan, so the
    * join build side is pre-cut to the three brands; the mixed-table
    * bracket disjunction then runs as one codegen'd filter on the joined
    * row — never three scans unioned, never a filter the scan could have
    * taken left unpushed.
    */
  def q19BracketRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
      .filter(col("p_brand").isin("Brand#13", "Brand#20", "Brand#25"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(5, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(15, 50) &&
          col("l_quantity").between(25, 50)))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("revenue_cents"))
  }

  /** TPC-H Q22's idle-balance shape, adapted to the schema (no phone
    * country codes; recency stands in for "never ordered", which this
    * generator never produces): per nation, the count and balance sum of
    * customers whose balance exceeds the global positive-balance average
    * and who placed NO order in 2001. The threshold is a 1-row broadcast
    * (integer-cents average: exact BIGINT sum, one division); the
    * inactivity test is a LEFT ANTI join against the date-pruned orders
    * projection — the o_orderdate cut pushes to the orders scan, so the
    * anti-join build is months of orders, not all of history.
    */
  def q22IdleBalances(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val thr = c.filter(col("cents") > 0).agg(avg(col("cents")).as("thr"))
    val recent = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(thr))
      .filter(col("cents") > col("thr"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_custs"), sum(col("cents")).as("total_cents"))
  }

  /** Exact weighted median (lower median, weights = quantities) of the
    * line price per return flag. The naive form sorts each group's raw
    * rows — a single reducer per flag at corpus scale. Here the corpus
    * collapses FIRST to the (flag, price-cents) histogram — a
    * partial-aggregable shuffle onto the bounded price domain — and the
    * cumulative-weight rule runs per flag over that domain-sized frame:
    * the median is the smallest price whose running weight reaches half
    * the total. The within-flag window sorts distinct PRICES, never rows.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val h = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .agg(sum(col("l_quantity")).cast("long").as("w"))
    // running and total weight ride ONE flag partitioning (two window
    // frames, same Exchange); the final per-flag agg reuses it too
    val wf = Window.partitionBy(col("l_returnflag"))
    h.withColumn("cum", sum(col("w")).over(wf.orderBy(col("cents"))))
      .withColumn("tw", sum(col("w")).over(wf))
      .filter(col("cum") * 2 >= col("tw"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("cents")).as("median_cents"),
        max(col("tw")).as("total_weight"))
  }

  /** Exact global rank of `value` (ties by c_custkey) WITHOUT a global
    * sort: rows land in monotone buckets, the bucket histogram (bounded
    * by the value domain, not the row count) yields broadcast cumulative
    * bases, and a per-bucket row_number finishes the rank — the
    * epoch_shuffle pattern on an ordered key. The only single-partition
    * window runs over the bucket histogram.
    */
  private def bucketedRank(df: DataFrame, value: Column, bucket: Column,
      out: String): DataFrame = {
    val keyed = df.select(col("c_custkey"), value.as("v"), bucket.as("bkt"))
    val bases = keyed.groupBy(col("bkt")).agg(count(lit(1)).as("bn"))
      .select(col("bkt"),
        coalesce(sum(col("bn")).over(Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("base"))
    keyed.join(broadcast(bases), "bkt")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("v"), col("c_custkey"))))
      .select(col("c_custkey"), (col("base") + col("rk")).as(out))
  }

  /** RFM customer segmentation — recency (last order date), frequency
    * (order count), monetary (lifetime cents) quartile scores 1–4, the
    * standard CRM cut. A global NTILE would move every customer into ONE
    * partition; instead each metric gets an exact global rank from
    * [[bucketedRank]] (recency: 64-day buckets; frequency: the count
    * itself; monetary: 100k-dollar cents buckets — all bounded by their
    * DOMAIN, so the histogram windows stay broadcast-size as customers
    * grow), and the score is rank arithmetic: 1 + (4·(rank−1)) div n.
    * Quartiles are equal-width by rank (the last partial width folds into
    * the top bucket), ties broken by custkey — deterministic end to end.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    // five consumers (three ranks, the key spine, the count) — without
    // the checkpoint each one re-executes the orders scan + aggregate
    // as its own subtree (25 Exchanges; the mad_outliers lesson)
    val per = t(spark, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        datediff(max(col("o_orderdate")).cast("date"),
          lit("1995-01-01").cast("date")).cast("long").as("r_days"),
        count(lit(1)).as("f_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("m_cents"))
      .localCheckpoint(true)
    val r = bucketedRank(per, col("r_days"), expr("r_days div 64"), "r_rank")
    val f = bucketedRank(per, col("f_orders"), col("f_orders"), "f_rank")
    val m = bucketedRank(per, col("m_cents"), expr("m_cents div 10000000"),
      "m_rank")
    val n = per.agg(count(lit(1)).as("n_custs"))
    per.select(col("c_custkey"))
      .join(r, "c_custkey").join(f, "c_custkey").join(m, "c_custkey")
      .crossJoin(broadcast(n))
      .select(col("c_custkey"),
        expr("(4 * (r_rank - 1)) div n_custs + 1").as("r_score"),
        expr("(4 * (f_rank - 1)) div n_custs + 1").as("f_score"),
        expr("(4 * (m_rank - 1)) div n_custs + 1").as("m_score"))
      .withColumn("rfm",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .cast("long"))
  }

  /** TPC-H Q6's forecast-revenue shape: the canonical predicate-pushdown
    * showcase — every filter (ship year, discount band, quantity cap) is
    * a single-column comparison the parquet scan takes as a pushed
    * filter + row-group min/max prune, so at 100 TB the query reads only
    * the row groups that can match and shuffles ONE partial-agg row per
    * partition. Revenue stays per-row-rounded integer cents (the q7
    * discipline) so the BIGINT sum grades engine-exactly.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * col("l_discount") * 100)
          .cast("long")).as("revenue_cents"))

  /** TPC-H Q12's conditional-counting shape, adapted to the schema (no
    * ship modes; the service dimension is the ship DELAY): per 30-day
    * delay bucket (capped at 6 — the tail bucket), how many line items
    * belong to critical-priority orders vs the rest. The CASE runs
    * inside the aggregate — one joined pass, one partial-aggregable
    * shuffle onto the ≤ 7-bucket key; never two filtered scans unioned.
    * The delay is an integer day difference, so the bucket rule is
    * engine-exact by construction.
    */
  def q12ServiceByDelay(spark: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      .join(t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(expr("least(greatest(datediff(l_shipdate, o_orderdate), 0)" +
        " div 30, 6)").cast("long").as("delay_bucket"), hi.as("hi"))
      .groupBy(col("delay_bucket"))
      .agg(sum(when(col("hi"), 1L).otherwise(0L)).as("high_lines"),
        sum(when(col("hi"), 0L).otherwise(1L)).as("low_lines"))
  }

  /** TPC-H Q13's customer-distribution shape: how many customers placed
    * exactly k qualifying orders, INCLUDING the zero-order cohort — the
    * reason this must be a LEFT OUTER join from customer, not an inner
    * join (an inner join silently drops the never-ordered customers the
    * distribution exists to expose). The per-customer count reuses the
    * join's c_custkey partitioning (no second fact shuffle); the final
    * histogram shuffle moves one row per distinct order COUNT — bounded
    * by the count domain, not the customer count.
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_custkey"))
      .join(t(spark, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_custs"))

  /** TPC-H Q15's top-supplier shape: quarterly revenue per supplier, keep
    * the maximum (ALL ties, Q15's defining subtlety — an ORDER BY/LIMIT 1
    * would drop co-leaders nondeterministically). The max is a 1-row
    * broadcast against the supplier-sized aggregate; the supplier
    * dimension joins AFTER the filter, so it probes only the winners.
    * No hardcoded broadcast on supplier (it grows with SF — AQE decides).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("revenue_cents"))
    val mx = rev.agg(max(col("revenue_cents")).as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("revenue_cents") === col("max_rev"))
      .join(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
  }

  /** TPC-H Q16's supplier-diversity shape, adapted to the schema (the
    * part-supplier relation is DERIVED from observed lineitem pairs; the
    * complaint blacklist is the negative-balance suppliers): per
    * (brand, type, size) — excluding one brand and one type, Q16's
    * negated predicates — how many DISTINCT suppliers ship the part.
    * The lineitem pair-distinct collapses map-side before its one
    * shuffle; the blacklist is a LEFT ANTI join against a frame AQE
    * broadcasts (suppliers with complaints ≪ suppliers); countDistinct
    * expands once over the part-bounded joined frame.
    */
  def q16PartSupplierCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(t(spark, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(t(spark, dir, "part")
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO")
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  /** TPC-H Q17's correlated-average decorrelation: revenue from lines of
    * SMALL-type parts whose quantity is below one fifth of that part's
    * average line quantity. SQL writes `l_quantity < 0.2 * (SELECT avg
    * ... correlated)`; the declarative plan pre-aggregates per part ONCE
    * (sum + count — partial-aggregable) and joins the parts-sized frame
    * back. The fifth-of-average test is INTEGER algebra — 5·q·n < Σq —
    * so no float average ever exists and the cut is engine-exact
    * (quantities are integral; the products stay far below 2^63).
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n_q"))
      .join(t(spark, dir, "part").filter(col("p_type") === "SMALL")
        .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as("pk"), col("sum_q"), col("n_q"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("q") * lit(5L) * col("n_q") < col("sum_q"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("total_cents"))
  }

  /** TPC-H Q8's national-market-share shape: among STANDARD-part revenue
    * sold to ASIA-region customers, the share supplied by NATION_5's
    * suppliers, per order year. The share's numerator and denominator
    * BOTH stay per-row-rounded integer cents (no float percentage — the
    * q14 discipline). Plan: nation⨝region collapses to a broadcast
    * custkey-side filter; part collapses to its filtered key set; the
    * supplier side joins as a (suppkey, is_nation5) boolean projection —
    * every dimension is pre-shrunk before the fact table moves, and the
    * conditional sum replaces a second filtered scan.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(spark, dir, "nation")
      .join(t(spark, dir, "region")
        .filter(col("r_name") === "ASIA").select(col("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val asiaCust = t(spark, dir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppFlag = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("s_suppkey"), (col("n_name") === "NATION_5").as("is_n5"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .join(t(spark, dir, "part").filter(col("p_type") === "STANDARD")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .join(suppFlag, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("is_n5"), col("cents")).otherwise(0L))
          .as("nation_cents"),
        sum(col("cents")).as("total_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q9's product-profit shape, adapted to the schema (no partsupp
    * supply cost — the cost basis is the part's RETAIL price in integer
    * cents times the line quantity, a deterministic stand-in with the
    * same join topology): per (supplier nation, order year), total
    * profit over parts whose name contains "red". Profit stays integer
    * cents end to end (revenue per-row-rounded, cost an exact integer
    * product), so the grouped BIGINT sum grades engine-exactly. The
    * name-filtered part projection and the supplier→nation flag are
    * pre-shrunk build sides; nation is broadcast.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val redParts = t(spark, dir, "part")
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("retail_cents"))
    val suppNation = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_cents"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long")
          .as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("rev_cents") - col("q") * col("retail_cents"))
        .as("profit_cents"))
  }

  /** TPC-H Q11's important-stock shape, adapted (no partsupp availqty —
    * a part's "inventory value" is the observed lineitem revenue from
    * NATION_7's suppliers): parts whose value exceeds TWICE the mean
    * part value. Q11's literal `> fraction · total` cut degenerates at
    * scale (the fraction of any one part among n parts falls as 1/n —
    * at sf1 the 0.1% form returns zero rows); the mean-multiple cut is
    * the same HAVING-against-a-global-scalar shape but scale-free. The
    * global (total, count) is a 1-row broadcast and the test is INTEGER
    * (value·n > 2·total) so the cut is engine-exact. The nation-filtered
    * supplier key set pre-shrinks the fact scan's join; the per-part
    * aggregate is partial-aggregable.
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val n7supp = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
        .filter(col("n_name") === "NATION_7").select(col("n_nationkey"))),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("s_suppkey"))
    val value = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(n7supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("cents")).as("value_cents"))
    val total = value.agg(sum(col("value_cents")).as("total_cents"),
      count(lit(1)).as("n_parts"))
    value.crossJoin(broadcast(total))
      .filter(col("value_cents") * col("n_parts") > col("total_cents") * 2L)
      .select(col("l_partkey"), col("value_cents"))
  }

  /** TPC-H Q20's nested-IN decorrelation: suppliers who shipped more
    * than a QUARTER of some PROMO part's total 1998+ volume (the excess-stock
    * shape — SQL nests `ps_availqty > 0.5 * (SELECT sum ...)` two
    * subqueries deep; the declarative plan is two partial-aggregable
    * aggregates of the SAME filtered scan joined on the part key, with
    * the quarter test as integer algebra 4·supp_qty > part_qty). The
    * distinct winner set then picks up supplier + nation names —
    * dimension joins probe only qualifying suppliers.
    */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val promoLines = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(t(spark, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("q"))
    val perPartSupp = promoLines.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("q")).as("supp_q"))
    val perPart = promoLines.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q")).as("part_q"))
    perPartSupp.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("supp_q") * 4L > col("part_q"))
      .select(col("l_suppkey")).distinct()
      .join(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  /** TPC-H Q21's waiting-suppliers shape: in finished ('F') orders with
    * at least TWO suppliers, the supplier whose latest line shipped
    * STRICTLY after every other supplier's — SQL writes an EXISTS (some
    * other supplier) and a NOT EXISTS (no other supplier shipped as
    * late), here decorrelated into per-(order, supplier) max-ship
    * aggregates, a per-order (max, count) frame joined back, and a
    * strictness check that the max is achieved exactly once. Counted per
    * supplier. Every aggregate is partial-aggregable and every join key
    * is the order key — one key family end to end.
    */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val perOS = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("ms"))
    val perO = perOS.groupBy(col("l_orderkey").as("ok"))
      .agg(max(col("ms")).as("m1"), count(lit(1)).as("n_supps"))
    val lastShippers = perOS.join(perO,
        col("l_orderkey") === col("ok") && col("ms") === col("m1"))
      .filter(col("n_supps") >= 2L)
    // strictness: the max must be achieved by exactly ONE supplier
    val unique = lastShippers.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_at_max"), min(col("l_suppkey")).as("supp"))
      .filter(col("n_at_max") === 1L)
    unique.groupBy(col("supp")).agg(count(lit(1)).as("numwait"))
      .join(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        col("s_suppkey") === col("supp"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  // Z-order layout audit constants — shared with the oracle SQL so the
  // quantization, tiling, and canonical box cannot drift between engines.
  /** Day-number epoch for the x dimension. */
  private[graft] val ZEpoch = "1995-01-01"
  /** Price quantum for the y dimension (a power of two: `price / 128`
    * is an EXACT double scaling, so `floor` is bit-deterministic). */
  private[graft] val ZPriceQuantum = 128
  /** File id = z >> this — 64 z-range tiles (top 3 bits of each dim). */
  private[graft] val ZFileShift = 18
  /** The canonical 2-D box predicate the audit prunes against:
    * order day ∈ [1200, 1440) × price bucket ∈ [1560, 2340). */
  private[graft] val ZBox = (1200L, 1440L, 1560L, 2340L)

  /** Z-order (Morton) layout audit — the multi-dimensional data-skipping
    * story graded end to end: quantize orders onto a 12-bit × 12-bit
    * (day-number, price-bucket) grid, interleave with the native
    * [[graft.funcs.MortonInterleave]] codegen expression, tile the
    * z-range into 64 "files" (`z >> `[[ZFileShift]]), and report each
    * file's zone map (min/max of BOTH dims) plus whether the canonical
    * 2-D box query [[ZBox]] can prune it. Because z-order clusters both
    * dimensions, the box needs only the handful of tiles its corner
    * coordinates touch — a date-sorted layout prunes on date alone
    * (spec-pinned: a price-only band prunes most z-tiles and ZERO
    * date-linear files). This is Delta/Iceberg `ZORDER BY` + zone-map
    * skipping, expressed as a graded query instead of a table service.
    *
    * All-integer: day diffs, a power-of-two price quantum (exact double
    * scaling, bit-deterministic floor), bit interleave. Scale shape: the
    * assignment is MAP-ONLY per-row codegen; the audit pays ONE bounded
    * shuffle onto ≤ 64 file cells.
    */
  def zorderAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val (x1, x2, y1, y2) = ZBox
    val q = o.select(
      least(datediff(to_date(col("o_orderdate")), lit(ZEpoch).cast("date")),
        lit(4095)).cast("long").as("x"),
      least(floor(col("o_totalprice") / ZPriceQuantum).cast("long"),
        lit(4095L)).as("y"))
    q.select(col("x"), col("y"),
        graft.funcs.MortonInterleave(col("x"), col("y")).as("z"))
      .groupBy(shiftright(col("z"), ZFileShift).as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .withColumn("can_prune",
        col("max_x") < x1 || col("min_x") >= x2 ||
          col("max_y") < y1 || col("min_y") >= y2)
  }

  /** Theil–Sen robust trend of daily event volume per type — the
    * median-of-pairwise-slopes estimator (Theil 1950, Sen 1968), the
    * robust sibling of [[trendSlope]]'s exact-rational OLS: slopes are
    * micro-quantized integers (`(10⁶·Δn) div Δd` — Spark `div` and
    * DuckDB `//` both truncate toward zero, verified on negatives, so
    * the quantization is engine-exact), the median is the
    * `(cnt+1) div 2` order statistic, and the intercept is the median
    * of `10⁶·n − slope·d` over days. Up to ~29% outlier days cannot
    * move it — the property the spec pins by planting one.
    *
    * Scale shape: the corpus collapses to the bounded (type, day)
    * frame first; the pairwise self-join and both median windows run
    * over days² per type (~435 pairs for a month) regardless of corpus
    * size.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame =
    theilSenOn(dailyByTypeShared(spark, dir))

  /** The (event_type, d, n) daily collapse shared by the whole
    * drift/trend family ([[theilSen]], [[cusumDays]], [[mannKendall]])
    * and its streaming face ([[graft.streaming.StreamingMonitors]]) —
    * ONE definition, so the batch operators and the maintained cell
    * state cannot drift. Additive: cells from any slicing of the input
    * sum to the full frame (the StreamingMonitors contract).
    */
  private[graft] def dailyByTypeOf(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"))

  /** Session-scoped memo for the daily (type, day, n) collapse — the
    * substring-memo discipline (DataOps.substringMemo) applied to the
    * statistics family: ~11 graded tests (Theil–Sen, CUSUM,
    * Mann–Kendall, L-moments, ANOVA, Kruskal–Wallis, Friedman, Kendall,
    * xcorr, EWMA, forecast backtest) all derive from this ONE
    * days×types-bounded frame, so the events-table scan + shuffle runs
    * once per (session, corpus) instead of once per entry — exactly the
    * persisted daily-cells table a production warehouse maintains.
    * Keys carry the applicationId (no cross-SparkContext leakage); the
    * frame is eagerly localCheckpointed so consumers replay a
    * materialized RDD. Hashes unchanged by construction: the same
    * expression tree over the same input.
    */
  private val dailyMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def dailyByTypeShared(spark: SparkSession, dir: String): DataFrame =
    dailyMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$dir",
      _ => dailyByTypeOf(t(spark, dir, "events")).localCheckpoint(true))

  /** The ZERO-FILLED types × observed-days frame the omnibus tests
    * (ANOVA, Kruskal–Wallis, Friedman) all condition on — memoized for
    * the same reason as the daily cells: three graded entries build the
    * identical balanced frame, so the spine/types distincts and the
    * fill join run once. The base daily frame is hoisted OUT of the
    * mapping function (computeIfAbsent must never re-enter the map).
    */
  private def filledDailyShared(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyByTypeShared(spark, dir)
    dailyMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$dir|filled",
      _ => {
        val spine = daily.select(col("d")).distinct()
        val types = daily.select(col("event_type")).distinct()
        broadcast(types).crossJoin(spine)
          .join(daily, Seq("event_type", "d"), "left")
          .na.fill(0L, Seq("n"))
          .localCheckpoint(true)
      })
  }

  /** The estimator on an explicit (event_type, d, n) daily frame — the
    * spec's outlier-robustness test injects a corrupted day here.
    */
  private[graft] def theilSenOn(daily: DataFrame): DataFrame = {
    daily.cache()
    try {
      val p = daily.as("a")
        .join(daily.as("b"), col("a.event_type") === col("b.event_type") &&
          col("a.d") < col("b.d"))
        .select(col("a.event_type").as("event_type"),
          (col("b.n") - col("a.n")).as("dy"), (col("b.d") - col("a.d")).as("dx"))
        .withColumn("sm", expr("(1000000 * dy) div dx"))
      val byType = Window.partitionBy(col("event_type"))
      def medianOf(d: DataFrame, c: String, as: String): DataFrame =
        d.withColumn("rn", row_number().over(byType.orderBy(col(c))))
          .withColumn("cnt", count(lit(1)).over(byType))
          .filter(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("event_type"), col(c).as(as))
      val slope = medianOf(p, "sm", "slope_micro")
      val ic = medianOf(
        daily.join(slope, "event_type")
          .select(col("event_type"),
            (lit(1000000L) * col("n") - col("slope_micro") * col("d")).as("b0")),
        "b0", "intercept_micro")
      daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
        .withColumn("n_pairs", expr("(n_days * (n_days - 1)) div 2"))
        .join(slope, "event_type").join(ic, "event_type")
        .localCheckpoint(true)
    } finally { daily.unpersist(blocking = false); () }
  }

  /** CUSUM change-point scan (Page 1954) over daily event volume — the
    * drift detector next to [[anomalousDays]]' point-outlier MAD gate:
    * a level SHIFT spreads small deviations over many days (no single
    * day trips a MAD fence), but their running sum drifts, and the day
    * where |S_d| peaks is the classic change-point estimate. All
    * integer: the per-type mean is micro-quantized
    * (`(10⁶·total) div n_days`), S_d = Σ (10⁶·n − μ) is an exact
    * BIGINT, and the peak row is a deterministic (|S| DESC, day) rank.
    * Output is the full bounded series with `is_peak` marking the
    * estimated change day.
    *
    * Scale shape: the corpus collapses to the (type, day) frame first;
    * the cumsum window, the 1-row-per-type mean broadcast, and the
    * peak rank all ride one event_type partitioning.
    */
  def cusumDays(spark: SparkSession, dir: String): DataFrame =
    cusumDaysOn(dailyByTypeShared(spark, dir))

  /** The scan on an explicit (event_type, d, n) daily frame — the
    * spec's planted-level-shift test drives it directly.
    */
  private[graft] def cusumDaysOn(daily: DataFrame): DataFrame = {
    val mu = daily.groupBy(col("event_type"))
      .agg(expr("(1000000 * sum(n)) div count(*)").as("mu_micro"))
    val byType = Window.partitionBy(col("event_type"))
    daily.join(broadcast(mu), "event_type")
      .withColumn("s_micro",
        sum(lit(1000000L) * col("n") - col("mu_micro"))
          .over(byType.orderBy(col("d"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_peak",
        row_number().over(byType.orderBy(abs(col("s_micro")).desc, col("d"))) === 1)
      .select(col("event_type"), col("d"), col("n"), col("s_micro"),
        col("is_peak"))
  }

  /** Candidate functional-dependency audit — the data-profiling family
    * (Papenbrock et al. 2015's FD-discovery benchmark suite) as a
    * graded query: for each candidate `lhs → rhs`, the lhs group count
    * and how many groups see MORE than one distinct rhs (violations);
    * `holds` = zero violations. The candidates exercise both outcomes:
    * the PK laws event_id → user_id / event_type (must hold — this IS
    * the uniqueness check a pipeline runs before trusting a merge key)
    * and the expected-to-fail control user_id → event_type. Each
    * candidate is one partial-distinct aggregation collapsing to a
    * single row; the union is 3 rows.
    */
  def fdAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    def cand(lhs: String, rhs: String): DataFrame =
      e.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("d"))
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("d") > 1, 1)).as("n_violating"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_groups"), col("n_violating"))
        .withColumn("holds", col("n_violating") === 0L)
    Seq(("event_id", "user_id"), ("event_id", "event_type"),
      ("user_id", "event_type"))
      .map { case (l, r) => cand(l, r) }.reduce(_ unionByName _)
  }

  /** Hash-sample group estimator (the AQP/BlinkDB pattern): per event
    * type, exact count + exact integer-cents value sum next to ×16
    * extrapolations from the deterministic 1/16 universe sample
    * (md5(event_id) mod 16 = 0). The sample is a pure function of the
    * row key, so at 100 TB it can be PERSISTED as a 1/16-size table
    * that answers dashboards at 16× scan speed — and because the draw
    * is keyed (not `TABLESAMPLE`'s partition-random), the same rows are
    * sampled on every engine, every run, and every joined table that
    * shares the key. Grading both the exact and estimated columns makes
    * the estimator's fidelity itself a graded value.
    *
    * One partial-aggregable shuffle; cents are per-row-rounded BIGINTs
    * (the q7 cents discipline) so every sum is engine-exact.
    */
  def hashSampleEst(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (pmod(conv(substring(md5(concat(lit("samp:"),
          col("event_id").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(16)) === 0).as("in_samp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"),
        sum(col("cents")).as("cents_exact"),
        count(when(col("in_samp"), 1)).as("n_sample"),
        (count(when(col("in_samp"), 1)) * 16).as("n_est"),
        (coalesce(sum(when(col("in_samp"), col("cents"))), lit(0L)) * 16)
          .as("cents_est"))

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975) over daily event
    * volume per type — the nonparametric significance companion to
    * [[theilSen]]'s slope estimate (the two are the classic pairing:
    * M-K says WHETHER a monotone trend exists, Theil–Sen says how
    * steep): S = Σ_{i<j} sign(n_j − n_i) over day pairs, with the
    * concordant/discordant/tied split that S summarizes. All integer —
    * sign, counts and S are exact BIGINTs, so the cross-engine hash is
    * definitionally stable; `trend` is the sign of S.
    *
    * Scale shape: identical to [[theilSen]] — the corpus collapses to
    * the bounded (type, day) frame before the days²/2 pair join, so
    * the pair count is ~435 for a month of days regardless of corpus
    * size, and the two operators can share one daily materialization
    * in a composed pipeline.
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendallOn(dailyByTypeShared(spark, dir))

  /** The test on an explicit (event_type, d, n) daily frame — the
    * spec's planted-monotone-series law drives it directly.
    */
  private[graft] def mannKendallOn(daily: DataFrame): DataFrame = {
    daily.cache()
    try {
      daily.as("a")
        .join(daily.as("b"), col("a.event_type") === col("b.event_type") &&
          col("a.d") < col("b.d"))
        .select(col("a.event_type").as("event_type"),
          signum(col("b.n") - col("a.n")).cast("long").as("sgn"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("sgn")).as("s_stat"),
          count(when(col("sgn") === 1, 1)).as("n_concordant"),
          count(when(col("sgn") === -1, 1)).as("n_discordant"),
          count(when(col("sgn") === 0, 1)).as("n_tied"))
        .withColumn("trend",
          when(col("s_stat") > 0, "inc").when(col("s_stat") < 0, "dec")
            .otherwise("none"))
        .localCheckpoint(true)
    } finally { daily.unpersist(blocking = false); () }
  }

  /** Event-type affinity as set-vector geometry — per type pair, the
    * cosine² and Jaccard of the two types' distinct-user sets, both
    * ppm-quantized integers (cos² = n₁₂²/(n₁·n₂) avoids the square
    * root): the co-occurrence-similarity face next to
    * [[basketAffinity]]'s probabilistic lift. Cosine normalizes away
    * the popularity imbalance lift keeps; the two disagree exactly when
    * one type is rare.
    *
    * Scale shape: one distinct collapse to (type, user), then the
    * pair join rides the same user_id keying; output is ≤ types²/2
    * cells. (At extreme user counts n₁₂²·10⁶ wants DECIMAL headroom;
    * BIGINT holds to ~10⁸ co-users.)
    */
  def typeCosine(spark: SparkSession, dir: String): DataFrame = {
    val du = t(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
    du.cache()
    try {
      val n = du.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
      du.as("a")
        .join(du.as("b"), col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("n_common"))
        .join(broadcast(n.select(col("event_type").as("t1"),
          col("nu").as("n1"))), "t1")
        .join(broadcast(n.select(col("event_type").as("t2"),
          col("nu").as("n2"))), "t2")
        .withColumn("cos2_ppm",
          expr("(1000000 * n_common * n_common) div (n1 * n2)"))
        .withColumn("jaccard_ppm",
          expr("(1000000 * n_common) div (n1 + n2 - n_common)"))
        .select(col("t1"), col("t2"), col("n1"), col("n2"),
          col("n_common"), col("cos2_ppm"), col("jaccard_ppm"))
        .localCheckpoint(true)
    } finally { du.unpersist(blocking = false); () }
  }

  /** L-moments of daily event volume per type (Hosking 1990) — the
    * order-statistics moment family next to [[trimmedStats]] and the
    * MAD fence: L-scale (l2) and the L-CV/L-skewness ratios (t2, t3)
    * are what hydrology and robust-stats practice fit distributions
    * with, because unlike conventional moments every L-moment exists
    * whenever the mean does and a single outlier moves them linearly,
    * not cubically. Everything is EXACT integer arithmetic: the
    * probability-weighted sums S₀ = Σx, S₁ = Σ(i−1)x, S₂ = Σ(i−1)(i−2)x
    * over the (n, d)-ranked daily frame give l1 = S₀/nd,
    * l2 = (2S₁−(nd−1)S₀)/(nd(nd−1)), t3 = (6S₂−6(nd−2)S₁+(nd−1)(nd−2)S₀)
    * / ((nd−2)(2S₁−(nd−1)S₀)) — micro/ppm-quantized by integer `div`
    * (truncation toward zero verified cross-engine on negatives, the
    * theilSen discipline; t3 CAN be negative).
    *
    * Scale shape: the corpus collapses to the bounded daily frame; the
    * rank window and one fold ride a single event_type partitioning.
    */
  def lMoments(spark: SparkSession, dir: String): DataFrame =
    lMomentsOn(dailyByTypeShared(spark, dir))

  /** The moments on an explicit (event_type, d, n) daily frame. */
  private[graft] def lMomentsOn(daily: DataFrame): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    daily
      .withColumn("i", row_number().over(byType.orderBy(col("n"), col("d"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("s0"),
        sum((col("i") - 1) * col("n")).as("s1"),
        sum((col("i") - 1) * (col("i") - 2) * col("n")).as("s2"))
      .select(col("event_type"), col("nd").as("n_days"),
        expr("(1000000 * s0) div nd").as("l1_micro"),
        expr("CASE WHEN nd >= 2 THEN " +
          "(1000000 * (2*s1 - (nd-1)*s0)) div (nd * (nd-1)) END")
          .as("l2_micro"),
        expr("CASE WHEN nd >= 2 THEN " +
          "(1000000 * (2*s1 - (nd-1)*s0)) div ((nd-1) * s0) END")
          .as("t2_ppm"),
        expr("CASE WHEN nd >= 3 AND (2*s1 - (nd-1)*s0) != 0 THEN " +
          "(1000000 * (6*s2 - 6*(nd-2)*s1 + (nd-1)*(nd-2)*s0)) " +
          "div ((nd-2) * (2*s1 - (nd-1)*s0)) END").as("t3_ppm"))
  }

  /** Customer revenue Lorenz curve — the money-side concentration
    * report next to the doc-count Gini/HHI: per thousand-dollar
    * lifetime-spend bucket, the customer count, exact cents mass, and
    * the cumulative customer/revenue shares in ppm (the two Lorenz
    * coordinates — "the top X% of customers carry Y% of revenue" reads
    * straight off consecutive rows). All integer: cents are per-row
    * rounded BIGINTs (the q7 discipline), shares are `div`-quantized
    * cumulative sums.
    *
    * Scale shape: one corpus shuffle onto per-customer totals, a second
    * partial-aggregable collapse onto the value-domain-bounded spend
    * buckets; the cumulative window and the share projection move only
    * that bounded frame.
    */
  def revenueLorenz(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      .select(expr("cents div 100000").as("spend_k"), col("cents"))
      .groupBy(col("spend_k"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("cents_sum"))
    cells.cache()
    try {
      val tot = cells.agg(sum(col("n_customers")).as("tc"),
        sum(col("cents_sum")).as("tv"))
      val w = Window.orderBy(col("spend_k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.crossJoin(broadcast(tot))
        .withColumn("cum_cust", sum(col("n_customers")).over(w))
        .withColumn("cum_cents", sum(col("cents_sum")).over(w))
        // revenue share folds cents → whole dollars before the ppm
        // multiply: 10⁶ × total CENTS overflows BIGINT already at sf1
        // (3.4e19); dollars buy 100× headroom and the quantization is
        // identical in both engines, so the hash still matches
        .select(col("spend_k"), col("n_customers"), col("cents_sum"),
          expr("(1000000 * cum_cust) div tc").as("cum_cust_ppm"),
          expr("(1000000 * (cum_cents div 100)) div (tv div 100)")
            .as("cum_cents_ppm"))
        .localCheckpoint(true)
    } finally { cells.unpersist(blocking = false); () }
  }

  /** Benford expected first-digit frequencies, ppm-quantized — computed
    * ONCE in Scala and shared verbatim between the Spark literal frame
    * and the oracle's interpolated VALUES (the ringPoints one-definition
    * discipline), so the float log10 never runs in either engine's
    * query.
    */
  private[graft] val BenfordPpm: Seq[(Long, Long)] =
    (1 to 9).map(d => d.toLong -> math.round(math.log10(1.0 + 1.0 / d) * 1e6))

  /** Benford first-digit audit of order totals — the fraud/data-entry
    * screen (Benford 1938; Nigrini's audit practice) as a graded query:
    * observed first-digit counts of the whole-dollar totals against the
    * log10(1+1/d) law, with a per-digit integer divergence term
    * ((obs_ppm − exp_ppm)² div exp_ppm, the χ²/n summand in nano
    * units). The synthetic totals are uniform, NOT Benford — the audit
    * correctly reports the big digit-1..4 excess, which is exactly what
    * it is for.
    *
    * Scale shape: one partial-aggregable shuffle onto ≤ 9 digit cells;
    * the expected table is a 9-row literal broadcast.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val exp = spark.createDataFrame(BenfordPpm).toDF("digit", "exp_ppm")
    // the 9-cell digit collapse is the ONE corpus shuffle — cached so
    // the total does not re-run the scan
    val o = t(spark, dir, "orders")
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    o.cache()
    try {
      val tot = o.agg(sum(col("n_orders")).as("n"))
      broadcast(exp).join(o, Seq("digit"), "left")
        .na.fill(0L, Seq("n_orders"))
        .crossJoin(broadcast(tot))
        .withColumn("obs_ppm", expr("(1000000 * n_orders) div n"))
        .withColumn("dev_nano",
          expr("((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) div exp_ppm"))
        .select(col("digit"), col("n_orders"), col("obs_ppm"),
          col("exp_ppm"), col("dev_nano"))
        .localCheckpoint(true)
    } finally { o.unpersist(blocking = false); () }
  }

  /** Day-over-day active-user Jaccard — the churn monitor next to
    * [[retentionCohorts]]' first-seen framing: for each consecutive day
    * pair, the exact overlap, union and ppm-quantized Jaccard of the
    * two days' distinct user sets. A stable product sits near 0.8; a
    * bot wave or an outage drops it from both sides.
    *
    * Scale shape: one distinct collapse to the (day, user) frame, then
    * a co-partitioned equi-join on (user_id, day+1) — the same one
    * shuffle family — folding straight onto ≤ |days| cells; the day
    * totals broadcast back.
    */
  def jaccardDays(spark: SparkSession, dir: String): DataFrame = {
    val du = t(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    du.cache()
    try {
      val n = du.groupBy(col("day")).agg(count(lit(1)).as("nu"))
      val i = du.as("a")
        .join(du.as("b"), col("a.user_id") === col("b.user_id") &&
          date_add(col("a.day"), 1) === col("b.day"))
        .groupBy(col("a.day").as("day"))
        .agg(count(lit(1)).as("n_common"))
      n.withColumnRenamed("nu", "n_today")
        .join(n.select(date_sub(col("day"), 1).as("day"),
          col("nu").as("n_next")), "day")
        .join(i, Seq("day"), "left")
        .na.fill(0L, Seq("n_common"))
        .withColumn("n_union",
          col("n_today") + col("n_next") - col("n_common"))
        .withColumn("jaccard_ppm", expr("(1000000 * n_common) div n_union"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_today"), col("n_next"), col("n_common"), col("n_union"),
          col("jaccard_ppm"))
        .localCheckpoint(true)
    } finally { du.unpersist(blocking = false); () }
  }

  /** Equi-depth histogram of order totals — the CBO statistics face
    * next to [[fdAudit]] and the sketch join-size estimators: 16
    * buckets of (count, lo, hi, ndv) over whole-dollar order totals,
    * the structure an optimizer consults for selectivity. Depth is
    * assigned at VALUE granularity (a tied value never splits across
    * buckets): with cum(v) the running count through value v, the
    * whole group lands in bucket `((cum−1)·16) div N + 1` — all
    * integer, so bucket membership is engine-exact with no ntile
    * order-dependence on ties.
    *
    * Scale shape: the corpus collapses to the (dollar → count)
    * histogram first — bounded by the VALUE DOMAIN (~450k cells for
    * TPC-H totals), not the row count, the [[graft.queries.DataOps]]
    * quality-deciles argument — and the single-partition cumulative
    * window plus the final 16-cell fold run on that bounded frame.
    * At 100 TB the histogram is the same ~450k cells.
    */
  def equiDepthHist(spark: SparkSession, dir: String): DataFrame = {
    // the dollar histogram is the ONE corpus shuffle — cached so the
    // total and the bucketing pass reuse it instead of re-scanning
    val h = t(spark, dir, "orders")
      .select(floor(col("o_totalprice")).cast("long").as("dollar"))
      .groupBy(col("dollar")).agg(count(lit(1)).as("c"))
    h.cache()
    try {
      val tot = h.agg(sum(col("c")).as("n"))
      h.crossJoin(broadcast(tot))
        .withColumn("cm", sum(col("c")).over(Window.orderBy(col("dollar"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("bucket", expr("((cm - 1) * 16) div n + 1"))
        .groupBy(col("bucket"))
        .agg(sum(col("c")).as("n_rows"),
          min(col("dollar")).as("lo_dollar"),
          max(col("dollar")).as("hi_dollar"),
          count(lit(1)).as("n_distinct"))
        .localCheckpoint(true)
    } finally { h.unpersist(blocking = false); () }
  }

  /** Exact per-day distinct users via 32-bit bitmap words — the
    * MERGEABLE exact-distinct shape (the roaring-bitmap warehouse
    * trick, e.g. Doris/ClickHouse bitmap aggregates): user ids land in
    * word `uid div 32`, bit `uid % 32`; `bit_or` over (day, word) is a
    * partial-aggregable integer aggregate, and popcount-sum recovers
    * the EXACT distinct count. Where `count(distinct)` reshuffles raw
    * (day, user) pairs on every re-aggregation, the word cells ADD
    * across slices (`bit_or` again) — the additive-cell contract that
    * makes exact distincts maintainable incrementally and mergeable
    * across partitions/days at 100 TB. n_words audits the compression
    * (cells moved vs distincts counted).
    *
    * Scale shape: one partial-aggregable shuffle onto (day, word) —
    * bounded by days × (id-domain/32), independent of event count —
    * then a days-bounded popcount collapse.
    */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    // bit index via the double-% floor-mod idiom, written IDENTICALLY in
    // the oracle: a negative user_id would otherwise make Spark's
    // shiftleft wrap the (negative) shift amount where DuckDB's <<
    // raises, and div/% rounding would pick different words — the
    // word is then exact truncating division of (user_id - bit), a
    // multiple of 32 in both engines regardless of sign.
    t(spark, dir, "events")
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        expr("(user_id - ((user_id % 32 + 32) % 32)) div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST((user_id % 32 + 32) % 32 AS INT))")
          .as("m"))
      .groupBy(col("day"), col("word"))
      .agg(expr("bit_or(m)").as("mask"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_words"),
        sum(bit_count(col("mask")).cast("long")).as("n_users"))

  /** Seasonal-naive forecast backtest (MASE discipline, Hyndman &
    * Koehler 2006): per event type, walk the daily-count series and
    * score two zero-parameter forecasters — naive (yesterday's count)
    * and seasonal-naive (the count 7 days ago) — on every day where
    * both are defined. MAE in micro-events by integer div;
    * `mase_ppm` = Σ|seasonal err| / Σ|naive err| in ppm, the
    * scale-free ratio (< 1M means weekly seasonality is real signal).
    * The spine is the FULL calendar range sequence(min d, max d) —
    * not just observed days — so lag(n, 7) is always 7 calendar days
    * and a day with zero events across ALL types still scores as a
    * zero observation instead of silently compressing the horizon.
    *
    * Scale shape: one partial-aggregable shuffle to the (type, day)
    * cells; the spine fill, lags and the final fold all move the
    * days × types bounded frame.
    */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyByTypeShared(spark, dir)
    daily.cache()
    try {
      // dense calendar spine: one bounded-agg row exploded to the day
      // range, so all-types-quiet days still appear as zeros
      val spine = daily.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("d"))
      val types = daily.select(col("event_type")).distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      val filled = broadcast(types).crossJoin(spine)
        .join(daily, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("n"))
      filled
        .withColumn("f1", lag(col("n"), 1).over(w))
        .withColumn("f7", lag(col("n"), 7).over(w))
        .filter(col("f7").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          sum(abs(col("n") - col("f1"))).as("ae1"),
          sum(abs(col("n") - col("f7"))).as("ae7"))
        .select(col("event_type"), col("n_eval"),
          expr("(1000000 * ae1) div n_eval").as("mae_naive_micro"),
          expr("(1000000 * ae7) div n_eval").as("mae_seasonal_micro"),
          expr("CASE WHEN ae1 > 0 THEN (1000000 * ae7) div ae1 END")
            .as("mase_ppm"))
        .localCheckpoint(true)
    } finally { daily.unpersist(blocking = false); () }
  }

  /** Dyadic window width for [[ewmaDaily]]: weights 2⁻ᵏ beyond k = 30
    * are < 10⁻⁹ — invisible at milli quantization — so the trailing
    * window is truncated there, which simultaneously (a) keeps the
    * milli-scaled numerator within BIGINT for daily cells up to ~4M
    * events (the 2⁴⁰ first cut overflowed exactly here at sf1) and
    * (b) bounds the join fan-out to 31 rows per cell at any horizon.
    */
  private[graft] val EwmaLagMax = 30

  /** One-way ANOVA F-statistic for daily volume across event types —
    * "do the types differ in LEVEL at all?", the omnibus question the
    * pairwise rank/KS tests condition on. Balanced by construction (the
    * zero-filled spine gives every type the same D days), which is what
    * makes the statistic EXACT: with A = k·ΣS_g² − S² (= kD·SSB) and
    * B = Σ_g(D·Q_g − S_g²) (= D·SSW) from the integer per-group sums,
    * F = A·(n−k) / (k·(k−1)·B) — one integer ratio, milli-quantized,
    * DECIMAL(38) intermediates for headroom.
    *
    * Scale shape: one partial-aggregable shuffle to (type, day) cells;
    * the group sums, the two scalars and the fold move the bounded
    * frame.
    */
  def anovaTypes(spark: SparkSession, dir: String): DataFrame = {
    val filled = filledDailyShared(spark, dir)
    locally {
      val g = filled.groupBy(col("event_type"))
        .agg(count(lit(1)).as("dd"), sum(col("n")).as("sg"),
          sum(col("n") * col("n")).as("qg"))
      g.agg(count(lit(1)).as("k"), max(col("dd")).as("d"),
          sum(col("sg")).as("s"),
          sum(col("sg") * col("sg")).as("ssg2"),
          sum(col("dd") * col("qg") - col("sg") * col("sg")).as("b"))
        .select(col("k"), col("d"), (col("k") * col("d")).as("n"),
          expr("k * ssg2 - s * s").as("a"), col("b"))
        .select(col("k"), col("d"), col("n"), col("a"), col("b"),
          expr("""CASE WHEN b > 0 AND k > 1 THEN
                    CAST((1000 * CAST(a AS DECIMAL(38,0)) * (n - k))
                      div (CAST(k AS DECIMAL(38,0)) * (k - 1) * b) AS BIGINT)
                  END""").as("f_milli"))
        .localCheckpoint(true)
    }
  }

  /** Kruskal–Wallis H (Kruskal & Wallis 1952) for daily volume across
    * event types — the RANK-based omnibus companion to [[anovaTypes]]:
    * ANOVA asks whether the type LEVELS differ assuming comparable
    * variances; H asks whether the rank distributions differ at all —
    * robust to the heavy-tailed daily counts the level test is not.
    * Exact integers throughout, two tricks:
    * (a) DOUBLED mid-ranks — the tied average rank F + (c+1)/2 is a
    *     half-integer, so the engine carries r₂ = 2F + c + 1 (always
    *     integer) straight off the pooled value histogram, and the
    *     doubled pooled mean is exactly N + 1;
    * (b) the variance-identity form H = (N−1)·SSB_rank/SST_rank, which
    *     IS the tie-corrected H (the 12/N(N+1) textbook form divided by
    *     the tie factor) — no separate Σ(t³−t) correction term, no
    *     float anywhere until the one milli-quantizing div. Balanced by
    *     the zero-filled spine (n_g = D for every type), so
    *     h_milli = 1000·(N−1)·Σ_g(S₂g − D(N+1))² div (D·Σᵢ(r₂ᵢ − (N+1))²).
    *
    * Scale shape: one partial-aggregable shuffle to the (type, day)
    * cells; the pooled histogram, the doubled-rank map-back (broadcast,
    * value-domain-bounded), the group sums and the two scalar folds all
    * move bounded frames. (BIGINT headroom: SSB ≤ k·(2ND)² — safe past
    * 10⁴ days × 10² types.)
    */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val filled = filledDailyShared(spark, dir)
    locally {
      val hist = filled.groupBy(col("n")).agg(count(lit(1)).as("c"))
      // bounded frame (distinct daily-count values): the
      // single-partition window is the documented qualityDeciles
      // exception
      val ranked = hist.withColumn("f",
          coalesce(sum(col("c")).over(Window.orderBy(col("n"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("n"), (lit(2L) * col("f") + col("c") + 1).as("r2"))
      val withR = filled.join(broadcast(ranked), "n")
      val g = withR.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("r2")).as("rank_sum2"))
      val kd = g.agg(count(lit(1)).as("k"), max(col("n_days")).as("dd"))
        .select(col("k"), col("dd"), (col("k") * col("dd")).as("nn"))
      val b = withR.crossJoin(broadcast(kd))
        .agg(max(col("nn")).as("nn"), max(col("dd")).as("dd"),
          sum(expr("(r2 - (nn + 1)) * (r2 - (nn + 1))")).as("bsum"))
      val a = g.crossJoin(broadcast(kd))
        .agg(sum(expr(
          "(rank_sum2 - dd * (nn + 1)) * (rank_sum2 - dd * (nn + 1))"))
          .as("asum"))
      g.crossJoin(broadcast(b)).crossJoin(broadcast(a))
        .select(col("event_type"), col("n_days"), col("rank_sum2"),
          expr("""CASE WHEN bsum > 0
                  THEN (1000 * (nn - 1) * asum) div (dd * bsum) END""")
            .as("h_milli"))
        .localCheckpoint(true)
    }
  }

  /** Friedman test (Friedman 1937) for daily volume across event types —
    * the WITHIN-BLOCKS companion to [[kruskalWallis]]: each DAY is a
    * block, types are ranked against each other inside their own day,
    * so a global volume trend (which inflates pooled-rank tests) cancels
    * entirely and only the consistent type ordering is scored. Same two
    * integer tricks: doubled within-day mid-ranks (2F + c + 1 off the
    * per-day value histogram; per-cell doubled mean = k + 1 exactly) and
    * the variance-identity tie-corrected form
    * chi2 = (k−1)·Σ_g(S₂g − D(k+1))² / Σcells(r₂ − (k+1))²
    * — both sums carry the same doubled-rank factor 4, so this IS
    * Conover's tie-corrected T = (k−1)·Σ_j(R_j − D(k+1)/2)² /
    * Σᵢⱼ(Rᵢⱼ − (k+1)/2)², which without ties reduces to the textbook
    * 12/(Dk(k+1))·ΣR_j² − 3D(k+1); milli-quantized by one div.
    *
    * Scale shape: one partial-aggregable shuffle to (type, day) cells;
    * the per-day rank histogram, the map-back join and both scalar folds
    * move days-bounded frames (the within-day window partitions by day —
    * k rows per partition, never a single-partition sort).
    */
  def friedmanTest(spark: SparkSession, dir: String): DataFrame = {
    val filled = filledDailyShared(spark, dir)
    locally {
      val hist = filled.groupBy(col("d"), col("n")).agg(count(lit(1)).as("c"))
      val ranked = hist.withColumn("f",
          coalesce(sum(col("c")).over(
            Window.partitionBy(col("d")).orderBy(col("n"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("d"), col("n"), (lit(2L) * col("f") + col("c") + 1).as("r2"))
      val withR = filled.join(ranked, Seq("d", "n"))
      val g = withR.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("r2")).as("rank_sum2"))
      val kd = g.agg(count(lit(1)).as("k"), max(col("n_days")).as("dd"))
      val sst = withR.crossJoin(broadcast(kd))
        .agg(max(col("k")).as("k"), max(col("dd")).as("dd"),
          sum(expr("(r2 - (k + 1)) * (r2 - (k + 1))")).as("sst"))
      val ssb = g.crossJoin(broadcast(kd))
        .agg(sum(expr(
          "(rank_sum2 - dd * (k + 1)) * (rank_sum2 - dd * (k + 1))"))
          .as("ssb"))
      g.crossJoin(broadcast(sst)).crossJoin(broadcast(ssb))
        .select(col("event_type"), col("n_days"), col("rank_sum2"),
          expr("""CASE WHEN sst > 0
                  THEN (1000 * (k - 1) * ssb) div sst END""")
            .as("chi2_milli"))
        .localCheckpoint(true)
    }
  }

  /** Kendall tau-b for the daily-volume trend, per type — the
    * tie-corrected NORMALIZED coefficient next to [[mannKendallOn]]'s
    * raw S statistic (S alone is not comparable across series lengths;
    * tau-b ∈ [−1, 1] is): over all day pairs, concordant minus
    * discordant over √(n₀(n₀ − n₂)) where n₀ = pair count and n₂ =
    * value-tied pairs (day ties cannot exist — the x-side correction
    * drops out). The counts are exact integers off the same pair join;
    * only the final ratio runs in float, IEEE-pinned (the xcorr/spearman
    * argument).
    *
    * Scale shape: the pair join runs on the days-bounded daily frame —
    * quadratic in DAYS, not events, the Mann-Kendall bound.
    */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyByTypeShared(spark, dir)
    daily.cache()
    try {
      daily.as("a")
        .join(daily.as("b"), col("a.event_type") === col("b.event_type") &&
          col("a.d") < col("b.d"))
        .select(col("a.event_type").as("event_type"),
          signum(col("b.n") - col("a.n")).cast("long").as("sgn"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n0"),
          count(when(col("sgn") === 1, 1)).as("n_c"),
          count(when(col("sgn") === -1, 1)).as("n_d"),
          count(when(col("sgn") === 0, 1)).as("n_tied"))
        .select(col("event_type"), col("n0"), col("n_c"), col("n_d"),
          col("n_tied"),
          expr("""CASE WHEN n0 > n_tied THEN
                    CAST(floor(1000 * CAST(n_c - n_d AS DOUBLE)
                      / sqrt(CAST(n0 AS DOUBLE) * CAST(n0 - n_tied AS DOUBLE)))
                      AS BIGINT)
                  END""").as("tau_milli"))
        .localCheckpoint(true)
    } finally { daily.unpersist(blocking = false); () }
  }

  /** Lagged cross-correlation between the view and purchase daily
    * series (±3-day lags) — the lead/lag question behind campaign
    * analysis: do views PREDICT purchases k days out (peak at positive
    * lag) or trail them? Per lag, Pearson's r over all spine days where
    * both shifted series exist: the six moment sums are exact BIGINTs
    * off the zero-filled (day → count) cells, num/denx/deny exact, and
    * only the final ratio runs in float — r_milli =
    * floor(1000·num/√(denx·deny)) with cast and operation order pinned
    * identically in both engines (IEEE-correctly-rounded double ops on
    * equal integer inputs, the spearman/kmeans argument).
    *
    * Scale shape: one partial-aggregable shuffle to the two daily
    * series; the 7-lag replication, the shifted join and the fold all
    * move the days-bounded frame.
    */
  def xcorrDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyByTypeShared(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
    daily.cache()
    try {
      val spine = daily.select(col("d")).distinct()
      def series(tpe: String, out: String) = spine
        .join(daily.filter(col("event_type") === tpe), Seq("d"), "left")
        .na.fill(0L, Seq("n")).select(col("d"), col("n").as(out))
      val x = series("view", "x")
      val y = series("purchase", "y").withColumnRenamed("d", "dy")
      val lags = spark.range(-3, 4).select(col("id").as("lag"))
      x.crossJoin(broadcast(lags))
        .join(y, col("d") + col("lag") === col("dy"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("lag"), col("n_days"),
          expr("n_days * sxy - sx * sy").as("num"),
          expr("n_days * sxx - sx * sx").as("denx"),
          expr("n_days * syy - sy * sy").as("deny"))
        .select(col("lag"), col("n_days"),
          expr("""CASE WHEN denx > 0 AND deny > 0 THEN
                    CAST(floor(1000 * CAST(num AS DOUBLE)
                      / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)))
                      AS BIGINT)
                  ELSE 0 END""").as("r_milli"))
        .localCheckpoint(true)
    } finally { daily.unpersist(blocking = false); () }
  }

  /** EWMA-smoothed daily volume per type, EXACTLY: with α = 1/2 every
    * weight is a dyadic rational, so the trailing-[[EwmaLagMax]]-day
    * smoother is a ratio of two BIGINTs — numerator Σ n₍d₋k₎·2⁽³⁰⁻ᵏ⁾,
    * denominator Σ 2⁽³⁰⁻ᵏ⁾ over the PRESENT spine days — and
    * `ewma_milli` is one integer div. No float powers, no recurrence
    * (Spark has no running-state window), no cross-engine drift: the
    * closed form makes the sequential filter a plain bounded
    * range-join, the same move as the bucketed as-of join. The spread
    * between n and its EWMA is the classic volume-drift monitor next
    * to [[cusumDaysOn]]'s change-point scan.
    *
    * Scale shape: one partial-aggregable shuffle to (type, day) cells;
    * the lag join replicates that bounded frame ≤ 31×.
    */
  def ewmaDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyByTypeShared(spark, dir)
    daily.cache()
    try {
      daily.as("a")
        .join(daily.as("b"), col("b.event_type") === col("a.event_type") &&
          col("b.d") <= col("a.d") && col("b.d") > col("a.d") - (EwmaLagMax + 1))
        .select(col("a.event_type").as("event_type"), col("a.d").as("d"),
          col("a.n").as("n"),
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST($EwmaLagMax - (a.d - b.d) AS INT))")
            .as("wgt"),
          (col("b.n") * expr(s"shiftleft(CAST(1 AS BIGINT), CAST($EwmaLagMax - (a.d - b.d) AS INT))"))
            .as("contrib"))
        .groupBy(col("event_type"), col("d"))
        .agg(max(col("n")).as("n"), sum(col("contrib")).as("num"),
          sum(col("wgt")).as("den"))
        .select(col("event_type"), col("d"), col("n"),
          expr("(1000 * num) div den").as("ewma_milli"),
          expr("abs(1000 * n - (1000 * num) div den)").as("spread_milli"))
        .localCheckpoint(true)
    } finally { daily.unpersist(blocking = false); () }
  }
}
