package graft

import org.apache.spark.sql.functions._

import graft.queries.RefOps

/** Invariants for the operators beyond the DuckDB hash-compare: as-of
  * ordering semantics and KMV estimator sanity.
  */
class RefOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("asof_join: every matched prior purchase is at-or-before its click, same user") {
    val out = RefOps.asofJoin(spark, sf).cache()
    val e = graft.queries.Tables(spark, sf, "events")
    val clicks = e.filter(col("event_type") === "click")
    out.count() shouldBe clicks.count() // left as-of keeps every click
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("prior_purchase"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val joined = out.filter(col("prior_purchase").isNotNull)
      .join(purchases, "prior_purchase")
    joined.filter(col("user_id") =!= col("p_user")).count() shouldBe 0L
    joined.filter(date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss") > col("ts_s"))
      .count() shouldBe 0L
    // and it is the LATEST such purchase: no other same-user purchase sits
    // strictly between the matched one and the click
    val better = joined.as("j").join(purchases.as("q"),
      col("q.p_user") === col("j.user_id") &&
        col("q.p_ts") > col("j.p_ts") &&
        date_format(col("q.p_ts"), "yyyy-MM-dd HH:mm:ss") <= col("j.ts_s"))
    better.count() shouldBe 0L
  }

  test("range_join: bucketed equi-join equals the naive inequality join, no nested loop") {
    val out = RefOps.rangeJoin(spark, sf)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val e = graft.queries.Tables(spark, sf, "events")
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val naive = c.join(p, col("user_id") === col("p_user") &&
        abs(unix_micros(col("c_ts")) - unix_micros(col("p_ts"))) <= 3600L * 1000000L)
      .collect().map(r => (r.getLong(1), r.getLong(4))).toSet
    got shouldBe naive
  }

  test("HLL binding: approx_count_distinct within 10% of exact per key") {
    val out = RefOps.approxDistinctHll(spark, sf).cache()
    out.count() should be > 0L
    out.filter(abs(col("n_hll") - col("n_exact")) >
      greatest(col("n_exact") * 0.1, lit(2))).count() shouldBe 0L
  }

  test("approx_distinct_kmv: estimate is positive and within 3x of exact") {
    val out = RefOps.approxDistinctKmv(spark, sf).cache()
    out.count() should be > 0L
    out.filter(col("est_distinct") <= 0).count() shouldBe 0L
    out.filter(col("est_distinct") > col("n_exact") * 3 ||
      col("est_distinct") * 3 < col("n_exact")).count() shouldBe 0L
  }

  test("eventsSince: raw-nanos branch agrees with typed-timestamp semantics for sub-µs cutoffs") {
    // A cutoff with a 500 ns tail: Spark timestamp literals are µs, so the
    // typed comparison floors it — the raw-nanos branch must floor too, or
    // rows in the first partial microsecond silently disappear.
    val base = graft.queries.Tables(spark, sf, "events")
      .select(min(col("ts"))).head().getTimestamp(0)
    val cutoff = new java.sql.Timestamp(base.getTime)
    cutoff.setNanos(base.getNanos + 500) // non-µs-aligned on purpose
    val raw = graft.queries.Tables.eventsSince(spark, sf, cutoff)
      .select("event_id")
    val typed = graft.queries.Tables(spark, sf, "events")
      .filter(col("ts") >= lit(cutoff)).select("event_id")
    raw.exceptAll(typed).count() shouldBe 0L
    typed.exceptAll(raw).count() shouldBe 0L
    raw.count() should be > 0L // the boundary row itself survives
  }
}
