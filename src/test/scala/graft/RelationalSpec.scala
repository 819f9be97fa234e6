package graft

import org.apache.spark.sql.functions._

import graft.queries.{Relational, Tables}

/** Invariants for the event-sequence analytics (the DuckDB hash-compare
  * covers exact values; these pin the semantic shape).
  */
class RelationalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("funnel: stages are consistent with the step timestamps and ordered in time") {
    val out = Relational.funnel(spark, sf).cache()
    // one row per user with at least one view
    val viewers = Tables(spark, sf, "events")
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    out.count() shouldBe viewers
    // stage ⇔ which step timestamps are present; steps strictly ordered
    out.filter(col("stage") === 1 && col("ct").isNotNull).count() shouldBe 0L
    out.filter(col("stage") === 2 &&
      (col("ct").isNull || col("pt").isNotNull)).count() shouldBe 0L
    out.filter(col("stage") === 3 && col("pt").isNull).count() shouldBe 0L
    out.filter(col("ct").isNotNull && col("ct") <= col("vt")).count() shouldBe 0L
    out.filter(col("pt").isNotNull && col("pt") <= col("ct")).count() shouldBe 0L
    // each step lands within the 24 h window of the previous
    out.filter(col("ct").isNotNull &&
      col("ct") > col("vt") + 86400000000L).count() shouldBe 0L
    out.filter(col("pt").isNotNull &&
      col("pt") > col("ct") + 86400000000L).count() shouldBe 0L
    out.unpersist()
  }

  test("retention_cohorts: week-0 count equals the cohort's size") {
    val out = Relational.retentionCohorts(spark, sf).cache()
    // every user is active in their own first week by construction
    val cohortSizes = Tables(spark, sf, "events")
      .groupBy("user_id").agg(min(date_trunc("day", col("ts"))).as("d0"))
      .groupBy(date_format(col("d0"), "yyyy-MM-dd").as("cohort"))
      .agg(count(lit(1)).as("n"))
    val wk0 = out.filter(col("wk") === 0).select("cohort", "n_users")
    wk0.join(cohortSizes, "cohort")
      .filter(col("n_users") =!= col("n")).count() shouldBe 0L
    wk0.count() shouldBe cohortSizes.count()
    // later weeks never exceed the cohort size
    out.join(cohortSizes, "cohort")
      .filter(col("n_users") > col("n")).count() shouldBe 0L
    out.unpersist()
  }

  test("window_hopping: every event lands in exactly size/slide = 2 windows") {
    val out = Relational.windowHopping(spark, sf).cache()
    val events = Tables(spark, sf, "events")
    // total window-cell mass is exactly 2× the event count
    out.agg(sum(col("n_events"))).head.getLong(0) shouldBe 2L * events.count()
    // per-type mass doubles too (no type leaks across windows)
    val perType = events.groupBy("event_type").count()
    out.groupBy("event_type").agg(sum(col("n_events")).as("m"))
      .join(perType, "event_type")
      .filter(col("m") =!= col("count") * 2).count() shouldBe 0L
    // window starts sit on the 30-minute slide grid
    out.filter(!col("window_start").endsWith(":00:00") &&
               !col("window_start").endsWith(":30:00")).count() shouldBe 0L
    // distinct users never exceed events in a cell
    out.filter(col("n_users") > col("n_events")).count() shouldBe 0L
    out.unpersist()
  }

  test("event_transitions: mass = events − users, probabilities normalize") {
    val out = Relational.eventTransitions(spark, sf).cache()
    val e = Tables(spark, sf, "events")
    // each user with k events contributes exactly k−1 transitions
    val want = e.count() - e.select("user_id").distinct().count()
    out.agg(sum(col("n_transitions"))).head.getLong(0) shouldBe want
    // per-prev probabilities sum to 1000 within integer-floor slack
    val sums = out.groupBy("prev_type").agg(sum(col("p_milli")).as("s"),
      count(lit(1)).as("k")).collect()
    sums.foreach { r =>
      r.getLong(1) should be <= 1000L
      r.getLong(1) should be > 1000L - r.getLong(2)
    }
    out.unpersist()
  }

  test("keySkewSketch: CMS never under-counts, over-count within the ε bound") {
    val out = Relational.keySkewSketch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.length shouldBe 10
    val n = Tables(spark, sf, "events").count()
    out.foreach { case (_, nTrue, nEst) =>
      nEst should be >= nTrue           // CMS cells only gain mass
      nEst - nTrue should be <= (0.001 * n).toLong + 1 // ε·N slack
    }
  }

  test("rolling_active_7d: trailing window dominates the daily count") {
    val out = Relational.rollingActive(spark, sf).cache()
    val du = Tables(spark, sf, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct().cache()
    // one row per observed day
    out.count() shouldBe du.select("day").distinct().count()
    // the 7-day count can never be below the same day's 1-day count,
    // nor above the total user population
    out.filter(col("n_users_7d") < col("n_users_1d")).count() shouldBe 0L
    val totalUsers = du.select("user_id").distinct().count()
    out.filter(col("n_users_7d") > totalUsers).count() shouldBe 0L
    // golden recompute for the max observed day: union of its trailing week
    val maxDay = out.agg(max(col("day"))).head.getString(0)
    val want = du.filter(col("day") > date_sub(to_date(lit(maxDay)), 7) &&
        col("day") <= to_date(lit(maxDay)))
      .select("user_id").distinct().count()
    out.filter(col("day") === maxDay).head.getLong(2) shouldBe want
    du.unpersist(); out.unpersist()
  }
}
