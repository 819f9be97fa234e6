package graft

import org.apache.spark.sql.functions._

import graft.queries.{RefOps, Relational, Tables}

/** r13i operator batch — sketch-warehouse faces: the HLL cube's graded
  * merge law, join-size estimation (Count-Min inner product + AMS
  * Tug-of-War median), and the FD-discovery audit. Exact cross-engine
  * equality is the driver's DuckDB oracle; these pin the merge
  * associativity, both estimators' statistical contracts, and the FD
  * definition row-level.
  */
class Round13iOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("hll_sketch_cube: day-partitioned max-merge equals the direct sketch") {
    // associativity/idempotence of the register max — the law that
    // makes a sketch WAREHOUSE (store per-partition, merge on read)
    // equal to resketching the world
    val cube = RefOps.hllSketchCube(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val direct = RefOps.hllDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    cube shouldBe direct
  }

  test("cms_join_est: CM is one-sided, AMS is tight") {
    val rows = RefOps.cmsJoinEst(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (f2, cm, ams) = (r.getLong(1), r.getLong(2), r.getLong(3))
      cm should be >= f2 // Count-Min inner product never undercounts
      r.getBoolean(4) shouldBe true
      // Tug-of-War: unbiased, std ~ F2·sqrt(2/512) ~ 6% — ±25% is >4σ
      math.abs(ams - f2).toDouble should be < 0.25 * f2
    }
  }

  test("fd_audit: the PK laws hold, the control fails, row-level recompute agrees") {
    val got = Relational.fdAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    got(("event_id", "user_id"))._3 shouldBe true
    got(("event_id", "event_type"))._3 shouldBe true
    got(("user_id", "event_type"))._3 shouldBe false
    // recompute the control candidate literally
    val e = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = e.groupBy(_._1).map { case (_, xs) => xs.map(_._2).distinct.size }
    got(("user_id", "event_type"))._1 shouldBe byUser.size.toLong
    got(("user_id", "event_type"))._2 shouldBe byUser.count(_ > 1).toLong
  }
}
