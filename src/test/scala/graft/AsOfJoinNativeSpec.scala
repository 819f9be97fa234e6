package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin
import graft.queries.{RefOps, Tables}

/** The native as-of operator carries the graded `asof_join`/
  * `asof_join_forward` entries (r11); the composed union+window form
  * (`RefOps.asofJoinComposed` / `asofJoinForwardComposed`) is the
  * executable specification it must agree with EXACTLY on the real
  * events table. Also pins the SortMergeJoin shuffle shape and the
  * null / no-match / self-join edges the operator contract promises.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  import spark.implicits._

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, Option[Long])] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("graded native path equals the composed union+window spec at two SFs") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      withClue(s"$sf: ") {
        rowSet(RefOps.asofJoin(spark, sf)) shouldBe
          rowSet(RefOps.asofJoinComposed(spark, sf))
      }
    }
  }

  test("forward graded path equals the composed forward spec (time negation)") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      withClue(s"$sf: ") {
        rowSet(RefOps.asofJoinForward(spark, sf)) shouldBe
          rowSet(RefOps.asofJoinForwardComposed(spark, sf))
      }
    }
  }

  test("the graded entries execute through AsOfJoinExec") {
    for ((name, q) <- Seq(
        "asof_join" -> (RefOps.asofJoin _),
        "asof_join_forward" -> (RefOps.asofJoinForward _))) {
      val plan = q(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      withClue(s"$name: ") { plan should include("AsOfJoin") }
    }
  }

  test("plans as AsOfJoinExec over two sorted, co-partitioned children") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val plan = AsOfJoin.asof(c, "user_id", "ts", p, "p_user", "p_ts")
      .queryExecution.executedPlan.toString
    plan should include("AsOfJoin")
    // one keyed Exchange + Sort per side — the SortMergeJoin shape
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 2
    "Sort ".r.findAllIn(plan).length shouldBe 2
  }

  test("no prior row, exact-tie inclusion, and null keys null-extend") {
    val l = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 100L, 12L))
      .toDF("k", "t", "l_id")
    val r = Seq((1L, 100L, 20L), (1L, 150L, 21L), (3L, 50L, 22L))
      .toDF("k", "t", "r_id").select(col("k").as("rk"), col("t").as("rt"), col("r_id"))
    val got = AsOfJoin.asof(l, "k", "t", r, "rk", "rt")
      .select(col("l_id"), col("r_id"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // t=100 matches the equal-time purchase (<=); t=200 takes the later
    // 150 one; key 2 has no right rows at all
    got shouldBe Map(10L -> 20L, 11L -> 21L, 12L -> -1L)
  }

  test("self-join on the same source frame carries distinct attribute ids") {
    val e = Seq((1L, 10L, 100L), (1L, 20L, 101L)).toDF("k", "t", "id")
    val out = AsOfJoin.asof(e, "k", "t", e, "k", "t")
    // every row matches itself (equal time included); columns stay addressable
    out.count() shouldBe 2L
    out.columns.length shouldBe 6
  }
}
