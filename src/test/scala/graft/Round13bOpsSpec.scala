package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational, Tables}

/** r13b operator batch — TPC-H Q4/Q14/Q19/Q22 shapes, exact distributed
  * quantile machinery (weighted median, RFM quartiles), MOSS winnowing.
  * Exact cross-engine equality is the driver's DuckDB oracle; these pin
  * the algorithmic boundaries and the equivalences the oracle's
  * different plan shape does not.
  */
class Round13bOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q4_priority_late: per-priority counts equal the correlated-EXISTS form") {
    val out = Relational.q4PriorityLate(spark, sf)
    // independent derivation: semi-join orders against late LINES (not
    // the per-order max) — same orders by EXISTS semantics
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    val late = Tables(spark, sf, "orders")
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_exists"))
    out.join(late, "o_orderpriority")
      .filter(col("n_late") =!= col("n_exists")).count() shouldBe 0L
    out.count() shouldBe 5L
  }

  test("q14_promo_share: promo never exceeds total; months partition the joined lines") {
    val out = Relational.q14PromoShare(spark, sf).cache()
    out.filter(col("promo_cents") > col("total_cents") ||
      col("promo_cents") < 0).count() shouldBe 0L
    val joined = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"),
        col("l_partkey") === col("p_partkey")).count()
    out.agg(sum(col("n_lines"))).head.getLong(0) shouldBe joined
    out.unpersist()
    ()
  }

  test("q19_bracket_revenue: the disjunction equals the union of its brackets") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .join(Tables(spark, sf, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey")).cache()
    def bracket(b: String, s0: Int, s1: Int, q0: Int, q1: Int) =
      li.filter(col("p_brand") === b && col("p_size").between(s0, s1) &&
        col("l_quantity").between(q0, q1))
    val expectLines = bracket("Brand#13", 1, 15, 1, 20).count() +
      bracket("Brand#20", 5, 30, 10, 35).count() +
      bracket("Brand#25", 15, 50, 25, 50).count()
    val row = Relational.q19BracketRevenue(spark, sf).head
    row.getLong(0) shouldBe expectLines
    row.getLong(0) should be > 0L
    li.unpersist()
    ()
  }

  test("q22_idle_balances: every kept customer is over-threshold and 2001-inactive") {
    val c = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents")).cache()
    val thr = c.filter(col("cents") > 0).agg(avg(col("cents"))).head.getDouble(0)
    val recent = Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    // left-join + isNull re-derivation of the anti join, row-level
    val expected = c.filter(col("cents") > thr)
      .join(recent, col("c_custkey") === col("o_custkey"), "left")
      .filter(col("o_custkey").isNull)
      .groupBy(col("nationkey")).agg(count(lit(1)).as("e_custs"))
    val out = Relational.q22IdleBalances(spark, sf)
    out.join(expected, Seq("nationkey"), "full")
      .filter(col("n_custs").isNull || col("e_custs").isNull ||
        col("n_custs") =!= col("e_custs")).count() shouldBe 0L
    c.unpersist()
    ()
  }

  test("weighted_median: the histogram-frame median equals the row-sort definition") {
    val rows = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (f, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; 2 * cum >= tot }.get._1
      f -> ((med, tot))
    }
    val got = Relational.weightedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe expect
  }

  test("rfm_segments: scores in 1..4, quartile widths differ by at most 1, monotone in the metric") {
    val out = Relational.rfmSegments(spark, sf).cache()
    out.filter(col("r_score") < 1 || col("r_score") > 4 ||
      col("f_score") < 1 || col("f_score") > 4 ||
      col("m_score") < 1 || col("m_score") > 4).count() shouldBe 0L
    // equal-width-by-rank: per dimension the four bucket sizes differ <= 1
    for (c0 <- Seq("r_score", "f_score", "m_score")) {
      val sizes = out.groupBy(col(c0)).count().collect().map(_.getLong(1))
      sizes.length shouldBe 4
      (sizes.max - sizes.min) should be <= 1L
    }
    // monotone: a strictly higher frequency never gets a lower f_score
    val f = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("f_orders"))
    val j = out.join(f, "c_custkey")
      .select(col("f_orders"), col("f_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    j.sliding(2).foreach {
      case Array((fa, sa), (fb, sb)) => if (fb > fa) sb should be >= sa
      case _ => ()
    }
    out.unpersist()
    ()
  }

  test("winnowing: a shared w+k-1 token run guarantees a shared fingerprint") {
    import spark.implicits._
    // w=5, k=4: any shared run of 8 tokens must surface in both docs'
    // selected sets (the structural guarantee of Schleimer et al.)
    val run = (1 to 8).map("r" + _).mkString(" ")
    val d = Seq(
      1L -> s"${(1 to 20).map("a" + _).mkString(" ")} $run",
      2L -> s"$run ${(1 to 20).map("b" + _).mkString(" ")}")
      .toDF("doc_id", "text")
    val sel = DataOps.winnowingSelectedOn(d)
      .select(col("doc_id"), col("fp")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    sel(1L).intersect(sel(2L)) should not be empty
  }

  test("winnowing: selection density is bounded (>= one fp per w windows, <= all grams)") {
    val out = DataOps.winnowing(spark, sf).cache()
    // every doc with >= w grams appears, with 1 <= n_fps <= n_grams-w+1
    out.filter(col("n_fps") < 1).count() shouldBe 0L
    out.filter(col("n_fps") > col("n_grams") - 4).count() shouldBe 0L
    // coverage floor: one selected fp can cover at most w windows
    out.filter(col("n_fps") * 5 < col("n_grams") - 4).count() shouldBe 0L
    out.count() shouldBe
      Tables(spark, sf, "documents")
        .filter(org.apache.spark.sql.functions.size(
          split(col("text"), " ")) >= 8).count()
    out.unpersist()
    ()
  }
}
