package graft

import org.apache.spark.sql.functions._

import graft.queries.{Relational, Tables}

/** r13d operator batch — the last TPC-H shapes, completing all 22: Q8
  * market share, Q9 product profit, Q11 global-scalar HAVING, Q20
  * nested-IN decorrelation, Q21 EXISTS/NOT-EXISTS strict-latest. Exact
  * cross-engine equality is the driver's DuckDB oracle; these pin the
  * decorrelation equivalences against direct (correlated-style)
  * re-derivations.
  */
class Round13dOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q8_market_share: nation share is bounded by total and sums re-derive") {
    val out = Relational.q8MarketShare(spark, sf).cache()
    out.filter(col("nation_cents") > col("total_cents") ||
      col("nation_cents") < 0).count() shouldBe 0L
    // independent recount of the joined-line population
    val lines = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part").filter(col("p_type") === "STANDARD"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sf, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .count()
    out.agg(sum(col("n_lines"))).head.getLong(0) shouldBe lines
    out.count() should be > 0L
    out.unpersist()
    ()
  }

  test("q9_product_profit: grouped profits equal a row-level recomputation") {
    val rows = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part").filter(col("p_name").contains("red")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(spark, sf, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, sf, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long") -
          col("l_quantity").cast("long") *
          round(col("p_retailprice") * 100).cast("long"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Relational.q9ProductProfit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe expect
    got.size should be > 0
  }

  test("q11_important_parts: exactly the parts over twice the mean value") {
    // sf0.01: sf0.001 has no NATION_7 supplier at all — the frame is
    // empty there regardless of threshold
    val sf = "/root/testdata/sf0.01"
    val value = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, sf, "nation").filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = value.map(_._2).sum
    val n = value.length.toLong
    val expect = value.filter { case (_, v) => v * n > 2L * total }.toMap
    val got = Relational.q11ImportantParts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expect
    got.size should be > 0
  }

  test("q20_excess_suppliers: every winner supplied more than a quarter of some promo part") {
    val pl = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(Tables(spark, sf, "part").filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val partQ = pl.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expect = pl.groupBy(r => (r._1, r._2)).collect {
      case ((pk, sk), rs) if 4L * rs.map(_._3).sum > partQ(pk) => sk
    }.toSet
    val got = Relational.q20ExcessSuppliers(spark, sf).collect()
      .map(_.getLong(0)).toSet
    got shouldBe expect
    got.size should be > 0
  }

  test("q21_waiting_suppliers: counts equal the EXISTS/NOT-EXISTS definition") {
    val perOS = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      // string-cast dodges the driver's unstable timestamp flavor
      // (TIMESTAMP vs NTZ); the render sorts like the instant
      .agg(max(col("l_shipdate")).cast("string").as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // the correlated form, literally: supplier s waits on order o iff
    // SOME other supplier exists on o and NO other supplier shipped >= s
    val byOrder = perOS.groupBy(_._1)
    val expect = perOS.flatMap { case (o, s, ms) =>
      val others = byOrder(o).filter(_._2 != s)
      if (others.nonEmpty && others.forall(_._3 < ms)) Some(s) else None
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Relational.q21WaitingSuppliers(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got shouldBe expect
    got.size should be > 0
  }
}
