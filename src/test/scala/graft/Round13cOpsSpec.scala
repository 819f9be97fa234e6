package graft

import org.apache.spark.sql.functions._

import graft.queries.{Relational, Tables}

/** r13c operator batch — the remaining TPC-H shapes (Q6 pushdown scan,
  * Q12 conditional counting, Q13 outer-join distribution, Q15
  * max-with-ties, Q16 distinct-count + NOT-IN blacklist, Q17
  * decorrelated fifth-of-average). Exact cross-engine equality is the
  * driver's DuckDB oracle; these pin the algebraic equivalences and
  * boundary rules the oracle's different plan shape does not.
  */
class Round13cOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q6_forecast_revenue: the aggregate equals a row-level recomputation") {
    val row = Relational.q6ForecastRevenue(spark, sf).head
    val rows = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(round(col("l_extendedprice") * col("l_discount") * 100)
        .cast("long"))
      .collect().map(_.getLong(0))
    row.getLong(0) shouldBe rows.length.toLong
    row.getLong(1) shouldBe rows.sum
    rows.length should be > 0
  }

  test("q12_service_by_delay: buckets partition the joined lines, 0..6 only") {
    val out = Relational.q12ServiceByDelay(spark, sf).cache()
    out.filter(col("delay_bucket") < 0 || col("delay_bucket") > 6)
      .count() shouldBe 0L
    val joined = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    out.agg(sum(col("high_lines") + col("low_lines"))).head.getLong(0) shouldBe
      joined
    // the CASE split is exhaustive and disjoint: re-derive high_lines
    // from a filtered recount
    val hi = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        col("l_orderkey") === col("o_orderkey")).count()
    out.agg(sum(col("high_lines"))).head.getLong(0) shouldBe hi
    out.unpersist()
    ()
  }

  test("q13_customer_distribution: the histogram accounts for every customer and every qualifying order") {
    val out = Relational.q13CustomerDistribution(spark, sf).cache()
    val nCust = Tables(spark, sf, "customer").count()
    val nOrd = Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED").count()
    out.agg(sum(col("n_custs"))).head.getLong(0) shouldBe nCust
    out.agg(sum(col("n_orders") * col("n_custs"))).head.getLong(0) shouldBe nOrd
    // the zero cohort equals customers minus distinct qualifying buyers —
    // the row the inner-join form silently loses
    val buyers = Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey")).distinct().count()
    val zero = out.filter(col("n_orders") === 0)
      .agg(coalesce(sum(col("n_custs")), lit(0L))).head.getLong(0)
    zero shouldBe (nCust - buyers)
    out.unpersist()
    ()
  }

  test("q15_top_supplier: winners carry exactly the true max revenue, ALL ties kept") {
    val rev = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("rc")).cache()
    val trueMax = rev.agg(max(col("rc"))).head.getLong(0)
    val nWinners = rev.filter(col("rc") === trueMax).count()
    val out = Relational.q15TopSupplier(spark, sf).collect()
    out.length.toLong shouldBe nWinners
    out.foreach(_.getLong(2) shouldBe trueMax)
    rev.unpersist()
    ()
  }

  test("q16_part_supplier_counts: negated predicates hold and counts sum to the clean pair set") {
    val out = Relational.q16PartSupplierCounts(spark, sf).cache()
    out.filter(col("p_brand") === "Brand#13" || col("p_type") === "PROMO")
      .count() shouldBe 0L
    out.filter(col("supplier_cnt") < 1).count() shouldBe 0L
    // independent re-derivation: distinct (brand, type, size, suppkey)
    // tuples of the blacklist-cleaned join
    val expect = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(Tables(spark, sf, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables(spark, sf, "part")
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .distinct().count()
    out.agg(sum(col("supplier_cnt"))).head.getLong(0) shouldBe expect
    out.unpersist()
    ()
  }

  test("q17_small_quantity: the integer fifth-of-average cut equals the float-average definition") {
    val rows = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part").filter(col("p_type") === "SMALL"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // q < avg/5 evaluated as the exact rational 5·q·n < Σq — a double
    // 0.2·avg would flap on rows sitting exactly on the ridge
    val agg = rows.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.length.toLong)).toMap
    val kept = rows.filter { case (pk, q, _) =>
      val (s, n) = agg(pk); 5L * q * n < s
    }
    val row = Relational.q17SmallQuantity(spark, sf).head
    row.getLong(0) shouldBe kept.length.toLong
    row.getLong(1) shouldBe kept.map(_._3).sum
    kept.length should be > 0
  }
}
