package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational, Tables}

/** r13n operator batch — Benford first-digit audit, day-over-day user
  * Jaccard, KS two-sample length test, host-graph triangle enumeration.
  * Exact cross-engine equality is the driver's DuckDB oracle; these pin
  * each operator's defining law.
  */
class Round13nOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("benford_audit: all nine digits, counts total, ppm shares consistent") {
    val rows = Relational.benfordAudit(spark, sf).collect()
      .sortBy(_.getAs[Long]("digit"))
    rows.map(_.getAs[Long]("digit")).toSeq shouldBe (1L to 9L)
    val n = rows.map(_.getAs[Long]("n_orders")).sum
    n shouldBe Tables(spark, sf, "orders").count()
    rows.foreach { r =>
      r.getAs[Long]("obs_ppm") shouldBe 1000000L * r.getAs[Long]("n_orders") / n
      val d = r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm")
      r.getAs[Long]("dev_nano") shouldBe d * d / r.getAs[Long]("exp_ppm")
    }
    // the ONE shared definition: the expected table IS the Scala literal
    rows.map(r => r.getAs[Long]("digit") -> r.getAs[Long]("exp_ppm"))
      .toSeq shouldBe Relational.BenfordPpm
  }

  test("jaccard_days: set algebra bounds hold on every consecutive day pair") {
    val rows = Relational.jaccardDays(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nt, nn, nc, nu) = (r.getAs[Long]("n_today"), r.getAs[Long]("n_next"),
        r.getAs[Long]("n_common"), r.getAs[Long]("n_union"))
      nc should be <= math.min(nt, nn)
      nu shouldBe nt + nn - nc
      nu should be >= math.max(nt, nn)
      r.getAs[Long]("jaccard_ppm") shouldBe 1000000L * nc / nu
    }
  }

  test("ks_test: D bounded in (0, 1M) ppm and largest for the most skewed language") {
    val rows = DataOps.ksTest(spark, sf).collect()
    rows.length should be > 1
    rows.foreach { r =>
      r.getAs[Long]("d_ppm") should be >= 0L
      r.getAs[Long]("d_ppm") should be < 1000000L
    }
    // the pooled CDF is a lang-weighted mix, so no single lang can match
    // it exactly here (distinct strata, finite samples)
    rows.map(_.getAs[Long]("d_ppm")).max should be > 0L
  }

  test("host_triangles: oriented output, every edge of every triangle exists") {
    val tri = DataOps.hostTriangles(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    tri.foreach { case (a, b, c) => a should be < b; b should be < c }
    tri.toSet.size shouldBe tri.length // each triangle found exactly once
    val (_, edges) = DataOps.hostGraph(spark, sf)
    val und = edges.select(least(col("src"), col("dst")),
        greatest(col("src"), col("dst"))).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    tri.foreach { case (a, b, c) =>
      und should contain(a -> b)
      und should contain(b -> c)
      und should contain(a -> c)
    }
    // completeness: count triangles the spec's own way from the edge set
    val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expect = und.toSeq.map { case (a, b) =>
      nbrs(a).intersect(nbrs(b)).count(c => c > b)
    }.sum
    tri.length shouldBe expect
  }
}
