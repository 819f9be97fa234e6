package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational, Tables}

/** r13m operator batch — Mann–Kendall trend test, Gini concentration,
  * rank-sum shift test, equi-depth histogram, Kneser–Ney continuation
  * counts, largest-remainder allocation. Exact cross-engine equality is
  * the driver's DuckDB oracle; these pin each operator's defining law.
  */
class Round13mOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("mann_kendall: pair split is total and a planted monotone series maxes S") {
    import spark.implicits._
    val rows = Relational.mannKendall(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Long]("n_concordant") + r.getAs[Long]("n_discordant") +
        r.getAs[Long]("n_tied") shouldBe r.getAs[Long]("n_pairs")
      r.getAs[Long]("s_stat") shouldBe
        (r.getAs[Long]("n_concordant") - r.getAs[Long]("n_discordant"))
    }
    // strictly increasing volumes: every pair concordant, S = n_pairs
    val up = Seq.tabulate(10)(i => ("t", i.toLong, (100 + i).toLong))
      .toDF("event_type", "d", "n")
    val m = Relational.mannKendallOn(up).collect().head
    m.getAs[Long]("s_stat") shouldBe 45L
    m.getAs[Long]("n_pairs") shouldBe 45L
    m.getAs[String]("trend") shouldBe "inc"
  }

  test("source_gini: zero on uniform cells, approaches max on single-source") {
    import spark.implicits._
    val uniform = Seq.tabulate(4)(i => ("en", s"s$i", 25L))
      .toDF("lang", "source", "c")
    DataOps.sourceGiniOn(uniform).collect()
      .head.getAs[Long]("gini_ppm") shouldBe 0L
    // one source holds everything across n=4 sources: G = (n-1)/n = 0.75
    val single = (Seq(("en", "s0", 97L)) ++
      Seq.tabulate(3)(i => ("en", s"t$i", 1L))).toDF("lang", "source", "c")
    val g = DataOps.sourceGiniOn(single).collect().head.getAs[Long]("gini_ppm")
    g should be > 700000L
    g should be < 750000L
    val corpus = DataOps.sourceGini(spark, sf).collect()
    corpus.foreach { r =>
      r.getAs[Long]("gini_ppm") should be >= 0L
      r.getAs[Long]("gini_ppm") should be < 1000000L
    }
  }

  test("rank_sum: doubled rank sums pool to N(N+1) and U stays in range") {
    val rows = DataOps.rankSumLengths(spark, sf).collect()
    val nTotal = rows.map(_.getAs[Long]("n")).sum
    rows.map(_.getAs[Long]("r2x")).sum shouldBe nTotal * (nTotal + 1)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      // doubled U in [0, 2·n·(N−n)]
      r.getAs[Long]("u2x") should be >= 0L
      r.getAs[Long]("u2x") should be <= 2 * n * (nTotal - n)
    }
  }

  test("equi_depth_hist: 16 non-overlapping buckets covering every row") {
    val rows = Relational.equiDepthHist(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    rows.map(_.getAs[Long]("bucket")).toSeq shouldBe (1L to 16L)
    rows.map(_.getAs[Long]("n_rows")).sum shouldBe
      Tables(spark, sf, "orders").count()
    rows.sliding(2).foreach { case Array(a, b) =>
      a.getAs[Long]("hi_dollar") should be < b.getAs[Long]("lo_dollar")
    }
    // depth balance: value-granular ties can only shift a bucket by the
    // largest single value-group, tiny next to the 1/16 depth
    val depths = rows.map(_.getAs[Long]("n_rows"))
    depths.max.toDouble / depths.min should be < 1.35
  }

  test("kn_continuation: continuation counts fold back to the distinct-bigram total") {
    val rows = DataOps.knContinuation(spark, sf).collect()
    val nd = rows.map(_.getAs[Long]("left_cont")).sum
    // every distinct bigram contributes exactly one left context…
    rows.map(_.getAs[Long]("right_cont")).sum shouldBe nd
    // …and the ppm quantization is against that same total
    rows.foreach { r =>
      r.getAs[Long]("p_cont_ppm") shouldBe
        1000000L * r.getAs[Long]("left_cont") / nd
    }
  }

  test("exact_allocation: totals exactly AllocK with every stratum within one slot of quota") {
    val rows = DataOps.exactAllocation(spark, sf).collect()
    rows.map(_.getAs[Long]("alloc")).sum shouldBe DataOps.AllocK.toLong
    val t = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      val quota = DataOps.AllocK.toDouble * r.getAs[Long]("n_docs") / t
      math.abs(r.getAs[Long]("alloc") - quota) should be < 1.0
      r.getAs[Long]("extra") should (be(0L) or be(1L))
      r.getAs[Long]("alloc") shouldBe
        r.getAs[Long]("base") + r.getAs[Long]("extra")
    }
  }
}
