package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, RefOps, Relational, Tables}

/** r13o operator batch — sliding-window HLL serving face, type-pair set
  * cosine, L-moments, all-pairs KS matrix. Exact cross-engine equality
  * is the driver's DuckDB oracle; these pin each operator's defining law.
  */
class Round13oOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("hll_sliding_7d: window merge equals a from-scratch sketch of the window") {
    val rows = RefOps.hllSliding(spark, sf).collect()
    rows.length should be > 0
    // associativity: pick the max day; max-merging its trailing-7 daily
    // registers must equal hashing the window's events directly
    val e = Tables(spark, sf, "events").withColumn("d",
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long"))
    val dMax = e.agg(max(col("d"))).head.getLong(0)
    val direct = RefOps.hllFromRegisters(RefOps.hllRegistersOf(
        e.filter(col("d") > dMax - 7 && col("d") <= dMax)))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("v_zero"), r.getAs[Long]("sum_pow"))).toSet
    rows.filter(_.getAs[Long]("day") == dMax)
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("v_zero"), r.getAs[Long]("sum_pow"))).toSet shouldBe direct
    // fidelity: the small-range-corrected estimate tracks the graded
    // exact count (raw alone sits at ~0.72·m on a nearly-empty sketch)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("n_exact").toDouble
      est should be > exact * 0.5
      est should be < exact * 2.0
    }
  }

  test("type_cosine: every column reproduces from the collected distinct sets") {
    val du = Tables(spark, sf, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = du.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val rows = Relational.typeCosine(spark, sf).collect()
    rows.length shouldBe sets.keys.toSeq.combinations(2).count { p =>
      sets(p.head).intersect(sets(p(1))).nonEmpty
    }
    rows.foreach { r =>
      val (t1, t2) = (r.getAs[String]("t1"), r.getAs[String]("t2"))
      t1 should be < t2
      val (s1, s2) = (sets(t1), sets(t2))
      val n12 = s1.intersect(s2).size.toLong
      r.getAs[Long]("n1") shouldBe s1.size.toLong
      r.getAs[Long]("n2") shouldBe s2.size.toLong
      r.getAs[Long]("n_common") shouldBe n12
      r.getAs[Long]("cos2_ppm") shouldBe
        1000000L * n12 * n12 / (s1.size.toLong * s2.size)
      r.getAs[Long]("jaccard_ppm") shouldBe
        1000000L * n12 / (s1.size + s2.size - n12)
    }
  }

  test("l_moments: known series — uniform 1..5 has t2 = 1/3 and t3 = 0") {
    import spark.implicits._
    val daily = (1 to 5).map(i => ("t", i.toLong, i.toLong))
      .toDF("event_type", "d", "n")
    val m = Relational.lMomentsOn(daily).collect().head
    m.getAs[Long]("l1_micro") shouldBe 3000000L
    m.getAs[Long]("l2_micro") shouldBe 1000000L
    m.getAs[Long]("t2_ppm") shouldBe 333333L
    m.getAs[Long]("t3_ppm") shouldBe 0L
    // corpus sanity: L-CV in (0, 1) for positive data, t3 in (-1, 1)
    Relational.lMoments(spark, sf).collect().foreach { r =>
      r.getAs[Long]("t2_ppm") should be >= 0L
      r.getAs[Long]("t2_ppm") should be < 1000000L
      math.abs(r.getAs[Long]("t3_ppm")) should be < 1000000L
    }
  }

  test("ks_matrix: one pair reproduces from the raw length lists") {
    val rows = DataOps.ksMatrix(spark, sf).collect()
    val langs = rows.flatMap(r => Seq(r.getAs[String]("l1"),
      r.getAs[String]("l2"))).distinct.sorted
    rows.length shouldBe langs.length * (langs.length - 1) / 2
    val data = Tables(spark, sf, "documents")
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byLang = data.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
    val grid = data.map(_._2).distinct.sorted
    def dPpm(a: String, b: String): Long = {
      val (xa, xb) = (byLang(a), byLang(b))
      grid.map { v =>
        math.abs(1000000L * xa.count(_ <= v) / xa.size
          - 1000000L * xb.count(_ <= v) / xb.size)
      }.max
    }
    rows.foreach { r =>
      r.getAs[Long]("d_ppm") shouldBe
        dPpm(r.getAs[String]("l1"), r.getAs[String]("l2"))
    }
  }
}
