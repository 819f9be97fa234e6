package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational, Tables}

/** r13t operator batch — the hypothesis-test family: chi-squared
  * independence, balanced one-way ANOVA, Kendall tau-b. Exact
  * cross-engine equality is the driver's DuckDB oracle; these pin each
  * statistic's defining law.
  */
class Round13tOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("chi2_independence: full grid, margins reproduce, contributions nonneg") {
    val rows = DataOps.chi2Independence(spark, sf).collect()
    val langs = rows.map(_.getString(0)).distinct.length
    val srcs = rows.map(_.getString(1)).distinct.length
    rows.length shouldBe langs * srcs // the zero-filled grid, no holes
    rows.foreach(_.getAs[Long]("contrib_ppm") should be >= 0L)
    // observed counts partition the corpus
    rows.map(_.getAs[Long]("o")).sum shouldBe
      Tables(spark, sf, "documents").count()
    // expected counts carry the same mass (milli-quantized: within one
    // milli per cell of the exact total)
    val emSum = rows.map(_.getAs[Long]("e_milli")).sum
    val n = rows.map(_.getAs[Long]("o")).sum
    emSum should be <= 1000L * n
    emSum should be > 1000L * n - rows.length
  }

  test("anova_types: exact decomposition identity and the F ratio law") {
    val r = Relational.anovaTypes(spark, sf).collect().head
    val (k, d, n) = (r.getAs[Long]("k"), r.getAs[Long]("d"), r.getAs[Long]("n"))
    n shouldBe k * d
    val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
    a should be >= 0L // kD*SSB
    b should be >= 0L // D*SSW
    if (b > 0 && k > 1)
      r.getAs[Long]("f_milli") shouldBe
        1000L * a * (n - k) / (k * (k - 1) * b)
    // independent recomputation of B from the raw daily frame
    val daily = Tables(spark, sf, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("dd"))
      .agg(count(lit(1)).as("n")).collect()
    val byType = daily.groupBy(_.getString(0)).view.mapValues { rs =>
      val xs0 = rs.map(_.getAs[Long]("n"))
      // zero-fill to the common spine length
      val xs = xs0 ++ Seq.fill(d.toInt - xs0.length)(0L)
      (xs.sum, xs.map(x => x * x).sum)
    }.toMap
    val bRe = byType.values.map { case (sg, qg) => d * qg - sg * sg }.sum
    bRe shouldBe b
  }

  test("kendall_tau: tau-b in [-1000, 1000], pair identity, agrees in sign with Mann-Kendall S") {
    val rows = Relational.kendallTau(spark, sf).collect()
    val mk = Relational.mannKendall(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("s_stat")).toMap
    rows.length should be > 0
    rows.foreach { r =>
      val (n0, nc, nd, nt) = (r.getAs[Long]("n0"), r.getAs[Long]("n_c"),
        r.getAs[Long]("n_d"), r.getAs[Long]("n_tied"))
      nc + nd + nt shouldBe n0
      val tau = r.getAs[Long]("tau_milli")
      tau should be >= -1000L
      tau should be <= 1000L
      // same pair set, same orientation: tau and S share a sign
      val s = mk(r.getString(0))
      if (s > 0) tau should be >= 0L
      if (s < 0) tau should be <= 0L
      s shouldBe nc - nd // the two operators factor the same pair scan
    }
  }
}
