package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational, Tables}

/** r13q operator batch — mergeable bitmap exact-distinct, t-closeness,
  * seasonal-naive forecast backtest, exact dyadic EWMA. Exact
  * cross-engine equality is the driver's DuckDB oracle; these pin each
  * operator's defining law.
  */
class Round13qOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("bitmap_distinct: popcount-sum equals count(distinct) exactly, words compress") {
    val r = Relational.bitmapDistinct(spark, sf)
    val truth = Tables(spark, sf, "events")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("t"))
    val j = r.join(truth, "day").collect()
    j.length should be > 0
    j.foreach { row =>
      row.getAs[Long]("n_users") shouldBe row.getAs[Long]("t")
      // each 32-bit word holds >= 1 user, so words never exceed users —
      // and the whole point is words ≪ users on dense id domains
      row.getAs[Long]("n_words") should be <= row.getAs[Long]("n_users")
    }
  }

  test("bitmap_distinct: word cells are additive across slices (the mergeable contract)") {
    val ev = Tables(spark, sf, "events")
    val whole = Relational.bitmapDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    // recombine the two halves' word masks with bit_or — the counts
    // must land exactly on the whole-table run (no over/undercount)
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        expr("user_id div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").as("m"))
      .groupBy(col("day"), col("word")).agg(expr("bit_or(m)").as("mask"))
    val merged = cells(ev.filter(col("event_id") % 2 === 0))
      .unionByName(cells(ev.filter(col("event_id") % 2 === 1)))
      .groupBy(col("day"), col("word")).agg(expr("bit_or(mask)").as("mask"))
      .groupBy(col("day"))
      .agg(sum(bit_count(col("mask")).cast("long")).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    merged shouldBe whole
  }

  test("t_closeness: EMD is a ppm in [0, 1M], zero iff the class mirrors the corpus") {
    val rows = DataOps.tCloseness(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val e = r.getAs[Long]("emd_ppm")
      e should be >= 0L
      e should be <= 1000000L
      r.getAs[Boolean]("exceeds_t") shouldBe (e > DataOps.TClosePpm)
    }
    // class sizes partition the corpus
    rows.map(_.getAs[Long]("n_c")).sum shouldBe
      Tables(spark, sf, "documents").count()
    // t-closeness sits BELOW the coarser rungs in information: some
    // class must be nonzero (the synthetic corpus is not length-uniform
    // across (lang, source) cells), else the operator measures nothing
    rows.map(_.getAs[Long]("emd_ppm")).max should be > 0L
  }

  test("forecast_backtest: horizon, MAE recomputation and the MASE ratio law") {
    val rows = Relational.forecastBacktest(spark, sf).collect()
    rows.length should be > 0
    val nDays = Tables(spark, sf, "events")
      .select(to_date(col("ts"))).distinct().count()
    rows.foreach { r =>
      // the zero-filled spine pins every type to the same horizon
      r.getAs[Long]("n_eval") shouldBe (nDays - 7)
      r.getAs[Long]("mae_naive_micro") should be >= 0L
      r.getAs[Long]("mae_seasonal_micro") should be >= 0L
    }
    // independent recomputation of one type's MAE pair via plain lag
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, sf, "events")
      .filter(col("event_type") === "click")
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("d"))
    val l = daily
      .withColumn("f1", lag(col("n"), 1).over(w))
      .withColumn("f7", lag(col("n"), 7).over(w))
      .filter(col("f7").isNotNull)
      .agg(count(lit(1)).as("ne"), sum(abs(col("n") - col("f1"))).as("ae1"),
        sum(abs(col("n") - col("f7"))).as("ae7"))
      .collect().head
    // clicks happen every day at this SF, so the spine fill is a no-op
    // for this type and the plain-lag recomputation must agree
    val click = rows.find(_.getString(0) == "click").get
    click.getAs[Long]("mae_naive_micro") shouldBe
      1000000L * l.getAs[Long]("ae1") / l.getAs[Long]("ne")
    click.getAs[Long]("mae_seasonal_micro") shouldBe
      1000000L * l.getAs[Long]("ae7") / l.getAs[Long]("ne")
    click.getAs[Long]("mase_ppm") shouldBe
      1000000L * l.getAs[Long]("ae7") / l.getAs[Long]("ae1")
  }

  test("ewma_daily: first day is its own EWMA; smoothing stays inside the window hull") {
    val rows = Relational.ewmaDaily(spark, sf).collect()
    rows.length should be > 0
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("d"))
      val first = sorted.head
      // day one: the trailing window holds only itself
      first.getAs[Long]("ewma_milli") shouldBe 1000L * first.getAs[Long]("n")
      first.getAs[Long]("spread_milli") shouldBe 0L
      // convexity: a weighted mean of window values never leaves their hull
      sorted.foreach { r =>
        val d = r.getAs[Long]("d")
        val win = sorted.filter(x => x.getAs[Long]("d") <= d &&
          x.getAs[Long]("d") > d - (Relational.EwmaLagMax + 1))
          .map(_.getAs[Long]("n"))
        val e = r.getAs[Long]("ewma_milli")
        e should be >= 1000L * win.min - 1 // floor-div slack
        e should be <= 1000L * win.max
        r.getAs[Long]("spread_milli") shouldBe
          math.abs(1000L * r.getAs[Long]("n") - e)
      }
    }
  }
}
