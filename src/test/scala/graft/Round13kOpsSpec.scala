package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** r13k — CUSUM change-point scan: the drift detector's defining
  * property (a level shift that no single-day outlier gate sees peaks
  * the running sum AT the shift boundary) plus series consistency.
  */
class Round13kOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("cusum_days: series telescopes to ~zero and has exactly one peak per type") {
    val rows = Relational.cusumDays(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    rows.length should be > 0
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.count(_._5) shouldBe 1 // one peak row
      // the final cumsum equals n_days * (mean remainder): within
      // n_days micro-units of zero by the quantized-mean construction
      val last = rs.maxBy(_._2)._4
      math.abs(last) should be < rs.length.toLong * 1000000L
      ()
    }
  }

  test("cusum_days: a planted level shift peaks at the shift boundary") {
    import spark.implicits._
    // a level step 100 -> 200 at day 15: no single day is an outlier
    // against either level, but the running sum bottoms out exactly at
    // the last old-level day — the change-point estimate
    val daily = (0L until 30L)
      .map(d => ("a", d, if (d < 15) 100L else 200L))
      .toDF("event_type", "d", "n")
    val peak = Relational.cusumDaysOn(daily)
      .filter(col("is_peak")).select(col("d")).head().getLong(0)
    peak shouldBe 14L
  }
}
