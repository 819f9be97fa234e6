package graft

import graft.queries.Relational
import graft.streaming.StreamingMonitors

/** r19 graduations: the remaining streaming-monitor replay faces — the
  * anomaly monitor plus the drift/trend trio. Round18OpsSpec pins the
  * replay/memo mechanics; this spec pins each new face's graded ENTRY
  * contract (output equals the batch query exactly) and that the trend
  * trio shares ONE drained daily-cell state (three queries, one drain).
  */
class Round19OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("anomalous_days_stream equals the graded batch query after replay") {
    rows(StreamingMonitors.anomalousDaysStream(spark, sf)) shouldBe
      rows(Relational.anomalousDays(spark, sf))
  }

  test("cusum_days_stream equals the graded batch query after replay") {
    rows(StreamingMonitors.cusumDaysStream(spark, sf)) shouldBe
      rows(Relational.cusumDays(spark, sf))
  }

  test("theil_sen_stream equals the graded batch query after replay") {
    rows(StreamingMonitors.theilSenStream(spark, sf)) shouldBe
      rows(Relational.theilSen(spark, sf))
  }

  test("mann_kendall_stream equals the graded batch query after replay") {
    rows(StreamingMonitors.mannKendallStream(spark, sf)) shouldBe
      rows(Relational.mannKendall(spark, sf))
  }

  test("the trend trio shares one drained daily-cell state") {
    rows(StreamingMonitors.cusumDaysStream(spark, sf)) // ensure drained
    val drains = StreamingMonitors.drainCount.get()
    StreamingMonitors.theilSenStream(spark, sf).collect()
    StreamingMonitors.mannKendallStream(spark, sf).collect()
    StreamingMonitors.drainCount.get() shouldBe drains
  }
}
