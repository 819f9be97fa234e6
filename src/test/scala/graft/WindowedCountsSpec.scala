package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.Article
import graft.streaming.StreamingIngest

/** Event-time windowed aggregation with a real watermark: hourly counts
  * emit once the watermark passes the window end (append mode), and rows
  * later than the allowance are dropped with their window state evicted.
  */
class WindowedCountsSpec extends SparkSpec {
  import spark.implicits._

  private def art(link: String, pub: String): Article =
    Article(link, link, "t", Some("A"), Timestamp.valueOf(pub), "Skift",
      Timestamp.valueOf("2025-08-03 00:00:00"))

  test("hourly windows emit on watermark passage; late rows are dropped") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Article]
    val q = StreamingIngest.windowedCounts(
        mem.toDF().toDF(graft.model.ArticleSchema.columns: _*), lateness = "1 day")
      .writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .start()

    // two articles in the 10:00 hour, then one far ahead to advance the
    // watermark past that window's end
    mem.addData(art("a", "2025-08-01 10:05:00"), art("b", "2025-08-01 10:20:00"))
    q.processAllAvailable()
    mem.addData(art("c", "2025-08-03 12:00:00"))
    q.processAllAvailable()
    mem.addData(art("d", "2025-08-03 13:00:00")) // one more trigger to flush
    q.processAllAvailable()

    val emitted = spark.table("win_counts")
      .selectExpr("window.start AS ws", "count").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    emitted("2025-08-01 10:00:00.0") shouldBe 2L

    // a row 2+ days late: beyond the 1-day allowance, state evicted —
    // no new emission for its (closed) window may ever appear
    mem.addData(art("e", "2025-08-01 10:40:00"))
    q.processAllAvailable()
    mem.addData(art("f", "2025-08-03 14:00:00"))
    q.processAllAvailable()
    val again = spark.table("win_counts")
      .filter($"window.start" === "2025-08-01 10:00:00").collect()
    again.length shouldBe 1 // still only the original emission, count 2
    again(0).getLong(2) shouldBe 2L
    q.stop()
  }

  test("hopping windows: each article lands in size/slide = 2 emitted cells") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Article]
    val q = StreamingIngest.hoppingCounts(
        mem.toDF().toDF(graft.model.ArticleSchema.columns: _*),
        lateness = "1 day")
      .writeStream.outputMode("append")
      .format("memory").queryName("hop_counts")
      .start()

    // two articles in the 10:00 half-hour → windows 09:30 and 10:00 both
    // hold 2; then far-future rows flush the watermark past both ends
    mem.addData(art("a", "2025-08-01 10:05:00"), art("b", "2025-08-01 10:20:00"))
    q.processAllAvailable()
    mem.addData(art("c", "2025-08-03 12:00:00"))
    q.processAllAvailable()
    mem.addData(art("d", "2025-08-03 13:00:00"))
    q.processAllAvailable()

    val emitted = spark.table("hop_counts")
      .selectExpr("window.start AS ws", "count").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    emitted("2025-08-01 09:30:00.0") shouldBe 2L
    emitted("2025-08-01 10:00:00.0") shouldBe 2L
    // batch equivalence: the same rows through the batch window() plan
    import org.apache.spark.sql.functions.{col, window => win, count => cnt}
    val batch = Seq(art("a", "2025-08-01 10:05:00"), art("b", "2025-08-01 10:20:00"))
      .toDF().toDF(graft.model.ArticleSchema.columns: _*)
      .groupBy(win(col(graft.model.ArticleSchema.NewsPublishedTime),
        "1 hour", "30 minutes"))
      .agg(cnt(org.apache.spark.sql.functions.lit(1)).as("n")).collect()
      .map(r => (r.getStruct(0).getTimestamp(0).toString, r.getLong(1))).toMap
    batch.foreach { case (ws, n) => emitted(ws) shouldBe n }
    q.stop()
  }
}
