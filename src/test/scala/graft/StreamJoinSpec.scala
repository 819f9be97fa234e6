package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamJoin

/** The stream-stream interval join's two load-bearing properties:
  * (1) streamed output over micro-batches equals the equivalent batch
  * range join on the same rows; (2) the range condition + watermarks
  * actually BOUND the join state — buffered rows are evicted once the
  * other side's watermark passes them, which is what separates an
  * unbounded-state join from one that survives an unbounded stream.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  // users 1..3: clicks every 7 min, purchases every 25 min over 2h
  private val clicks = for (u <- 1L to 3L; m <- 0 until 120 by 7)
    yield (u, u * 1000 + m, ts(m))
  private val purchases = for (u <- 1L to 3L; m <- 0 until 120 by 25)
    yield (u, u * 5000 + m, ts(m))

  private def batchExpected: Set[(Long, Long, Long)] = {
    val c = clicks.toDF("user_id", "c_id", "ts")
    val p = purchases.toDF("user_id", "p_id", "p_ts")
    c.join(p, Seq("user_id"))
      .filter(abs(unix_micros(col("ts")) - unix_micros(col("p_ts"))) <= 3600L * 1000000L)
      .select(col("c_id"), col("p_id"),
        (unix_micros(col("ts")) - unix_micros(col("p_ts"))).as("dt_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("streamed interval join equals the batch range join over micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamJoin.clickPurchase(
      cMem.toDF().toDF("user_id", "c_id", "ts"),
      pMem.toDF().toDF("user_id", "p_id", "p_ts"))
    val q = out.writeStream.format("memory").queryName("sj_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-sjoin"))
      .start()
    // interleave in event-time order across four micro-batches — matches
    // must pair rows that arrived in DIFFERENT batches
    val (c1, c2) = clicks.sortBy(_._3.getTime).splitAt(clicks.size / 2)
    val (p1, p2) = purchases.sortBy(_._3.getTime).splitAt(purchases.size / 2)
    cMem.addData(c1: _*); q.processAllAvailable()
    pMem.addData(p1: _*); q.processAllAvailable()
    cMem.addData(c2: _*); q.processAllAvailable()
    pMem.addData(p2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("sj_stream")
      .select("c_id", "p_id", "dt_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe batchExpected
  }

  test("watermark + range condition evict buffered join state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamJoin.clickPurchase(
      cMem.toDF().toDF("user_id", "c_id", "ts"),
      pMem.toDF().toDF("user_id", "p_id", "p_ts"),
      toleranceMin = 10, latenessMin = 5)
    val q = out.writeStream.format("memory").queryName("sj_evict")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-sjevict"))
      .start()
    cMem.addData((1L, 1L, ts(0))); pMem.addData((1L, 2L, ts(0)))
    q.processAllAvailable()
    // advance BOTH watermarks far past the buffered minute-0 rows:
    // state watermark = other side's watermark - (tolerance + lateness)
    cMem.addData((1L, 3L, ts(110))); pMem.addData((1L, 4L, ts(110)))
    q.processAllAvailable()
    cMem.addData((1L, 5L, ts(115))); pMem.addData((1L, 6L, ts(115)))
    q.processAllAvailable()
    q.stop()
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed > 0, "no state rows were ever evicted")
    // and the minute-0 pair still matched before eviction
    spark.table("sj_evict").where(col("c_id") === 1L).count() shouldBe 1L
  }
}
