package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.{RefOps, Tables}
import graft.streaming.Sessionizer
import graft.streaming.Sessionizer.SessionEvent

/** The custom-state sessionizer (flatMapGroupsWithState) against the
  * declarative batch sessionize query: closed sessions must be
  * identical; the open (final) session per user stays in state.
  */
class SessionizerSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("batch flatMapGroupsWithState == SQL sessionize minus each user's open session") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id")).as[SessionEvent]
    val custom = Sessionizer.sessions(ev)
      .select("user_id", "session_id", "start_s", "end_s", "n_events")
    val sql = RefOps.sessionize(spark, sf)
    // the custom path keeps each user's LAST session open (in state)
    val lastPer = sql.groupBy("user_id").agg(max("session_id").as("session_id"))
    val sqlClosed = sql.join(lastPer, Seq("user_id", "session_id"), "left_anti")
    custom.exceptAll(sqlClosed).count() shouldBe 0L
    sqlClosed.exceptAll(custom).count() shouldBe 0L
  }

  test("streaming: state carries an open session across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = Sessionizer.sessions(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_stream")
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    // batch 1: two events 10 min apart — one open session, nothing emitted
    mem.addData(SessionEvent(7, t("2024-01-01 10:00:00"), 1),
                SessionEvent(7, t("2024-01-01 10:10:00"), 2))
    q.processAllAvailable()
    spark.table("sessions_stream").count() shouldBe 0L
    // batch 2: an event 2 h later closes the first session (2 events)
    mem.addData(SessionEvent(7, t("2024-01-01 12:10:00"), 3))
    q.processAllAvailable()
    val rows = spark.table("sessions_stream").collect()
    rows.length shouldBe 1
    rows(0).getLong(0) shouldBe 7L        // user_id
    rows(0).getLong(1) shouldBe 1L        // session_id
    rows(0).getString(2) shouldBe "2024-01-01 10:00:00"
    rows(0).getString(3) shouldBe "2024-01-01 10:10:00"
    rows(0).getLong(4) shouldBe 2L        // n_events
    q.stop()
  }

  test("expiring: event-time timeout closes an idle session and drops its state") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionsExpiring(mem.toDS(), gapSec = 60,
        lateness = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_exp")
      .option("checkpointLocation", tmpDir("ckpt-sess-exp"))
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    // batch 1: user 7's session (2 events, 30 s apart) — still open
    mem.addData(SessionEvent(7, t("2024-01-01 10:00:00"), 1),
                SessionEvent(7, t("2024-01-01 10:00:30"), 2))
    q.processAllAvailable()
    spark.table("sessions_exp").count() shouldBe 0L
    // batch 2: an UNRELATED user's event advances the watermark past
    // user 7's gap boundary (10:01:30) — the event-time clock has proven
    // the gap elapsed, so user 7's session closes WITHOUT any user-7
    // event arriving, and its state is dropped
    mem.addData(SessionEvent(8, t("2024-01-01 10:30:00"), 3))
    q.processAllAvailable()
    val rows = spark.table("sessions_exp").collect()
    rows.length shouldBe 1
    rows(0).getLong(0) shouldBe 7L
    rows(0).getString(2) shouldBe "2024-01-01 10:00:00"
    rows(0).getString(3) shouldBe "2024-01-01 10:00:30"
    rows(0).getLong(4) shouldBe 2L
    // state now holds ONLY user 8's open session (user 7 evicted)
    val lastRows = q.recentProgress.reverse.collectFirst {
      case p if p.stateOperators.nonEmpty => p.stateOperators(0).numRowsTotal
    }
    lastRows shouldBe Some(1L)
    q.stop()
  }

  test("expiring: session ids stay unique across eviction; late in-gap events don't regress bounds") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionsExpiring(mem.toDS(), gapSec = 60,
        lateness = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_exp2")
      .option("checkpointLocation", tmpDir("ckpt-sess-exp2"))
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    // user 7 session A ([10:00:00, 10:00:30], inside the 60 s gap), then
    // a LATE but admissible in-gap event (10:00:10 arrives after
    // 10:00:30 — within the 10-minute lateness): bounds must stay
    // [10:00:00, 10:00:30], not end at the late event
    mem.addData(SessionEvent(7, t("2024-01-01 10:00:00"), 1),
                SessionEvent(7, t("2024-01-01 10:00:30"), 2))
    q.processAllAvailable()
    mem.addData(SessionEvent(7, t("2024-01-01 10:00:10"), 3))
    q.processAllAvailable()
    // advance event time far past session A's gap boundary → A evicts...
    mem.addData(SessionEvent(8, t("2024-01-01 11:00:00"), 4))
    q.processAllAvailable()
    // ...then user 7 starts session B, which also closes via timeout
    mem.addData(SessionEvent(7, t("2024-01-01 12:00:00"), 5))
    q.processAllAvailable()
    mem.addData(SessionEvent(8, t("2024-01-01 13:00:00"), 6))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions_exp2")
      .filter(col("user_id") === 7).orderBy("start_s").collect()
    rows.length shouldBe 2
    rows(0).getString(2) shouldBe "2024-01-01 10:00:00" // start not regressed
    rows(0).getString(3) shouldBe "2024-01-01 10:00:30" // end not regressed
    rows(0).getLong(4) shouldBe 3L                      // late event counted
    // distinct ids across the eviction boundary (start-millis keying)
    rows.map(_.getLong(1)).distinct.length shouldBe 2
  }

  test("expiring: a straggler from before the open session's window is dropped, not merged") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionsExpiring(mem.toDS(), gapSec = 60,
        lateness = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_strag")
      .option("checkpointLocation", tmpDir("ckpt-sess-strag"))
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    // session A closes in-stream when B's first event exceeds the gap
    mem.addData(SessionEvent(7, t("2024-01-01 10:00:00"), 1),
                SessionEvent(7, t("2024-01-01 10:00:30"), 2))
    q.processAllAvailable()
    mem.addData(SessionEvent(7, t("2024-01-01 10:02:00"), 3))
    q.processAllAvailable()
    // a late duplicate of A's first event (admissible: watermark is
    // 09:52) — merging it into B would regress B.startMs onto A's
    // already-emitted session_id and span a silence larger than the gap
    mem.addData(SessionEvent(7, t("2024-01-01 10:00:00"), 4))
    q.processAllAvailable()
    mem.addData(SessionEvent(8, t("2024-01-01 11:00:00"), 5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions_strag")
      .filter(col("user_id") === 7).orderBy("start_s").collect()
    rows.length shouldBe 2
    rows(0).getString(2) shouldBe "2024-01-01 10:00:00" // A
    rows(0).getLong(4) shouldBe 2L
    rows(1).getString(2) shouldBe "2024-01-01 10:02:00" // B: straggler NOT merged
    rows(1).getLong(4) shouldBe 1L
    rows.map(_.getLong(1)).distinct.length shouldBe 2 // no id collision
  }
}
