package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.streaming.StreamingDedup
import graft.text.TextOps

/** The streaming LSH candidate detector is equivalent to the batch
  * candidate join over the same documents: collisions found incrementally
  * across micro-batches (with per-bucket state, no history re-scan) are
  * exactly the pairs the batch (band, digest) self-join produces.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // near-dup corpus: a shared body + one unique tail token per doc, in
  // two families so cross-family pairs must NOT collide
  private def doc(i: Long): (Long, String) = {
    val family = if (i % 2 == 0) (0 until 20).map(n => s"alpha$n")
                 else (0 until 20).map(n => s"beta$n")
    (i, (family :+ s"u$i").mkString(" "))
  }
  private val docs = (1L to 24L).map(doc)

  private def batchCandidates(rows: Seq[(Long, String)]): Set[(Long, Long)] =
    DataOps.lshCandidates(DataOps.shingledOn(rows.toDF("doc_id", "text")), Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streaming candidates across micro-batches equal the batch candidate join") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.candidates(stream)
      .writeStream.format("memory").queryName("cand_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-sdedup"))
      .start()
    val (b1, b2) = docs.splitAt(docs.size / 2)
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cand_stream").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = batchCandidates(docs)
    got shouldBe expect
    // sanity on the corpus itself: families collide internally, never across
    expect should not be empty
    expect.foreach { case (a, b) => (a % 2) shouldBe (b % 2) }
    // and pairs SPANNING the two micro-batches were found without
    // re-scanning batch 1 (state carried the bucket membership)
    val spanning = expect.filter { case (a, b) =>
      (a <= 12) != (b <= 12) }
    spanning should not be empty
  }

  test("bounded state: an over-cap bucket still pairs new docs against retained members") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.candidates(stream, cap = 3)
      .writeStream.format("memory").queryName("cand_capped")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-sdedup-cap"))
      .start()
    val family = (1L to 10L).map(i => (i, ((0 until 20).map(n => s"g$n") :+ s"u$i").mkString(" ")))
    mem.addData(family: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cand_capped").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every doc beyond the cap still pairs with the 3 retained members —
    // the dedup DECISION (who has a smaller-id near-dup) is preserved
    (4L to 10L).foreach { d =>
      got.exists { case (a, b) => b == d && a <= 3 } shouldBe true
    }
    // but candidates are bounded: far fewer than the full clique
    got.size should be < (10 * 9) / 2
  }

  test("expiring: idle buckets evict after the horizon; pre-watermark candidates unaffected") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.candidatesExpiring(stream,
        lateness = "0 seconds", idleMillis = 60000L) // 1-minute idle horizon
      .writeStream.format("memory").queryName("cand_exp")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-sdedup-exp"))
      .start()
    // batch 1: alpha near-dups at t0 — pair found normally
    mem.addData((1L, doc(2)._2.replace("u2", "u1"), t("2024-01-01 10:00:00")),
                (3L, doc(4)._2.replace("u4", "u3"), t("2024-01-01 10:00:05")))
    q.processAllAvailable()
    val afterB1 = spark.table("cand_exp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    afterB1 shouldBe Set((1L, 3L))
    // batches 2+3: beta docs 10+ min later advance the watermark far past
    // the alpha buckets' idle horizon (10:01) — alpha state evicts
    mem.addData((2L, doc(1)._2.replace("u1", "u2"), t("2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData((4L, doc(3)._2.replace("u3", "u4"), t("2024-01-01 10:12:00")))
    q.processAllAvailable()
    // batch 4: a NEW alpha near-dup after the horizon — its bucket history
    // is gone, so no pair against docs 1/3 (the explicit recall trade);
    // the beta pair found across batches 2/3 is unaffected
    mem.addData((5L, doc(6)._2.replace("u6", "u5"), t("2024-01-01 10:13:00")))
    q.processAllAvailable()
    // eviction is visible in the state metrics: some later batch holds
    // strictly fewer state rows than an earlier one (alpha's buckets
    // dropped while beta's remained)
    val stateSeq = q.recentProgress.filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal).toSeq
    q.stop()
    withClue(s"state rows per batch: $stateSeq: ") {
      stateSeq.zip(stateSeq.tail).exists { case (a, b) => b < a } shouldBe true
    }
    val got = spark.table("cand_exp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 3L), (2L, 4L))
  }

  test("expiring: a late in-window arrival never pulls the idle horizon backwards") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.candidatesExpiring(stream,
        lateness = "1 hour", idleMillis = 60000L)
      .writeStream.format("memory").queryName("cand_exp_late")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-sdedup-late"))
      .start()
    // alpha bucket: newest arrival 10:00:05
    mem.addData((1L, doc(2)._2.replace("u2", "u1"), t("2024-01-01 10:00:00")),
                (3L, doc(4)._2.replace("u4", "u3"), t("2024-01-01 10:00:05")))
    q.processAllAvailable()
    // a LATE alpha arrival (09:50, admissible under the 1 h lateness):
    // the idle clock must stay at 10:00:05, not rewind to 09:50
    mem.addData((7L, doc(6)._2.replace("u6", "u7"), t("2024-01-01 09:50:00")))
    q.processAllAvailable()
    // advance the watermark to 09:51:30 — past the REWOUND horizon
    // (09:51) but inside the true one (10:01:05): the bucket must survive
    mem.addData((2L, doc(1)._2.replace("u1", "u2"), t("2024-01-01 10:51:30")))
    q.processAllAvailable()
    // a new alpha near-dup: pairs with the retained members prove the
    // bucket was NOT evicted early
    mem.addData((5L, doc(8)._2.replace("u8", "u5"), t("2024-01-01 10:52:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cand_exp_late").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got should contain((1L, 5L))
    got should contain((3L, 5L))
  }
}
