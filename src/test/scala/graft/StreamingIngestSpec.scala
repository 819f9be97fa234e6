package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{Article, ArticleSchema}
import graft.query.Pipeline
import graft.sink.ArticleStore
import graft.streaming.StreamingIngest

/** W4 contract: an AvailableNow streaming ingest converges to the same
  * sink state as the batch path, consumed files are not reprocessed on
  * the next invocation, and new files merge incrementally.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2025-07-25 00:00:00")

  private def art(link: String, title: String, pub: String): Article =
    Article(
      articleId = java.security.MessageDigest.getInstance("MD5")
        .digest(link.getBytes("UTF-8")).map("%02x".format(_)).mkString,
      newsLink = link, newsTitle = title, authorName = Some("A"),
      newsPublishedTime = Timestamp.valueOf(pub), sourceName = "Skift",
      processedAt = t0)

  private def sourceDf(as: Article*): DataFrame =
    spark.createDataset(as).toDF(ArticleSchema.columns: _*)
      .drop(ArticleSchema.ProcessedAt)

  private def state(store: ArticleStore): Set[String] =
    store.read().drop(ArticleSchema.ProcessedAt)
      .collect().map(_.mkString("|")).toSet

  test("AvailableNow stream converges to the batch path's state") {
    val landing = tmpDir("landing")
    val batch = Seq(
      art("https://skift.com/a/", "a", "2025-08-01 12:00:00"),
      art("https://skift.com/b/", "b", "2025-08-02 09:30:00"))
    sourceDf(batch: _*).write.mode("append").parquet(landing)

    val streamed = new ArticleStore(spark, tmpDir("stream-store"))
    StreamingIngest.runAvailableNow(spark, streamed, landing, tmpDir("ckpt"))

    val batched = new ArticleStore(spark, tmpDir("batch-store"))
    Pipeline.runIncremental(spark, batched,
      Seq(sourceDf(batch: _*).withColumn(ArticleSchema.ProcessedAt, lit(t0))
        .drop(ArticleSchema.ProcessedAt)))

    state(streamed) shouldBe state(batched)
    streamed.watermark() shouldBe batched.watermark()
  }

  test("streaming keyed dedup: duplicate keys across micro-batches converge to one row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Article]
    val articles = mem.toDF().toDF(ArticleSchema.columns: _*)
    val q = StreamingIngest.dedupedStream(articles)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-dedup"))
      .start()
    val batch1 = Seq(
      art("https://skift.com/a/", "a-first", "2025-08-01 12:00:00"),
      art("https://skift.com/b/", "b", "2025-08-01 13:00:00"))
    val batch2 = Seq(
      art("https://skift.com/a/", "a-dup", "2025-08-01 12:30:00"), // same key, later batch
      art("https://skift.com/c/", "c", "2025-08-01 14:00:00"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_stream")
    out.count() shouldBe 3 // the duplicate key collapsed across micro-batches
    // first-wins (the reference's newest-first page order makes first-seen
    // the newest): batch 1's title survives
    out.filter(col(ArticleSchema.ArticleId) === batch1.head.articleId)
      .select(ArticleSchema.NewsTitle).collect().map(_.getString(0))
      .toSeq shouldBe Seq("a-first")
    // equivalence with the batch path: same surviving key set as a batch
    // dropDuplicates over the union of both micro-batches
    val batchDedup = sourceDf(batch1 ++ batch2: _*)
      .dropDuplicates(ArticleSchema.ArticleId)
    out.select(ArticleSchema.ArticleId).collect().map(_.getString(0)).toSet shouldBe
      batchDedup.select(ArticleSchema.ArticleId).collect().map(_.getString(0)).toSet
  }

  test("second invocation merges only new files (checkpointed), idempotently") {
    val landing = tmpDir("landing2")
    val ckpt = tmpDir("ckpt2")
    val store = new ArticleStore(spark, tmpDir("stream-store2"))
    sourceDf(art("https://skift.com/a/", "a", "2025-08-01 12:00:00"))
      .write.mode("append").parquet(landing)
    StreamingIngest.runAvailableNow(spark, store, landing, ckpt)
    store.read().count() shouldBe 1

    // drop a second file: same key updated + one new article (same day:
    // the strict-< watermark keeps both)
    sourceDf(
      art("https://skift.com/a/", "a-updated", "2025-08-01 13:00:00"),
      art("https://skift.com/c/", "c", "2025-08-01 08:00:00"))
      .write.mode("append").parquet(landing)
    StreamingIngest.runAvailableNow(spark, store, landing, ckpt)

    val rows = store.read()
    rows.count() shouldBe 2
    rows.filter(col(ArticleSchema.NewsTitle) === "a-updated").count() shouldBe 1
    rows.filter(col(ArticleSchema.NewsTitle) === "c").count() shouldBe 1
  }
}
