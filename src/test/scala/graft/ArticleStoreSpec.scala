package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{Article, ArticleSchema}
import graft.query.Pipeline
import graft.sink.ArticleStore

class ArticleStoreSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2025-07-25 00:00:00")
  private def ts(s: String) = Timestamp.valueOf(s)

  private def art(link: String, title: String, pub: String,
                  author: Option[String] = Some("A"),
                  src: String = "Skift"): Article =
    Article(
      articleId = java.security.MessageDigest.getInstance("MD5")
        .digest(link.getBytes("UTF-8")).map("%02x".format(_)).mkString,
      newsLink = link, newsTitle = title, authorName = author,
      newsPublishedTime = ts(pub), sourceName = src, processedAt = t0)

  private def toDf(as: Article*): DataFrame =
    spark.createDataset(as).toDF(ArticleSchema.columns: _*)

  test("K2/S5 cold start: empty table yields default watermark, non-incremental") {
    val store = new ArticleStore(spark, tmpDir("store"))
    store.create()
    store.watermark() shouldBe (ts("2025-07-25 00:00:00"), false)
  }

  test("K1 merge inserts new keys and updates existing in place") {
    val store = new ArticleStore(spark, tmpDir("store"))
    store.merge(toDf(art("u1", "old title", "2025-07-26 10:00:00"),
                     art("u2", "two", "2025-07-27 00:00:00")))
    store.merge(toDf(art("u1", "new title", "2025-07-26 10:00:00"),
                     art("u3", "three", "2025-07-28 00:00:00")))
    val rows = store.read().orderBy(ArticleSchema.NewsLink).collect()
    rows.map(_.getAs[String](ArticleSchema.NewsTitle)) shouldBe
      Array("new title", "two", "three")
    rows.length shouldBe 3
  }

  test("time travel: readAt sees the pre-merge snapshot; history counts versions") {
    val store = new ArticleStore(spark, tmpDir("store-tt"))
    store.merge(toDf(art("u1", "old title", "2025-07-26 10:00:00")))
    val v1 = store.history().head.version
    store.merge(toDf(art("u1", "new title", "2025-07-26 10:00:00"),
                     art("u2", "two", "2025-07-27 00:00:00")))
    // current snapshot: the update won
    store.read().filter(col(ArticleSchema.NewsLink) === "u1")
      .select(ArticleSchema.NewsTitle).head().getString(0) shouldBe "new title"
    // the retained older version still serves the pre-merge state
    val old = store.readAt(v1)
    old.count() shouldBe 1
    old.select(ArticleSchema.NewsTitle).head().getString(0) shouldBe "old title"
    // history: newest first, bounded by retention, with row counts
    val h = store.history()
    h.head.rows shouldBe 2
    h.map(_.version) shouldBe h.map(_.version).sorted.reverse
    h.length should be <= ArticleStore.RetainVersions
    // a GC'd version refuses cleanly
    intercept[IllegalArgumentException](store.readAt(v1 + 1000))
  }

  test("K1 merge is idempotent modulo Processed_at") {
    val store = new ArticleStore(spark, tmpDir("store"))
    val batch = toDf(art("u1", "one", "2025-07-26 10:00:00"),
                     art("u2", "two", "2025-07-27 00:00:00"))
    store.merge(batch)
    val first = store.read().drop(ArticleSchema.ProcessedAt)
      .orderBy(ArticleSchema.ArticleId).collect()
    store.merge(batch)
    val second = store.read().drop(ArticleSchema.ProcessedAt)
      .orderBy(ArticleSchema.ArticleId).collect()
    second shouldBe first
  }

  test("Q4 in-batch dedupe keeps the newest row per key") {
    val d = ArticleStore.dedupeLatest(
      toDf(art("u1", "older", "2025-07-26 00:00:00"),
           art("u1", "newer", "2025-07-27 00:00:00")),
      ArticleSchema.ArticleId)
    d.count() shouldBe 1
    d.head.getAs[String](ArticleSchema.NewsTitle) shouldBe "newer"
  }

  test("S5 watermark truncates max publish time to midnight and is incremental") {
    val store = new ArticleStore(spark, tmpDir("store"))
    store.merge(toDf(art("u1", "one", "2025-08-01 17:19:21")))
    store.watermark() shouldBe (ts("2025-08-01 00:00:00"), true)
  }

  test("T1 topN returns newest-first limited rows") {
    val store = new ArticleStore(spark, tmpDir("store"))
    store.merge(toDf(
      art("u1", "a", "2025-07-26 00:00:00"),
      art("u2", "b", "2025-07-28 12:00:00"),
      art("u3", "c", "2025-07-27 06:00:00")))
    store.topN(2).collect().map(_.getAs[String](ArticleSchema.NewsTitle)) shouldBe
      Array("b", "c")
  }

  test("Q3+pipeline: strict-< cutoff re-ingests equal-date rows, drops older") {
    val store = new ArticleStore(spark, tmpDir("store"))
    store.merge(toDf(art("u1", "seed", "2025-07-28 09:00:00")))
    // watermark is now 2025-07-28 00:00:00
    val batch = toDf(
      art("u2", "same-day", "2025-07-28 00:00:00"), // equal → kept
      art("u3", "older", "2025-07-27 23:59:59"))    // strictly older → dropped
    val (wm, inc) = store.watermark()
    inc shouldBe true
    val filtered = Pipeline.watermarkFilter(batch, wm)
    filtered.collect().map(_.getAs[String](ArticleSchema.NewsTitle)) shouldBe
      Array("same-day")
  }

  test("full incremental run end-to-end") {
    val store = new ArticleStore(spark, tmpDir("store"))
    val skift = toDf(art("s1", "skift one", "2025-08-01 17:19:21"))
    val phocus = toDf(art("p1", "phocus one", "2025-07-28 00:00:00",
                          src = "Phocuswire"))
    val top = Pipeline.runIncremental(spark, store, Seq(skift, phocus), topN = 5)
    top.collect().map(_.getAs[String](ArticleSchema.NewsTitle)) shouldBe
      Array("skift one", "phocus one")
    store.read().count() shouldBe 2
  }

  test("concurrent merges: the claim CAS makes the loser abort cleanly, no lost buckets") {
    val dir = tmpDir("store-cas")
    val store = new ArticleStore(spark, dir)
    store.merge(toDf(art("u1", "one", "2025-07-26 10:00:00")))
    // Simulate writer A mid-merge: it has claimed v2 (the atomic acquire
    // happens BEFORE any data write) but not yet published.
    val claim = java.nio.file.Paths.get(dir, "v2", "_claim")
    java.nio.file.Files.createDirectories(claim.getParent)
    java.nio.file.Files.createFile(claim)
    // Writer B's merge must abort cleanly — claim denied, nothing written,
    // pointer unmoved, table still serving writer A's base snapshot.
    val batchB = toDf(art("u2", "two", "2025-07-27 00:00:00"))
    an[ArticleStore.ConcurrentMergeException] should be thrownBy
      store.merge(batchB)
    store.read().count() shouldBe 1
    store.history().head.version shouldBe 1L
    // Writer A dies without publishing: operator abandons the orphan
    // claim, and the SAME batch B then commits with nothing lost.
    store.abandonClaim()
    store.merge(batchB)
    store.read().orderBy(ArticleSchema.NewsLink).collect()
      .map(_.getAs[String](ArticleSchema.NewsTitle)) shouldBe Array("one", "two")
    store.history().head.version shouldBe 2L
  }

  test("gc never deletes a concurrent writer's claimed FUTURE version") {
    val dir = tmpDir("store-gc-future")
    val store = new ArticleStore(spark, dir)
    store.merge(toDf(art("u1", "one", "2025-07-26 10:00:00")))
    // a second writer based on v1 has claimed v3 and is mid-write
    // (it will read v2 as current and re-claim, but its data must survive
    // OUR commit's gc regardless)
    val claimed = java.nio.file.Paths.get(dir, "v3", "_claim")
    java.nio.file.Files.createDirectories(claimed.getParent)
    java.nio.file.Files.createFile(claimed)
    store.merge(toDf(art("u2", "two", "2025-07-27 00:00:00"))) // publishes v2 + gc(2)
    store.history().head.version shouldBe 2L
    java.nio.file.Files.exists(claimed) shouldBe true // gc left the claim alone
  }
}
