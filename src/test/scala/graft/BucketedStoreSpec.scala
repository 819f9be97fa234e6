package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.model.{Article, ArticleSchema}
import graft.sink.ArticleStore

/** The bucket-pruned merge contract: a merge rewrites ONLY the buckets
  * containing batch keys; untouched buckets' parquet files are the same
  * physical files (never copied or rewritten), and GC keeps every version
  * still referenced by a retained manifest.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2025-07-25 00:00:00")

  private def art(link: String, title: String, pub: String): Article =
    Article(
      articleId = java.security.MessageDigest.getInstance("MD5")
        .digest(link.getBytes("UTF-8")).map("%02x".format(_)).mkString,
      newsLink = link, newsTitle = title, authorName = Some("A"),
      newsPublishedTime = Timestamp.valueOf(pub), sourceName = "Skift",
      processedAt = t0)

  private def toDf(as: Article*): DataFrame =
    spark.createDataset(as).toDF(ArticleSchema.columns: _*)

  private def parquetFiles(dir: String): Map[String, Long] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap

  test("merge rewrites only affected buckets; untouched files are identical") {
    val dir = tmpDir("bucketed")
    val store = new ArticleStore(spark, dir, numBuckets = 8)
    // seed enough keys to populate many buckets
    store.merge(toDf((1 to 64).map(i =>
      art(s"https://example.com/$i", s"t$i", "2025-07-26 10:00:00")): _*))
    val before = parquetFiles(s"$dir/v1")
    before.nonEmpty shouldBe true

    // single-key batch: exactly one bucket is affected
    store.merge(toDf(art("https://example.com/1", "updated", "2025-07-26 10:00:00")))

    // v1's files are physically untouched (same paths, same mtimes)
    parquetFiles(s"$dir/v1") shouldBe before
    // v2 contains exactly ONE bucket directory
    val v2Buckets = Files.list(Paths.get(s"$dir/v2/data")).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(ArticleStore.BucketCol))
      .toSeq
    v2Buckets.size shouldBe 1
    // and the merged table is still complete and updated
    val rows = store.read()
    rows.count() shouldBe 64
    rows.filter(org.apache.spark.sql.functions.col(ArticleSchema.NewsTitle) === "updated")
      .count() shouldBe 1
  }

  test("GC keeps referenced versions across many merges; reads stay complete") {
    val dir = tmpDir("bucketed-gc")
    val store = new ArticleStore(spark, dir, numBuckets = 4)
    store.merge(toDf((1 to 32).map(i =>
      art(s"https://example.com/$i", s"t$i", "2025-07-26 10:00:00")): _*))
    (1 to 5).foreach { k =>
      store.merge(toDf(art(s"https://example.com/$k", s"u$k", "2025-07-27 10:00:00")))
    }
    // v1 (the seed) may still hold untouched buckets => must survive GC
    // as long as any retained manifest references it.
    val rows = store.read()
    rows.count() shouldBe 32
    rows.filter(org.apache.spark.sql.functions.col(ArticleSchema.NewsTitle)
      .startsWith("u")).count() shouldBe 5
    // watermark/topN still work over the multi-version layout
    store.watermark()._2 shouldBe true
    store.topN(3).count() shouldBe 3
  }

  test("a reader resolved before merges still scans successfully (retention)") {
    val dir = tmpDir("bucketed-reader")
    val store = new ArticleStore(spark, dir, numBuckets = 4)
    store.merge(toDf((1 to 16).map(i =>
      art(s"https://example.com/$i", s"t$i", "2025-07-26 10:00:00")): _*))
    // lazily-planned stale reader: files resolve at action time
    val stale = store.read()
    store.merge(toDf(art("https://example.com/1", "u1", "2025-07-27 10:00:00")))
    store.merge(toDf(art("https://example.com/2", "u2", "2025-07-27 11:00:00")))
    // two merges later (= retention window edge) the old snapshot's files
    // are still referenced by a retained manifest and must be readable
    stale.count() shouldBe 16
  }

  test("empty batch is a no-op: no new version published") {
    val dir = tmpDir("bucketed-empty")
    val store = new ArticleStore(spark, dir, numBuckets = 4)
    store.merge(toDf(art("https://example.com/a", "a", "2025-07-26 10:00:00")))
    val before = Files.list(Paths.get(dir)).iterator().asScala.map(_.toString).toSet
    store.merge(toDf().limit(0))
    Files.list(Paths.get(dir)).iterator().asScala.map(_.toString).toSet shouldBe before
  }
}
