package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.extract.Sites
import graft.model.ArticleSchema
import graft.query.Pipeline
import graft.sink.ArticleStore
import graft.source.{FixtureFetcher, PaginatedSource}

/** The watermark early-stop contract (S1/S2/O1): pagination stops at the
  * first sub-watermark article, an empty page, or a fetch failure — and
  * pages past the stop are NEVER requested
  * (reference: PhocusWire/PhocusWireSource.py:180-185,203-204).
  */
class PaginatedSourceSpec extends SparkSpec {

  private def skiftEl(slug: String, iso: String, author: String = "A") =
    s"""<article><h3 class="c-tease__title"><a href="https://skift.com/$slug/">T $slug</a></h3>
       |<div class="c-tease__byline"><a class="underline">$author</a>
       |<time datetime="$iso+00:00"></time></div></article>""".stripMargin

  private val wm = Timestamp.valueOf("2025-08-01 00:00:00")

  test("O1: pagination stops at first sub-watermark article; later pages never fetched") {
    val pages = Seq(
      skiftEl("p1a", "2025-08-03T10:00:00") + skiftEl("p1b", "2025-08-02T09:00:00"),
      skiftEl("p2a", "2025-08-01T08:00:00") + skiftEl("p2b", "2025-07-30T07:00:00"),
      skiftEl("p3a", "2025-07-20T06:00:00")) // must never be requested
    val f = new FixtureFetcher(pages)
    val out = new PaginatedSource(spark, f, Sites.skift).load(wm)
    f.fetched.toSeq shouldBe Seq(1, 2) // page 3 never fetched
    // the stop page is included whole; Q3 filtering is the plan's job
    out.count() shouldBe 4
    Pipeline.watermarkFilter(out, wm).count() shouldBe 3 // p2b dropped
  }

  test("equal-date articles do not stop pagination (strict <, overlap day)") {
    val pages = Seq(
      skiftEl("q1", "2025-08-01T00:00:00"), // exactly AT the watermark
      skiftEl("q2", "2025-07-31T23:59:59")) // below => stop here
    val f = new FixtureFetcher(pages)
    new PaginatedSource(spark, f, Sites.skift).load(wm).count() shouldBe 2
    // the at-watermark page did NOT stop the scan (page 2 was requested);
    // page 2's below-watermark article did.
    f.fetched.toSeq shouldBe Seq(1, 2)
  }

  test("empty page terminates the scan") {
    val f = new FixtureFetcher(Seq(skiftEl("r1", "2025-08-02T10:00:00"),
      "<html><body>no articles</body></html>", skiftEl("r3", "2025-08-02T10:00:00")))
    val out = new PaginatedSource(spark, f, Sites.skift).load(wm)
    f.fetched.toSeq shouldBe Seq(1, 2) // page 3 never fetched
    out.count() shouldBe 1
  }

  test("fetch failure terminates the scan") {
    val f = new FixtureFetcher(Seq(skiftEl("s1", "2025-08-02T10:00:00"))) {
      override def fetch(page: Int): Option[String] =
        if (page == 2) { fetched += page; None } else super.fetch(page)
    }
    val out = new PaginatedSource(spark, f, Sites.skift).load(wm)
    f.fetched.toSeq shouldBe Seq(1, 2)
    out.count() shouldBe 1
  }

  test("maxPages caps a scan that never hits the watermark") {
    val f = new FixtureFetcher(Seq.fill(10)(skiftEl("t", "2025-08-02T10:00:00")))
    new PaginatedSource(spark, f, Sites.skift, maxPages = 3).load(wm)
    f.fetched.toSeq shouldBe Seq(1, 2, 3)
  }

  test("runScrape end-to-end: scrape -> merge -> topN with watermark pushdown") {
    val dir = tmpDir("scrape")
    val store = new ArticleStore(spark, dir)
    val pages = Seq(
      skiftEl("e1", "2025-08-02T12:00:00", "X") + skiftEl("e2", "2025-08-02T11:00:00", "Y"),
      skiftEl("e3", "2025-07-20T06:00:00")) // pre-default-watermark => stop
    val f = new FixtureFetcher(pages)
    val top = Pipeline.runScrape(spark, store,
      Seq(new PaginatedSource(spark, f, Sites.skift)), topN = 5)
    // cold store => default watermark 2025-07-25; e3 is older and dropped
    top.count() shouldBe 2
    top.select(col(ArticleSchema.NewsTitle)).collect().map(_.getString(0))
      .toSet shouldBe Set("T e1", "T e2")
    val (newWm, incremental) = store.watermark()
    incremental shouldBe true
    newWm shouldBe Timestamp.valueOf("2025-08-02 00:00:00")
  }
}
