package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.extract.{HtmlExtract, SiteSpec}
import graft.source.{FixtureFetcher, PaginatedSource}

/** The reference's extensibility contract is "write a new scraper class
  * with the same duck type" (SURVEY.md §2.10). In this engine a new
  * source is DATA, not code: a [[SiteSpec]] with the site's selectors
  * and date dialect, after which every shared stage — container scoping,
  * element explode, field extraction, null filters, id derivation,
  * watermark early-stop, merge — applies unchanged. This spec registers
  * a third site no production file knows about and runs the full
  * pipeline against it.
  */
class ExtensibilitySpec extends SparkSpec {
  import spark.implicits._

  // A fictional third site: list-scoped <section class="feed">, items as
  // <li class="story">, ISO date in a data attribute.
  private val newsml: SiteSpec = SiteSpec(
    sourceName = "Newsml",
    container = Some(graft.extract.ContainerScope("<section class=\"feed\">")),
    elementRe = "<li class=\"story\">[\\s\\S]*?</li>",
    titleRe = "<a class=\"headline\" href=\"[^\"]*\">([^<]*)</a>",
    hrefRe = "<a class=\"headline\" href=\"([^\"]*)\">",
    authorRe = "<em class=\"by\">([^<]*)</em>",
    dateRe = "data-published=\"([^\"]*)\"",
    buildLink = href => concat(lit("https://newsml.example"), href),
    cleanAuthor = a => trim(a),
    parseDate = d => try_to_timestamp(d),
    probeDate = raw =>
      try Some(Timestamp.valueOf(raw.trim)) catch { case _: Exception => None })

  private def story(slug: String, iso: String, author: String = "Rae") =
    s"""<li class="story"><a class="headline" href="/$slug">T $slug</a>
       |<em class="by">$author</em><span data-published="$iso"></span></li>""".stripMargin

  private def page(items: String*) =
    s"""<nav><li class="story"><a class="headline" href="/ad">Promo</a>
       |<span data-published="2020-01-01 00:00:00"></span></li></nav>
       |<section class="feed">${items.mkString}</section>""".stripMargin

  test("a brand-new site runs the whole shared pipeline from a SiteSpec alone") {
    val out = HtmlExtract.articles(
      Seq(page(story("a", "2025-08-02 10:00:00"),
               story("b", "2025-08-01 09:00:00"))).toDF("html"), "html", newsml)
      .orderBy("News_link").collect()
    out.length shouldBe 2 // the nav decoy is outside the feed container
    out(0).getString(1) shouldBe "https://newsml.example/a"
    out(0).getString(2) shouldBe "T a"
    out(0).getString(3) shouldBe "Rae"
    out(0).getTimestamp(4) shouldBe Timestamp.valueOf("2025-08-02 10:00:00")
    out(0).getString(5) shouldBe "Newsml"
  }

  test("the watermark early-stop probe works for the new site unchanged") {
    val pages = Seq(
      page(story("p1", "2025-08-03 10:00:00")),
      page(story("p2", "2025-07-20 06:00:00")), // below watermark => stop
      page(story("p3", "2025-08-04 06:00:00"))) // never fetched
    val f = new FixtureFetcher(pages)
    val arts = new PaginatedSource(spark, f, newsml)
      .load(Timestamp.valueOf("2025-08-01 00:00:00"))
    f.fetched.toSeq shouldBe Seq(1, 2)
    arts.count() shouldBe 2
  }
}
