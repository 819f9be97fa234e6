package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.extract.{HtmlExtract, Sites}

/** Golden-fixture tests for the HTML extraction layer over the two sites'
  * shapes (FIXTURES.md §2), covering the cited edge branches: missing
  * title anchor (Q1 skip), missing href (Q2 skip), missing author (P5 →
  * null), malformed date (F2 → null), tz-dropping (F3), and the
  * PhocusWire double-slash link quirk (byte-exact md5 identity, §1.3).
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private val skiftPage =
    """<html><body>
      |<article><h3 class="c-tease__title"><a href="https://skift.com/2025/08/01/a/">Article A</a></h3>
      |<div class="c-tease__byline"><a class="underline">Jane Doe</a>
      |<time datetime="2025-08-01T17:19:21+05:00"></time></div></article>
      |<article><h3 class="c-tease__title"><a href="https://skift.com/2025/08/01/b/">Article B</a></h3>
      |<div class="c-tease__byline"><time datetime="2025-08-01T09:00:00Z"></time></div></article>
      |<article><h3 class="c-tease__title"></h3>
      |<div class="c-tease__byline"><a class="underline">No Title</a>
      |<time datetime="2025-08-01T10:00:00Z"></time></div></article>
      |</body></html>""".stripMargin

  private val phocusPage =
    """<div class="article-list">
      |<div class="item"><a class="title" href="/news/x">Item X</a>
      |<div class="author"><span class="name">By John Smith</span> | July 28, 2025</div></div>
      |<div class="item"><a class="title" href="/news/y">Item Y</a>
      |<div class="author"> | July 29, 2025</div></div>
      |<div class="item"><a class="title" href="/news/z">Item Z</a>
      |<div class="author"><span class="name">By Ann</span> | not a date</div></div>
      |</div>""".stripMargin

  test("Skift: tz dropped not converted, null author, missing-title skipped") {
    val out = HtmlExtract.articles(
      Seq(skiftPage).toDF("html"), "html", Sites.skift)
      .orderBy("News_link").collect()
    out.length shouldBe 2 // third element has no title anchor (Q1)
    val a = out(0)
    a.getString(1) shouldBe "https://skift.com/2025/08/01/a/"
    a.getString(2) shouldBe "Article A"
    a.getString(3) shouldBe "Jane Doe"
    // +05:00 dropped, NOT converted: wall-clock 17:19:21 survives
    a.getTimestamp(4).toString shouldBe "2025-08-01 17:19:21.0"
    a.getString(5) shouldBe "Skift"
    val b = out(1)
    b.getString(2) shouldBe "Article B"
    assert(b.isNullAt(3)) // no author anchor => null (P5)
    b.getTimestamp(4).toString shouldBe "2025-08-01 09:00:00.0"
  }

  test("PhocusWire: double-slash link + md5 id, By-strip, null-date branch") {
    val out = HtmlExtract.articles(
      Seq(phocusPage).toDF("html"), "html", Sites.phocuswire)
      .orderBy("News_link").collect()
    out.length shouldBe 3
    val x = out.find(_.getString(2) == "Item X").get
    // base + "/" + href where href starts with "/" => byte-exact double slash
    x.getString(1) shouldBe "https://www.phocuswire.com//news/x"
    x.getString(3) shouldBe "John Smith" // "By " prefix stripped
    x.getTimestamp(4).toString shouldBe "2025-07-28 00:00:00.0" // date-only => midnight
    val y = out.find(_.getString(2) == "Item Y").get
    assert(y.isNullAt(3)) // missing author span
    y.getTimestamp(4).toString shouldBe "2025-07-29 00:00:00.0"
    val z = out.find(_.getString(2) == "Item Z").get
    assert(z.isNullAt(4)) // malformed date => null, row survives extraction
  }

  test("container scoping: a decoy item outside div.article-list is never extracted") {
    val decoyPage =
      """<div class="sidebar"><div class="item"><a class="title" href="/decoy">Promo</a>
        |<div class="author"><span class="name">By Ad Bot</span> | July 1, 2025</div></div></div>
        |<div class="article-list">
        |<div class="item"><a class="title" href="/news/real">Real</a>
        |<div class="author"><span class="name">By Jo</span> | July 2, 2025</div></div>
        |</div>""".stripMargin
    val out = HtmlExtract.articles(
      Seq(decoyPage).toDF("html"), "html", Sites.phocuswire).collect()
    out.length shouldBe 1 // sidebar decoy excluded (PhocusWireSource.py:132 CSS scope)
    out(0).getString(2) shouldBe "Real"
    // and a page with no container yields nothing, like the CSS selector
    val noContainer =
      """<div class="item"><a class="title" href="/x">X</a>
        |<div class="author"> | July 1, 2025</div></div>""".stripMargin
    HtmlExtract.articles(
      Seq(noContainer).toDF("html"), "html", Sites.phocuswire).count() shouldBe 0
  }

  test("container scoping is two-sided: decoys BEFORE and AFTER the listing are excluded") {
    // the reference's CSS `div.article-list div.item` matches neither a
    // sidebar promo nor a footer promo; the depth-counting TagScope must
    // agree on both sides
    val page =
      """<div class="sidebar"><div class="item"><a class="title" href="/decoy">Promo</a>
        |<div class="author"><span class="name">By Ad Bot</span> | July 1, 2025</div></div></div>
        |<div class="article-list">
        |<div class="item"><a class="title" href="/news/real1">Real One</a>
        |<div class="author"><span class="name">By Jo</span> | July 2, 2025</div></div>
        |<div class="item"><a class="title" href="/news/real2">Real Two</a>
        |<div class="author"><span class="name">By Sam</span> | July 3, 2025</div></div>
        |</div>
        |<footer><div class="item"><a class="title" href="/footer-decoy">Footer promo</a>
        |<div class="author"><span class="name">By Ad Bot</span> | July 4, 2025</div></div></footer>""".stripMargin
    val out = HtmlExtract.articles(
      Seq(page).toDF("html"), "html", Sites.phocuswire)
      .orderBy("News_link").collect()
    out.map(_.getString(2)).toSeq shouldBe Seq("Real One", "Real Two")
    // the pagination probe sees the SAME two elements (shared TagScope scan)
    val probeDates = graft.source.PaginatedSource.pageDates(Sites.phocuswire, page)
    probeDates.flatten.map(_.toString) shouldBe
      Seq("2025-07-02 00:00:00.0", "2025-07-03 00:00:00.0")
  }

  test("a truncated page (unbalanced container) still yields its items") {
    // fetch cut off mid-stream: container never closes — the reference's
    // lenient parser auto-closes and extracts every complete item, and so
    // must the depth counter
    val truncated =
      """<div class="article-list">
        |<div class="item"><a class="title" href="/news/t1">T One</a>
        |<div class="author"><span class="name">By Jo</span> | July 2, 2025</div></div>
        |<div class="item"><a class="title" href="/news/t2">T Two</a>
        |<div class="author"><span class="name">By Sam</span> | July 3, 2025</div></div>""".stripMargin
    val out = HtmlExtract.articles(
      Seq(truncated).toDF("html"), "html", Sites.phocuswire)
      .orderBy("News_link").collect()
    out.map(_.getString(2)).toSeq shouldBe Seq("T One", "T Two")
    // the early-stop probe sees the same two elements
    graft.source.PaginatedSource.pageDates(Sites.phocuswire, truncated)
      .flatten.length shouldBe 2
  }

  test("TagScope extracts exactly the balanced container subtree") {
    import graft.funcs.TagScope
    // nested same-tag children are depth-counted, not terminated early
    TagScope.scope(
      """pre<div class="c"><div a="1">x</div><div>y</div></div>post""",
      "<div class=\"c\">", "div") shouldBe
      """<div class="c"><div a="1">x</div><div>y</div></div>"""
    // absent container yields ""; unbalanced markup (truncated page)
    // auto-closes at end of input like a lenient parser — items present
    // on the page are still extracted
    TagScope.scope("<div class=\"other\">x</div>", "<div class=\"c\">", "div") shouldBe ""
    TagScope.scope("<div class=\"c\"><div>x</div>", "<div class=\"c\">", "div") shouldBe
      "<div class=\"c\"><div>x</div>"
    // a '<divx' pseudo-tag is not an open (dialect: '<div' + space or '>')
    TagScope.scope("<div class=\"c\"><divx></div>rest", "<div class=\"c\">", "div") shouldBe
      "<div class=\"c\"><divx></div>"
  }

  test("missing href is skipped (Q2) and ids are md5 of the exact link") {
    val page =
      """<div class="article-list">
        |<div class="item"><a class="title">No Href</a>
        |<div class="author"> | July 1, 2025</div></div>
        |<div class="item"><a class="title" href="/k">K</a>
        |<div class="author"> | July 1, 2025</div></div>
        |</div>""".stripMargin
    val out = HtmlExtract.articles(
      Seq(page).toDF("html"), "html", Sites.phocuswire).collect()
    out.length shouldBe 1
    val link = "https://www.phocuswire.com//k"
    out(0).getString(1) shouldBe link
    out(0).getString(0) shouldBe
      java.security.MessageDigest.getInstance("MD5")
        .digest(link.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("probeDate agrees with parseDate on every fixture date shape, per site") {
    // The SiteSpec contract: the driver-side probe parser and the Column
    // parser must agree on the site's dialect, or the early-stop decision
    // and the extracted rows diverge. Pinned over each site's fixture
    // shapes (FIXTURES.md §2) including the malformed branch.
    val shapes: Seq[(graft.extract.SiteSpec, Seq[String])] = Seq(
      Sites.skift -> Seq("2025-08-01T17:19:21+05:00", "2025-08-01T09:00:00Z",
        "2025-08-01T10:00:00", "not a date"),
      Sites.phocuswire -> Seq("July 28, 2025", " July 29, 2025 ", "not a date"))
    shapes.foreach { case (site, raws) =>
      val viaColumn = raws.toDF("raw")
        .select(site.parseDate(col("raw")).as("t"))
        .collect().map(r => Option(r.getTimestamp(0)))
      raws.map(site.probeDate).zip(viaColumn).zip(raws).foreach {
        case ((probe, column), raw) =>
          withClue(s"${site.sourceName} '$raw': ") { probe shouldBe column }
      }
    }
  }

  test("native FirstGroups equals the per-field regexp_extract specification") {
    val spec = Sites.phocuswire
    val el = HtmlExtract.elements(Seq(phocusPage).toDF("html"), "html", spec)
    val res = Seq(spec.titleRe, spec.hrefRe, spec.authorRe, spec.dateRe)
    val native = el.select(graft.funcs.FirstGroups(col("element"), res).as("g"))
      .select((1 to 4).map(i => element_at(col("g"), i).as(s"f$i")): _*)
    val builtin = el.select(
      res.zipWithIndex.map { case (re, i) =>
        HtmlExtract.grp(col("element"), re).as(s"f${i + 1}") }: _*)
    native.exceptAll(builtin).count() shouldBe 0L
    builtin.exceptAll(native).count() shouldBe 0L
  }

  test("element explode yields one row per article element across pages") {
    val n = HtmlExtract.elements(
      Seq(skiftPage, skiftPage).toDF("html"), "html", Sites.skift).count()
    n shouldBe 6
  }
}
