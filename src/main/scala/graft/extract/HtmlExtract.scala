package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.funcs.Funcs
import graft.model.ArticleSchema

/** The HTML extraction layer (P1–P7 in SURVEY.md §2.2): listing-page HTML
  * → exploded article elements → field extraction → assembled article
  * rows.
  *
  * The reference parses with BeautifulSoup CSS selectors
  * (reference: PhocusWire/PhocusWireSource.py:131-173,
  * Skift/SkiftSource.py:126-158); this engine re-expresses each selector
  * as an RE2-compatible regex over the fixture shapes of FIXTURES.md §2 —
  * no lookarounds or backreferences, so the same pattern runs under
  * Spark's Java regex and the oracle's RE2, and the whole layer stays
  * inside codegen'd built-ins (`regexp_extract_all` + `explode` +
  * `regexp_extract`), no UDF, no jsoup (offline jar set).
  *
  * Scale shape: pages are rows; element explode is a Generator (one page
  * → N elements) and every extraction is per-row projection work — the
  * layer adds zero shuffles to an ingest plan.
  */
/** Two-sided listing-container scope: the subtree from `openTag` through
  * its depth-matching close ([[graft.funcs.TagScope]]). The tag name is
  * DERIVED from the open tag — one source of truth, so a spec author
  * cannot pair `<section …>` with a `div` counter and silently
  * depth-count the wrong tag.
  */
final case class ContainerScope(openTag: String) {
  require(openTag.startsWith("<"), s"not an open tag: $openTag")
  val tag: String = openTag.drop(1).takeWhile(_.isLetterOrDigit)
  require(tag.nonEmpty, s"no tag name in: $openTag")
}

final case class SiteSpec(
    sourceName: String,
    /** P2 — listing-container scope, applied BEFORE [[elementRe]]: the
      * reference selects `div.article-list  div.item`
      * (PhocusWire/PhocusWireSource.py:132), so an "item" div in a
      * sidebar, nav, OR footer must NOT be extracted. The scope is
      * TWO-SIDED: [[graft.funcs.TagScope]] depth-counts open/close tags
      * to extract exactly the container subtree — a decoy before the
      * container (sidebar) and one after it (footer promo) are both
      * excluded, like the reference's CSS descendant scoping. A page
      * with no container yields no elements (the CSS selector's empty
      * result); an UNBALANCED container (truncated fetch) auto-closes
      * at end of input, like the reference's lenient parser. None ⇒
      * whole page (Skift selects bare `article` tags,
      * Skift/SkiftSource.py:127).
      */
    container: Option[ContainerScope],
    /** P2 — one match per article element. */
    elementRe: String,
    /** P3 — group 1 = title text. */
    titleRe: String,
    /** P4 — group 1 = raw href. */
    hrefRe: String,
    /** P5 — group 1 = raw author text (may be absent ⇒ null). */
    authorRe: String,
    /** P6 — group 1 = raw date string. */
    dateRe: String,
    /** P4 — raw href → canonical link (byte-exact, no normalization). */
    buildLink: Column => Column,
    /** P5 — raw author → cleaned author. */
    cleanAuthor: Column => Column,
    /** F2/F3 — raw date string → TimestampType. */
    parseDate: Column => Column,
    /** Driver-side mirror of [[parseDate]] for the pagination early-stop
      * probe ([[graft.source.PaginatedSource.pageDates]]): the probe runs
      * on the driver per page, outside any plan, so it needs a plain
      * function. A new site supplies BOTH forms of its date dialect —
      * keeping the probe and the distributed extraction in lockstep is
      * part of the SiteSpec contract (they must agree or the early-stop
      * decision and the extracted rows could diverge).
      */
    probeDate: String => Option[java.sql.Timestamp])

object Sites {

  /** Skift listing shape (reference: Skift/SkiftSource.py:126-158): full
    * `<time datetime>` timestamps whose tz offset is DROPPED, raw hrefs,
    * author anchor text.
    */
  val skift: SiteSpec = SiteSpec(
    sourceName = "Skift",
    container = None,
    elementRe = "<article[\\s\\S]*?</article>",
    titleRe = "<h3 class=\"c-tease__title\"><a href=\"[^\"]*\">([^<]*)</a>",
    hrefRe = "<h3 class=\"c-tease__title\"><a href=\"([^\"]*)\">",
    authorRe = "<a class=\"underline\">([^<]*)</a>",
    dateRe = "<time datetime=\"([^\"]*)\"",
    buildLink = href => href,
    cleanAuthor = a => trim(a),
    parseDate = d => Funcs.dropTimezone(d),
    // ISO with the offset DROPPED, not converted (F3)
    probeDate = raw =>
      try Some(java.sql.Timestamp.valueOf(java.time.LocalDateTime.parse(
        Sites.TzSuffix.replaceAllIn(raw, ""))))
      catch { case _: Exception => None })

  /** PhocusWire listing shape
    * (reference: PhocusWire/PhocusWireSource.py:132-173): date-only
    * byline after a '|', "By "-prefixed author, and the base+"/"+href
    * double-slash link quirk preserved byte-exact (SURVEY.md §1.3).
    * Elements must close with the author div (`</div></div>`), matching
    * the fixture contract — a real crawler feeds this exact shape.
    */
  val phocuswire: SiteSpec = SiteSpec(
    sourceName = "Phocuswire",
    container = Some(ContainerScope("<div class=\"article-list\">")),
    elementRe = "<div class=\"item\">[\\s\\S]*?</div>\\s*</div>",
    titleRe = "<a class=\"title\" href=\"[^\"]*\">([^<]*)</a>",
    hrefRe = "<a class=\"title\" href=\"([^\"]*)\">",
    authorRe = "<span class=\"name\">([^<]*)</span>",
    dateRe = "\\|([^<]*)</div>",
    buildLink = href => concat(lit("https://www.phocuswire.com"), lit("/"), href),
    cleanAuthor = a => Funcs.cleanAuthor(trim(a)),
    parseDate = d =>
      try_to_timestamp(trim(d), lit(ArticleSchema.MonthDayYear)),
    // date-only "July 28, 2025" → midnight
    probeDate = raw =>
      try Some(java.sql.Timestamp.valueOf(java.time.LocalDate.parse(
        raw.trim, Sites.MonthDay).atStartOfDay()))
      catch { case _: Exception => None })

  private[graft] val TzSuffix = "([+-]\\d{2}:?\\d{2}|Z)$".r
  private[graft] val MonthDay = java.time.format.DateTimeFormatter
    .ofPattern("MMMM d, uuuu", java.util.Locale.ENGLISH)
}

object HtmlExtract {

  /** P1+P2 — explode a page DataFrame into one row per article element,
    * scoped to the site's listing container subtree first (a decoy
    * element outside it — sidebar, nav, footer — is never extracted; a
    * page with no container yields nothing, like the reference's CSS
    * selector). [[graft.funcs.TagScope]] returns "" on no container, and
    * extracting elements from "" is the empty array — no null-handling
    * branch needed.
    */
  def elements(pages: DataFrame, htmlCol: String, spec: SiteSpec): DataFrame = {
    val scoped = spec.container
      .map(c => graft.funcs.TagScope(col(htmlCol), c.openTag, c.tag))
      .getOrElse(col(htmlCol))
    pages.select(
      explode(regexp_extract_all(scoped, lit(spec.elementRe), lit(0)))
        .as("element"))
  }

  /** The built-ins executable specification of the field extraction —
    * [[graft.funcs.FirstGroups]] computes the same values in one native
    * pass and is equality-tested against this form.
    */
  private[graft] def grp(el: Column, re: String): Column =
    nullif(regexp_extract(el, re, 1), lit(""))

  /** P3–P7 + Q1/Q2 — extract fields from elements, drop rows missing a
    * title or href (reference skip branches:
    * PhocusWire/PhocusWireSource.py:143-151), assemble article columns.
    * Output: Article_id, News_link, News_title, Author_name,
    * News_published_time, Source_name (Processed_at is sink-side, F6).
    * All four field regexes run in ONE native pass per element
    * ([[graft.funcs.FirstGroups]]): one string materialization instead of
    * four — the extraction layer is regex-bound, so this is where its
    * time goes.
    */
  def articles(pages: DataFrame, htmlCol: String, spec: SiteSpec): DataFrame = {
    val el = elements(pages, htmlCol, spec)
    val fields = graft.funcs.FirstGroups(col("element"),
      Seq(spec.titleRe, spec.hrefRe, spec.authorRe, spec.dateRe))
    val raw = el.select(
      element_at(fields, 1).as("title"),
      element_at(fields, 2).as("href"),
      element_at(fields, 3).as("author_raw"),
      element_at(fields, 4).as("date_raw"))
    val link = spec.buildLink(col("href"))
    raw
      .filter(col("title").isNotNull && col("href").isNotNull)
      .select(
        Funcs.articleId(link).as(ArticleSchema.ArticleId),
        link.as(ArticleSchema.NewsLink),
        col("title").as(ArticleSchema.NewsTitle),
        spec.cleanAuthor(col("author_raw")).as(ArticleSchema.AuthorName),
        spec.parseDate(col("date_raw")).as(ArticleSchema.NewsPublishedTime),
        lit(spec.sourceName).as(ArticleSchema.SourceName))
  }
}
