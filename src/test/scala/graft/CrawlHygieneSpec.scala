package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.text.UrlOps

/** From-first-principles recomputation of the crawl-hygiene operators
  * (repetition metrics, paragraph dedup, corpus rarity, duplicated
  * windows) on sf0.001 — every row of each operator's output is rebuilt
  * in plain driver-side Scala from the raw parquet and compared exactly —
  * plus the URL canonicalizer's case law (defaults stripped, non-defaults
  * kept, path case preserved, idempotence).
  */
class CrawlHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rawDocs: Map[Long, Array[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
      .toMap

  test("doc_repetition: every row matches a plain-Scala recomputation") {
    val got = DataOps.docRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val docs = rawDocs
    got.keySet shouldBe docs.keySet
    docs.foreach { case (id, w) =>
      val n = w.length.toLong
      val top = 1000L * w.groupBy(identity).values.map(_.length).max / n
      val g = w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val gc = g.groupBy(identity).map { case (k, v) => k -> v.length }
      val dup = if (g.isEmpty) 0L
        else 1000L * g.count(gc(_) > 1) / g.length
      got(id) shouldBe ((n, top, dup, top <= 200 && dup <= 200))
    }
  }

  /** The planted-paragraph frame the operator sees, rebuilt by hand. */
  private def plantedParas: Map[Long, Vector[String]] =
    rawDocs.map { case (id, w) =>
      val core = w.grouped(15).map(_.mkString(" ")).toVector
      val pre = if (id % 5 == 0)
        Vector("subscribe to our newsletter for the latest updates") else Vector()
      val post = if (id % 7 == 0)
        Vector("all rights reserved contact us for more information") else Vector()
      id -> (pre ++ core ++ post)
    }

  test("dedup_paragraphs: keep-first winners, global uniqueness, conservation") {
    val out = DataOps.dedupParagraphs(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val planted = plantedParas
    out.keySet shouldBe planted.keySet

    // expected keeper of each paragraph text = min (doc_id, pos)
    val keeper = planted.toSeq
      .flatMap { case (id, ps) => ps.zipWithIndex.map { case (p, i) => (p, (id, i.toLong + 1)) } }
      .groupBy(_._1).map { case (p, occ) => p -> occ.map(_._2).min }
    val expected = planted.map { case (id, ps) =>
      id -> ps.zipWithIndex.filter { case (p, i) => keeper(p) == ((id, i.toLong + 1)) }.map(_._1)
    }
    planted.foreach { case (id, ps) =>
      val (nb, na, text) = out(id)
      nb shouldBe ps.length.toLong
      na shouldBe expected(id).length.toLong
      text shouldBe expected(id).mkString("\n\n")
    }

    // every surviving paragraph text appears exactly once corpus-wide,
    // and the surviving set is exactly the distinct planted set
    val survivors = out.values.toSeq.flatMap(_._3.split("\n\n").filter(_.nonEmpty))
    survivors.distinct.length shouldBe survivors.length
    survivors.toSet shouldBe planted.values.flatten.toSet
  }

  test("doc_rarity: corpus-frequency scores match a plain-Scala recomputation") {
    val docs = rawDocs
    val tf = docs.values.flatten.toSeq.groupBy(identity)
      .map { case (t, o) => t -> o.length.toLong }
    val got = DataOps.docRarity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    got.keySet shouldBe docs.keySet
    docs.foreach { case (id, w) =>
      val freqs = w.map(tf)
      val sum = freqs.sum
      val mean = new java.math.BigDecimal(sum.toDouble / w.length)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      got(id) shouldBe ((w.length.toLong, freqs.min, sum, mean))
    }
  }

  test("dup_windows: duplicated-window shares match a plain-Scala recomputation") {
    val docs = rawDocs
    val wins = docs.toSeq.flatMap { case (id, w) =>
      w.sliding(8).filter(_.length == 8).map(g => (id, g.mkString(" "))).toSeq
    }
    val cnt = wins.groupBy(_._2).map { case (k, v) => k -> v.length }
    val got = DataOps.dupWindows(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    got.keySet shouldBe docs.filter(_._2.length >= 8).keySet
    got.foreach { case (id, (nw, nd, milli, flagged)) =>
      val mine = wins.filter(_._1 == id).map(_._2)
      nw shouldBe mine.length.toLong
      nd shouldBe mine.count(cnt(_) >= 2).toLong
      milli shouldBe 1000L * nd / nw
      flagged shouldBe nd > 0
    }
    // the driver's planted near-dups must surface: some doc IS flagged
    got.values.count(_._4) should be > 0
  }

  test("dedup_spans: keep-first span surgery matches a plain-Scala recomputation") {
    val docs = rawDocs
    val wins = docs.toSeq
      .flatMap { case (id, w) =>
        w.sliding(8).filter(_.length == 8).zipWithIndex
          .map { case (g, p) => (id, p.toLong + 1, g.mkString(" ")) }
      }
    val byText = wins.groupBy(_._3)
    val winner = byText.map { case (wt, occ) =>
      wt -> occ.map(o => (o._1, o._2)).min
    }
    val cover: Map[Long, Set[Long]] = wins
      .filter { case (id, p, wt) => byText(wt).size >= 2 && winner(wt) != ((id, p)) }
      .flatMap { case (id, p, _) => (p until p + 8).map(id -> _) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
      .withDefaultValue(Set.empty)
    val got = DataOps.dedupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    got.keySet shouldBe docs.keySet
    docs.foreach { case (id, w) =>
      val rm = cover(id)
      val keptText = w.zipWithIndex
        .collect { case (t, i) if !rm.contains(i.toLong + 1) => t }.mkString(" ")
      got(id) shouldBe ((w.length.toLong, rm.size.toLong, keptText))
    }
    // the corpus-first occurrence of every duplicated phrase survives intact:
    // at least one doc with duplicated windows has zero tokens removed only
    // if it is first everywhere — weaker but still useful: removals exist
    got.values.map(_._2).sum should be > 0L
  }

  test("hash_embed: feature-hashed weights match a plain-Scala recomputation") {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val want = rawDocs.toSeq.flatMap { case (id, w) =>
      w.map { t =>
        val h = h32("hemb:" + t)
        ((id, h % 64), if ((h / 64) % 2 == 0) 1L else -1L)
      }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val got = DataOps.hashEmbed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe want
  }

  test("url canonicalizer: case law") {
    val cases = Seq(
      // default ports stripped, scheme+host lowered, www dropped, utm gone
      "HTTP://WWW.Site.Example.COM:80/articles/7?utm_source=feed&ref=rss#top"
        -> "http://site.example.com/articles/7?ref=rss",
      // subdomain kept, trailing slash stripped
      "https://News.site.example.com/articles/7/" -> "https://news.site.example.com/articles/7",
      // :443 default for https stripped; PATH case preserved
      "https://site.example.com:443/Articles/7?id=7" -> "https://site.example.com/Articles/7?id=7",
      // utm params interleaved with real ones: separators re-joined
      "http://site.example.com/a?utm_campaign=x&page=2&utm_medium=y"
        -> "http://site.example.com/a?page=2",
      "http://site.example.com/a?a=1&utm_b=2&c=3" -> "http://site.example.com/a?a=1&c=3",
      // ONLY utm params: the query evaporates entirely
      "http://site.example.com/a?utm_only=1" -> "http://site.example.com/a",
      // non-default ports survive; :80 is only default for http
      "http://site.example.com:8080/x" -> "http://site.example.com:8080/x",
      "https://site.example.com:80/x" -> "https://site.example.com:80/x",
      // schemeless/malformed inputs pass through untouched, never emptied
      "site.example.com/path" -> "site.example.com/path",
      "mailto:someone@example.com" -> "mailto:someone@example.com",
      "/relative/link?utm_x=1" -> "/relative/link?utm_x=1",
      // "utm_" inside a VALUE is not a tracking param — never stripped
      "http://h.example.com/p?a=utm_x&b=2" -> "http://h.example.com/p?a=utm_x&b=2",
      // www. inside a query value (redirect target) is preserved
      "http://h.example.com/r?next=http://www.foo.com"
        -> "http://h.example.com/r?next=http://www.foo.com",
      // a RUN of adjacent utm params collapses in one pass
      "http://h.example.com/p?utm_a=1&utm_b=2&c=3" -> "http://h.example.com/p?c=3")
    import spark.implicits._
    val got = cases.map(_._1).toDF("u")
      .select(UrlOps.canonicalize(col("u"))).as[String].collect()
    got.toSeq shouldBe cases.map(_._2)
  }

  test("doc_repetition: a single-token document gets dup_bigram_milli 0, not a crash") {
    import spark.implicits._
    val tmp = tmpDir("rep-one-token")
    Seq((1L, "solo", "en", "srcX", 4L), (2L, "two words", "en", "srcX", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = DataOps.docRepetition(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows(1L) shouldBe ((1L, 1000L, 0L))
    rows(2L) shouldBe ((2L, 500L, 0L))
  }

  test("url_canonical: canonicalization is idempotent over the graded output") {
    DataOps.urlCanonical(spark, dir)
      .select(col("url_canon").as("c1"),
        UrlOps.canonicalize(col("url_canon")).as("c2"))
      .filter(col("c1") =!= col("c2")).count() shouldBe 0L
  }

  test("domain_stats: host cardinality and doc conservation") {
    val ds = DataOps.domainStats(spark, dir).collect()
    ds.map(_.getLong(1)).sum shouldBe rawDocs.size.toLong
    all(ds.map(_.getString(0))) should fullyMatch regex "[a-z0-9.]+\\.example\\.com"
  }

  test("dedup_url: every page family of four raw variants collapses to one key") {
    val n = rawDocs.size
    val rows = DataOps.dedupUrl(spark, dir).collect()
    rows.length shouldBe (n + 3) / 4
    rows.map(_.getLong(2)).sum shouldBe n.toLong // doc conservation
    // full families (all four variants present) have 4 distinct raw forms
    // and the representative is the family's first crawl
    rows.filter(_.getLong(2) == 4).foreach { r =>
      r.getLong(3) shouldBe 4L
      r.getLong(1) % 4 shouldBe 0L
      r.getString(0) shouldBe
        s"http://src${(r.getLong(1) / 4) % 20}.example.com/articles/${r.getLong(1) / 4}"
    }
  }

  test("clean_corpus: the capstone agrees with its three components row by row") {
    val rep = DataOps.docRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val q = DataOps.docQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val paras = DataOps.dedupParagraphs(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val out = DataOps.cleanCorpus(spark, dir).collect()
    out.length shouldBe paras.size
    out.foreach { r =>
      val id = r.getLong(0)
      val (nb, na, text) = paras(id)
      (r.getLong(1), r.getLong(2), r.getString(3)) shouldBe ((nb, na, text))
      r.getBoolean(4) shouldBe (rep(id) && q(id) && na > 0)
    }
  }
}
