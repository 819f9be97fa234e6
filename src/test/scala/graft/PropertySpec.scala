package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.funcs.Funcs
import graft.model.{Article, ArticleSchema}
import graft.query.Pipeline
import graft.sink.ArticleStore
import graft.text.TextOps

/** Property-based invariants (SURVEY.md §5.3) over ScalaCheck-generated
  * inputs with a fixed seed: identity hashing, shingling, dedup
  * tie-breaking, the strict-< watermark boundary, and date-format
  * round-trips. Each property evaluates as ONE Spark job over a
  * generated batch, compared against a plain-Scala reference model.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val token: Gen[String] =
    Gen.choose(1, 8).flatMap(l => Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString))

  private val url: Gen[String] = for {
    host <- Gen.oneOf("skift.com", "www.phocuswire.com")
    parts <- Gen.listOfN(3, token)
  } yield s"https://$host//${parts.mkString("/")}"

  // second-granular timestamps, 1971..2099 (clear of format edge years)
  private val ts: Gen[Timestamp] =
    Gen.choose(31536000L, 4070908800L).map(s => new Timestamp(s * 1000))

  test("property: Bmp encode/decode round-trips exact pixels for arbitrary dims") {
    // covers every row-padding case (3*w % 4 = 0..3) and non-square rasters
    val cases = sample(for {
      w <- Gen.choose(1, 9)
      h <- Gen.choose(1, 9)
      px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, px.map(_.toByte).toArray), 40)
    cases.foreach { case (w, h, rgb) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        graft.multimodal.MultimodalOps.Bmp.encode(w, h, rgb)))
      img.getWidth shouldBe w
      img.getHeight shouldBe h
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        (img.getRGB(x, y) & 0xFFFFFF) shouldBe
          (((rgb(i) & 0xFF) << 16) | ((rgb(i + 1) & 0xFF) << 8) | (rgb(i + 2) & 0xFF))
      }
    }
  }

  test("property: Wav encode/decode round-trips exact samples for arbitrary formats") {
    val cases = sample(for {
      rate <- Gen.choose(4000, 48000)
      ch <- Gen.choose(1, 4)
      frames <- Gen.choose(1, 64)
      s <- Gen.listOfN(frames * ch,
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (rate, ch, s.map(_.toShort).toArray), 40)
    cases.foreach { case (rate, ch, samples) =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(
          graft.multimodal.MultimodalOps.Wav.encode(rate, ch, samples)))
      in.getFormat.getSampleRate shouldBe rate.toFloat
      in.getFormat.getChannels shouldBe ch
      in.getFrameLength shouldBe samples.length / ch
      val bytes = in.readAllBytes()
      val got = Array.tabulate(samples.length)(i =>
        ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort)
      got.toSeq shouldBe samples.toSeq
    }
  }

  test("property: TagScope extracts exactly the container subtree from random tag trees") {
    def tree(depth: Int): Gen[String] =
      if (depth == 0) Gen.oneOf("x", "y z", "", "<span>t</span>")
      else for {
        n <- Gen.choose(0, 3)
        cs <- Gen.listOfN(n, tree(depth - 1))
        pad <- Gen.oneOf("", " t ")
      } yield s"""<div class="n">$pad${cs.mkString}</div>"""
    val docs = sample(for {
      inner <- tree(3)
      prefix <- tree(2)
      suffix <- tree(2)
    } yield {
      val container = s"""<div class="c">$inner</div>"""
      (prefix + container + suffix, container)
    }, 60)
    docs.foreach { case (doc, container) =>
      graft.funcs.TagScope.scope(doc, "<div class=\"c\">", "div") shouldBe container
    }
  }

  test("property: articleId == java MD5 lowercase hex for arbitrary URLs") {
    val urls = sample(url, 300).distinct
    val got = urls.toDF("u").select(Funcs.articleId(col("u")).as("id"), col("u"))
      .collect().map(r => r.getString(1) -> r.getString(0)).toMap
    urls.foreach { u =>
      got(u) shouldBe java.security.MessageDigest.getInstance("MD5")
        .digest(u.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
  }

  test("property: WordShingles == sliding-window distinct for arbitrary token arrays") {
    val arrays = sample(Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, token)), 150)
    for (n <- Seq(2, 3)) {
      val got = arrays.toDF("w")
        .select(TextOps.shingles(col("w"), n).as("sh"))
        .collect().map(_.getSeq[String](0))
      arrays.zip(got).foreach { case (toks, sh) =>
        val expected =
          if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
        sh shouldBe expected
      }
    }
  }

  test("property: native MinHashSig == per-salt fold for arbitrary shingle sets") {
    val sets = sample(Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, token)), 100)
      .map(_.distinct)
    val df = sets.toDF("sh").cache()
    val native = df.select(graft.funcs.MinHashSig(col("sh"), 6).as("sig")).collect()
    val folded = df.select(
      array((0 until 6).map(j => TextOps.minhash(col("sh"), j)): _*).as("sig")).collect()
    native.map(_.getSeq[String](0)).toSeq shouldBe folded.map(_.getSeq[String](0)).toSeq
  }

  test("property: watermark filter keeps exactly ts >= wm (equal passes)") {
    val stamps = sample(ts, 200)
    val wm = stamps(57) // an arbitrary generated value, guaranteed present
    val df = stamps.zipWithIndex.map { case (t, i) =>
      Article(s"id$i", s"l$i", "t", None, t, "Skift", t)
    }.toDS.toDF(ArticleSchema.columns: _*)
    val kept = Pipeline.watermarkFilter(df, wm)
      .select(ArticleSchema.NewsPublishedTime).collect().map(_.getTimestamp(0)).toSeq
    kept.sortBy(_.getTime) shouldBe
      stamps.filter(t => !t.before(wm)).sortBy(_.getTime)
    assert(kept.contains(wm)) // the boundary row itself is re-ingested
  }

  test("property: dedupeLatest keeps max-(ts, min-link) row per key") {
    val keyPool = (1 to 12).map(i => s"k$i")
    val rows = sample(for {
      k <- Gen.oneOf(keyPool)
      t <- ts
      l <- url
    } yield (k, t, l), 250)
    val df = rows.zipWithIndex.map { case ((k, t, l), i) =>
      Article(k, l, s"t$i", None, t, "Skift", t)
    }.toDS.toDF(ArticleSchema.columns: _*)
    val got = ArticleStore.dedupeLatest(df, ArticleSchema.ArticleId)
      .select(ArticleSchema.ArticleId, ArticleSchema.NewsLink)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = rows.groupBy(_._1).map { case (k, grp) =>
      // newest publish time wins; equal times break on ascending link
      k -> grp.minBy { case (_, t, l) => (-t.getTime, l) }._3
    }
    got shouldBe expected
  }

  test("property: ISO render/parse round-trips; month-name format loses time only") {
    val stamps = sample(ts, 200)
    val df = stamps.toDF("t").select(
      col("t"),
      Funcs.parseDate(Funcs.isoWithT(col("t")), lit("Skift")).as("iso_rt"),
      Funcs.parseDate(date_format(col("t"), "MMMM d, yyyy"), lit("Phocuswire"))
        .as("pw_rt"),
      Funcs.truncToDay(col("t")).as("day"))
    df.filter(col("iso_rt") =!= col("t")).count() shouldBe 0L
    df.filter(col("pw_rt") =!= col("day")).count() shouldBe 0L
  }

  /** Generated crawl URLs: random case, www, default/odd ports, utm and
    * real params in any order, fragments, trailing slashes.
    */
  private val crawlUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.listOfN(2, token).map(_.mkString(".") + ".com")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.listOfN(2, token).map(ps => "/" + ps.mkString("/"))
    slash <- Gen.oneOf("", "/")
    nParams <- Gen.choose(0, 4)
    params <- Gen.listOfN(nParams,
      Gen.oneOf(Gen.oneOf("utm_source=x", "utm_b=2"), token.map(t => s"$t=1")))
    frag <- Gen.oneOf("", "#top", "#s")
  } yield {
    val q = if (params.isEmpty) "" else "?" + params.mkString("&")
    s"$scheme://$www$host$port$path$slash$q$frag"
  }

  test("property: URL canonicalization is idempotent, lossless of the host, utm/frag-free") {
    import graft.text.UrlOps
    val urls = sample(crawlUrl, 400).distinct
    val df = urls.toDF("u").select(
      col("u"),
      UrlOps.canonicalize(col("u")).as("c1"))
      .select(col("u"), col("c1"), UrlOps.canonicalize(col("c1")).as("c2"),
        UrlOps.host(col("c1")).as("h"))
    val rows = df.collect()
    rows.foreach { r =>
      val (u, c1, c2, h) = (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
      withClue(s"url $u -> $c1: ") {
        c2 shouldBe c1 // idempotent
        c1 should startWith("http") // scheme survives, lowercased
        c1.toLowerCase shouldBe c1.takeWhile(_ != '/').toLowerCase + c1.dropWhile(_ != '/')
        c1 should not include "#"
        ("[?&]utm_".r.findFirstIn(c1)) shouldBe None
        // the host is the input's, lowercased, minus one leading www.
        val inHost = u.toLowerCase.replaceFirst("^[a-z]+://", "")
          .takeWhile(ch => ch != '/' && ch != ':' && ch != '?' && ch != '#')
          .replaceFirst("^www\\.", "")
        h shouldBe inHost
      }
    }
  }

  test("property: saltedJoin ≡ plain join on arbitrary frames, nulls included") {
    // keys drawn from a tiny domain (forced collisions + hot keys),
    // nullable keys on the fact side, nullable salt source values
    val keyGen: Gen[Option[Long]] =
      Gen.frequency(8 -> Gen.choose(0L, 4L).map(Some(_)), 1 -> Gen.const(None))
    val saltSrc: Gen[Option[Long]] =
      Gen.frequency(9 -> Gen.choose(Long.MinValue, Long.MaxValue).map(Some(_)),
        1 -> Gen.const(None))
    val facts = sample(Gen.zip(keyGen, saltSrc), 300).zipWithIndex
      .map { case ((k, sv), i) => (i.toLong, k, sv) }
    val dims = sample(Gen.zip(Gen.choose(0L, 6L), token), 20)
      .distinctBy(_._1)
    val fact = facts.toDF("row_id", "k", "salt_src")
      .select(col("row_id"), col("k"), col("salt_src"))
    val dim = dims.toDF("k", "attr")
    val salted = graft.queries.Skew
      .saltedJoin(fact, dim, "k", hash(col("salt_src")), 8)
      .select("row_id", "k", "attr")
    val plain = fact.join(dim, Seq("k")).select("row_id", "k", "attr")
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }
}
