package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.model.{Article, ArticleSchema}
import graft.query.Pipeline
import graft.sink.ArticleStore

/** T1/K4 golden replay: the reference's executed notebook
  * (ingestion.ipynb cell 498c25c4) prints exactly five rows after its
  * logged run; replaying those articles (plus older decoys) through this
  * engine's merge + topN must reproduce them byte-for-byte — md5 ids
  * derived from the links, unicode titles, T-separated publish times.
  * Processed_at is excluded: it is the run's wall-clock in both systems.
  */
class GoldenReplaySpec extends SparkSpec {
  import spark.implicits._

  // (link, title, author, publish time) lifted from the notebook output /
  // data/articles.db; the expected md5 ids are the reference's own.
  private val golden = Seq(
    ("https://skift.com/2025/08/01/from-concur-to-spotnana-steve-singh-on-how-ai-could-fix-corporate-travel/",
      "From Concur to Spotnana: Steve Singh on How AI Could Fix Corporate Travel",
      "Sean O'Neill", "2025-08-01T17:19:21",
      "b6180012cdfcaab01451bded2196d26c"),
    ("https://skift.com/2025/08/01/delta-says-it-will-not-use-ai-to-target-customers/",
      "Delta Responds to AI-Pricing Backlash: No ‘Individualized Prices Based on Personal Data’",
      "Meghna Maharishi", "2025-08-01T15:05:14",
      "d030436466546bcf23aa4befbf4d08b6"),
    ("https://skift.com/2025/08/01/u-s-dollar-slide-hurts-accor-minor-and-melia/",
      "U.S. Dollar Slide Hurts Accor, Minor, and Meliá",
      "Luke Martin", "2025-08-01T13:53:29",
      "8db7ffa1ba14adc8dd8348e7f5d1923d"),
    ("https://skift.com/2025/08/01/winners-losers-and-lots-of-premium-seats-europes-airline-scorecard/",
      "Winners, Losers, and Lots of Premium Seats: Europe’s Airline Scorecard",
      "Gordon Smith", "2025-08-01T13:13:39",
      "3fa30e2c6eee18976f224053633c1a27"),
    ("https://skift.com/2025/08/01/electrification-and-renewables-are-driving-iberostars-emissions-decline/",
      "Electrification and Renewables Are Driving Iberostar’s Emissions Decline",
      "Darin Graham", "2025-08-01T13:02:26",
      "265b2b2258dd197970b5619cbd6b943a"))

  private def art(link: String, title: String, author: String, pub: String): Article =
    Article(
      articleId = java.security.MessageDigest.getInstance("MD5")
        .digest(link.getBytes("UTF-8")).map("%02x".format(_)).mkString,
      newsLink = link, newsTitle = title, authorName = Some(author),
      newsPublishedTime = Timestamp.valueOf(pub.replace('T', ' ')),
      sourceName = "Skift", processedAt = Timestamp.valueOf("2025-08-03 09:13:02"))

  private def toDf(as: Seq[Article]): DataFrame =
    spark.createDataset(as).toDF(ArticleSchema.columns: _*)

  test("engine-computed md5 ids equal the reference's stored Article_ids") {
    golden.foreach { case (link, _, _, _, id) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(link.getBytes("UTF-8")).map("%02x".format(_)).mkString shouldBe id
    }
  }

  test("topN(5) replays the notebook's printed rows byte-for-byte") {
    val store = new ArticleStore(spark, tmpDir("golden"))
    val batch = golden.map { case (l, t, a, p, _) => art(l, t, a, p) } ++ Seq(
      art("https://skift.com/2025/07/30/older-one/", "Older One", "X", "2025-07-30T10:00:00"),
      art("https://www.phocuswire.com//older-two", "Older Two", "Y", "2025-07-29T00:00:00"))
    Pipeline.runIncremental(spark, store, Seq(toDf(batch)), topN = 5)

    val got = ArticleStore.renderServing(store.topN(5))
      .drop(ArticleSchema.ProcessedAt) // wall-clock in both systems
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5)))
    val expected = golden.map { case (l, t, a, p, id) =>
      (id, l, t, a, p, "Skift")
    }
    got.toSeq shouldBe expected
  }

  test("the COMPLETE 97-row reference sink state reconstructs byte-for-byte") {
    // The reference's data/articles.db holds two ingestion runs' merged
    // output: 82 articles stamped 2025-08-03 09:12:45 and 15 stamped
    // 09:13:02 (80 Skift / 17 Phocuswire, 5 NULL authors, every
    // Phocuswire id carrying the double-slash link quirk). Replaying the
    // two cohorts as two incremental runs through the production merge
    // path — with the logical-run-time seam supplying each run's
    // Processed_at — must reproduce ALL SEVEN columns of every row.
    val lines = {
      val in = getClass.getResourceAsStream("/reference_articles_97.tsv")
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().toVector finally src.close()
    }
    val rows = lines.map { l =>
      val f = l.split("\t", -1)
      (f(0), f(1), f(2), if (f(3) == "\\N") null else f(3), f(4), f(5), f(6))
    }
    rows.size shouldBe 97
    rows.count(_._4 == null) shouldBe 5
    rows.count(_._6 == "Skift") shouldBe 80
    rows.count(_._6 == "Phocuswire") shouldBe 17
    // every Phocuswire link carries the double-slash quirk the byte-exact
    // md5 ids depend on
    rows.filter(_._6 == "Phocuswire")
      .count(_._2.contains(".com//")) shouldBe 17

    val cohorts = Seq("2025-08-03 09:12:45", "2025-08-03 09:13:02")
    val byCohort = rows.groupBy(_._7)
    byCohort.keySet shouldBe cohorts.toSet
    byCohort(cohorts.head).size shouldBe 82
    byCohort(cohorts.last).size shouldBe 15

    def toArticles(rs: Seq[(String, String, String, String, String, String, String)]) =
      rs.map { case (_, link, title, author, pub, source, processed) =>
        Article(
          articleId = java.security.MessageDigest.getInstance("MD5")
            .digest(link.getBytes("UTF-8")).map("%02x".format(_)).mkString,
          newsLink = link, newsTitle = title, authorName = Option(author),
          newsPublishedTime = Timestamp.valueOf(pub.replace('T', ' ')),
          sourceName = source,
          processedAt = Timestamp.valueOf(processed))
      }

    val store = new ArticleStore(spark, tmpDir("golden97"))
    try {
      for (cohort <- cohorts) {
        // the logical run time: merge stamps every surviving row with it
        spark.conf.set("spark.graft.processedAt", cohort)
        Pipeline.runIncremental(spark, store,
          Seq(toDf(toArticles(byCohort(cohort)))))
      }
    } finally spark.conf.unset("spark.graft.processedAt")

    val got = ArticleStore.renderServing(store.read()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6)))
      .toSet
    val expected = rows.map { case (id, link, title, author, pub, source, processed) =>
      (id, link, title, author, pub, source, processed)
    }.toSet
    got.size shouldBe 97
    got shouldBe expected
  }
}
