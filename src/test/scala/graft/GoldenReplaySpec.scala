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
}
