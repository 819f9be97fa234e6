package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.funcs.Funcs

class FuncsSpec extends SparkSpec {
  import spark.implicits._

  test("F1 articleId matches reference md5 golden pair") {
    // Real pair from the reference's shipped data/articles.db (FIXTURES.md §1).
    val url = "https://skift.com/2025/08/01/from-concur-to-spotnana-steve-singh-on-how-ai-could-fix-corporate-travel/"
    val got = Seq(url).toDF("link").select(Funcs.articleId($"link")).head.getString(0)
    got shouldBe "b6180012cdfcaab01451bded2196d26c"
  }

  test("F2 parseDate: PhocusWire month-name format to midnight; ISO otherwise; null on garbage") {
    val df = Seq(
      ("July 28, 2025", "Phocuswire"),
      ("2025-08-01T17:19:21", "Skift"),
      ("not a date", "Phocuswire"),
      ("not a date", "Skift"),
    ).toDF("raw", "src").select(Funcs.parseDate($"raw", $"src").as("ts"))
    val rows = df.collect().map(r => Option(r.getTimestamp(0)))
    rows(0) shouldBe Some(Timestamp.valueOf("2025-07-28 00:00:00"))
    rows(1) shouldBe Some(Timestamp.valueOf("2025-08-01 17:19:21"))
    rows(2) shouldBe None
    rows(3) shouldBe None
  }

  test("F3 dropTimezone discards (not converts) the offset") {
    val df = Seq("2025-08-01T17:19:21+05:00", "2025-08-01T17:19:21Z",
                 "2025-08-01T17:19:21-0300", "2025-08-01T17:19:21")
      .toDF("s").select(Funcs.dropTimezone($"s").as("ts"))
    df.collect().map(_.getTimestamp(0)).foreach {
      _ shouldBe Timestamp.valueOf("2025-08-01 17:19:21")
    }
  }

  test("F4/processed-at render formats: T-separated vs space-separated") {
    val ts = Timestamp.valueOf("2025-08-01 17:19:21")
    val df = Seq(ts).toDF("ts")
      .select(Funcs.isoWithT($"ts").as("t"), Funcs.isoWithSpace($"ts").as("s"))
    val r = df.head
    r.getString(0) shouldBe "2025-08-01T17:19:21"
    r.getString(1) shouldBe "2025-08-01 17:19:21"
  }

  test("F5 truncToDay zeroes time parts") {
    val df = Seq(Timestamp.valueOf("2025-08-01 17:19:21")).toDF("ts")
      .select(Funcs.truncToDay($"ts"))
    df.head.getTimestamp(0) shouldBe Timestamp.valueOf("2025-08-01 00:00:00")
  }

  test("P5 cleanAuthor strips only the By prefix") {
    val df = Seq("By Jane Doe", "Jane Doe", "Derby Author").toDF("a")
      .select(Funcs.cleanAuthor($"a"))
    df.collect().map(_.getString(0)) shouldBe Array("Jane Doe", "Jane Doe", "Derby Author")
  }

  test("P6 bylineDate takes the trimmed second pipe segment") {
    val df = Seq("By Mitra Sorrells | July 28, 2025").toDF("b")
      .select(Funcs.bylineDate($"b"))
    df.head.getString(0) shouldBe "July 28, 2025"
  }
}
