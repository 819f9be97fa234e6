package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables
import graft.sink.CorpusExport
import graft.source.CsvSource

/** CSV malformed-row contract (permissive quarantine / drop / failfast)
  * and the ORC export round trip.
  */
class CsvSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType)))

  private def writeCsv(): String = {
    val dir = tmpDir("csv")
    // two malformed lines: a non-numeric score and a row with too many
    // columns for the declared schema
    Files.write(Paths.get(dir, "part.csv"),
      """id,name,score
        |1,alice,10
        |2,bob,notanumber
        |3,carol,30
        |4,dave,40,EXTRA,COLS
        |5,erin,50
        |""".stripMargin.getBytes("UTF-8"))
    dir
  }

  test("PERMISSIVE quarantines malformed lines in _corrupt_record, keeps the rest") {
    val dir = writeCsv()
    val out = CsvSource.read(spark, dir, schema).cache()
    out.count() shouldBe 5L
    val bad = out.filter(col(CsvSource.CorruptColumn).isNotNull)
    bad.count() shouldBe 2L
    // the raw lines survive byte-for-byte for the dead-letter route
    bad.select(CsvSource.CorruptColumn).collect().map(_.getString(0))
      .exists(_.contains("notanumber")) shouldBe true
    // clean rows parse fully
    out.filter(col(CsvSource.CorruptColumn).isNull)
      .agg(sum(col("score"))).head.getLong(0) shouldBe 90L
  }

  test("DROPMALFORMED keeps only clean rows — when the columns are actually read") {
    val dir = writeCsv()
    val out = CsvSource.readDropMalformed(spark, dir, schema)
    // the column-pruning trap, demonstrated: count() parses NO columns,
    // so no conversion can fail and nothing is dropped
    out.count() shouldBe 5L
    // materializing the full schema applies the contract
    val rows = out.select("id", "name", "score").collect()
    rows.map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 3L, 5L)
    rows.map(_.getLong(2)).sum shouldBe 90L
  }

  test("FAILFAST throws on the first malformed line") {
    val dir = writeCsv()
    intercept[SparkException] {
      CsvSource.readStrict(spark, dir, schema).collect()
    }
  }

  test("ORC round-trips the corpus exactly") {
    val dir = tmpDir("orc")
    val df = Tables(spark, "/root/testdata/sf0.001", "documents")
    CorpusExport.orc(df, dir)
    val back = CorpusExport.orcRead(spark, dir)
    back.count() shouldBe df.count()
    back.exceptAll(df).count() shouldBe 0L
    df.exceptAll(back).count() shouldBe 0L
  }
}
