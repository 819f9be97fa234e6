package graft

import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.sink.PartitionedCorpus

/** Partitioned corpus layout: round-trip fidelity, directory-level
  * partition pruning, and row-group predicate pushdown — the two scan
  * effects the layout exists to buy.
  */
class PartitionedCorpusSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("write lays out lang directories; scoped read prunes and pushes down") {
    val dir = tmpDir("pcorp")
    val docs = Tables(spark, sf, "documents")
    PartitionedCorpus.write(docs, dir)

    // one directory per language, no top-level data files
    val top = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    top.toSet shouldBe docs.select("lang").distinct().collect()
      .map(r => s"lang=${r.getString(0)}").toSet

    // round trip: nothing lost, per-lang content identical
    val back = spark.read.parquet(dir)
    back.count() shouldBe docs.count()
    back.select("doc_id", "text", "lang", "source", "n_chars")
      .exceptAll(docs.select("doc_id", "text", "lang", "source", "n_chars"))
      .count() shouldBe 0L

    // the scoped read prunes partitions and pushes the doc_id bound
    val scoped = PartitionedCorpus.readLang(spark, dir, "en", Some(100L))
    val plan = scoped.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include regex "PartitionFilters: \\[.*lang.*en.*\\]"
    plan should include regex "PushedFilters: \\[.*GreaterThanOrEqual\\(doc_id,100\\).*\\]"
    scoped.count() shouldBe docs
      .filter(col("lang") === "en" && col("doc_id") >= 100).count()

    // each written file holds exactly one language (task↔directory
    // alignment — the writer repartitioned by the partition column)
    val files = back.select(col("lang"),
        expr("input_file_name()").as("f"))
      .groupBy("f").agg(countDistinct(col("lang")).as("n"))
    files.filter(col("n") =!= 1).count() shouldBe 0L
  }

  test("in-file doc_id sort holds (row-group stats are monotone)") {
    val dir = tmpDir("pcorp2")
    PartitionedCorpus.write(Tables(spark, sf, "documents"), dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("f")).orderBy(col("ord"))
    val rows = spark.read.parquet(dir)
      .select(col("doc_id"), expr("input_file_name()").as("f"),
        monotonically_increasing_id().as("ord"))
      .withColumn("prev", lag(col("doc_id"), 1).over(w))
    rows.filter(col("prev").isNotNull && col("prev") > col("doc_id"))
      .count() shouldBe 0L
  }
}
