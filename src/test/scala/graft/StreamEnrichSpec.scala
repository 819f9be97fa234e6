package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.StreamEnrich

/** Stream-static enrichment: the dimension is re-resolved at every
  * micro-batch (the foreachBatch pattern), so a dimension UPDATE between
  * batches is visible to the next batch — the semantics a query-start
  * static join cannot provide — and unmatched keys flow through null-
  * enriched instead of dropping.
  */
class StreamEnrichSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val inSchema = StructType(Seq(
    StructField("key", LongType), StructField("event", StringType)))

  private def writeDim(path: String, rows: Seq[(Long, String)]): Unit =
    spark.createDataFrame(
        rows.map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava,
        StructType(Seq(StructField("key", LongType),
          StructField("label", StringType))))
      .repartition(1).write.mode("overwrite").parquet(path)

  private def writeInput(dir: String, file: String, rows: Seq[(Long, String)]): Unit = {
    // the file stream source lists FILES — stage the parquet directory
    // and land its single part-file flat under the watched dir
    val stage = tmpDir("enrich-stage")
    spark.createDataFrame(
        rows.map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava, inSchema)
      .repartition(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, s"$file.parquet"))
    ()
  }

  test("each micro-batch sees the newest dimension snapshot; misses survive") {
    val in = tmpDir("enrich-in")
    val dim = tmpDir("enrich-dim") + "/dim"
    val out = tmpDir("enrich-out")

    writeDim(dim, Seq(1L -> "v1-one", 2L -> "v1-two"))
    writeInput(in, "b1", Seq(1L -> "e1", 2L -> "e2", 99L -> "e3"))
    def run(): Unit = {
      val stream = spark.readStream.schema(inSchema).parquet(in)
      StreamEnrich.enrichToParquet(spark, stream, dim, out)
        .start().awaitTermination()
    }
    run()
    val r1 = spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getAs[String]("event"), Option(r.getAs[String]("label")))).toMap
    r1("e1") shouldBe Some("v1-one")
    r1("e2") shouldBe Some("v1-two")
    r1("e3") shouldBe None // key 99 not in the dimension — kept, not dropped

    // publish dimension v2, land a second input file, resume from the
    // checkpoint: ONLY the new file processes, and it sees v2
    writeDim(dim, Seq(1L -> "v2-one", 2L -> "v2-two"))
    writeInput(in, "b2", Seq(1L -> "e4"))
    run()
    val r2 = spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getAs[String]("event"), Option(r.getAs[String]("label")))).toMap
    r2("e4") shouldBe Some("v2-one")
    // batch-1 rows were NOT reprocessed under v2 (exactly-once held)
    r2("e1") shouldBe Some("v1-one")
    r2.size shouldBe 4
  }

  test("a replayed batch overwrites its own partition — no duplicate rows") {
    // foreachBatch is at-least-once: a crash between the batch's write and
    // the checkpoint commit re-runs the batch on restart. The sink keys the
    // physical layout on the batch id (dynamic partition overwrite), so the
    // replay rewrites the same partition instead of appending a second copy.
    val dim = tmpDir("enrich-dim2") + "/dim"
    val out = tmpDir("enrich-out2")
    writeDim(dim, Seq(1L -> "one"))
    val batch = spark.createDataFrame(
      Seq(1L -> "e1", 2L -> "e2").map { case (k, v) =>
        org.apache.spark.sql.Row(k, v) }.asJava, inSchema)
    StreamEnrich.enrichBatch(batch, 0L, dim, out)
    StreamEnrich.enrichBatch(batch, 0L, dim, out) // the replay
    val rows = spark.read.parquet(s"$out/data")
    rows.count() shouldBe 2L
    // and a NEW batch id lands alongside, untouched by the replay
    StreamEnrich.enrichBatch(batch.filter(col("key") === 2L), 1L, dim, out)
    spark.read.parquet(s"$out/data").count() shouldBe 3L
  }
}
