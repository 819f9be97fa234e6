package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.funcs.TopKAgg
import graft.queries.DataOps

/** The heap aggregate is an EXACT commutative fold — unlike the MG
  * sketch these specs pin full equality with the window form under
  * every partitioning, plus the buffer mechanics (compaction past 2k,
  * serialize round-trip via the streaming state store, null skipping).
  */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  // 4 groups x 1000 rows with colliding scores so ties exercise the
  // (score desc, id asc) tie-break everywhere
  private def rows(parts: Int): DataFrame =
    spark.range(4000)
      .select(pmod(col("id"), lit(4)).as("g"), (col("id") % 97).as("s"), col("id"))
      .repartition(parts)

  private def viaAgg(df: DataFrame, k: Int): Set[(Long, Long, Long)] =
    df.groupBy("g").agg(TopKAgg(col("s"), col("id"), k).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.score"), col("e.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def viaWindow(df: DataFrame, k: Int): Set[(Long, Long, Long)] =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("s").desc, col("id"))))
      .filter(col("rn") <= k).select(col("g"), col("s"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("equals the window top-k under any partitioning, ties broken by id") {
    for (parts <- Seq(1, 4, 13); k <- Seq(1, 3, 50)) {
      withClue(s"parts=$parts k=$k: ") {
        viaAgg(rows(parts), k) shouldBe viaWindow(rows(1), k)
      }
    }
  }

  test("groups smaller than k return all their rows, sorted") {
    val df = Seq((1L, 10L, 100L), (1L, 20L, 101L)).toDF("g", "s", "id")
    val got = df.groupBy("g").agg(TopKAgg(col("s"), col("id"), 5).as("top"))
      .select(col("top")).head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe Seq((20L, 101L), (10L, 100L))
  }

  test("null score or id rows are skipped") {
    val df = Seq((Some(5L), Some(1L)), (None, Some(2L)), (Some(7L), None))
      .toDF("s", "id").withColumn("g", lit(0L))
    val got = df.groupBy("g").agg(TopKAgg(col("s"), col("id"), 5).as("top"))
      .select(explode(col("top")).as("e")).select("e.score", "e.id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq shouldBe Seq((5L, 1L))
  }

  test("streaming aggregation restores heap buffers from the state store") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("s", "id").withColumn("g", lit(0L))
      .groupBy("g").agg(TopKAgg(col("s"), col("id"), 2).as("top"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("ckpt-topk"))
      .start()
    mem.addData((10L, 1L), (30L, 2L))
    q.processAllAvailable()
    mem.addData((20L, 3L), (5L, 4L))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT inline(top) FROM topk_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq shouldBe Seq((30L, 2L), (20L, 3L))
  }

  test("topk_per_key: grades against the window form on the real corpus") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = DataOps.topkPerKey(spark, sf).cache()
      // exactly k per language
      got.groupBy("lang").count().filter(col("count") =!= 3).count() shouldBe 0L
      // rank order consistent with scores
      got.filter(col("rank") === 1).join(
          got.filter(col("rank") === 3).withColumnRenamed("score_milli", "s3")
            .select("lang", "s3"), "lang")
        .filter(col("score_milli") < col("s3")).count() shouldBe 0L
      got.unpersist()
    }
  }
}
