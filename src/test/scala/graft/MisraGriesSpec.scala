package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.funcs.MisraGriesAgg
import graft.queries.DataOps

/** The Misra–Gries aggregate's order-invariant guarantees (the residual
  * counts themselves are legitimately merge-order-sensitive, so the
  * specs pin BOUNDS, never sketch equality), plus the graded
  * `topk_frequent` composition's exactness precondition on the real
  * corpus.
  */
class MisraGriesSpec extends SparkSpec {

  import spark.implicits._

  private val Cap = 64

  /** 10 heavy tokens x 500 + 5000 singleton tail = skew that forces
    * thousands of eviction sweeps at capacity 64.
    */
  private def skewed(parts: Int): DataFrame =
    spark.range(5000 * 2)
      .select(when(col("id") < 5000, concat(lit("h"), pmod(col("id"), lit(10))))
        .otherwise(concat(lit("t"), col("id"))).as("token"))
      .repartition(parts)

  private def summary(df: DataFrame): (Map[String, (Long, Long)], Long) = {
    val rows = df.agg(MisraGriesAgg(col("token"), Cap).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.token"), col("e.cnt_lo"), col("e.cnt_hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    val dec = rows.headOption.map { case (_, (lo, hi)) => hi - lo }.getOrElse(0L)
    (rows.toMap, dec)
  }

  test("exact regime: vocabulary under capacity leaves counts exact, dec 0") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("token")
    val (got, dec) = summary(df)
    dec shouldBe 0L
    got.view.mapValues(_._1).toMap shouldBe Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
  }

  test("eviction regime: MG bounds hold under any partitioning / merge tree") {
    val exact = skewed(1).groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (parts <- Seq(1, 4, 13)) {
      val (got, dec) = summary(skewed(parts))
      withClue(s"parts=$parts: ") {
        got.size should be <= Cap
        // total decrement bounded by N/(cap+1) regardless of merge order
        dec should be <= n / (Cap + 1)
        // every survivor brackets its true count: lo <= true <= lo + dec
        got.foreach { case (t, (lo, hi)) =>
          val tru = exact(t)
          assert(lo <= tru && tru <= hi, s"$t: [$lo, $hi] vs true $tru")
        }
        // superset guarantee: heavy tokens always survive
        exact.filter(_._2 > n / (Cap + 1)).keys.foreach { t =>
          assert(got.contains(t), s"heavy token $t evicted")
        }
      }
    }
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("token")
    val (got, dec) = summary(df)
    dec shouldBe 0L
    got.view.mapValues(_._1).toMap shouldBe Map("a" -> 2L)
  }

  test("misra_gries aggregates over a stream: buffers survive the state store") {
    // the serialize/deserialize path is what streaming exercises — each
    // trigger restores the partial buffer from the state store and folds
    // the next micro-batch into it
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = mem.toDF().select(col("value").as("token"))
      .agg(MisraGriesAgg(col("token"), 8).as("mg"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("ckpt-mg"))
      .start()
    mem.addData("a", "b", "a")
    q.processAllAvailable()
    mem.addData("a", "c")
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT inline(mg) FROM mg_stream")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 3L, "b" -> 1L, "c" -> 1L)
  }

  test("topk_frequent: equals the exact vocabulary top-K, precondition has margin") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val tok = spark.read.parquet(s"$sf/documents.parquet")
        .select(explode(split(col("text"), " ")).as("token"))
      val exact = tok.groupBy("token").agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("token"))))
        .filter(col("rank") <= 20)
      val got = DataOps.topkFrequent(spark, sf)
      got.exceptAll(exact).count() shouldBe 0L
      exact.exceptAll(got).count() shouldBe 0L
      // exactness precondition: K-th count clears the MG survival bar
      val kth = exact.agg(min("n")).head().getLong(0)
      val n = tok.count()
      kth should be > n / (DataOps.TopkFreqCap + 1)
    }
  }
}
