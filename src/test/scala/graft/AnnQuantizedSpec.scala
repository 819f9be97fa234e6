package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps

/** [[DataOps.annLshBucketQuantized]] (int8 ANN over the N36 quantized
  * storage form) vs the float path, at two SFs — the spec-bounded-binding
  * pattern: quantization is a fidelity trade, so the contract is a
  * neighbor-overlap bound (measured 0.958–0.963 mean, 98.8% of queries
  * at ≥ 2/3), not row equality. Plus the exactness contract of the
  * native integer dot it scores with.
  */
class AnnQuantizedSpec extends SparkSpec {

  private def neighbors(df: org.apache.spark.sql.DataFrame) =
    df.collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).toSet }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"quantized ANN tracks the float path's neighbors ($dir)") {
      val f = neighbors(DataOps.annLshBucket(spark, dir))
      val q = neighbors(DataOps.annLshBucketQuantized(spark, dir))
      val keys = f.keySet ++ q.keySet
      val ov = keys.toSeq.map(k =>
        (f.getOrElse(k, Set.empty) intersect q.getOrElse(k, Set.empty)).size / 3.0)
      (ov.sum / ov.size) should be >= 0.9
      (ov.count(_ >= 2.0 / 3).toDouble / ov.size) should be >= 0.95
      // every vector still gets a full top-3
      q.values.foreach(_.size shouldBe 3)
    }
  }

  test("Int8Dot equals the built-in fold exactly (integer arithmetic)") {
    val q = DataOps.quantizeEmbeddings(spark, "/root/testdata/sf0.001")
    val bad = q.select(
        graft.funcs.Int8Dot(col("q8"), col("q8")).as("native"),
        expr("""aggregate(zip_with(q8, q8, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)),
                CAST(0 AS BIGINT), (a, v) -> a + v)""").as("fold"))
      .filter(col("native") =!= col("fold")).count()
    bad shouldBe 0L
  }
}
