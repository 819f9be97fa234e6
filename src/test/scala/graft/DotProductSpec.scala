package graft

import org.apache.spark.sql.functions._

import graft.ml.VectorOps

/** The native DotProduct expression must be bit-identical to its
  * built-in-fold specification (same left-to-right double accumulation)
  * in both interpreted and codegen paths.
  */
class DotProductSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("native expression equals the HOF fold on every embedding pair") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50).cache()
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
    val diff = pairs.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.foldDot(col("a"), col("b")).as("fold"))
      .filter(col("native") =!= col("fold"))
    diff.count() shouldBe 0L
  }

  test("known values, including self dot = squared norm") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    df.select(VectorOps.dot(col("a"), col("b"))).head().getDouble(0) shouldBe 32.0
    df.select(VectorOps.dot(col("a"), col("a"))).head().getDouble(0) shouldBe 14.0
  }

  test("null array yields null; unequal lengths dot the common prefix") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Option.empty[Array[Float]]),
                 (Array(1.0f, 2.0f), Some(Array(3.0f))))
      .toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    out(1).getDouble(0) shouldBe 3.0
  }
}
