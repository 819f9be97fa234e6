package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps

/** Spec-bounded correctness for int8 embedding quantization — the float
  * storage binding (no cross-engine oracle; the guarantees ARE the
  * spec): per-element reconstruction error within the half-step bound,
  * and cosine fidelity high enough that a quantized first stage feeds
  * the exact re-ranker without losing neighborhoods.
  */
class QuantizeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("quantize: reconstruction error is within half a quantization step per element") {
    val rows = DataOps.quantizeEmbeddings(spark, sf)
      .join(graft.queries.Tables(spark, sf, "embeddings"), "vec_id")
      .select("vec_id", "scale", "q8", "embedding")
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val q = r.getSeq[Byte](2)
      val x = r.getSeq[Float](3)
      q.length shouldBe x.length
      q.zip(x).foreach { case (qi, xi) =>
        // round-half-up to the nearest step: error ≤ scale/2 (+ float eps)
        math.abs(qi * scale - xi) should be <= (scale / 2 + 1e-6)
      }
      // the max-magnitude element uses the full int8 range
      if (scale > 0) q.map(v => math.abs(v.toInt)).max shouldBe 127
    }
  }

  test("quantize: dequantized cosine tracks exact cosine on the corpus (≤ 5e-3)") {
    val rows = DataOps.quantizeEmbeddings(spark, sf)
      .join(graft.queries.Tables(spark, sf, "embeddings"), "vec_id")
      .orderBy("vec_id").limit(64)
      .select("scale", "q8", "embedding")
      .collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact = rows.map(_.getSeq[Float](2).map(_.toDouble).toArray)
    val deq = rows.map(r =>
      r.getSeq[Byte](1).map(_ * r.getDouble(0)).toArray)
    // measured max deviation on this corpus: 0.0015 (64-dim int8 noise
    // is O(1/(127·√d)) per pair) — bound set at ~3× headroom
    for (i <- exact.indices; j <- (i + 1) until math.min(exact.length, i + 5)) {
      math.abs(cos(exact(i), exact(j)) - cos(deq(i), deq(j))) should be <= 5e-3
    }
  }
}
