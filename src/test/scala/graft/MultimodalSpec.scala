package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

/** Multimodal plumbing contract: BINARY payload column with typed
  * metadata, per-partition decode boundary (stubbed — no codecs in this
  * container), deterministic features.
  */
class MultimodalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("media table carries a BINARY payload and a modality tag") {
    val m = MultimodalOps.mediaTable(spark, sf)
    m.schema("payload").dataType.typeName shouldBe "binary"
    m.select("format").distinct().collect().map(_.getString(0)).toSet shouldBe
      Set("image", "audio", "video")
  }

  test("decode stub: histogram accounts for every payload byte, deterministic") {
    val f = MultimodalOps.extractFeatures(spark, sf).cache()
    f.count() shouldBe 500L
    // histogram mass == payload bytes, per row
    import spark.implicits._
    f.map(r => (r.n_bytes, r.hist.sum)).filter(t => t._1 != t._2)
      .count() shouldBe 0L
    // deterministic across runs
    val a = f.select("doc_id", "n_bytes").orderBy("doc_id").collect()
    val b = MultimodalOps.extractFeatures(spark, sf)
      .select("doc_id", "n_bytes").orderBy("doc_id").collect()
    a shouldBe b
  }

  test("metadata query is consistent with the feature extraction") {
    val meta = MultimodalOps.multimodalMeta(spark, sf)
    val f = MultimodalOps.extractFeatures(spark, sf)
      .select(col("doc_id"), col("n_bytes").as("fb"))
    meta.join(f, "doc_id").filter(col("n_bytes") =!= col("fb"))
      .count() shouldBe 0L
    meta.filter(col("n_chunks") =!= col("n_frames")).count() shouldBe 0L
  }
}
