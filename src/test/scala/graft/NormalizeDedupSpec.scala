package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.text.TextOps

/** The reason [[TextOps.normalize]] exists: mixed-encoding near-dups.
  * Each planted pair is the SAME accented document in two encodings —
  * NFC-composed ('á' U+00E1, additionally zero-width-polluted, uppercased
  * and whitespace-padded) vs NFD-decomposed ('a' + combining acute) —
  * exactly the variance real crawls carry. MinHash-LSH dedup on raw text
  * misses every planted pair (no shingle collides); after normalization
  * both encodings collapse to identical text and every pair is caught at
  * Jaccard 1.0. Also pins normalizer idempotence.
  */
class NormalizeDedupSpec extends SparkSpec {

  test("planted mixed-encoding near-dups: invisible raw, exact after normalize") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 40)
    // composed + polluted rendition at id + 100000
    val composed = d.select((col("doc_id") + 100000).as("doc_id"),
      concat(lit("\u200B"),
        upper(regexp_replace(col("text"), "a", "á")),
        lit("   \t")).as("text"))
    // decomposed clean rendition of the SAME content at id + 200000
    val decomposed = d.select((col("doc_id") + 200000).as("doc_id"),
      regexp_replace(col("text"), "a", "á").as("text"))
    val corpus = d.unionByName(composed).unionByName(decomposed)
    val planted = d.collect().map(_.getLong(0))
      .map(i => (i + 100000, i + 200000)).toSet

    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      DataOps.dedupOnShingles(
        DataOps.shingledOn(df), DataOps.BandBucketCap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    pairs(corpus).keySet.intersect(planted) shouldBe empty

    val normalized = corpus.select(col("doc_id"),
      TextOps.normalize(col("text")).as("text"))
    val normPairs = pairs(normalized)
    planted.subsetOf(normPairs.keySet) shouldBe true
    planted.foreach(p => normPairs(p) shouldBe 1.0)

    // idempotence: normalizing normalized text is the identity
    normalized.select(col("text").as("t1"),
        TextOps.normalize(col("text")).as("t2"))
      .filter(col("t1") =!= col("t2")).count() shouldBe 0L
  }
}
