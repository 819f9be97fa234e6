package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.sink.SignatureIndex

/** The production clustering binding: [[DataOps.clusterFromIndex]] runs
  * the same large-star/small-star loop as the graded query but reads its
  * candidate front ENTIRELY from a persisted [[SignatureIndex]] — stored
  * bucket ranks instead of a window, stored shingle sets instead of raw
  * text. Proven here: output equality with the graded star clustering on
  * a full-corpus index, candidate-set equality with the window-based
  * generator at two caps (including an over-cap bucket), survival of
  * raw-corpus deletion, and the rank cap reaching the parquet scan as a
  * pushed filter.
  */
class ClusterFromIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshIndex(docs: org.apache.spark.sql.DataFrame): SignatureIndex = {
    val idx = new SignatureIndex(spark, tmpDir("cfi-idx"))
    idx.append(DataOps.shingledOn(docs))
    idx
  }

  test("full-corpus index clustering equals direct clustering, after raw deletion") {
    import spark.implicits._
    // sf0.001 has no natural >= 0.8 pairs — plant two near-dup families
    // (a 3-clique and a chain via shared text) so the clustering is
    // NON-EMPTY, then build the index from a DELETABLE copy of the corpus
    val fam = Seq(
      (2000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2002L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3000L, "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3001L, "lambda mu nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").unionByName(fam)
    val tmpData = tmpDir("cfi-data")
    corpus.write.parquet(s"$tmpData/docs")
    val idx = freshIndex(spark.read.parquet(s"$tmpData/docs"))

    val p = new org.apache.hadoop.fs.Path(tmpData)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val direct = {
      val sh = DataOps.shingledOn(corpus)
      val pairs = DataOps.dedupOnShingles(sh, DataOps.BandBucketCap)
        .select(col("doc_a"), col("doc_b"))
      DataOps.largeSmallStar(pairs)
        .select(col("doc_id"), col("rep").as("cluster_rep"),
          (col("doc_id") === col("rep")).as("keeper"))
    }
    val got = key(DataOps.clusterFromIndex(idx))
    got should not be empty
    got shouldBe key(direct)
    // both planted families clustered to their minimum ids
    got.filter(_._1 >= 2000L).map(t => (t._1, t._2)).toSet shouldBe
      Set((2000L, 2000L), (2001L, 2000L), (2002L, 2000L),
        (3000L, 3000L), (3001L, 3000L))
  }

  test("index candidates equal window candidates at cap 32 and at an over-cap 2") {
    import spark.implicits._
    // ten identical docs -> one over-cap bucket per band; plus the corpus
    val clones = (1000L until 1010L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").unionByName(clones)
    val sh = DataOps.shingledOn(corpus)
    val idx = freshIndex(corpus)

    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (cap <- Seq(32, 2)) {
      val fromIndex = pairs(DataOps.indexCandidates(idx, cap))
      val fromWindow = pairs(DataOps.lshCandidates(sh, cap))
      withClue(s"cap=$cap: ") { fromIndex shouldBe fromWindow }
    }
    // the over-cap bucket really is over cap: the clone pairs at cap 2
    // are exactly those with a generator among the two earliest clones
    val clonePairs = pairs(DataOps.indexCandidates(idx, 2))
      .filter { case (a, b) => a >= 1000L && b >= 1000L }
    clonePairs.map(_._1).toSet shouldBe Set(1000L, 1001L)
  }

  test("the rank cap is a pushed parquet filter — no window in the candidate plan") {
    val idx = freshIndex(spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text"))
    val cand = DataOps.indexCandidates(idx, DataOps.BandBucketCap)
    cand.collect()
    val plan = cand.queryExecution.executedPlan.toString
    plan should include("LessThanOrEqual(rk")
    plan should not include "Window"
  }
}
