package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps

/** IVF ANN vs the exhaustive ground truth: recall@8 measured at two SFs
  * against [[DataOps.annCosineTopk]], pruning verified (the probed lists
  * hold strictly less than the corpus), and determinism (two runs,
  * identical rows).
  */
class AnnIvfSpec extends SparkSpec {

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  private def recallAt(dir: String): Double = {
    val truth = topkSets(DataOps.annCosineTopk(spark, dir).select("q_id", "vec_id"))
    val ivf = topkSets(DataOps.annIvf(spark, dir).select("q_id", "vec_id"))
    val hits = truth.map { case (q, t) => ivf.getOrElse(q, Set.empty).count(t) }.sum
    hits.toDouble / truth.values.map(_.size).sum
  }

  test("recall@8 vs exhaustive truth holds at two SFs") {
    // measured 0.90 (sf0.001) / 0.875 (sf0.01) with the consistent
    // quantizer (deterministic — no RNG anywhere); pinned with margin
    // for future corpus regenerations
    val r1 = recallAt("/root/testdata/sf0.001")
    val r2 = recallAt("/root/testdata/sf0.01")
    withClue(s"recall sf0.001=$r1 sf0.01=$r2: ") {
      r1 should be >= 0.7
      r2 should be >= 0.7
    }
  }

  test("the probe actually prunes: candidates scanned < corpus; runs deterministic") {
    val dir = "/root/testdata/sf0.001"
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // every returned neighbor must come from a probed list — reconstruct
    // the probed fraction from the assignment, at the operator's OWN
    // defaults so a tuning change can't leave this pinned to a stale
    // quantizer
    val assigned = DataOps
      .kmeansLloyd(spark, dir, DataOps.IvfK, DataOps.IvfIters)
      .select(col("vec_id"), col("cluster"))
    val sizes = assigned.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // even the nProbe LARGEST lists stay under the corpus
    val worst = sizes.values.toSeq.sorted.reverse.take(DataOps.IvfProbe).sum
    worst should be < n

    val a = DataOps.annIvf(spark, dir).collect().map(_.toSeq).toSet
    val b = DataOps.annIvf(spark, dir).collect().map(_.toSeq).toSet
    a shouldBe b
  }
}
