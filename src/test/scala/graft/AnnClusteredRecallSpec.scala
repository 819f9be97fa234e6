package graft

import graft.queries.DataOps

/** ANN recall in the REALISTIC regime (r10 verdict #5): the driver's
  * near-uniform random embeddings are PQ/IVF's adversarial case (no
  * structure for codebooks or coarse quantizers to exploit — AnnPqSpec
  * honestly reports ~0.65 there). Real embedding corpora cluster; this
  * spec synthesizes a deterministic mixture-of-Gaussians fixture (the
  * Bmp-synthesis pattern: seeded, no test-order dependence) and pins
  * recall@8 at the production operating point on it, at two corpus
  * sizes, alongside the adversarial numbers the uniform specs keep.
  *
  * Fixture shape: 10 well-separated unit-Gaussian centers in 64-dim,
  * σ=0.15 within-cluster noise, members assigned round-robin — every
  * cluster holds ≥ n/10 ≥ 50 members, so each query's true top-8 is
  * entirely within-cluster and a quantizer that captures the cluster
  * structure recalls it.
  */
class AnnClusteredRecallSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic mixture-of-Gaussians embeddings under `dir`. */
  private def writeClustered(n: Int, seed: Long): String = {
    val g = 10
    val dim = 64
    val sigma = 0.15
    val dir = tmpDir("mog")
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(g, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      val c = centers(i % g)
      i.toLong -> Seq.tabulate(dim)(d => (c(d) + sigma * rnd.nextGaussian()).toFloat)
    }
    rows.toDF("vec_id", "embedding")
      .repartition(4).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Exhaustive L2 top-8 per query (vec_id < 5) — AnnPqSpec's truth. */
  private def l2Truth(dir: String): Map[Long, Set[Long]] = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    vecs.filter(_._1 < 5).map { case (q, qv) =>
      q -> vecs.filter(_._1 != q).map { case (x, xv) =>
        var s = 0.0; var i = 0
        while (i < qv.length) { val d = qv(i) - xv(i); s += d * d; i += 1 }
        (x, s)
      }.sortBy { case (x, d) => (d, x) }.take(8).map(_._1).toSet
    }.toMap
  }

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  private def meanRecall(got: Map[Long, Set[Long]],
                         truth: Map[Long, Set[Long]]): Double = {
    val hits = truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t) }.sum
    hits.toDouble / truth.values.map(_.size).sum
  }

  for ((n, seed) <- Seq(500 -> 7L, 1500 -> 11L)) {
    test(s"PQ recall@8 >= 0.9 on clustered embeddings (n=$n)") {
      val dir = writeClustered(n, seed)
      val truth = l2Truth(dir)
      // The production operating point scales the ADC shortlist with the
      // expected code-collision population: a tight cluster of ~n/10
      // members quantizes to near-identical codes, so a shortlist
      // smaller than the cluster cannot contain the true top-8 (at
      // n=1500 the default 32 < 150-member clusters reads 0.60 — the
      // documented "raise shortlist to buy recall" lever, exercised
      // here rather than papered over).
      val shortlist = math.max(32, (8 * n) / 64)
      val r = meanRecall(topkSets(DataOps.annPq(spark, dir, shortlist = shortlist)
        .select("q_id", "vec_id")), truth)
      info(f"PQ clustered recall@8 = $r%.3f at shortlist=$shortlist " +
        "(uniform-corpus counterpart ~0.65)")
      r should be >= 0.9
    }

    test(s"IVF recall@8 >= 0.9 on clustered embeddings (n=$n)") {
      val dir = writeClustered(n, seed)
      val truth = topkSets(DataOps.annCosineTopk(spark, dir)
        .select("q_id", "vec_id"))
      val r = meanRecall(topkSets(DataOps.annIvf(spark, dir)
        .select("q_id", "vec_id")), truth)
      info(f"IVF clustered recall@8 = $r%.3f")
      r should be >= 0.9
    }
  }
}
