package graft

import graft.queries.DataOps

/** Product-quantization ANN (N88) contract — spec-bounded binding, the
  * AnnIvfSpec pattern (float scores + approximate by design, no SQL
  * oracle):
  *
  *  - recall@8 against the exhaustive L2 truth clears a floor at two SFs
  *    (the exact re-rank stage means a truth neighbor is lost only when
  *    ADC ranks it outside the shortlist);
  *  - the re-rank ordering is the EXACT distance ordering — within each
  *    query's output, d2 is nondecreasing with rk and matches a driver
  *    recompute bit-for-bit;
  *  - deterministic across runs (bit-pinned codebooks + order-pinned
  *    ADC folds).
  */
class AnnPqSpec extends SparkSpec {

  private def truthTop8(dir: String): Map[Long, Set[Long]] = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val all = vecs.toMap
    vecs.filter(_._1 < 5).map { case (q, qv) =>
      val top = vecs.filter(_._1 != q)
        .map { case (x, xv) =>
          var s = 0.0
          var i = 0
          while (i < qv.length) { val d = qv(i) - xv(i); s += d * d; i += 1 }
          (x, s)
        }
        .sortBy { case (x, d) => (d, x) }.take(8).map(_._1).toSet
      q -> top
    }.toMap
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"PQ+re-rank recall@8 vs exhaustive L2 truth ($dir)") {
      val truth = truthTop8(dir)
      val got = DataOps.annPq(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      got.keySet shouldBe truth.keySet
      val recalls = truth.map { case (q, t) =>
        got(q).intersect(t).size.toDouble / t.size }
      val recall = recalls.sum / recalls.size
      info(f"mean recall@8 = $recall%.3f (per query: ${recalls.map(r => f"$r%.2f").mkString(", ")})")
      // The floor is the ADVERSARIAL bound: near-uniform random
      // embeddings give codebooks no structure to exploit, and the
      // r18 sample-capped trainer (PqTrainCap=256, r17 verdict #4)
      // reads ~0.45-0.48 here across 5 queries — an honest worst case,
      // protected by the exact re-rank. The REALISTIC recall pin lives
      // in AnnClusteredRecallSpec (>= 0.9 on clustered corpora, where
      // the same sampled trainer reads 1.0).
      recall should be >= 0.4
    }
  }

  test("re-rank distances are exact, ordered, and deterministic") {
    val dir = "/root/testdata/sf0.001"
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val rows = DataOps.annPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRk = rs.sortBy(_._4)
      byRk.map(_._4) shouldBe (1 to byRk.length)
      // nondecreasing exact distance with rank
      byRk.map(_._3).toSeq.sliding(2).foreach { w =>
        if (w.length == 2) w(0) should be <= w(1)
      }
      // d2 matches a driver recompute (same fold order, rounded alike)
      byRk.foreach { case (_, x, d2, _) =>
        val qv = vecs(q); val xv = vecs(x)
        var s = 0.0
        var i = 0
        while (i < qv.length) { val d = qv(i) - xv(i); s += d * d; i += 1 }
        d2 shouldBe BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble +- 1e-9
      }
    }
    val again = DataOps.annPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(4))).toSet
    again shouldBe rows.toSet
  }
}
