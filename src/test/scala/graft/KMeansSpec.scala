package graft

import graft.queries.DataOps

/** Deterministic Lloyd k-means, rebuilt from first principles: every
  * iteration (assignment argmin with lowest-d2-then-lowest-cid
  * tie-break, sorted-value fold means) re-run in plain driver Scala with
  * the same IEEE operation order, and compared BIT-exactly — assignments,
  * distances and centroids. Plus the Lloyd monotonicity property:
  * total inertia never increases across iterations.
  */
class KMeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = 8

  private def vectors: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toMap

  /** Driver mirror of one assignment pass + one update pass. */
  private def lloyd(vs: Map[Long, Array[Double]], iters: Int)
  : (Map[Long, (Int, Double)], Map[Int, Array[Double]]) = {
    var cents: Map[Int, Array[Double]] = vs.keys.toSeq.sorted.take(K)
      .zipWithIndex.map { case (id, i) => i -> vs(id) }.toMap
    var assign: Map[Long, (Int, Double)] = Map.empty
    for (_ <- 1 to iters) {
      assign = vs.map { case (id, x) =>
        // mirror array_min over struct(d2, cid): lexicographic min
        val best = cents.toSeq.sortBy(_._1).map { case (cid, c) =>
          var a = 0.0
          var i = 0
          while (i < x.length) { val d = x(i) - c(i); a += d * d; i += 1 }
          (a, cid)
        }.min
        id -> ((best._2, best._1))
      }
      cents = assign.groupBy(_._2._1).map { case (cid, members) =>
        val ms = members.keys.toSeq
        val dim = vs(ms.head).length
        cid -> Array.tabulate(dim) { d =>
          // mirror the sorted-value fold: ascending values, left-to-right
          ms.map(vs(_)(d)).sorted.foldLeft(0.0)(_ + _) / ms.size
        }
      }
    }
    (assign, cents)
  }

  test("three Lloyd iterations match the driver mirror bit-exactly") {
    val vs = vectors
    val (wantAssign, wantCents) = lloyd(vs, 3)
    val got = DataOps.kmeansLloyd(spark, dir, K, 3).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getDouble(3)))).toMap
    got.keySet shouldBe vs.keySet
    got shouldBe wantAssign

    val gotCents = DataOps.kmeansCentroids(
      DataOps.kmeansLloyd(spark, dir, K, 3)).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    // one more update over the mirrored final assignment
    val wantNext = wantAssign.groupBy(_._2._1).map { case (cid, members) =>
      val ms = members.keys.toSeq
      cid -> Array.tabulate(vs(ms.head).length) { d =>
        ms.map(vs(_)(d)).sorted.foldLeft(0.0)(_ + _) / ms.size
      }
    }
    gotCents.keySet shouldBe wantNext.keySet
    gotCents.foreach { case (cid, vec) =>
      vec.toSeq shouldBe wantNext(cid).toSeq
    }
  }

  test("diversity sample: per-cluster closest members, balanced, mirror-exact") {
    val vs = vectors
    val (assign, _) = lloyd(vs, 3)
    val m = 16
    val want = assign.toSeq
      .groupBy(_._2._1)
      .flatMap { case (cid, members) =>
        members.toSeq.map { case (id, (_, d2)) => (id, cid, d2) }
          .sortBy { case (id, _, d2) => (d2, id) }.take(m)
          .zipWithIndex.map { case ((id, c, d2), i) => (id, c, d2, i.toLong + 1) }
      }.toSet
    val got = DataOps.diversitySample(spark, dir, 8, 3, m).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    got shouldBe want
    // balance: every cluster contributes exactly min(m, population)
    val pop = assign.groupBy(_._2._1).map { case (c, ms) => c -> ms.size }
    got.groupBy(_._2).foreach { case (c, rows) =>
      rows.size shouldBe math.min(m, pop(c))
    }
  }

  test("inertia never increases across iterations; clusters are non-trivial") {
    def inertia(iters: Int): Double =
      DataOps.kmeansLloyd(spark, dir, K, iters).collect().map(_.getDouble(3)).sum
    val seq = (1 to 3).map(inertia)
    seq.sliding(2).foreach { case Seq(a, b) => b should be <= a }
    val clusters = DataOps.kmeansLloyd(spark, dir, K, 3).collect()
      .map(_.getInt(2)).distinct
    clusters.length should be > 1
  }
}
