package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, RefOps, Tables}

/** r13f operator batch — the additive sketch-register family: Count-Min
  * token counters, Bloom join-pruning audit, one-permutation-hashing
  * MinHash. Exact cross-engine equality is the driver's DuckDB oracle;
  * these pin each sketch's defining mathematical property (one-sided
  * error, merge law, no false negatives, estimator fidelity) and the
  * pre-checkpoint plan shapes.
  */
class Round13fOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("cms_topk_est: the estimate never undercounts (CMS's one-sided guarantee)") {
    val rows = DataOps.cmsTopkEst(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      est should be >= exact
      r.getBoolean(3) shouldBe true
    }
  }

  test("cms_topk_est: registers are ADDITIVE — doubling the input doubles every cell") {
    val tc = DataOps.cmsTokenCounts(spark, sf)
    val once = DataOps.cmsRegistersOf(tc).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the merge law: registers over events ∪ events = cell-wise sum of
    // the two partial sketches = 2x each counter
    val doubled = DataOps.cmsRegistersOf(tc.union(tc)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    doubled shouldBe once.map { case (k, v) => k -> 2 * v }
  }

  test("cms_topk_est: pre-checkpoint plan stays within its shuffle budget") {
    // histogram shuffle (x2 branches on the uncached frame) + register
    // cell agg + TakeOrdered + the bounded probe agg
    spark.catalog.clearCache()
    val p = DataOps.cmsTopkEstOn(DataOps.cmsTokenCounts(spark, sf))
      .queryExecution.executedPlan.toString
    val n = ("Exchange hashpartitioning".r.findAllIn(p).length
      + "Exchange rangepartitioning".r.findAllIn(p).length
      + "Exchange SinglePartition".r.findAllIn(p).length)
    withClue(p) { n should be <= 5 }
  }

  test("bloom_prune_audit: no false negatives, no saturation") {
    val rows = RefOps.bloomPruneAudit(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nUsers, nPass, nMember, nBits) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      nPass should be >= nMember // every member's k positions are set
      nPass should be <= nUsers
      nBits should be <= math.min(RefOps.BloomHashes * nMember,
        RefOps.BloomBits)
    }
  }

  test("bloom_prune_audit: every member passes the filter row-level") {
    // rebuild the k positions in the spec's own words and check each
    // member hits only set bits — the row-level form of the aggregate
    // no-false-negative pin above
    val e = Tables(spark, sf, "events")
    val members = e.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(8)) === 0)
      .collect().map(_.getLong(0))
    members.length should be > 0
    def positions(u: Long): Seq[Long] = (1 to RefOps.BloomHashes).map { j =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bloom:$j:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % RefOps.BloomBits
    }
    val bits = members.flatMap(positions).toSet
    members.foreach { u => positions(u).forall(bits.contains) shouldBe true }
  }

  test("oph_minhash: estimator tracks exact Jaccard on the graded pair set") {
    val rows = DataOps.ophMinhash(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (j, nUsed, est) = (r.getDouble(2), r.getLong(3), r.getLong(5))
      nUsed should be >= 1L
      nUsed should be <= DataOps.OphBuckets
      est should be <= 1000L
      // 32-bucket OPH on a J >= 0.8 pair: binomial std ~ sqrt(k*J(1-J))/k
      // < 0.07 — +-200 per-mille is ~3 sigma plus small-doc slack
      est.toDouble should be >= 1000 * j - 200
      est.toDouble should be <= 1000 * j + 200
    }
  }
}
