package graft

import graft.queries.DataOps

/** r17 additions: the soft-dedup sampler (N249). The PQ/ADC graduation
  * (ann_pq) is covered by AnnPqSpec + the DuckDB oracle; the sampler's
  * draw is double-implemented here with java.security.MessageDigest so
  * a drift in the Spark-side hash expression fails against an
  * independent construction, not against itself.
  */
class Round17OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def drawPpm(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"sdw:$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1000000L
  }

  test("soft_dedup_sample: kept set is exactly the independent md5 draw under weight_ppm") {
    val weights = DataOps.softDedupWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val kept = DataOps.softDedupSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    // independent reconstruction: every doc with draw < weight, no other
    val expect = weights.collect {
      case (d, w) if drawPpm(d) < w => d
    }.toSet
    kept.map(_._1).toSet shouldBe expect
    kept.foreach { case (d, w, draw) =>
      w shouldBe weights(d)
      draw shouldBe drawPpm(d)
      draw should be < w
    }
    // singletons carry weight 10^6 and a mod-10^6 draw is always under
    // it — certainty for unduplicated docs, the SoftDedup contract
    val singletons = weights.filter(_._2 == 1000000L).keySet
    singletons.diff(kept.map(_._1).toSet) shouldBe empty
  }

  test("soft_dedup_sample: near-dup families keep ~one copy's mass in expectation") {
    val rows = DataOps.softDedupSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // no family floods the sample: kept docs per family can exceed 1
    // (Bernoulli, not top-1) but the weights bound the EXPECTED count at
    // 1; on this corpus no family should retain more than half its copies
    rows.groupBy(_._2).foreach { case (_, g) =>
      val size = g.head._3
      if (size > 2) g.length.toLong should be <= (size / 2 + 1)
    }
  }
}
