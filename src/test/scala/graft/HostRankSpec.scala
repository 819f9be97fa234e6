package graft

import graft.queries.DataOps

/** host_rank (N86): the distributed fixed-iteration PageRank must equal a
  * sequential driver-side mirror BIT-FOR-BIT — integer mass is the whole
  * determinism argument (BIGINT sums commute; truncating division is the
  * same operation in Scala, Spark SQL `div` and DuckDB `//`), so any
  * divergence means a float or an ordering dependency crept in.
  */
class HostRankSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val Scale = 1000000000000L
  private val Iters = 5

  /** The synth dialect, sequential form: source index → canonical host. */
  private def hostOf(sidx: Long): String =
    if (sidx % 4 == 1) s"news.src$sidx.example.com"
    else s"src$sidx.example.com"

  test("host_rank equals a sequential integer PageRank mirror exactly") {
    val docIds = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val edges = docIds.map { d =>
      val s = d % 20
      (hostOf(s), hostOf((s * 3 + 1 + ((d / 20) % (1 + s % 5))) % 20))
    }.filter(e => e._1 != e._2).distinct
    val nodes = docIds.map(d => hostOf(d % 20)).distinct.sorted
    val n = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val base = (Scale * 15L) / (100L * n)
    var rank = nodes.map(h => h -> Scale / n).toMap
    (1 to Iters).foreach { _ =>
      val contrib = edges
        .map { case (s, d) => d -> (rank(s) * 85L) / (outdeg(s) * 100L) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = nodes.map(h => h -> (base + contrib.getOrElse(h, 0L))).toMap
    }
    val got = DataOps.hostRank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.keySet shouldBe rank.keySet
    got shouldBe rank
    // sanity: mass was actually redistributed (not everyone at the seed)
    got.values.toSet.size should be > 1
  }

  test("host_cap_ranked: quota follows the trust tier exactly") {
    val ranks = DataOps.hostRank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val thr = 1000000000000L / ranks.size
    val out = DataOps.hostCapRanked(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getInt(4)))
    val byHost = out.groupBy(_._1)
    byHost.keySet shouldBe ranks.keySet // every host keeps something
    byHost.foreach { case (h, rows) =>
      val quota = if (ranks(h) >= thr) 5 else 2
      withClue(s"host $h (rank ${ranks(h)}, thr $thr): ") {
        // every host has >= 25 docs at this SF, so the quota binds exactly
        rows.length shouldBe quota
        rows.map(_._4).sorted shouldBe (1 to quota)
        rows.foreach(_._3 shouldBe ranks(h))
      }
    }
    // both tiers are exercised — the composition actually differentiates
    byHost.values.map(_.length).toSet shouldBe Set(2, 5)
  }

  test("host_rank is deterministic across runs") {
    val a = DataOps.hostRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val b = DataOps.hostRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    a shouldBe b
  }
}
