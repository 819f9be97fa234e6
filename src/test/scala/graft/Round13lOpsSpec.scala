package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Tables}

/** r13l operator batch — consistent-hash ring routing and integer ±1
  * random projection. Exact cross-engine equality is the driver's
  * DuckDB oracle; these pin the ring's minimal-movement law and the
  * projection's norm-preservation expectation.
  */
class Round13lOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("ring_shards: adding a shard's vnodes moves docs ONLY to the new shard") {
    val d = Tables(spark, sf, "documents").select(col("doc_id"))
    val before = d.select(col("doc_id"),
        DataOps.ringAssignExpr(col("doc_id"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = d.select(col("doc_id"),
        DataOps.ringAssignExpr(col("doc_id"), 17).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = before.keys.filter(k => before(k) != after(k))
    moved.foreach { k => after(k) shouldBe 16L }
    // ~8/136 of the ring's arc belongs to the new shard's vnodes
    moved.size.toDouble should be < 0.25 * before.size
  }

  test("ring_shards: every doc routes to a live shard and the report is total") {
    val rows = DataOps.ringShards(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    total shouldBe Tables(spark, sf, "documents").count()
    rows.foreach { r =>
      r.getLong(0) should be >= 0L
      r.getLong(0) should be < DataOps.RingShardsN.toLong
    }
  }

  test("rand_projection: E[norm²] preservation and exact linear reproduction") {
    val proj = DataOps.randProjection(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    proj.length should be > 0
    // reproduce one vector's projections in the spec's own words
    val q = DataOps.quantizeCodes(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byVec = q.groupBy(_._1).map { case (v, xs) =>
      v -> xs.sortBy(_._2).map(_._3.toLong)
    }
    val someVec = byVec.keys.min
    val expect = (0 until DataOps.ProjK).map { k =>
      byVec(someVec).zipWithIndex.map { case (c, d) =>
        c * DataOps.ProjSigns(k)(d)
      }.sum
    }
    proj.filter(_._1 == someVec).sortBy(_._2).map(_._3).toSeq shouldBe expect
    // norm law: mean over k of proj² ≈ ‖code‖² (sign variance 1);
    // averaged over all vecs the ratio concentrates hard
    val norms = byVec.map { case (v, cs) => v -> cs.map(c => c * c).sum }
    val ratios = proj.groupBy(_._1).map { case (v, ps) =>
      ps.map(p => p._3.toDouble * p._3).sum / DataOps.ProjK / norms(v)
    }
    val mean = ratios.sum / ratios.size
    mean should be > 0.8
    mean should be < 1.2
  }
}
