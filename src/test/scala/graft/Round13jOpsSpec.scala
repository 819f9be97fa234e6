package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational}

/** r13j operator batch — host-graph BFS and the Theil–Sen robust trend.
  * Exact cross-engine equality is the driver's DuckDB oracle; these pin
  * BFS's definitional laws (seed at 0, triangle inequality on edges,
  * round-bounded reach) and Theil–Sen's outlier robustness against the
  * OLS sibling.
  */
class Round13jOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("bfs_hosts: seed at 0, neighbors differ by at most one hop, reach bounded") {
    val dist = DataOps.bfsHosts(spark, sf).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val seed = dist.keys.min
    dist(seed) shouldBe Some(0L)
    dist.values.flatten.foreach { d =>
      d should be >= 0L
      d should be <= DataOps.BfsRounds.toLong
    }
    // edge relaxation: for every edge (u, v), dist(v) <= dist(u) + 1
    // unless dist(u) + 1 exceeds the round budget
    val (_, edges) = DataOps.hostGraph(spark, sf)
    edges.collect().map(r => (r.getString(0), r.getString(1))).foreach {
      case (u, v) =>
        (dist(u), dist(v)) match {
          case (Some(du), dv) if du + 1 <= DataOps.BfsRounds =>
            dv.getOrElse(Long.MaxValue) should be <= du + 1
          case _ => ()
        }
    }
  }

  test("theil_sen: slope survives a planted outlier day that flips OLS") {
    import spark.implicits._
    // a clean linear series n = 10 + 2*day over 31 days, one type
    val clean = (0L to 30L).map(d => ("a", d, 10L + 2 * d)).toDF("event_type", "d", "n")
    val cleanSlope = Relational.theilSenOn(clean)
      .select(col("slope_micro")).head().getLong(0)
    cleanSlope shouldBe 2000000L
    // corrupt ONE day with a 1000x spike: the median of pairwise slopes
    // must not move (fewer than half the pairs touch the outlier)
    val dirty = clean.withColumn("n",
      when(col("d") === 15, lit(30000L)).otherwise(col("n")))
    val dirtySlope = Relational.theilSenOn(dirty)
      .select(col("slope_micro")).head().getLong(0)
    dirtySlope shouldBe 2000000L
  }

  test("theil_sen: graded frame is internally consistent") {
    val rows = Relational.theilSen(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nDays, nPairs) = (r.getLong(1), r.getLong(2))
      nPairs shouldBe nDays * (nDays - 1) / 2
    }
  }
}
