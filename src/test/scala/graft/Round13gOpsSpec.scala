package graft

import org.apache.spark.sql.functions._

import graft.funcs.MortonInterleave
import graft.queries.{Relational, Tables}

/** r13g operator batch — physical-layout family: Morton z-order
  * zone-map audit (native codegen interleave) and the deterministic
  * universe-sample estimator. Exact cross-engine equality is the
  * driver's DuckDB oracle; these pin pruning SOUNDNESS, the z-order
  * advantage over a single-dimension layout, and estimator laws.
  */
class Round13gOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def mortonRef(x: Long, y: Long): Long =
    (0 until MortonInterleave.Bits).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("morton: codegen expression is bit-exact against the scalar definition") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (4095L, 4095L), (5L, 3L), (2404L, 3907L),
      (1L, 0L), (0L, 1L), (2048L, 1024L))
    val got = pairs.toDF("x", "y")
      .select(MortonInterleave(col("x"), col("y"))).as[Long].collect()
    got.toSeq shouldBe pairs.map { case (x, y) => mortonRef(x, y) }
  }

  test("zorder_audit: pruning is SOUND — every box-matching row lives in a kept file") {
    val audit = Relational.zorderAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    val (x1, x2, y1, y2) = Relational.ZBox
    // recompute each order's file id in the spec's own words and check
    // no box row falls in a can_prune file
    val rows = Tables(spark, sf, "orders")
      .select(
        least(datediff(to_date(col("o_orderdate")),
          lit(Relational.ZEpoch).cast("date")), lit(4095)).cast("long").as("x"),
        least(floor(col("o_totalprice") / Relational.ZPriceQuantum)
          .cast("long"), lit(4095L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val boxRows = rows.filter { case (x, y) =>
      x >= x1 && x < x2 && y >= y1 && y < y2 }
    boxRows.length should be > 0
    boxRows.foreach { case (x, y) =>
      val f = mortonRef(x, y) >> Relational.ZFileShift
      audit(f) shouldBe false // a file holding a match must be kept
    }
    // and pruning is non-trivial: most files are skippable for the box
    audit.values.count(identity) should be > audit.size / 2
  }

  test("zorder_audit: a price-only band prunes z-tiles but ZERO date-linear files") {
    // the multi-dimensional point: a date-sorted layout has no price
    // locality, so a price band keeps every file; the z-layout's zone
    // maps bound BOTH dims and skip most tiles
    val (_, _, y1, y2) = Relational.ZBox
    val audit = Relational.zorderAudit(spark, sf).collect()
      .map(r => (r.getLong(4), r.getLong(5))) // (min_y, max_y)
    val zPruned = audit.count { case (mn, mx) => mx < y1 || mn >= y2 }
    zPruned should be > audit.length / 2
    // date-linear layout: files = contiguous day ranges; per-file price
    // zone maps span (nearly) the full domain, so none can prune
    val rows = Tables(spark, sf, "orders")
      .select(
        datediff(to_date(col("o_orderdate")),
          lit(Relational.ZEpoch).cast("date")).cast("long").as("x"),
        floor(col("o_totalprice") / Relational.ZPriceQuantum)
          .cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val linPruned = rows.groupBy(_._1 / 38).values // 64 day-range files
      .count { f =>
        val ys = f.map(_._2)
        ys.max < y1 || ys.min >= y2
      }
    linPruned shouldBe 0
  }

  test("hash_sample_est: estimator laws and sf0.01 fidelity") {
    val rows = Relational.hashSampleEst(spark, "/root/testdata/sf0.01").collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nExact, nSample, nEst, centsEst) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      nEst shouldBe 16 * nSample
      nSample should be <= nExact
      // 1/16 universe sample at ~2000 rows/type: ~125 sampled, rel
      // error ~ 1/sqrt(125) ~ 9% — ±40% is > 4 sigma
      math.abs(nEst - nExact).toDouble should be < 0.4 * nExact
      centsEst should be > 0L
    }
  }
}
