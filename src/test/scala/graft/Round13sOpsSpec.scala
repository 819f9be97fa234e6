package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps

/** r13s operator batch — exact embedding moment matrix + Jacobi PCA,
  * integer Stupid-Backoff doc score. The moment matrix and the doc
  * score grade against the DuckDB oracle; these pin the spec-bounded
  * PCA consumer's linear-algebra laws and the integer score's bounds.
  */
class Round13sOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("embedding_moments: diagonal dominance and symmetry-free storage") {
    val rows = DataOps.embeddingMoments(spark, sf).collect()
    rows.length shouldBe DataOps.EmbDim * (DataOps.EmbDim + 1) / 2
    val n = rows.head.getAs[Long]("n")
    rows.foreach(_.getAs[Long]("n") shouldBe n)
    // Cauchy–Schwarz cell-wise: sxy² <= sxx·syy on the raw moments is
    // not guaranteed, but the DIAGONAL second moments are nonnegative
    rows.filter(r => r.getAs[Long]("i") == r.getAs[Long]("j"))
      .foreach(_.getAs[Long]("sxy") should be >= 0L)
  }

  test("pca_project: eigen laws — trace, per-component variance, decorrelation") {
    val cells = DataOps.embeddingMoments(spark, sf).collect()
    val n = cells.head.getAs[Long]("n").toDouble
    def cov(r: org.apache.spark.sql.Row) =
      (n * r.getAs[Long]("sxy") -
        r.getAs[Long]("si").toDouble * r.getAs[Long]("sj")) / (n * n) / 1e12
    val trace = cells.filter(r => r.getAs[Long]("i") == r.getAs[Long]("j"))
      .map(cov).sum
    val covM = Array.ofDim[Double](DataOps.EmbDim, DataOps.EmbDim)
    cells.foreach { r =>
      val (i, j) = (r.getAs[Long]("i").toInt, r.getAs[Long]("j").toInt)
      covM(i)(j) = cov(r); covM(j)(i) = cov(r)
    }
    val (eval, evec) = DataOps.jacobiEigen(covM)
    // similarity transforms preserve the trace
    eval.sum shouldBe (trace +- 1e-9)
    // eigenvector columns are orthonormal
    val d = DataOps.EmbDim
    (0 until d).foreach { c =>
      val nrm = (0 until d).map(r => evec(r)(c) * evec(r)(c)).sum
      nrm shouldBe (1.0 +- 1e-9)
    }
    val (c1, c2) = {
      val top = eval.zipWithIndex.sortBy(-_._1).take(2).map(_._2)
      (top(0), top(1))
    }
    val dot12 = (0 until d).map(r => evec(r)(c1) * evec(r)(c2)).sum
    math.abs(dot12) should be < 1e-9
    // the projected corpus realizes each component's eigenvalue as its
    // empirical variance, and the two components are decorrelated
    val proj = DataOps.pcaProject(spark, sf, 2).collect()
    def stats(get: org.apache.spark.sql.Row => Double) = {
      val v = proj.map(get)
      val m = v.sum / v.length
      (m, v.map(x => (x - m) * (x - m)).sum / v.length)
    }
    val (m1, v1) = stats(_.getAs[Double]("pc1"))
    val (m2, v2) = stats(_.getAs[Double]("pc2"))
    val lam = eval.sorted.reverse
    v1 shouldBe (lam(0) +- 1e-6 * math.max(1.0, lam(0)))
    v2 shouldBe (lam(1) +- 1e-6 * math.max(1.0, lam(1)))
    // centered projections: means vanish (float32 inputs re-summed in
    // double — micro-level residue, not a centering bug)
    math.abs(m1) should be < 1e-6
    math.abs(m2) should be < 1e-6
    val cov12 = proj.map(r => (r.getAs[Double]("pc1") - m1) *
      (r.getAs[Double]("pc2") - m2)).sum / proj.length
    math.abs(cov12) should be < 1e-6
    // PCA optimality: the top component carries at least the average
    // per-dimension variance
    v1 should be >= trace / d - 1e-9
  }

  test("sb_doc_score: per-token ppm bounds and coverage of every document") {
    val rows = DataOps.sbDocScore(spark, sf).collect()
    rows.length shouldBe
      queries.Tables(spark, sf, "documents").count().toInt
    rows.foreach { r =>
      val (nt, s) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_ppm"))
      nt should be > 0L
      // each position's quantized ratio lives in [0, 1e6]
      s should be >= 0L
      s should be <= 1000000L * nt
      r.getAs[Long]("avg_ppm") shouldBe s / nt
    }
    // the integer face must RANK like the float log-score gate it
    // mirrors: the doc orderings agree strongly (not exactly — sums of
    // quantized ratios vs sums of logs), checked as rank correlation
    val fl = DataOps.sbScore(spark, sf)
      .select(col("doc_id"), col("score_milli")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_milli")).toMap
    val both = rows.map(r => (r.getAs[Long]("avg_ppm").toDouble,
      fl(r.getAs[Long]("doc_id")).toDouble))
    def ranks(v: Array[Double]) = {
      val idx = v.zipWithIndex.sortBy(_._1).map(_._2)
      val out = new Array[Double](v.length)
      idx.zipWithIndex.foreach { case (orig, rk) => out(orig) = rk.toDouble }
      out
    }
    val rx = ranks(both.map(_._1))
    val ry = ranks(both.map(_._2))
    val nn = rx.length.toDouble
    val (mx, my) = (rx.sum / nn, ry.sum / nn)
    val num = rx.indices.map(i => (rx(i) - mx) * (ry(i) - my)).sum
    val den = math.sqrt(rx.map(x => (x - mx) * (x - mx)).sum *
      ry.map(y => (y - my) * (y - my)).sum)
    (num / den) should be > 0.8
  }
}
