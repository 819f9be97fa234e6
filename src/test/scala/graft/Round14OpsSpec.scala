package graft

import org.apache.spark.sql.functions._

import graft.queries.{RefOps, Tables}

/** r14 operator batch — the register-level quantile sketch, the one
  * sketch family that had no register-graded face (the t-digest binding
  * is float-centroid state). Cross-engine exactness is the driver's
  * DuckDB oracle; these pin the sketch laws the oracle cannot see:
  * the error bound, the disjoint register tiling, and the two merge
  * laws (cell-wise sum; doubled-input estimate invariance).
  */
class Round14OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def cents = Tables(spark, sf, "lineitem")
    .select(col("l_returnflag").as("flag"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))

  test("quantile_sketch: est >= exact and relative error within the 2^-B bound") {
    val rows = RefOps.quantileSketch(spark, sf).collect()
    rows.length shouldBe 9 // 3 flags x 3 quantiles
    rows.foreach { r =>
      val (est, exact, err) =
        (r.getLong(5), r.getLong(6), r.getLong(7))
      est should be >= exact
      err should be >= 0L
      // upper-edge estimate: (est - exact)/exact <= bucket width / lo
      // = 2^-QSketchSubBits = 31250 ppm
      err should be <= 31250L
    }
  }

  test("quantile_sketch: registers tile the value axis disjointly and count every row") {
    val regs = RefOps.quantileRegistersOf(cents).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    regs.groupBy(_._1).foreach { case (_, rs) =>
      val iv = rs.map { case (_, sh, sub, _) =>
        (sub << sh, ((sub + 1) << sh) - 1)
      }.sortBy(_._1)
      iv.sliding(2).foreach {
        case Array((_, h1), (l2, _)) => l2 should be > h1
        case _ => ()
      }
    }
    regs.map(_._4).sum shouldBe cents.count()
  }

  test("quantile_sketch: registers merge cell-wise — parity halves sum to the full frame") {
    def toMap(df: org.apache.spark.sql.DataFrame) =
      RefOps.quantileRegistersOf(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
    val full = toMap(cents)
    val even = toMap(cents.filter(col("v") % 2 === 0))
    val odd = toMap(cents.filter(col("v") % 2 =!= 0))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))).toMap
    merged shouldBe full
  }

  test("substring family memo: every shared-frame face equals its pure un-memoized form") {
    // the r14 sharing is a pure refactor — the five public faces read
    // memoized class/span frames, and each must return exactly what the
    // spec-facing On(t, L) forms compute from scratch on the same input
    import graft.queries.DataOps
    val t = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    rows(DataOps.substringDedup(spark, sf)) shouldBe
      rows(DataOps.substringDedupOn(t, 16))
    rows(DataOps.substringSpansKeepOne(spark, sf)) shouldBe
      rows(DataOps.substringSpansKeepOneOn(t, 16))
    rows(DataOps.topDupSubstrings(spark, sf)) shouldBe
      rows(DataOps.topDupSubstringsOn(t, 16))
    rows(DataOps.substringDupFraction(spark, sf)) shouldBe
      rows(DataOps.substringDupFractionOn(t, 16))
    rows(DataOps.removeDupSpans(spark, sf)) shouldBe
      rows(DataOps.removeDupSpansOn(t, 16))
  }

  test("substring_decontaminate: strictly implies the shingle gate (an L-run contains 3-shingles)") {
    // a verbatim >= L-token overlap with an eval doc necessarily shares
    // 3-shingles with it, so every substring-contaminated doc MUST also
    // be shingle-contaminated — the gates are ordered by evidence
    // strength, never contradictory
    import graft.queries.DataOps
    val strict = DataOps.substringDecontaminate(spark, sf)
      .filter(col("contaminated")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val loose = DataOps.decontaminate(spark, sf)
      .filter(col("contaminated")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    strict.diff(loose) shouldBe empty
  }

  test("weighted_quantile_sketch: weight 1 degenerates to the unweighted sketch exactly") {
    // count IS the weight-1 special case — every column (total, rank,
    // registers, estimate, exact, err) must agree value-for-value
    val w = RefOps.quantileSketchWeightedOn(cents.withColumn("wt", lit(1L)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2))
      .toMap
    val u = RefOps.quantileSketchOn(cents)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2))
      .toMap
    w shouldBe u
  }

  test("weighted_quantile_sketch: estimate bounds hold under token weights") {
    val rows = RefOps.weightedQuantileSketch(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getLong(5) should be >= r.getLong(6) // est_hi >= exact_v
      r.getLong(7) should be >= 0L
      r.getLong(7) should be <= 31250L
    }
  }

  test("kruskal_wallis: equals the textbook tie-corrected H recomputed driver-side") {
    import graft.queries.Relational
    val hMilli = Relational.kruskalWallis(spark, sf).collect()
      .head.getLong(3)
    // independent recomputation: float mid-ranks, the 12/N(N+1) form,
    // the explicit Σ(t³−t) tie divisor — a different derivation path
    // than the engine's integer variance identity
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .groupBy("event_type", "d").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val days = ev.map(_._2).distinct
    val types = ev.map(_._1).distinct
    val cells = ev.map { case (t, d, n) => (t, d) -> n }.toMap
    val vals = for (t <- types; d <- days)
      yield (t, cells.getOrElse((t, d), 0L).toDouble)
    val n = vals.length
    val sorted = vals.map(_._2).sorted
    val rank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2 + 1).sum.toDouble / g.length }
    val sG = vals.groupBy(_._1).map { case (_, g) =>
      (g.map(x => rank(x._2)).sum, g.length) }
    val h0 = 12.0 / (n * (n + 1.0)) *
      sG.map { case (s, ng) => s * s / ng }.sum - 3 * (n + 1.0)
    val ties = sorted.groupBy(identity).values.map(_.length.toDouble)
      .map(t => t * t * t - t).sum
    val h = h0 / (1.0 - ties / (n.toDouble * n * n - n))
    math.abs(hMilli - 1000.0 * h) should be <= 1.5
  }

  test("quantile_sketch_cube: rolling the month away reproduces the direct sketch exactly") {
    // the associativity law the cube grades: cell-wise summed monthly
    // registers must yield the same n, register count, ranks and
    // estimates as registers built directly over the whole table
    val cube = RefOps.quantileSketchCube(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val direct = RefOps.quantileSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    cube shouldBe direct
  }

  test("friedman_test: equals a driver-side recomputation from per-day mid-ranks") {
    import graft.queries.Relational
    val chiMilli = Relational.friedmanTest(spark, sf).collect()
      .head.getLong(3)
    val ev = Tables(spark, sf, "events")
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .groupBy("event_type", "d").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val days = ev.map(_._2).distinct
    val types = ev.map(_._1).distinct
    val cells = ev.map { case (t, d, n) => (t, d) -> n }.toMap
    val k = types.length
    // independent path: float mid-ranks per day, then the TEXTBOOK
    // chi2_0 = 12/(Dk(k+1))*Sum R_j^2 - 3D(k+1) divided by the standard
    // tie correction 1 - Sum(t^3-t)/(Dk(k^2-1)) — Friedman 1937 /
    // Conover form, NOT the engine's integer variance identity
    val perDay = days.map { d =>
      val vs = types.map(t => t -> cells.getOrElse((t, d), 0L).toDouble)
      val sorted = vs.map(_._2).sorted
      val mid = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> g.map(_._2 + 1).sum.toDouble / g.length }
      (vs.map { case (t, v) => (t, mid(v)) },
        sorted.groupBy(identity).values
          .map(g => { val t = g.length.toDouble; t * t * t - t }).sum)
    }
    val dD = days.length.toDouble
    val rankSums = perDay.flatMap(_._1).groupBy(_._1)
      .map { case (_, g) => g.map(_._2).sum }
    val chi0 = 12.0 / (dD * k * (k + 1)) * rankSums.map(s => s * s).sum -
      3.0 * dD * (k + 1)
    val tieSum = perDay.map(_._2).sum
    val corr = 1.0 - tieSum / (dD * k * (k.toDouble * k - 1))
    val chi = chi0 / corr
    math.abs(chiMilli - 1000.0 * chi) should be <= 1.5
  }

  test("quantile_sketch: doubled input doubles n and rank but moves no estimate") {
    def byKey(df: org.apache.spark.sql.DataFrame) =
      RefOps.quantileSketchOn(df).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
    val once = byKey(cents)
    val twice = byKey(cents.union(cents))
    twice.keySet shouldBe once.keySet
    once.foreach { case (k, (n1, rank1, est1, ex1)) =>
      val (n2, rank2, est2, ex2) = twice(k)
      n2 shouldBe 2 * n1
      // ceiling rank: (2qn+99)div100 is 2*((qn+99)div100) or one less;
      // either way it lands in the same register (2cum >= 2rank-1 iff
      // cum >= rank on integers), so the estimates cannot move
      rank2 should (be(2 * rank1) or be(2 * rank1 - 1))
      est2 shouldBe est1
      ex2 shouldBe ex1
    }
  }
}
