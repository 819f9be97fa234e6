package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.DataOps

/** r11 curation additions: rule gate, contamination fraction, epoch
  * shuffle, token-budget cut, TF-IDF top terms. Exact cross-engine
  * equality is the driver's DuckDB oracle; these pin the algorithmic
  * invariants — most importantly that each scale-shaped plan (bucketed
  * dense rank, two-phase budget cut) is byte-equal to its naive
  * single-window executable specification.
  */
class CurationR11Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("epoch_shuffle: dense permutation, equal to the naive global window") {
    val got = DataOps.epochShuffle(spark, sf)
    val rows = got.collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = rows.length.toLong
    rows.map(_._2).sorted.toSeq shouldBe (1L to n)
    // naive single-partition form — the executable spec
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        row_number().over(Window.orderBy(
          md5(concat(lit("ep1:"), col("doc_id"))), col("doc_id")))
          .cast("long").as("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, rk) => rk shouldBe naive(id) }
  }

  test("epoch_shuffle: rank order is invariant to input partitioning") {
    val a = DataOps.epochShuffle(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the operator spreads input itself; a second run must agree exactly
    val b = DataOps.epochShuffle(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a shouldBe b
  }

  test("token_budget_select: kept is exactly the inclusive greedy prefix") {
    val rows = DataOps.tokenBudgetSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val total = rows.map(_._3).sum
    val budget = total * 600 / 1000
    val ordered = rows.sortBy { case (id, score, _, _) => (-score, id) }
    var cum = 0L
    ordered.foreach { case (_, _, n, kept) =>
      cum += n
      kept shouldBe (cum <= budget)
    }
    // the boundary is doc-granular: at least one kept and one dropped
    rows.count(_._4) should be > 0
    rows.count(!_._4) should be > 0
  }

  test("gopher_gates: every boolean recomputes from its own quantity") {
    val rows = DataOps.gopherGates(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_words"))
      val ml = r.getLong(r.fieldIndex("mean_len_milli"))
      val st = r.getLong(r.fieldIndex("stop_count"))
      val tw = r.getLong(r.fieldIndex("top_word_milli"))
      r.getBoolean(r.fieldIndex("r_words")) shouldBe (n >= 20 && n <= 90)
      r.getBoolean(r.fieldIndex("r_word_len")) shouldBe (ml >= 3000 && ml <= 8000)
      r.getBoolean(r.fieldIndex("r_stop")) shouldBe (st >= 2)
      r.getBoolean(r.fieldIndex("r_rep")) shouldBe (tw <= 200)
      r.getBoolean(r.fieldIndex("kept")) shouldBe
        (n >= 20 && n <= 90 && ml >= 3000 && ml <= 8000 && st >= 2 && tw <= 200)
    }
    // thresholds sit inside the corpus distribution: both branches real
    rows.count(_.getBoolean(rows.head.fieldIndex("kept"))) should be > 0
    rows.count(!_.getBoolean(rows.head.fieldIndex("kept"))) should be > 0
  }

  test("gopher_gates quantities recompute from the raw text") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = DataOps.gopherGates(spark, sf).collect()
    rows.take(50).foreach { r =>
      val w = texts(r.getLong(r.fieldIndex("doc_id"))).split(" ", -1)
      r.getLong(r.fieldIndex("n_words")) shouldBe w.length.toLong
      r.getLong(r.fieldIndex("mean_len_milli")) shouldBe
        Math.floorDiv(1000L * w.map(_.length.toLong).sum, w.length.toLong)
      r.getLong(r.fieldIndex("stop_count")) shouldBe
        w.count(t => t == "the" || t == "a").toLong
      r.getLong(r.fieldIndex("top_word_milli")) shouldBe
        Math.floorDiv(1000L * w.groupBy(identity).values.map(_.length).max, w.length.toLong)
    }
  }

  test("contamination_score agrees with decontaminate's boolean") {
    val milli = DataOps.contaminationScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val flags = DataOps.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    milli.foreach { case (id, (nSh, nHit, m)) =>
      nHit should be <= nSh
      m shouldBe Math.floorDiv(1000L * nHit, nSh)
      // same shingle dialect, same eval cohort: any-hit ⟺ contaminated
      flags(id) shouldBe (nHit > 0)
    }
    // score-only docs (< 3 tokens carry no shingles) appear in
    // decontaminate but not here; every scored doc must be flagged there
    milli.keySet.diff(flags.keySet) shouldBe empty
  }

  test("curriculum_order: dense permutation, stratum-major, shuffled inside") {
    val got = DataOps.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.map(_._3).sorted.toSeq shouldBe (1L to got.length.toLong)
    // stratum-major: every doc in a higher score stratum ranks before
    // every doc in a lower one
    val byRank = got.sortBy(_._3)
    val strata = byRank.map(_._2 / 100)
    strata.zip(strata.tail).foreach { case (a, b) => a should be >= b }
    // shuffled inside: within the largest stratum, rank order must not
    // be doc_id order (md5 keys decorrelate them)
    val biggest = byRank.filter(_._2 / 100 == strata.max)
    if (biggest.length > 10)
      biggest.map(_._1).toSeq should not be biggest.map(_._1).sorted.toSeq
  }

  test("ngram_novelty: first doc fully novel, counts recompute") {
    val got = DataOps.ngramNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (_, nSh, nNov, m) =>
      nNov should be <= nSh
      m shouldBe Math.floorDiv(1000L * nNov, nSh)
    }
    val first = got.minBy(_._1)
    first._3 shouldBe first._2 // smallest doc_id introduced all its shingles
    // independent recompute from the raw shingle frame
    val sh = DataOps.shingledForTest(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("sh")).toSet)
    val firstDoc = sh.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).min }
    val expect = sh.map { case (id, s) =>
      id -> (s.size.toLong, s.count(firstDoc(_) == id).toLong) }.toMap
    got.foreach { case (id, nSh, nNov, _) =>
      (nSh, nNov) shouldBe expect(id)
    }
  }

  test("tokenizer_fertility: per-lang sums recompute from token_counts") {
    val tc = DataOps.tokenCounts(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "lang"),
        "doc_id")
      .collect().map(r => (r.getAs[String]("lang"),
        r.getAs[Int]("ws_tokens").toLong, r.getAs[Long]("subwords")))
    val expect = tc.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum) }
    val got = DataOps.tokenizerFertility(spark, sf).collect()
    got.map(_.getString(0)).toSet shouldBe expect.keySet
    got.foreach { r =>
      val (n, ws, sw) = expect(r.getString(0))
      (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((n, ws, sw))
      r.getLong(4) shouldBe Math.floorDiv(1000L * sw, ws)
    }
  }

  test("quality_calibration: cells partition the corpus, masses recompute") {
    val q = DataOps.docQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val c = DataOps.classifierInfer(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    q.keySet shouldBe c.keySet
    // toSeq before mapping to scores: the keys view is set-backed, and a
    // Set.map would deduplicate equal score values before summing
    val expect = q.keys.toSeq.groupBy(id => (q(id)._2, c(id)._2)).map { case (k, ids) =>
      k -> (ids.size.toLong, ids.map(q(_)._1).sum, ids.map(c(_)._1).sum) }
    val got = DataOps.qualityCalibration(spark, sf).collect()
    got.length shouldBe expect.size
    got.foreach { r =>
      expect((r.getBoolean(0), r.getBoolean(1))) shouldBe
        ((r.getLong(2), r.getLong(3), r.getLong(4)))
    }
  }

  test("minhash_containment: values recompute from shingle sets, >= jaccard") {
    val sh = DataOps.shingledForTest(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("sh")).toSet).toMap
    val got = DataOps.minhashContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.length should be > 0
    got.foreach { case (a, b, c) =>
      val (sa, sb) = (sh(a), sh(b))
      val i = sa.intersect(sb).size.toDouble
      c shouldBe (math.rint(i / math.min(sa.size, sb.size) * 1000) / 1000)
      c should be >= 0.9
      // containment dominates jaccard on the same pair
      c should be >= i / (sa.size + sb.size - i)
    }
    // the production near-dup pairs at >= 0.9 jaccard all reappear here:
    // containment >= jaccard, same candidate pool
    val lsh = DataOps.dedupMinhashLsh(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.9).map(r => (r.getLong(0), r.getLong(1)))
    val pairs = got.map(p => (p._1, p._2)).toSet
    lsh.foreach(p => pairs should contain(p))
  }

  test("window_cooccurrence: counts and pmi recompute from raw text") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val pair = scala.collection.mutable.Map.empty[(String, String), Long]
    var total = 0L
    texts.foreach { t =>
      val w = t.split(" ", -1)
      w.foreach { x => uni(x) = uni.getOrElse(x, 0L) + 1; total += 1 }
      for (i <- w.indices; d <- 1 to 4; if i + d < w.length) {
        val k = if (w(i) <= w(i + d)) (w(i), w(i + d)) else (w(i + d), w(i))
        pair(k) = pair.getOrElse(k, 0L) + 1
      }
    }
    val expect = pair.filter(_._2 >= 5).map { case ((a, b), c) =>
      (a, b) -> (c, Math.floorDiv(1000L * c * total, uni(a) * uni(b))) }
    val got = DataOps.windowCooccurrence(spark, sf).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) ->
        (r.getAs[Long]("c_ab"), r.getAs[Long]("pmi_milli"))).toMap
    got.keySet shouldBe expect.keySet
    expect.foreach { case (k, v) => got(k) shouldBe v }
  }

  test("simhash_recall_sampled: flag-exact subset of the full monitor") {
    val full = DataOps.simhashRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    val sampled = DataOps.simhashRecallSampled(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3)))
    sampled.foreach { case (k, v) => full(k) shouldBe v }
    // both-endpoint sampling: every full-monitor pair whose endpoints are
    // both in the 1/4 draw must appear — the restriction is exact
    def inSample(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 4 == 0
    }
    val expected = full.keySet.filter { case (a, b) => inSample(a) && inSample(b) }
    sampled.map(_._1).toSet shouldBe expected
  }

  test("tfidf_topterms: dense per-doc ranks, scores recompute for a sample") {
    val rows = DataOps.tfidfTopTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val perDoc = rows.groupBy(_._1)
    perDoc.values.foreach { g =>
      g.map(_._5).sorted.toSeq shouldBe (1L to g.length)
      g.length should be <= 3
    }
    // manual recompute on one doc: tf and integer idf from raw text
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val nDocs = texts.length.toLong
    val df = texts.flatMap(_._2.split(" ", -1).distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val sampleId = texts.head._1
    val tf = texts.head._2.split(" ", -1)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val expect = tf.map { case (t, c) =>
      (t, c, c * Math.floorDiv(1000L * nDocs, df(t))) }
      .toSeq.sortBy { case (t, _, s) => (-s, t) }.take(3)
    val got = perDoc(sampleId).sortBy(_._5)
      .map { case (_, t, c, s, _) => (t, c, s) }.toSeq
    got shouldBe expect
  }
}
