package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, RefOps, Tables}

/** r13e operator batch — register-level HLL (oracle-graded sketch
  * mathematics), exact integer Mann–Whitney AUC, integer-quantized
  * reciprocal-rank fusion. Exact cross-engine equality is the driver's
  * DuckDB oracle; these pin the statistical properties and the
  * definitional equivalences.
  */
class Round13eOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("hll_distinct: corrected estimate lands within the sketch's error regime") {
    val rows = RefOps.hllDistinct(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (exact, vZero, raw) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      // the serving-layer rule the scaladoc defers (ln lives HERE, in
      // the spec, not in the graded columns): linear counting when the
      // raw estimate is in the small-range regime
      val m = 256.0
      val est = if (raw <= 2.5 * m && vZero > 0)
        m * math.log(m / vZero) else raw
      est should be > exact * 0.75
      est should be < exact * 1.30
    }
  }

  test("hll_distinct: registers are insertion-order- and duplicate-invariant (the merge property)") {
    // duplicating the input must not move a single register (max is the
    // merge), so v_zero / sum_pow / est are identical on events ∪ events
    val e = Tables(spark, sf, "events")
    val once = RefOps.hllDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val doubled = RefOps.hllDistinctOn(e.union(e)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    doubled shouldBe once
  }

  test("quality_auc: micro-AUC matches a direct pair-counting definition") {
    val sfd = sf
    val s = DataOps.docQuality(spark, sfd)
      .filter(col("score_milli").isNotNull)
      .select(col("doc_id"), col("score_milli"))
    val g = DataOps.gopherGates(spark, sfd)
      .select(col("doc_id"), col("kept").as("label"))
    val rows = s.join(g, "doc_id")
      .join(Tables(spark, sfd, "documents").select(col("doc_id"), col("lang")),
        "doc_id")
      .collect().map(r => (r.getString(3), r.getLong(1), r.getBoolean(2)))
    val expect = rows.groupBy(_._1).collect {
      case (lang, rs)
          if rs.exists(_._3) && rs.exists(!_._3) =>
        val pos = rs.filter(_._3).map(_._2)
        val neg = rs.filter(!_._3).map(_._2)
        // U as literal pair counting: wins + half-ties
        val u2 = (for (p <- pos; n <- neg) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum
        lang -> (u2 * 500000L) / (pos.length.toLong * neg.length)
    }
    val got = DataOps.qualityAuc(spark, sfd).collect()
      .filter(!_.isNullAt(3)).map(r => r.getString(0) -> r.getLong(3)).toMap
    got shouldBe expect
    got.size should be > 0
  }

  test("substring_spans_keep_one: the canonical copy survives, every other copy is cut") {
    import spark.implicits._
    val run = (1 to 16).map("d" + _).mkString(" ")
    val fillA = (1 to 10).map("a" + _).mkString(" ")
    val fillB = (1 to 10).map("b" + _).mkString(" ")
    // doc 1 holds the first (canonical) occurrence; docs 2 and 3 repeat it
    val t = Seq(1L -> s"$fillA $run", 2L -> s"$run $fillB",
      3L -> s"$fillB $run").toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val spans = DataOps.substringSpansKeepOneOn(t, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spans shouldBe Set((2L, 1L, 16L), (3L, 11L, 26L))
  }

  test("substring_spans_keep_one: covered positions are a strict subset of the remove-all variant's") {
    def covered(df: org.apache.spark.sql.DataFrame) = df.collect()
      .flatMap(r => (r.getLong(1) to r.getLong(2)).map((r.getLong(0), _))).toSet
    val keepOne = covered(DataOps.substringSpansKeepOne(spark, sf))
    val all = covered(DataOps.substringDedup(spark, sf))
    keepOne.subsetOf(all) shouldBe true
    // strict whenever any duplication exists (it does in this corpus)
    all.size should be > keepOne.size
  }

  test("split_leakage: buckets partition the graded pair set and leaks re-derive row-level") {
    val sfd = "/root/testdata/sf0.01" // sf0.001 has too few near-dup pairs
    val out = DataOps.splitLeakage(spark, sfd).cache()
    val pairs = DataOps.dedupMinhashLsh(spark, sfd)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val split = DataOps.splitAssign(spark, sfd)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = pairs.map { case (a, b) =>
      val (sa, sb) = (split(a), split(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got shouldBe expect
    out.filter(col("is_leak") =!= (col("split_a") =!= col("split_b")))
      .count() shouldBe 0L
    out.agg(sum(col("n_pairs"))).head.getLong(0) shouldBe pairs.length.toLong
    out.unpersist()
    ()
  }

  test("rendezvous_shards: adding a shard moves ~1/(n+1) of docs, all TO the new shard") {
    import spark.implicits._
    val ids = Tables(spark, sf, "documents").select(col("doc_id"))
    val before = ids.select(col("doc_id"),
        DataOps.rendezvousShardExpr(col("doc_id"), 16).as("s16"))
    val both = before.withColumn("s17",
        DataOps.rendezvousShardExpr(col("doc_id"), 17))
      .select(col("doc_id"), col("s16"), col("s17")).collect()
    val moved = both.filter(r => r.getLong(1) != r.getLong(2))
    // HRW's defining property: a doc never moves BETWEEN existing shards
    moved.foreach(_.getLong(2) shouldBe 16L)
    // expected movement 1/17 ≈ 5.9%; binomial slack on the small corpus
    val frac = moved.length.toDouble / both.length
    frac should be > 0.01
    frac should be < 0.15
    // occupancy report accounts for every doc
    DataOps.rendezvousShards(spark, sf)
      .agg(sum(col("n_docs"))).head.getLong(0) shouldBe both.length.toLong
  }

  test("rrf_fusion: fused set is the union of the arms' top-20s, ordered by the quantized score") {
    val out = DataOps.rrfFusion(spark, sf).collect()
    out.length should be > 0
    // every row carries at least one arm rank and the rrf re-derives
    out.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getLong(2))
      (lex.isDefined || sem.isDefined) shouldBe true
      val rrf = lex.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        sem.map(x => 1000000L / (60 + x)).getOrElse(0L)
      r.getLong(3) shouldBe rrf
    }
    // fused_rank is the (rrf desc, doc_id) order
    val sorted = out.sortBy(r => (-r.getLong(3), r.getLong(0)))
      .map(_.getLong(0)).toSeq
    out.sortBy(_.getLong(4)).map(_.getLong(0)).toSeq shouldBe sorted
    // a doc ranked first in BOTH arms would dominate; at minimum the
    // top fused doc appears in at least one arm's top-3
    val top = out.minBy(_.getLong(4))
    val topArms = Seq(Option(top.get(1)), Option(top.get(2))).flatten
      .map(_.asInstanceOf[Long])
    topArms.min should be <= 3L
  }
}
