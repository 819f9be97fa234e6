package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Relational, Tables}
import graft.text.TextOps

/** r13 operator batch. Exact cross-engine equality is the driver's
  * DuckDB oracle; these pin the algorithmic boundaries the sf corpus
  * doesn't exercise.
  */
class Round13OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def toksOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), lit("en").as("lang"),
        TextOps.tokens(col("text")).as("w"))
  }

  private def spans(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("substring_dedup: an exactly-L shared run is found; L-1 is not") {
    val shared16 = words("s", 16)
    val shared15 = words("t", 15)
    val t = toksOf(Seq(
      1L -> s"${words("a", 5)} $shared16 ${words("b", 5)}",
      2L -> s"${words("c", 3)} $shared16",
      3L -> s"${words("d", 4)} $shared15 ${words("e", 4)}",
      4L -> s"${words("f", 6)} $shared15"))
    // L=4: |span| >= 4 duplicated substrings only
    spans(DataOps.substringDedupOn(toksOf(Seq(
      1L -> s"x1 x2 p1 p2 p3 p4 y1",
      2L -> s"p1 p2 p3 p4 z1")), 4)) shouldBe
      Set((1L, 3L, 6L), (2L, 1L, 4L))
    // L=16 on the corpus above: the 16-run surfaces in both docs at its
    // exact positions, the 15-run in neither
    spans(DataOps.substringDedupOn(t, 16)) shouldBe
      Set((1L, 6L, 21L), (2L, 4L, 19L))
  }

  test("substring_dedup: overlapping duplicated windows merge to one maximal span") {
    // a shared 6-token run with L=4 yields three overlapping duplicated
    // 4-grams per doc — the output must be ONE merged span covering all
    // six tokens, not three window rows
    val shared = words("m", 6)
    val out = DataOps.substringDedupOn(toksOf(Seq(
      1L -> s"${words("a", 2)} $shared",
      2L -> s"$shared ${words("b", 3)}")), 4)
    spans(out) shouldBe Set((1L, 3L, 8L), (2L, 1L, 6L))
  }

  test("substring_dedup: a WITHIN-doc repeat is a duplicate (occurrence rule)") {
    // Lee et al. count occurrences, not documents: the run appearing
    // twice inside one doc is duplicated even though no other doc has it
    val run = words("r", 4)
    val out = DataOps.substringDedupOn(toksOf(Seq(
      1L -> s"$run ${words("x", 3)} $run")), 4)
    spans(out) shouldBe Set((1L, 1L, 4L), (1L, 8L, 11L))
    // and docs shorter than L never participate
    DataOps.substringDedupOn(toksOf(Seq(
      1L -> words("u", 3), 2L -> words("u", 3))), 4).count() shouldBe 0L
  }

  private def shingleFrame(rows: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "sh")
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("containment_join surfaces the containment-high/Jaccard-low embed") {
    // a 5-shingle doc fully inside a 50-shingle doc: containment 1.0,
    // Jaccard 0.1 — the pair the MinHash-band reranker cannot surface,
    // and the reason the true index exists
    val small = (1 to 5).map("s" + _)
    val sh = shingleFrame(Seq(
      1L -> small,
      2L -> (small ++ (1 to 45).map("b" + _))))
    pairs(DataOps.containmentPairsOn(sh, 0.9)) shouldBe Set((1L, 2L, 1.0))
  }

  test("containment_join boundary: exactly t kept, below t dropped, equal sizes once") {
    val nine = (1 to 9).map("c" + _)
    val sh = shingleFrame(Seq(
      1L -> (nine :+ "x1"),          // shares 9 of 10 with doc 2
      2L -> (nine :+ "y1"),          // equal sizes: C = 0.9 exactly
      3L -> ((1 to 8).map("c" + _) ++ Seq("z1", "z2")))) // 8/10 vs doc 1 -> 0.8
    val got = pairs(DataOps.containmentPairsOn(sh, 0.9))
    got should contain((1L, 2L, 0.9)) // boundary pair survives, emitted ONCE
    got.count { case (a, b, _) => a == 1L && b == 2L } shouldBe 1
    got.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) } shouldBe false
  }

  test("containment_join is a superset of the MinHash-band reranker on the sf corpus") {
    val full = pairs(DataOps.containmentJoin(spark, sf).select(
      col("doc_a"), col("doc_b"), col("containment")))
    val banded = pairs(DataOps.minhashContainment(spark, sf).select(
      col("doc_a"), col("doc_b"), col("containment")))
    banded.subsetOf(full) shouldBe true
    full.size should be >= banded.size
  }

  test("top_dup_substrings reconstructs the gram text from the class representative") {
    // L=4: docs 1 and 2 share "p1 p2 p3 p4"; the run of 5 in docs 3+4
    // yields TWO overlapping duplicated 4-gram classes
    val out = DataOps.topDupSubstringsOn(toksOf(Seq(
      1L -> "x1 x2 p1 p2 p3 p4",
      2L -> "p1 p2 p3 p4 y1",
      3L -> "q1 q2 q3 q4 q5",
      4L -> "z1 q1 q2 q3 q4 q5")), 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe Set(
      ("p1 p2 p3 p4", 2L, 2L),
      ("q1 q2 q3 q4", 2L, 2L),
      ("q2 q3 q4 q5", 2L, 2L))
  }

  test("substring_dup_fraction: full corpus distribution with exact per-mille") {
    val out = DataOps.substringDupFraction(spark, sf).cache()
    // one row per document (clean docs report 0, not absence)
    out.count() shouldBe
      spark.read.parquet(s"$sf/documents.parquet").count()
    out.filter(col("dup_milli") < 0 || col("dup_milli") > 1000)
      .count() shouldBe 0L
    out.filter(col("dup_tokens") > col("n_tokens")).count() shouldBe 0L
    // ties to the span report: docs with a span carry dup_tokens > 0
    val spanned = DataOps.substringDedup(spark, sf)
      .select("doc_id").distinct().count()
    out.filter(col("dup_tokens") > 0).count() shouldBe spanned
    out.unpersist()
    ()
  }

  test("remove_dup_spans cuts exactly the span report's tokens") {
    val cut = DataOps.removeDupSpans(spark, sf).cache()
    val frac = DataOps.substringDupFraction(spark, sf)
      .select(col("doc_id"), col("dup_tokens"), col("n_tokens"))
    // n_removed == the fraction report's dup_tokens on every doc, and
    // the kept text has exactly n_tokens - dup_tokens tokens
    cut.join(frac, "doc_id")
      .filter(col("n_removed") =!= col("dup_tokens") ||
        // split("") = [""], so a fully-cut doc measures 1, not 0
        org.apache.spark.sql.functions.size(
          split(col("clean_text"), " ")) =!= when(
          col("n_removed") === col("n_tokens"), lit(1))
          .otherwise(col("n_tokens") - col("n_removed")))
      .count() shouldBe 0L
    cut.unpersist()
    ()
  }

  test("event_trigrams: continuation shares and bigram consistency") {
    val tri = Relational.eventTrigrams(spark, sf).cache()
    tri.filter(col("p_milli") < 0 || col("p_milli") > 1000).count() shouldBe 0L
    // each (e1,e2) prefix's trigram total can't exceed its bigram count
    val bi = Relational.eventTransitions(spark, sf)
      .select(col("prev_type").as("e1"), col("next_type").as("e2"),
        col("n_transitions"))
    tri.groupBy(col("e1"), col("e2")).agg(sum(col("n_paths")).as("n3"))
      .join(bi, Seq("e1", "e2"))
      .filter(col("n3") > col("n_transitions")).count() shouldBe 0L
    tri.unpersist()
    ()
  }

  test("part_best_supplier: one row per purchased part, price is the true minimum") {
    val out = Relational.partBestSupplier(spark, sf).cache()
    out.select("p_partkey").distinct().count() shouldBe out.count()
    // the argmin really is the min: no line item undercuts its part's best
    val mins = Tables(spark, sf, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("true_min"))
    out.join(mins, col("l_partkey") === col("p_partkey"))
      .filter(col("best_cents") =!= col("true_min")).count() shouldBe 0L
    out.unpersist()
    ()
  }

  test("q18_large_orders: every order exceeds the threshold, keys consistent") {
    val out = Relational.q18LargeOrders(spark, sf).cache()
    out.filter(col("total_qty") <= 300).count() shouldBe 0L
    out.select("o_orderkey").distinct().count() shouldBe out.count()
    out.unpersist()
    ()
  }

  test("bpe_learn equals the driver-Scala Bpe.train mirror on the corpus") {
    // the distributed learner and the (spec-bounded) driver trainer must
    // emit the identical merge list — same winners, same counts, same
    // order — on the real corpus vocabulary
    val dist = DataOps.bpeLearn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    val driver = DataOps.bpeMerges(spark, sf)
      .collect().map(r => (r.getInt(0).toLong, r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).take(dist.size).toSeq
    dist shouldBe driver
    dist.size shouldBe 8
  }

  test("bpe_learn early-stops structurally when no pair reaches count 2") {
    import spark.implicits._
    // one word, count 1: round 0's best pair is under the count-2 floor,
    // so EVERY round is empty — 0 merges, not 8 rows of noise
    DataOps.bpeLearnOn(Seq(("ab", 1L)).toDF("word", "c"), 8)
      .count() shouldBe 0L
    // 'ab' twice: round 0 merges (a,b) cnt 2; round 1 has no pairs left
    val one = DataOps.bpeLearnOn(Seq(("ab", 2L)).toDF("word", "c"), 8)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
    one.toSeq shouldBe Seq((0L, "ab", 2L))
  }

  test("substring_dedup invariants on the sf corpus: in-bounds maximal spans of >= L") {
    val L = 16L
    val out = DataOps.substringDedup(spark, sf).cache()
    out.filter(col("span_end") - col("span_start") + 1 < L).count() shouldBe 0L
    out.filter(col("span_start") < 1).count() shouldBe 0L
    // spans are maximal: per doc, sorted spans neither overlap nor touch
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("span_start"))
    out.withColumn("pe", lag(col("span_end"), 1).over(w))
      .filter(col("pe").isNotNull && col("span_start") <= col("pe") + 1)
      .count() shouldBe 0L
    // nonempty at sf0.001 (the corpus plants near-dups and templates)
    out.count() should be > 0L
    out.unpersist()
    ()
  }
}
