package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.text.Bpe

/** Deterministic-BPE contract — the spec-bounded side of the tokenizer
  * family ([[DataOps.bpePairCounts]] carries the oracle for the one
  * closed-form stage; everything iterative is bounded here).
  *
  *  - training is input-order independent and fully deterministic;
  *  - the hand-checkable example trains exactly as computed on paper;
  *  - longest-match encode round-trips (concat rebuilds the word), uses
  *    only vocab symbols or single-char fallbacks, and is greedy;
  *  - the Spark operators agree BIT-exactly with a plain driver-Scala
  *    recompute from the raw parquet at two SFs;
  *  - real-count packing preserves the graded packing's window semantics.
  */
class BpeSpec extends SparkSpec {

  test("train: deterministic under input reordering and duplicate words") {
    val base = Seq(("lower", 2L), ("low", 5L), ("newest", 6L), ("widest", 3L))
    val a = Bpe.train(base, 16)
    val b = Bpe.train(Random.shuffle(base), 16)
    val c = Bpe.train(base ++ Seq(("low", 0L)), 16) // duplicate aggregates
    a shouldBe b
    a shouldBe c
    a.map(_.rank) shouldBe a.indices
  }

  test("train: hand-checked example merges as computed on paper") {
    // {"abab": 3}: round 0 pairs — (a,b): 2·3 = 6, (b,a): 1·3 = 3 → merge (a,b).
    // round 1: word is [ab, ab] — (ab, ab): 3 → merge. round 2: single
    // symbol left, no pair reaches count 2 → stop.
    val m = Bpe.train(Seq(("abab", 3L)), 10)
    m.map(g => (g.left, g.right, g.score)) shouldBe
      Seq(("a", "b", 6L), ("ab", "ab", 3L))
  }

  test("train: tie-breaks by (count desc, pair lex asc)") {
    // "xy" and "ab" both appear once with count 2 — equal pair counts;
    // the lexicographically smaller pair (a,b) must win round 0.
    val m = Bpe.train(Seq(("xy", 2L), ("ab", 2L)), 1)
    m.map(g => (g.left, g.right)) shouldBe Seq(("a", "b"))
  }

  test("encode: round-trip, vocab membership, greedy longest match") {
    val merges = Bpe.train(Seq(("lower", 2L), ("low", 5L), ("newest", 6L),
      ("widest", 3L)), 16)
    val vocab = Bpe.vocabOf(merges)
    for (w <- Seq("lower", "low", "newest", "widest", "lowest", "zq", "", "a")) {
      val toks = Bpe.encode(w, vocab)
      toks.mkString shouldBe w
      toks.foreach(t => assert(t.length == 1 || vocab.contains(t)))
      // greedy: the first token is the LONGEST vocab prefix (or 1 char)
      if (w.nonEmpty) {
        val first = toks.head
        val longer = (first.length + 1) to w.length
        longer.foreach(l => assert(!vocab.contains(w.substring(0, l)),
          s"encode('$w') took '$first' but a longer vocab prefix exists"))
      }
      Bpe.encodeCount(w, vocab) shouldBe toks.length
    }
    // unseen characters fall back to singles, never throw
    Bpe.encode("π∂", vocab) shouldBe Seq("π", "∂")
  }

  private def corpusWords(dir: String): Seq[(String, Long)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .flatMap(_.getString(1).split(" ", -1))
      .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }.toSeq

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"spark bpe_pair_counts equals the driver brute force ($dir)") {
      val got = DataOps.bpePairCounts(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val brute = corpusWords(dir).filter(_._1.length >= 2)
        .flatMap { case (w, c) => w.sliding(2).map((_, c)) }
        .groupBy(_._1).map { case (p, o) => (p, o.map(_._2).sum) }
      got shouldBe brute
    }

    test(s"spark token_counts_bpe equals a per-doc driver recompute ($dir)") {
      val wc = corpusWords(dir)
      val vocab = Bpe.vocabOf(Bpe.train(
        wc.sortBy { case (w, c) => (-c, w) }.take(1 << 16), 64))
      val expected = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) ->
          r.getString(1).split(" ", -1).map(Bpe.encodeCount(_, vocab).toLong).sum)
        .toMap
      val got = DataOps.tokenCountsBpe(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bpe_tokens")).toMap
      got shouldBe expected
      // the real counts are in the estimate's ballpark, not degenerate
      val est = DataOps.tokenCounts(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("subwords")).toMap
      val ratio = got.values.sum.toDouble / est.values.sum
      assert(ratio > 0.2 && ratio < 5.0, s"bpe/estimate ratio $ratio degenerate")
    }
  }

  test("bpe_merges table is rank-ordered and replays the pure trainer") {
    val dir = "/root/testdata/sf0.001"
    val got = DataOps.bpeMerges(spark, dir).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    val pure = Bpe.train(
      corpusWords(dir).sortBy { case (w, c) => (-c, w) }.take(1 << 16), 64)
    got.toSeq shouldBe pure.map(m => (m.rank, m.left, m.right, m.merged, m.score))
    got.map(_._1).toSeq shouldBe got.indices
  }

  test("bpe_encode_docs: id sequences decode back to the document text") {
    val dir = "/root/testdata/sf0.001"
    val merges = Bpe.train(
      corpusWords(dir).sortBy { case (w, c) => (-c, w) }.take(1 << 16), 64)
    val symOf = merges.map(m => (m.rank, m.merged)).toMap
    def decode(id: Int): String =
      symOf.getOrElse(id, (id - 64).toChar.toString)
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = DataOps.tokenCountsBpe(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bpe_tokens")).toMap
    val out = DataOps.bpeEncodeDocs(spark, dir).collect()
    out.length shouldBe texts.size
    out.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val ids = r.getSeq[Int](2)
      // count consistency with the counting operator
      ids.length.toLong shouldBe counts(doc)
      r.getAs[Int]("n_tokens") shouldBe ids.length
      // full decode round-trip: concatenated symbols == text minus spaces
      ids.map(decode).mkString shouldBe texts(doc).replace(" ", "")
    }
  }

  test("pack_sequences_bpe: bins are the packing window over real counts") {
    val dir = "/root/testdata/sf0.01"
    val out = DataOps.packSequencesBpe(spark, dir).cache()
    try {
      val counts = DataOps.tokenCountsBpe(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bpe_tokens")).toMap
      out.collect().groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
        .foreach { case (_, rows) =>
          var cum = 0L
          rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
            val n = r.getAs[Long]("n_tokens")
            counts(r.getAs[Long]("doc_id")) shouldBe n
            r.getAs[Long]("bin") shouldBe cum / 2048
            cum += n
          }
        }
    } finally { out.unpersist(blocking = false); () }
  }
}
