package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, Tables}
import graft.text.TextOps

/** Spec-bounded correctness for the BM25 re-ranker — the float production
  * binding of `keyword_search` (same pattern as the t-digest/HLL/avg
  * bindings: the exact integer form is the oracle query, the float form
  * is pinned by rank agreement plus a from-first-principles score
  * recomputation).
  */
class KeywordBm25Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("bm25: every hit matches all query terms, ranking is score-desc then id") {
    val out = DataOps.keywordSearchBm25(spark, sf).cache()
    out.count() should be <= 20L
    // conjunctive candidates only: re-derive the all-terms membership
    val member = Tables(spark, sf, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        expr("size(array_intersect(w, array('query', 'window', 'join')))").as("nt"))
      .filter(col("nt") === 3).select("doc_id")
    out.select("doc_id").exceptAll(member).count() shouldBe 0L
    val rows = out.orderBy("rank").collect().map(r => (r.getDouble(1), r.getLong(0)))
    rows.sliding(2).foreach {
      case Array((s1, id1), (s2, id2)) =>
        assert(s1 > s2 || (s1 == s2 && id1 < id2))
      case _ =>
    }
    out.unpersist()
  }

  test("bm25: rank agreement with the integer-tf ranking at both SFs") {
    // BM25 legitimately reorders the integer-tf ranking (idf boosts docs
    // hitting the rarer terms; length normalization boosts short docs) —
    // measured top-20 overlap is 8/20 at sf0.001 and 9/20 at sf0.01, and
    // even the #1 doc can differ (sf0.01: tf picks 42, bm25 picks the
    // shorter 202). The spec-bound is the measured floor with headroom:
    // the rankers stay correlated (≥ 25% top-20 overlap) — the EXACT
    // formula is pinned by the recomputation test below, not by rank
    // coincidence.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val tfTop = DataOps.keywordSearch(spark, d)
        .orderBy("rank").collect().map(_.getLong(0)).toSeq
      val bmTop = DataOps.keywordSearchBm25(spark, d)
        .orderBy("rank").collect().map(_.getLong(0)).toSeq
      info(s"$d top20 overlap=${bmTop.toSet.intersect(tfTop.toSet).size}")
      bmTop.toSet.intersect(tfTop.toSet).size should be >= 5
    }
  }

  test("bm25: every returned score matches a from-first-principles recomputation") {
    val terms = Seq("query", "window", "join")
    val t = Tables(spark, sf, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .cache()
    val nDocs = t.count().toDouble
    val avgdl = t.select(avg(expr("size(w)"))).head().getDouble(0)
    val dfm = terms.map { q =>
      q -> t.filter(array_contains(col("w"), q)).count().toDouble
    }.toMap
    val out = DataOps.keywordSearchBm25(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val toksById = t.filter(col("doc_id").isInCollection(out.keys.toSeq))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    t.unpersist()
    val (k1, b) = (1.2, 0.75)
    out.foreach { case (id, score) =>
      val wSeq = toksById(id)
      val dl = wSeq.size.toDouble
      val expect = terms.map { q =>
        val tf = wSeq.count(_ == q).toDouble
        val idf = math.log((nDocs - dfm(q) + 0.5) / (dfm(q) + 0.5) + 1.0)
        idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      withClue(s"doc $id: ") { math.abs(score - expect) should be <= 1e-9 }
    }
  }
}
