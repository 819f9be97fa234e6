package graft

import graft.queries.DataOps

/** Stupid-Backoff LM (N87): the distributed scorer must equal a
  * sequential driver mirror BIT-FOR-BIT (the DsirSpec/KMeansSpec
  * discipline) — the per-doc fold is order-pinned and every float op
  * (divide, multiply by α, log, left-to-right sum) is spelled in the
  * same order on both sides, so `==` on the doubles is the assertion,
  * not a tolerance.
  */
class StupidBackoffSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val Alpha = 0.4

  private def tokensOf(text: String): Array[String] = text.split(" ")

  private def grams(w: Array[String], n: Int): Iterator[String] =
    if (w.length < n) Iterator.empty
    else (0 to w.length - n).iterator.map(i => w.slice(i, i + n).mkString(" "))

  test("sb_ngram_counts: unigram mass equals total tokens; orders nest") {
    val out = DataOps.sbNgramCounts(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val totalTokens = texts.map(t => tokensOf(t).length.toLong).sum
    out.filter(_._1 == 1).map(_._3).sum shouldBe totalTokens
    // every counted trigram's leading bigram is counted at least as often
    val bi = out.filter(_._1 == 2).map(x => x._2 -> x._3).toMap
    out.filter(_._1 == 3).foreach { case (_, g, c) =>
      val lead = g.split(" ").take(2).mkString(" ")
      assert(bi(lead) >= c, s"bigram '$lead' undercounts trigram '$g'")
    }
  }

  test("sb_score equals the sequential Stupid-Backoff mirror exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), tokensOf(r.getString(1))))
    val c1 = scala.collection.mutable.Map.empty[String, Long]
    val c2 = scala.collection.mutable.Map.empty[String, Long]
    val c3 = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, w) =>
      grams(w, 1).foreach(g => c1(g) = c1.getOrElse(g, 0L) + 1)
      grams(w, 2).foreach(g => c2(g) = c2.getOrElse(g, 0L) + 1)
      grams(w, 3).foreach(g => c3(g) = c3.getOrElse(g, 0L) + 1)
    }
    val nTotal = c1.values.sum.toDouble
    def mirror(w: Array[String]): Double = {
      var s = 0.0
      w.indices.foreach { i =>
        val pos = i + 1
        val uni = c1.getOrElse(w(i), 1L).toDouble
        val ls =
          if (pos >= 3) {
            val trik = s"${w(i - 2)} ${w(i - 1)} ${w(i)}"
            val bik = s"${w(i - 1)} ${w(i)}"
            if (c3.contains(trik))
              StrictMath.log(c3(trik).toDouble / c2(s"${w(i - 2)} ${w(i - 1)}").toDouble)
            else if (c2.contains(bik))
              StrictMath.log(Alpha * (c2(bik).toDouble / c1(w(i - 1)).toDouble))
            else StrictMath.log(Alpha * Alpha * (uni / nTotal))
          } else if (pos == 2) {
            val bik = s"${w(i - 1)} ${w(i)}"
            if (c2.contains(bik))
              StrictMath.log(c2(bik).toDouble / c1(w(i - 1)).toDouble)
            else StrictMath.log(Alpha * (uni / nTotal))
          } else StrictMath.log(uni / nTotal)
        s += ls
      }
      s
    }
    val expect = docs.map { case (id, w) =>
      val sc = mirror(w)
      val milli = math.floor(1000 * sc / w.length).toLong
      id -> ((w.length.toLong, sc, milli, milli >= -3000))
    }.toMap
    val got = DataOps.sbScore(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    got.keySet shouldBe expect.keySet
    got.foreach { case (id, g) =>
      withClue(s"doc $id: ") { g shouldBe expect(id) }
    }
    // scores differentiate: the corpus is not one flat band
    got.values.map(_._3).toSet.size should be > 10
  }
}
