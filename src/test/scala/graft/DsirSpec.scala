package graft

import java.security.MessageDigest

import graft.queries.{DataOps, Tables}

/** DSIR importance weighting: the graded count table mirrors a plain
  * driver recompute exactly, and the spec-bounded score is BIT-exact vs
  * a mirror that folds the same smoothed log-ratios in the same array
  * order (the k-means N54 pattern for float outputs) — both at TWO SFs,
  * the repo's spec-bounded standard.
  */
class DsirSpec extends SparkSpec {
  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  private val B = 4096

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def features(text: String): Seq[String] = {
    val w = text.split(" ", -1).toSeq
    w ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" "))
  }

  private def bucket(t: String): Int =
    Integer.parseInt(md5hex("dsir:" + t).substring(0, 4), 16) % B

  private def corpus(sf: String) = Tables(spark, sf, "documents")
    .select("doc_id", "lang", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def histograms(docs: Array[(Long, String, String)]) = {
    val nt = new Array[Long](B); val nr = new Array[Long](B)
    docs.foreach { case (_, lang, text) =>
      val a = if (lang == "en") nt else nr
      features(text).foreach(t => a(bucket(t)) += 1)
    }
    (nt, nr)
  }

  test("dsir_counts equals a driver recompute of both histograms (two SFs)") {
    sfs.foreach { sf =>
      val (nt, nr) = histograms(corpus(sf))
      val got = DataOps.dsirCounts(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val want = (0 until B)
        .filter(b => nt(b) + nr(b) > 0)
        .map(b => (b.toLong, nt(b), nr(b)))
      withClue(sf) { got.toSeq shouldBe want }
    }
  }

  test("dsir_score is bit-exact vs the mirror fold; selection = score > 0 (two SFs)") {
    sfs.foreach { sf =>
      val docs = corpus(sf)
      val (nt, nr) = histograms(docs)
      val tT = nt.sum + B.toDouble; val tR = nr.sum + B.toDouble
      val ratios = (0 until B).map(b =>
        math.log((nt(b) + 1.0) / tT) - math.log((nr(b) + 1.0) / tR))
      val want = docs.map { case (id, _, text) =>
        id -> features(text).foldLeft(0.0)((a, t) => a + ratios(bucket(t)))
      }.toMap
      val got = DataOps.dsirScore(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
      withClue(sf) {
        got.length shouldBe docs.length.toLong
        got.foreach { case (id, _, score, sel) =>
          score shouldBe want(id) // exact double equality — same fold order
          sel shouldBe (score > 0)
        }
        // the score separates the corpora it was trained on: en above rest
        val (en, rest) = got.partition(_._2 == "en")
        en.map(_._3).sum / en.length should be > rest.map(_._3).sum / rest.length
      }
    }
  }
}
