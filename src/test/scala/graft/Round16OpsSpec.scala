package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, RefOps}

/** r16 graduations (r15 verdict #2/#3/#4): the IVF ANN probe path, the
  * signature-index compaction manifest, and ArticleStore time travel
  * each gained a DuckDB-graded face. These specs pin the Spark-side
  * invariants the cross-engine hash cannot see: probe containment, the
  * compaction content-preservation law against a never-compacted twin,
  * and the retained-version read serving PRE-update rows after the
  * update landed.
  */
class Round16OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("ann_ivf graded face: candidates probed-list-only, ranks dense, agrees with the operator") {
    val g = DataOps.annIvfGraded(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3).toLong))
    g should not be empty
    // ranks are dense 1..n (n <= 8) per query, ordered by (cos desc, vec_id)
    g.groupBy(_._1).foreach { case (_, rows) =>
      val byRk = rows.sortBy(_._4)
      byRk.map(_._4).toSeq shouldBe (1L to byRk.length.toLong)
      byRk.length should be <= 8
      // rank follows the RAW cosine (oracle-pinned); the served rounded
      // cos can only be checked for monotone non-increase — two raw
      // values may round equal while their raw order ignores vec_id
      byRk.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 >= b._3, s"rank order broken: $a then $b")
        case _ => ()
      }
    }
    // every candidate lies in one of its query's nProbe probed lists —
    // the IVF contract the oracle replays; recomputed here from the
    // quantizer pair the operator itself ranks against
    val ivf = DataOps.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3).toLong))
    g.map(x => (x._1, x._2, x._4)).toSet shouldBe ivf.toSet
  }

  test("index_compaction graded face: post-compaction content equals a never-compacted twin, generation 1") {
    val g = DataOps.indexCompactionGraded(spark, sf)
    g.select("generation").distinct().collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    val twin = new graft.sink.SignatureIndex(spark, tmpDir("r16-twin"))
    twin.appendDocuments(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")))
    twin.generation shouldBe 0L
    g.select("doc_id", "b", "h", "rk").collect().map(_.toSeq).toSet shouldBe
      twin.bands.select("doc_id", "b", "h", "rk").collect().map(_.toSeq).toSet
  }

  test("ccnet_buckets: score-threshold terciles — ordered, exhaustive, minimal head") {
    val rows = DataOps.ccnetBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val score = DataOps.sbDocScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    // the bucketed score IS the graded sb_doc_score avg_ppm
    rows.foreach { case (d, _, a, _) => score(d) shouldBe a }
    rows.groupBy(_._2).foreach { case (_, g) =>
      val n = g.length
      val byB = g.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      val head = byB.getOrElse("head", Array.empty[Long])
      val mid = byB.getOrElse("middle", Array.empty[Long])
      val tail = byB.getOrElse("tail", Array.empty[Long])
      head.length + mid.length + tail.length shouldBe n
      // buckets are score-separated: every head score beats every
      // middle score, every middle beats every tail
      if (head.nonEmpty && mid.nonEmpty) head.min should be > mid.max
      if (mid.nonEmpty && tail.nonEmpty) mid.min should be > tail.max
      // head reaches the tercile and is minimal given score ties
      val ceil3 = (n + 2) / 3
      head.length should be >= ceil3
      (head.length - head.count(_ == head.min)) should be < ceil3
    }
  }

  test("soft_dedup: per-cluster equal weights, singleton mass exact, family mass bounded") {
    val w = DataOps.softDedupWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val clustered = DataOps.dedupCluster(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    w.length shouldBe spark.read.parquet(s"$sf/documents.parquet").count()
    w.foreach { case (d, rep, size, wp) =>
      if (clustered.contains(d)) rep shouldBe clustered(d)
      else { rep shouldBe d; size shouldBe 1L; wp shouldBe 1000000L }
      wp shouldBe 1000000L / size
    }
    // every near-dup family's total mass is one clean copy's, short
    // only the integer-division remainder (< |cluster| ppm)
    val fams = w.groupBy(_._2).filter(_._2.length > 1)
    fams should not be empty
    fams.foreach { case (_, g) =>
      val mass = g.map(_._4).sum
      mass should be <= 1000000L
      mass should be > (1000000L - g.length)
      g.map(_._3).distinct.toSeq shouldBe Seq(g.length.toLong)
    }
  }

  test("time_travel graded face: version 1 serves pre-update rows after version 2 replaced them") {
    val t = RefOps.timeTravelGraded(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"))
    val mods = nDocs.collect().map(_.getLong(0) % 10)
    // version 1 = the phase-1 batch exactly, all titles v1
    val v1 = t.filter(_._1 == 1L)
    v1.length shouldBe mods.count(_ < 5)
    all(v1.map(_._3)) should startWith("v1 title ")
    // version 2 = the merge law: untouched v1 rows + the phase-2 batch
    val v2 = t.filter(_._1 == 2L)
    v2.length shouldBe mods.count(m => m < 3 || (m >= 3 && m <= 7))
    v2.count(_._3.startsWith("v2 title ")) shouldBe
      mods.count(m => m >= 3 && m <= 7)
    // the retained-read promise: every key REPLACED at version 2 still
    // serves its original row at version 1
    val replaced = v2.filter(_._3.startsWith("v2 title ")).map(_._2).toSet
    val v1ByKey = v1.map(r => r._2 -> r._3).toMap
    val overlap = v1.map(_._2).toSet.intersect(replaced)
    overlap should not be empty
    overlap.foreach { k => v1ByKey(k) should startWith("v1 title ") }
  }
}
