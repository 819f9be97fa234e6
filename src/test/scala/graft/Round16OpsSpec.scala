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
