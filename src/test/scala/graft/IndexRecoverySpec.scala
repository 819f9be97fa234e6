package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.sink.SignatureIndex
import graft.streaming.StreamingIndexDedup

/** r15 verdict #7: the crash/restart recovery story for the PERSISTED
  * signature index under the streaming path — the ArticleStore
  * CAS/fencing discipline (claim, pre-publish re-check, abandonClaim for
  * a dead writer) extended to the index's maintenance lock. Pinned here:
  * a compactor killed BETWEEN its rewrite and its pointer swap leaves the
  * live generation untouched and every reader/append correctly fenced;
  * [[SignatureIndex.abandonCompaction]] clears the debris; the re-run
  * compaction converges to the exact pre-crash content; and the
  * streaming drain that resumes over the same checkpoint emits exactly
  * the pair set a never-crashed control run emits. A stale lock from a
  * compactor killed AFTER its swap is likewise cleared without touching
  * the now-live generation.
  */
class IndexRecoverySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = {
    import spark.implicits._
    val fam = Seq(
      (2001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2003L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3001L, "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3000L, "lambda mu nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").unionByName(fam)
  }

  private def pairsOf(pairsDir: String): Set[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(pairsDir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      Set.empty
    else spark.read.parquet(pairsDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("compactor killed before the swap: fenced, abandoned, re-run converges; the resumed stream matches a never-crashed control") {
    val c = corpus
    val b1 = c.filter(col("doc_id") % 2 =!= 0)
    val b2 = c.filter(col("doc_id") % 2 === 0)

    val landing = tmpDir("rec-landing")
    val pairsDir = tmpDir("rec-pairs") + "/out"
    val ckpt = tmpDir("rec-ckpt")
    val base = tmpDir("rec-idx")
    val idx = new SignatureIndex(spark, base)

    b1.coalesce(1).write.mode("append").parquet(landing)
    StreamingIndexDedup.runAvailableNow(spark, idx, landing, pairsDir, ckpt)
    val bandsBefore = idx.bands.collect().map(_.toSeq).toSet
    idx.generation shouldBe 0L

    // simulate a compactor killed between its next-gen rewrite and the
    // pointer swap: the lock is on disk and gen1 holds a PARTIAL rewrite
    new java.io.File(base, "_COMPACTING").createNewFile() shouldBe true
    idx.bands.limit(3).write.parquet(s"$base/gen1/bands")

    // appends are fenced loudly while the (dead) compactor holds the lock
    intercept[IllegalArgumentException] {
      idx.appendDocuments(b2.limit(1))
    }
    // a second compactor cannot race the (dead) lock holder either
    intercept[IllegalStateException] { idx.compact() }
    // readers keep resolving the live generation under all of it
    idx.generation shouldBe 0L
    idx.bands.collect().map(_.toSeq).toSet shouldBe bandsBefore

    // the dead compactor is abandoned: debris gone, pointer untouched
    idx.abandonCompaction()
    new java.io.File(s"$base/gen1").exists() shouldBe false
    idx.generation shouldBe 0L

    // the re-run compaction converges to the exact pre-crash content
    idx.compact()
    idx.generation shouldBe 1L
    idx.bands.collect().map(_.toSeq).toSet shouldBe bandsBefore

    // and the streaming drain resumes over the same checkpoint against
    // the compacted index: the final pair set is exactly what a
    // never-crashed, never-compacted control run emits
    b2.coalesce(1).write.mode("append").parquet(landing)
    StreamingIndexDedup.runAvailableNow(spark, idx, landing, pairsDir, ckpt)

    val ctrlLanding = tmpDir("rec-ctrl-landing")
    val ctrlPairs = tmpDir("rec-ctrl-pairs") + "/out"
    val ctrlCkpt = tmpDir("rec-ctrl-ckpt")
    val ctrl = new SignatureIndex(spark, tmpDir("rec-ctrl-idx"))
    b1.coalesce(1).write.mode("append").parquet(ctrlLanding)
    StreamingIndexDedup.runAvailableNow(spark, ctrl, ctrlLanding, ctrlPairs, ctrlCkpt)
    b2.coalesce(1).write.mode("append").parquet(ctrlLanding)
    StreamingIndexDedup.runAvailableNow(spark, ctrl, ctrlLanding, ctrlPairs, ctrlCkpt)

    pairsOf(pairsDir) shouldBe pairsOf(ctrlPairs)
    idx.bands.select("doc_id", "b", "h", "rk").collect().map(_.toSeq).toSet shouldBe
      ctrl.bands.select("doc_id", "b", "h", "rk").collect().map(_.toSeq).toSet
  }

  test("compactor killed after the swap: the stale lock clears without touching the live generation") {
    val base = tmpDir("rec2-idx")
    val idx = new SignatureIndex(spark, base)
    idx.appendDocuments(corpus.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("text")))
    idx.compact()
    idx.generation shouldBe 1L
    val bands1 = idx.bands.collect().map(_.toSeq).toSet

    // killed between publishGen and the lock release in `finally`
    new java.io.File(base, "_COMPACTING").createNewFile() shouldBe true
    intercept[IllegalArgumentException] {
      idx.appendDocuments(corpus.limit(1).select(col("doc_id"), col("text")))
    }
    idx.abandonCompaction()
    // the live generation survived the abandon untouched
    idx.generation shouldBe 1L
    idx.bands.collect().map(_.toSeq).toSet shouldBe bands1

    // normal life resumes: appends land, the next compaction advances
    val before = idx.bands.count()
    idx.appendDocuments(corpus.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text")))
    idx.bands.count() should be > before
    val bands2 = idx.bands.select("doc_id", "b", "h", "rk")
      .collect().map(_.toSeq).toSet
    idx.compact()
    idx.generation shouldBe 2L
    idx.bands.select("doc_id", "b", "h", "rk")
      .collect().map(_.toSeq).toSet shouldBe bands2
  }
}
