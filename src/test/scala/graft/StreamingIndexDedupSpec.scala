package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.sink.SignatureIndex
import graft.streaming.StreamingIndexDedup

/** The durable streaming dedup binding: landing files drain through
  * [[StreamingIndexDedup.runAvailableNow]] micro-batch by micro-batch,
  * with the persisted [[SignatureIndex]] as the only cross-run state.
  * Pinned: two drains (batch 1, then batch 2 after a simulated restart —
  * a NEW query over the same checkpoint) emit exactly the one-shot
  * full-corpus pair set restricted to pairs touching each batch, with no
  * pair emitted twice; and a restart with NOTHING new to process emits
  * nothing and appends nothing to the index.
  */
class StreamingIndexDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("drain, restart, drain: exactly the one-shot pairs, no re-processing") {
    import spark.implicits._
    // two planted near-dup families split across the batches so both
    // new_new (within batch) and new_hist (across batches) pairs exist
    val fam = Seq(
      (2001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2003L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3001L, "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3000L, "lambda mu nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").unionByName(fam)
    val b1 = corpus.filter(col("doc_id") % 2 =!= 0)
    val b2 = corpus.filter(col("doc_id") % 2 === 0)

    val landing = tmpDir("sid-landing")
    val pairsDir = tmpDir("sid-pairs") + "/out"
    val ckpt = tmpDir("sid-ckpt")
    val idx = new SignatureIndex(spark, tmpDir("sid-idx"))

    def pairs(): Set[(Long, Long, String)] = {
      val p = new org.apache.hadoop.fs.Path(pairsDir)
      if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        Set.empty
      else spark.read.parquet(pairsDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    }

    b1.coalesce(1).write.mode("append").parquet(landing)
    StreamingIndexDedup.runAvailableNow(spark, idx, landing, pairsDir, ckpt)
    val after1 = pairs()
    after1.map(p => (p._1, p._2)) should contain((2001L, 2003L))
    all(after1.map(_._3)) shouldBe "new_new"

    // restart with nothing new: no output growth, no index growth
    val bandRows = idx.bands.count()
    StreamingIndexDedup.runAvailableNow(spark, idx, landing, pairsDir, ckpt)
    pairs() shouldBe after1
    idx.bands.count() shouldBe bandRows

    // second batch after the restart: cross-batch pairs surface
    b2.coalesce(1).write.mode("append").parquet(landing)
    StreamingIndexDedup.runAvailableNow(spark, idx, landing, pairsDir, ckpt)
    val all2 = pairs()
    all2((3000L, 3001L, "new_hist")) shouldBe true

    // exactly the one-shot full-corpus pair set — nothing missed, nothing
    // emitted twice (set vs bag equality via counts)
    val oneShot = DataOps.dedupOnShingles(
      DataOps.shingledOn(corpus), DataOps.BandBucketCap)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    all2.map(p => (p._1, p._2)) shouldBe oneShot
    spark.read.parquet(pairsDir).count() shouldBe all2.size.toLong
  }

  test("a partial bands write resumes on replay: missing rows appended, nothing duplicated") {
    import spark.implicits._
    val docs = Seq(
      (50L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (51L, "lambda mu nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    val idx = new SignatureIndex(spark, tmpDir("sid-partial-idx"))
    val sh = DataOps.shingledOn(docs)
    val bands = DataOps.bandDigests(sh)
    // simulated crash midway through the bands write: shingles committed,
    // only 2 of the 4 band rows per doc made it
    idx.append(sh, bands.filter(col("b") < 2))
    // the at-least-once replay delivers the full batch again
    idx.append(sh, bands)
    idx.shingles.count() shouldBe 2L // one row per doc, never duplicated
    idx.bands.count() shouldBe 8L // 2 docs x 4 bands, resumed not doubled
    idx.bands.select("pb", "b", "h", "doc_id").distinct().count() shouldBe 8L
    // and a third delivery is a complete no-op
    idx.append(sh, bands)
    idx.bands.count() shouldBe 8L
    idx.shingles.count() shouldBe 2L
  }

  test("completed-append replay is idempotent: same pairs, no self-pairs, no index growth") {
    import spark.implicits._
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val idx = new SignatureIndex(spark, tmpDir("sid-replay-idx"))

    def run() = DataOps.dedupIncrementalOn(idx, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted

    val first = run() // appends the batch
    val bandRows = idx.bands.count()
    val shingleRows = idx.shingles.count()
    // the at-least-once replay: batch re-delivered after its append
    // completed — byte-identical output (as a bag, not just a set), no
    // doc paired with itself, nothing re-appended
    val replay = run()
    replay shouldBe first
    replay.map(p => (p._1, p._2)) should contain((10L, 11L))
    replay.foreach { case (a, b, _) => a should not be b }
    idx.bands.count() shouldBe bandRows
    idx.shingles.count() shouldBe shingleRows
  }
}
