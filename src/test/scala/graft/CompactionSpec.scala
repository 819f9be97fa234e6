package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.sink.SignatureIndex

/** [[SignatureIndex.compact]]: storage-only — the row multiset (including
  * arrival ranks) is untouched, the per-append file accumulation
  * collapses, and the incremental dedup operator over a compacted index
  * returns byte-identical pairs.
  */
class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }

  test("compact preserves rows and ranks, collapses files, and dedup output is unchanged") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val base = tmpDir("compaction-idx")
    val idx = new SignatureIndex(spark, base)
    // several appends -> many small files per cell
    for (part <- 0 until 4)
      idx.append(DataOps.shingledOn(d.filter(col("doc_id") % 4 === part)))

    def bandRows = idx.bands.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getInt(4)))
      .sorted.toSeq
    def shingleRows = idx.shingles.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).sorted.mkString("|"))).sorted.toSeq

    // the batch a future day would bring, deduped against the index
    // before AND after compaction — must be byte-identical
    val batch = Seq((9000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    def pairsNow = DataOps.dedupIncrementalOn(idx, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).sorted.toSeq
    val pairsBefore = pairsNow // appends 9000 to the index

    // snapshot AFTER the incremental append so the newest rows (doc
    // 9000's) are inside the preservation check, not excluded from it
    val (bandsBefore, shinglesBefore) = (bandRows, shingleRows)
    val filesBefore = parquetFiles(base)

    idx.compact()

    bandRows shouldBe bandsBefore
    shingleRows shouldBe shinglesBefore
    // the LIVE generation holds the collapsed file set; the previous
    // generation is retained for in-flight readers until the next
    // compaction, so the on-disk total collapses one compaction later
    parquetFiles(s"$base/gen1") should be < filesBefore
    idx.compact()
    parquetFiles(base) should be < filesBefore
    // replay of the same batch over the compacted index: identical pairs
    // (the replay guard makes the second run side-effect-free)
    pairsNow shouldBe pairsBefore
  }

  test("a reader that resolved before the compaction swap survives it") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val base = tmpDir("compaction-reader")
    val idx = new SignatureIndex(spark, base)
    for (part <- 0 until 3)
      idx.append(DataOps.shingledOn(d.filter(col("doc_id") % 3 === part)))

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq

    // resolve the table BEFORE the swap — this reader's file listing is
    // pinned to the pre-compaction generation
    val preSwap = idx.bands
    val expected = rows(preSwap)
    idx.compact()
    // the previous generation is retained through the swap: the stale
    // reader completes with the full pre-swap row set, no missing files
    rows(preSwap) shouldBe expected
    // a fresh resolve sees the new generation with identical content
    rows(idx.bands) shouldBe expected

    // appends land in the LIVE generation after the swap and a second
    // compaction (which drops the oldest generation) loses nothing
    val extra = Seq((7777L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    idx.append(DataOps.shingledOn(extra))
    val withExtra = rows(idx.bands)
    withExtra.size should be > expected.size
    idx.compact()
    rows(idx.bands) shouldBe withExtra
    // the generation pointer exists and gen 0's base-dir tables are gone
    // (second compaction dropped them), while the base dir itself — and
    // the retained previous generation — survive
    assert(new java.io.File(base, "_GEN").exists())
    assert(!new java.io.File(base, "bands").exists())
    assert(new java.io.File(base, "gen1").exists())
    assert(new java.io.File(base, "gen2").exists())
  }

  test("writer exclusion is mechanical: appends fail while the lock is held; lock always released") {
    import spark.implicits._
    val base = tmpDir("compaction-lock")
    val idx = new SignatureIndex(spark, base)
    idx.append(DataOps.shingledOn(
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")))
    // simulate an in-flight compaction holding the lock
    val lock = new java.io.File(base, "_COMPACTING")
    lock.createNewFile() shouldBe true
    val ex = intercept[IllegalArgumentException] {
      idx.append(DataOps.shingledOn(
        Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text")))
    }
    ex.getMessage should include("compacting")
    // a second compaction cannot start either
    val ex2 = intercept[IllegalStateException] { idx.compact() }
    ex2.getMessage should include("in progress")
    lock.delete() shouldBe true
    // with the lock gone both operations proceed, and compact() releases
    // its own lock on the way out
    idx.append(DataOps.shingledOn(
      Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text")))
    idx.compact()
    assert(!lock.exists(), "compact() must release its lock")
    idx.bands.select("doc_id").distinct().count() shouldBe 2L
  }
}
