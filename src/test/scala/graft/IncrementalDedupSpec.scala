package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.sink.SignatureIndex

/** Contract of the persisted-signature incremental dedup
  * ([[DataOps.dedupIncrementalOn]] over [[SignatureIndex]]):
  *
  *  1. sequential batches ≡ one full-corpus run: feeding the corpus in two
  *     batches yields exactly the full batch operator's pair set;
  *  2. signatures-only: batch 2 runs (and finds cross-batch pairs) AFTER
  *     batch 1's raw text has been deleted from disk;
  *  3. pair_type reflects true batch membership;
  *  4. the index maintains per-(b, h) arrival ranks across appends.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs(): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("the graded binding's shared fixture makes every run identical") {
    // run 1 builds the per-process fixture and appends the batch; run 2
    // replays the SAME batch against an index that already holds it —
    // the at-least-once case the operator's anti-join guards exist for
    val first = pairs(DataOps.dedupIncremental(spark, dir))
    val second = pairs(DataOps.dedupIncremental(spark, dir))
    val third = pairs(DataOps.dedupIncremental(spark, dir))
    first should not be empty
    second shouldBe first
    third shouldBe first
  }

  test("two sequential batches produce exactly the one-shot pair set") {
    val d = docs()
    val b1 = d.filter(col("doc_id") % 3 =!= 0)
    val b2 = d.filter(col("doc_id") % 3 === 0)
    val idx = new SignatureIndex(spark, tmpDir("sigidx-seq-"))
    val run1 = DataOps.dedupIncrementalOn(idx, b1)
    val run2 = DataOps.dedupIncrementalOn(idx, b2)

    val full = DataOps.dedupOnShingles(
      DataOps.shingledOn(d), DataOps.BandBucketCap)
    (pairs(run1) ++ pairs(run2)) shouldBe pairs(full)
    // sequential runs partition the pair set: nothing reported twice
    pairs(run1).intersect(pairs(run2)) shouldBe empty
  }

  test("batch 2 needs no batch-1 raw text: runs after its files are deleted") {
    val d = docs()
    val b1Dir = tmpDir("b1-docs-")
    d.filter(col("doc_id") % 3 =!= 0).write.mode("overwrite").parquet(b1Dir)
    val idx = new SignatureIndex(spark, tmpDir("sigidx-del-"))
    DataOps.dedupIncrementalOn(idx, spark.read.parquet(b1Dir))

    // destroy batch 1's raw text; only the index survives
    val p = new org.apache.hadoop.fs.Path(b1Dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    val run2 = DataOps.dedupIncrementalOn(idx, d.filter(col("doc_id") % 3 === 0))
    val cross = run2.filter(col("pair_type") === "new_hist").count()
    assert(cross > 0, "expected cross-batch pairs found from signatures alone")
  }

  test("pair_type reflects batch membership") {
    val d = docs()
    val batchIds = d.filter(col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val idx = new SignatureIndex(spark, tmpDir("sigidx-type-"))
    DataOps.dedupIncrementalOn(idx, d.filter(col("doc_id") % 3 =!= 0))
    val run2 = DataOps.dedupIncrementalOn(idx, d.filter(col("doc_id") % 3 === 0))
    run2.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val expected =
        if (batchIds(a) && batchIds(b)) "new_new" else "new_hist"
      assert(r.getString(2) == expected, s"pair ($a,$b)")
    }
  }

  test("index arrival ranks stay dense and unique across appends") {
    val d = docs()
    val idx = new SignatureIndex(spark, tmpDir("sigidx-rank-"))
    DataOps.dedupIncrementalOn(idx, d.filter(col("doc_id") % 3 =!= 0))
    DataOps.dedupIncrementalOn(idx, d.filter(col("doc_id") % 3 === 0))
    val bad = idx.bands.groupBy("b", "h")
      .agg(count(lit(1)).as("n"), countDistinct(col("rk")).as("nrk"),
        max(col("rk")).as("mx"), min(col("rk")).as("mn"))
      .filter(col("nrk") =!= col("n") || col("mx") =!= col("n") ||
        col("mn") =!= lit(1))
      .count()
    bad shouldBe 0L
  }
}
