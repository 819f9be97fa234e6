package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-bucketed corpus tables: Spark's `bucketBy` layout, where the
  * expensive hash-partitioning of a join is paid ONCE at write time and
  * every subsequent join on the bucket key plans with the table side
  * unshuffled.
  *
  * Why this is the single biggest recurring-cost lever at 100 TB: every
  * doc_id join-back in the pipeline ([[graft.queries.DataOps.decontaminate]]'s
  * flag join, `hostCap`'s score join, `dupWindows`'s per-doc re-aggregation
  * consumers) otherwise shuffles the full corpus ON EVERY RUN — at 100 TB
  * that is ~the corpus size in network + spill I/O per join, repeated
  * daily. A bucketed catalog table moves that shuffle to write time:
  *  - **co-bucketed join** (both sides bucketed on the join key with the
  *    same bucket count): ZERO Exchange on either side — the scan itself
  *    reports `HashPartitioning(key, n)`, so the SortMergeJoin needs no
  *    shuffle (pinned in `PlanBudgetSpec`). A partition-local Sort
  *    remains: Spark ≥3.0 ignores the written per-bucket order unless
  *    the legacy `bucketedTableScan.outputOrdering` flag is set — that
  *    sort is task-local CPU, zero network, not the lever.
  *  - **derived-side join** (a batch-derived frame against the bucketed
  *    table): only the SMALL derived side shuffles, into the table's
  *    bucketing — the 100 TB side never moves (pinned in
  *    `BucketedCatalogSpec`).
  *
  * When bucket maintenance beats paying the shuffle: the write itself
  * costs one full shuffle (the same work one unbucketed join would pay),
  * so bucketing wins as soon as a table is join-probed on the key more
  * often than it is rewritten — true for any corpus table a daily
  * pipeline reads (rewritten ~never, probed every run). It is NOT worth
  * it for run-scoped intermediates (probed once), nor for keys the
  * workload never joins on. Two scale cautions: bucket count is FIXED at
  * write time and AQE cannot coalesce or split bucketed scans, so pick n
  * from target partition size (corpus_bytes / n ≈ 128-512 MB — thousands
  * of buckets at 100 TB, 8 in these tests); and a skewed bucket key
  * (one hot doc_id family) stays skewed forever — salt upstream instead.
  *
  * Mechanics the helpers below encode so callers cannot get them wrong:
  *  - `repartition(n, key)` BEFORE the bucketed write: Spark writes one
  *    file per bucket PER TASK, and `repartition` uses the same Murmur3
  *    hash as bucketing, so pre-partitioning gives exactly ONE file per
  *    bucket — no small-file explosion, and the shape the sorted-scan
  *    flag (above) requires if a deployment enables it.
  *  - `sortBy(key)` inside each bucket: row-group stats line up with the
  *    key, and readers that enable the sorted-scan flag skip the
  *    partition-local sort entirely.
  *  - co-bucketed sides may use DIFFERENT column names (documents.doc_id
  *    vs embeddings.vec_id): each side's scan partitioning is checked
  *    against its OWN join key, so `doc_id === vec_id` still plans
  *    Exchange-free.
  *
  * The reference has no analog (its sink is a single SQLite table,
  * `database_utils/database_methods.py:143-153`); this is engine depth
  * the Spark-native design adds.
  */
object BucketedCorpus {

  /** Buckets for the test tables; production sizes from bytes/bucket. */
  val NumBuckets = 8

  /** Write `df` as a bucketed, per-bucket-sorted EXTERNAL catalog table
    * at `path` (external so tests and pipelines control the location;
    * the catalog entry carries the bucket spec that later scans read).
    */
  def writeTable(df: DataFrame, table: String, path: String, key: String,
                 nBuckets: Int = NumBuckets): Unit =
    df.repartition(nBuckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Register `documents` and `embeddings` from a test-data dir as
    * co-bucketed catalog tables (same bucket count; doc_id / vec_id are
    * the same id domain). Returns the table names.
    */
  def writeCorpus(spark: SparkSession, dir: String, base: String,
                  nBuckets: Int = NumBuckets): (String, String) = {
    val docsTable = "graft_docs_bucketed"
    val embTable = "graft_emb_bucketed"
    writeTable(spark.read.parquet(s"$dir/documents.parquet"),
      docsTable, s"$base/documents", "doc_id", nBuckets)
    writeTable(spark.read.parquet(s"$dir/embeddings.parquet"),
      embTable, s"$base/embeddings", "vec_id", nBuckets)
    (docsTable, embTable)
  }

  /** The co-bucketed doc↔embedding join: both scans arrive hash-
    * partitioned and sorted on their own key, so the equi-join plans
    * with zero Exchange and zero Sort on BOTH sides. This is the shape
    * every repeated corpus-wide join should take at scale.
    */
  def joinDocsEmbeddings(spark: SparkSession, docsTable: String,
                         embTable: String): DataFrame =
    spark.table(docsTable).join(spark.table(embTable),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("embedding"), col("label"))

  /** Bucketed read path for the heavy join-backs: join a (small,
    * batch-derived) frame against the bucketed corpus on `doc_id`.
    * Only `derived` shuffles — into the table's bucketing — while the
    * corpus side is consumed directly off its bucketed scan. At 100 TB
    * this turns "shuffle the corpus per run" into "shuffle today's
    * batch per run".
    */
  def joinBack(spark: SparkSession, docsTable: String,
               derived: DataFrame): DataFrame =
    spark.table(docsTable).join(derived, Seq("doc_id"))
}
