package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned corpus layout: the on-disk shape that makes
  * language- and source-scoped reads cheap at 100 TB.
  *
  * `write` lays the corpus out as `lang=<l>/part-*.parquet` with rows
  * sorted by `doc_id` WITHIN each file: the directory level gives the
  * reader partition PRUNING (a `lang = 'en'` predicate never lists, let
  * alone reads, the other languages' files — at a 5-language 100 TB
  * corpus that is 80% of the bytes skipped before any IO), and the
  * in-file sort gives parquet row-group min/max statistics their bite
  * for `doc_id` range predicates (row-group skipping within the kept
  * files). Both effects are pinned in `PartitionedCorpusSpec`:
  * the scan's `PartitionFilters` carry the lang predicate and its
  * `PushedFilters` carry the doc_id range.
  *
  * The writer repartitions by the partition column first so each task
  * writes into ONE directory (otherwise every task appends a file to
  * every partition — tasks × partitions small files, the classic
  * partitioned-write mistake); `maxRecordsPerFile` would bound file
  * size at scale.
  */
object PartitionedCorpus {

  def write(df: DataFrame, path: String): Unit =
    // (lang, bucket) repartitioning: file count is bounded by the CELL
    // count (langs × 16) rather than tasks × langs — no small-file
    // explosion — while a language spreads over up to 16 tasks;
    // repartitioning on lang alone would funnel the dominant language's
    // entire volume through a single task, the same serialization this
    // file's own docs warn against. (A task that receives two cells by
    // hash collision writes two files — still within the cell bound.)
    df.repartition(col("lang"), pmod(col("doc_id"), lit(16)))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.mode("overwrite")
      .partitionBy("lang")
      .parquet(path)

  /** Scoped read: `lang` prunes at the directory level, the optional
    * doc_id bounds push to parquet row-group stats.
    */
  def readLang(spark: SparkSession, path: String, lang: String,
               minDocId: Option[Long] = None): DataFrame = {
    val base = spark.read.parquet(path).filter(col("lang") === lang)
    minDocId.fold(base)(m => base.filter(col("doc_id") >= m))
  }
}
