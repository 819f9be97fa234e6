package graft.sink

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.funcs.Funcs
import graft.model.ArticleSchema

/** The engine's keyed, upsertable serving table — the Spark re-expression of
  * the reference's SQLite `articles` sink (K1/K2/K3/S5/T1 in SURVEY.md §2).
  *
  * Plain parquet has no keyed upsert, so merge is the classic
  * anti-join + union rewrite (reference upsert:
  * database_utils/database_methods.py:68-107) over immutable snapshots:
  * each merge writes a complete new snapshot directory `v<N>` and then
  * atomically swaps a pointer file — readers see either the old or the new
  * snapshot, never a half-written one.
  *
  * Scale notes (100 TB design):
  *   - the incoming batch is broadcast (incremental batches are small by
  *     construction — one run's worth of new articles), so the anti-join is
  *     shuffle-free on the big side: a single pass over the stored table.
  *   - the stored snapshot is written hash-distributed by the merge key
  *     (`repartition(key)`), so key-colocation survives across merges and a
  *     future co-partitioned (bucketed) merge path needs no re-shuffle.
  *   - nothing here collects to the driver except the watermark scalar.
  */
final class ArticleStore(spark: SparkSession, basePath: String,
                         keyCol: String = ArticleSchema.ArticleId,
                         numFiles: Int = 0) {
  import ArticleStore._

  private val base = new Path(basePath)
  private def fs: FileSystem = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val pointer = new Path(base, "_CURRENT")

  /** K2 — CREATE TABLE IF NOT EXISTS: an empty v0 snapshot. */
  def create(): Unit = if (!fs.exists(pointer)) {
    fs.mkdirs(base)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], ArticleSchema.schema)
    writeSnapshot(empty, 0L)
  }

  /** K3 — DROP TABLE. */
  def drop(): Unit = if (fs.exists(base)) { fs.delete(base, true); () }

  def exists: Boolean = fs.exists(pointer)

  private def currentVersion: Long = {
    val in = fs.open(pointer)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong
    finally in.close()
  }

  private def snapshotPath(v: Long) = new Path(base, s"v$v")

  /** S6 — serving-table scan of the current snapshot. */
  def read(): DataFrame = spark.read.parquet(snapshotPath(currentVersion).toString)

  private def writeSnapshot(df: DataFrame, v: Long): Unit = {
    // Key-distributed layout: merges and key-lookups stay co-located.
    val sized = if (numFiles > 0) df.repartition(numFiles, col(keyCol))
                else df.repartition(col(keyCol))
    sized.write.mode("overwrite").parquet(snapshotPath(v).toString)
    val tmp = new Path(base, s"_CURRENT.tmp$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, pointer)) { // first publish: pointer doesn't exist yet
      fs.delete(pointer, false)
      require(fs.rename(tmp, pointer), s"failed to publish snapshot v$v")
    }
    // GC all but the snapshot just published and its predecessor.
    val keep = Set(s"v$v", s"v${v - 1}", "_CURRENT")
    fs.listStatus(base).foreach { st =>
      if (!keep.contains(st.getPath.getName)) fs.delete(st.getPath, true)
    }
  }

  /** K1 — keyed upsert: new rows win over stored rows with the same key;
    * every surviving incoming row gets a fresh Processed_at
    * (reference: database_utils/database_methods.py:84-94).
    */
  def merge(batch: DataFrame): Unit = {
    create()
    val v = currentVersion
    val stamped = dedupeLatest(batch, keyCol)
      .withColumn(ArticleSchema.ProcessedAt, Funcs.processedNow())
      .select(ArticleSchema.columns.map(col): _*)
    val old = spark.read.parquet(snapshotPath(v).toString)
    // Incremental batches are small: broadcast so the anti-join is a single
    // shuffle-free pass over the (potentially huge) stored snapshot.
    val merged = old
      .join(broadcast(stamped.select(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(stamped)
    writeSnapshot(merged, v + 1)
  }

  /** S5 — watermark read: `date_trunc(DAY, max(publish_time))`, cold-start
    * fallback to the fixed default; also reports whether the run is
    * incremental (reference: database_utils/database_methods.py:40-66).
    */
  def watermark(): (Timestamp, Boolean) = {
    val row = read()
      .agg(Funcs.truncToDay(max(col(ArticleSchema.NewsPublishedTime))).as("wm"))
      .head()
    if (row.isNullAt(0))
      (Timestamp.valueOf(ArticleSchema.DefaultWatermark.replace('T', ' ')), false)
    else (row.getTimestamp(0), true)
  }

  /** T1 — top-N serving query. Catalyst plans Sort+Limit as
    * TakeOrderedAndProject: a bounded per-partition heap + driver merge, no
    * full sort even at 100 TB (reference: database_utils/database_methods.py:109-130).
    */
  def topN(n: Int = 5): DataFrame =
    read().orderBy(col(ArticleSchema.NewsPublishedTime).desc,
                   col(ArticleSchema.ArticleId))
      .limit(n)
}

object ArticleStore {
  /** Q4 tie-breaking for one batch: one row per key, newest publish time
    * wins (matches the reference's newest-first page order where the first
    * occurrence of a URL is kept — SURVEY.md §4 "Ordering"). News_link is a
    * deterministic second tie-break so same-key same-time rows always pick
    * the same winner across retries/partitionings.
    */
  def dedupeLatest(batch: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ArticleSchema.NewsPublishedTime).desc_nulls_last,
               col(ArticleSchema.NewsLink).asc_nulls_last)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
