package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus export formats — the shapes a training run or a downstream
  * team actually consumes.
  */
object CorpusExport {

  /** Globally doc_id-sorted parquet: `repartitionByRange` gives each of
    * the `files` output tasks a contiguous, non-overlapping id range
    * (one range Exchange — Spark samples the key distribution to place
    * the cut points, so the files balance even under id skew), and the
    * within-partition sort makes every file internally ordered too: a
    * reader concatenating files in range order sees one totally ordered
    * corpus, and every file's parquet min/max footer covers a disjoint
    * id interval — range predicates touch exactly the files they must.
    * This is THE total-order export shape at 100 TB; a single
    * `orderBy.coalesce(1)` — the naive spelling — serializes the corpus
    * through one task.
    */
  def sortedParquet(df: DataFrame, path: String, files: Int): Unit =
    df.repartitionByRange(files, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(path)

  /** JSONL export — one JSON object per line, the lingua franca of
    * training-data interchange. `to_json(struct(*))` renders each row
    * with Spark's canonical field order and the text codec writes lines;
    * the round trip back through a schema-bearing read is spec-pinned
    * (`jsonlRead` is the inverse). Per-row, zero shuffles.
    */
  def jsonl(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** Read a JSONL export back with an explicit schema (schema inference
    * costs an extra full pass and can widen types — an export reader
    * should know its contract).
    */
  def jsonlRead(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC export/read — the other columnar format large estates demand
    * (Hive-ecosystem consumers). Same writer discipline as parquet:
    * callers compose with `repartitionByRange`/`partitionBy` upstream.
    * ORC carries its own row-group (stripe) min/max statistics, so
    * pushed predicates prune stripes just as parquet prunes row groups.
    */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def orcRead(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-evolution read: parquet exports accrete columns over time
    * (a v2 writer adds `quality`; v1 files simply lack it).
    * `mergeSchema` unions the file footers so old files surface the new
    * column as null — the read-side contract that lets a 100 TB corpus
    * evolve without rewriting history. Spark skips footer merging by
    * default (it costs one footer read per file), so the evolution read
    * is EXPLICIT, not ambient.
    */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
