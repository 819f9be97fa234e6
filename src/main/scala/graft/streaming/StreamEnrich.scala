package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Stream-static enrichment against a SLOWLY CHANGING dimension — the
  * scorer/allowlist/routing-table join every continuous ingest runs
  * (the reference's analog: each scraped article consults the serving
  * table's watermark, `database_utils/database_methods.py:47-56`).
  *
  * The trap this module exists to document: `streamDf.join(
  * spark.read.parquet(dimPath))` re-EXECUTES the static side's plan per
  * micro-batch, but the file LISTING was resolved once at query start —
  * an overwritten dimension either errors (old part-files gone) or
  * silently serves the stale snapshot forever. The production pattern
  * is `foreachBatch`: re-resolve the dimension INSIDE the batch
  * function, so every micro-batch enriches against the newest published
  * snapshot, and broadcast it — the stream side never shuffles for the
  * join (dimensions are small by definition; a dimension too big to
  * broadcast belongs in a bucketed catalog table, see BucketedCorpus).
  *
  * Snapshot atomicity rides on the dimension WRITER, not this reader:
  * publish via atomic rename/generation pointer (the SignatureIndex
  * compaction pattern) and each batch sees exactly one consistent
  * version.
  */
object StreamEnrich {

  /** One micro-batch's enrichment, written idempotently: the output is
    * partitioned by `_batch_id` and each batch dynamically OVERWRITES
    * only its own partition. `foreachBatch` + plain parquet `append` is
    * at-least-once — a failure between the batch's write and the
    * checkpoint commit replays the batch on restart and duplicates its
    * rows; keying the physical layout on the (checkpoint-stable) batch
    * id makes the replay rewrite the same partition instead, restoring
    * exactly-once output without a transactional sink.
    */
  def enrichBatch(batch: DataFrame, batchId: Long, dimPath: String,
                  outPath: String): Unit = {
    val dim = broadcast(batch.sparkSession.read.parquet(dimPath))
    batch.join(dim, Seq("key"), "left")
      .withColumn("_batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(s"$outPath/data")
  }

  /** Enrich `stream` (must carry `key`) with the dimension parquet at
    * `dimPath` (columns `key`, ...), re-read at every micro-batch; each
    * enriched batch lands under `outPath/data/_batch_id=N` via
    * [[enrichBatch]] (idempotent on replay). Left join: a key missing
    * from the dimension must not DROP the event (the dimension lags the
    * stream by publication cadence) — it flows through with null
    * enrichment for a later backfill.
    */
  def enrichToParquet(spark: SparkSession, stream: DataFrame, dimPath: String,
                      outPath: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        enrichBatch(batch, batchId, dimPath, outPath)
      }
}
