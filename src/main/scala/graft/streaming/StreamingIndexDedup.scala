package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.queries.DataOps
import graft.sink.SignatureIndex

/** Streaming incremental near-dup dedup against the PERSISTED
  * [[SignatureIndex]] — the durable production form that unifies the two
  * existing halves: [[StreamingDedup]] holds its bucket state in the
  * query's memory (gone on restart, bounded by watermark eviction), while
  * the batch [[DataOps.dedupIncrementalOn]] checks one batch against the
  * on-disk index. This binding runs the batch operator once per
  * micro-batch under `Trigger.AvailableNow` + `foreachBatch`, so:
  *
  *  - state is the INDEX — a restarted query resumes against everything
  *    every previous run indexed, with nothing rebuilt from memory;
  *  - a CLEAN restart is exactly-once via the file source's checkpoint
  *    (a committed landing file is never re-delivered), and a CRASHED
  *    batch replay is idempotent end-to-end: `foreachBatch` is
  *    at-least-once, so the body is built to re-run —
  *    [[SignatureIndex.append]] skips docs whose band rows already sit
  *    in the index, the new-vs-history join excludes the batch's own ids
  *    (no self-pairs, no in-batch pairs re-tagged as history), and pair
  *    output goes to a per-batch directory in overwrite mode. The one
  *    residual window is a crash MIDWAY through the index's parquet
  *    append (a partially-written file set) — the exposure every
  *    append-only parquet sink shares; a transactional table format is
  *    the deployment remedy. StreamingIndexDedupSpec pins the clean
  *    restart, the completed-append replay, and drain(b1) + restart +
  *    drain(b2) equaling the one-shot pair set;
  *  - each micro-batch pays exactly the batch operator's plan: history
  *    never shuffles, the batch's digests broadcast, raw history text is
  *    never read.
  *
  * The reference's incremental contract (watermark read → filter → upsert,
  * database_utils/database_methods.py:40-107) is this same drain-and-stop
  * shape one level down — [[StreamingIngest.runAvailableNow]] is its
  * article-level sibling; this operator is the near-dup level.
  */
object StreamingIndexDedup {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Drain all unprocessed landing files through the index; blocks until
    * done. Verified near-dup pairs (`doc_a`, `doc_b`, `pair_type`,
    * `jaccard`) append to `pairsDir`; the index at `idx` gains each
    * micro-batch's signatures.
    */
  def runAvailableNow(spark: SparkSession, idx: SignatureIndex,
                      landingDir: String, pairsDir: String,
                      checkpointDir: String): Unit = {
    val stream = spark.readStream.schema(DocSchema).parquet(landingDir)
    val query = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty trigger must not append empty index files; the
        // per-batch overwrite directory makes a replayed batch's output
        // REPLACE its previous attempt instead of duplicating it
        if (!batch.isEmpty) {
          DataOps.dedupIncrementalOn(idx, batch)
            .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }
}
