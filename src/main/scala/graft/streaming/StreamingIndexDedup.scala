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
  *  - the file source's checkpoint gives exactly-once micro-batches — a
  *    restart never re-dedups (and never re-appends) an already-processed
  *    landing file, which matters because [[SignatureIndex.append]]
  *    assumes new doc_ids (StreamingIndexDedupSpec pins both: restart
  *    emits no duplicate pairs, and drain(b1) + restart + drain(b2)
  *    equals the one-shot pair set);
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an empty trigger must not append empty index files
        if (!batch.isEmpty) {
          DataOps.dedupIncrementalOn(idx, batch)
            .write.mode("append").parquet(pairsDir)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }
}
