package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.query.CorpusPipeline
import graft.sink.SignatureIndex

/** The STREAMING form of the daily curation run (r10 verdict #6) —
  * [[CorpusPipeline.runDaily]] and [[StreamingIndexDedup]]'s
  * exactly-once wiring unified: one `Trigger.AvailableNow` +
  * `foreachBatch` binding that runs normalize → gates → incremental
  * near-dup dedup → index-learns-kept for every micro-batch of landed
  * documents, with the persisted [[SignatureIndex]] as the SOLE
  * cross-run state.
  *
  * Semantics: each micro-batch IS one `runDaily` day. A drain over
  * files b1, restart, drain over b2 produces byte-identical kept/pairs/
  * report output to two direct `runDaily` calls on a fresh index —
  * the streaming layer adds delivery bookkeeping (which files are
  * processed) and nothing else; StreamingCorpusPipelineSpec pins the
  * equivalence including the attrition reports.
  *
  * Failure contract (the [[StreamingIndexDedup]] analysis, inherited
  * wholesale): clean restarts are exactly-once via the file source's
  * checkpoint; a crashed batch's replay is idempotent because every
  * output lands in a per-batch-id directory in overwrite mode and
  * [[SignatureIndex.append]] skips already-indexed docs. The residual
  * window is a crash midway through the index's own parquet append —
  * the exposure every append-only parquet sink shares.
  *
  * Scale shape: identical to the batch pipeline's (history never
  * rescanned or shuffled, batch digests broadcast, per-component
  * keeper selection on the batch only) — the streaming binding adds
  * zero new shuffles.
  */
object StreamingCorpusPipeline {

  /** Drain all unprocessed landing files (parquet, `doc_id`/`text` —
    * [[StreamingIndexDedup.DocSchema]]) through the full daily flow;
    * blocks until drained. Per micro-batch N, writes
    * `outDir/kept/batch_id=N`, `outDir/pairs/batch_id=N`, and
    * `outDir/report/batch_id=N`; the index at `idx` learns each
    * batch's kept signatures.
    */
  def runAvailableNow(spark: SparkSession, idx: SignatureIndex,
                      landingDir: String, outDir: String,
                      checkpointDir: String): Unit = {
    val stream = spark.readStream
      .schema(StreamingIndexDedup.DocSchema).parquet(landingDir)
    val query = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty trigger must not run a day (or append index files);
        // per-batch overwrite directories make a replayed batch REPLACE
        // its previous attempt instead of duplicating it
        if (!batch.isEmpty) {
          val run = CorpusPipeline.runDaily(idx, batch)
          run.kept.write.mode("overwrite")
            .parquet(s"$outDir/kept/batch_id=$batchId")
          run.pairs.write.mode("overwrite")
            .parquet(s"$outDir/pairs/batch_id=$batchId")
          run.report.write.mode("overwrite")
            .parquet(s"$outDir/report/batch_id=$batchId")
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** The drained output of [[runAvailableNow]] as frames (partition
    * column `batch_id` carries the micro-batch provenance).
    */
  def results(spark: SparkSession, outDir: String):
      (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$outDir/kept"),
     spark.read.parquet(s"$outDir/pairs"),
     spark.read.parquet(s"$outDir/report").orderBy(col("batch_id")))
}
