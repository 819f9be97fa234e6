package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.model.ArticleSchema
import graft.query.Pipeline
import graft.sink.ArticleStore

/** W4 — the trigger model (SURVEY.md §2.9): the reference's "streaming" is
  * a manual notebook re-run, one incremental batch per invocation; the
  * Structured Streaming analog is `Trigger.AvailableNow` — process
  * everything available as micro-batches, then stop.
  *
  * Shape: `readStream` over a landing directory of extracted article
  * files (what a [[graft.source.PaginatedSource]] or any crawler drops) →
  * the strict-< watermark filter (Q3, read ONCE from the sink at job
  * start, like the reference reads SQLite MAX before scraping) →
  * `foreachBatch { store.merge }`. Exactly-once-ish (W3) holds without
  * streaming state: identity is the deterministic md5 key and the merge
  * is an idempotent keyed upsert, so replayed micro-batches converge;
  * the checkpoint prevents re-reading consumed files across invocations.
  * No `withWatermark` is needed — there is no stateful operator to evict;
  * the reference's lateness allowance IS the one-day overlap of the
  * cutoff (W2).
  */
object StreamingIngest {

  /** Stateful streaming analytics over an article stream: hourly publish
    * counts per source with a real event-time watermark — late rows
    * beyond `lateness` are dropped and window state older than it is
    * evicted, the Structured Streaming surface the ingest path itself
    * does not need (its lateness allowance is the overlap day, W2).
    * Append output mode: a window emits once, when the watermark passes
    * its end.
    */
  def windowedCounts(articles: DataFrame, lateness: String = "1 day"): DataFrame =
    articles
      .withWatermark(ArticleSchema.NewsPublishedTime, lateness)
      .groupBy(
        org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col(ArticleSchema.NewsPublishedTime), "1 hour"),
        org.apache.spark.sql.functions.col(ArticleSchema.SourceName))
      .count()

  /** Hopping (sliding) windowed counts — the streaming binding of the
    * batch `window_hopping` aggregation (N67): each article lands in
    * size/slide windows, state per open window cell is evicted once the
    * watermark passes the window end + lateness, and a window emits
    * exactly once (append mode) when the watermark passes its end. Same
    * map-side cell expansion as the batch form — the shuffle carries
    * window cells, not articles.
    */
  def hoppingCounts(articles: DataFrame, size: String = "1 hour",
                    slide: String = "30 minutes",
                    lateness: String = "1 day"): DataFrame =
    articles
      .withWatermark(ArticleSchema.NewsPublishedTime, lateness)
      .groupBy(
        org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col(ArticleSchema.NewsPublishedTime),
          size, slide),
        org.apache.spark.sql.functions.col(ArticleSchema.SourceName))
      .count()

  /** Streaming keyed dedup with bounded state — the streaming form of Q4
    * (in-run dedup). `dropDuplicatesWithinWatermark` keeps the FIRST row
    * seen per `Article_id` (the reference's first-wins rule: pages arrive
    * newest-first, so first-seen IS newest —
    * PhocusWire/PhocusWireSource.py:156-158) while the event-time
    * watermark evicts each key's state once it ages past `lateness`, so
    * state never grows unboundedly on an endless stream. The ingest path
    * itself doesn't need this operator — merge idempotence (W3) already
    * absorbs replays — but it's the standard Spark form of Q4 at
    * streaming scale.
    */
  def dedupedStream(articles: DataFrame, lateness: String = "1 day"): DataFrame =
    articles
      .withWatermark(ArticleSchema.NewsPublishedTime, lateness)
      .dropDuplicatesWithinWatermark(ArticleSchema.ArticleId)

  /** Run one AvailableNow ingest over the landing dir; blocks until the
    * stream drains, then returns the top-N serving result.
    */
  def runAvailableNow(spark: SparkSession, store: ArticleStore,
                      landingDir: String, checkpointDir: String,
                      topN: Int = 5): DataFrame = {
    store.create()
    val (wm, _) = store.watermark()
    val stream = spark.readStream
      .schema(ArticleSchema.sourceSchema)
      .parquet(landingDir)
    val query = Pipeline.watermarkFilter(stream, wm)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => store.merge(batch) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
    query.awaitTermination()
    store.topN(topN)
  }
}
