package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ArticleSchema
import graft.sink.ArticleStore
import graft.source.PaginatedSource

/** The ingestion "query plan" — the Spark re-expression of the reference's
  * notebook driver (`ingestion.ipynb`, SURVEY.md §3.1):
  *
  *   watermark scan → per-source paginated scan + extraction → union →
  *   watermark filter → in-run dedup → keyed merge → top-N serving query.
  *
  * Sources are [[graft.source.PaginatedSource]]s (scrape mode, with the
  * watermark early-stop pushed into the scan) or already-extracted
  * article DataFrames; the union's branches are naturally parallel in
  * Spark where the reference ran them sequentially.
  */
object Pipeline {

  /** U1 — bag union of per-source batches, by name (schemas match by
    * construction; Skift first, as in the reference).
    */
  def unionSources(sources: Seq[DataFrame]): DataFrame =
    sources.reduceLeft(_ unionByName _)

  /** Q3 — watermark cutoff: strict `<` drops, equal-date rows pass and are
    * re-upserted (the reference's deliberate one-day overlap, SURVEY.md §1.4).
    */
  def watermarkFilter(df: DataFrame, watermark: Timestamp): DataFrame =
    df.filter(col(ArticleSchema.NewsPublishedTime) >= lit(watermark))

  /** One full incremental run; returns the top-N serving result
    * (reference: ingestion.ipynb cell 498c25c4).
    */
  def runIncremental(spark: SparkSession, store: ArticleStore,
                     sources: Seq[DataFrame], topN: Int = 5): DataFrame = {
    store.create()
    val (wm, _) = store.watermark()
    val batch = watermarkFilter(unionSources(sources), wm)
    store.merge(batch)
    store.topN(topN)
  }

  /** Scrape-mode incremental run: the watermark read from the sink is
    * pushed into each paginated scan (pages past the cutoff are never
    * fetched — O1), then the standard filter/merge/serve tail runs.
    */
  def runScrape(spark: SparkSession, store: ArticleStore,
                sources: Seq[PaginatedSource], topN: Int = 5): DataFrame = {
    store.create()
    val (wm, _) = store.watermark()
    val batch = watermarkFilter(unionSources(sources.map(_.load(wm))), wm)
    store.merge(batch)
    store.topN(topN)
  }
}
