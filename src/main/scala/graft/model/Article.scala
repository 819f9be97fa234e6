package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The one logical entity of the reference pipeline: a news article.
  *
  * Mirrors the canonical 7-column schema declared by the reference DDL
  * (reference: database_utils/database_methods.py:144-152) but with real
  * Spark types instead of all-TEXT: publish/processed times are
  * `TimestampType` internally and are only rendered to the reference's two
  * string formats at the serving edge (see [[graft.funcs.Funcs]]).
  *
  * Nullability follows the observed contract (SURVEY.md §1.2): `authorName`
  * is genuinely optional; everything else is required.
  */
final case class Article(
    articleId: String,
    newsLink: String,
    newsTitle: String,
    authorName: Option[String],
    newsPublishedTime: Timestamp,
    sourceName: String,
    processedAt: Timestamp)

object ArticleSchema {
  // Column names are the reference's exact external names so results are
  // drop-in comparable with the golden data/articles.db.
  val ArticleId = "Article_id"
  val NewsLink = "News_link"
  val NewsTitle = "News_title"
  val AuthorName = "Author_name"
  val NewsPublishedTime = "News_published_time"
  val SourceName = "Source_name"
  val ProcessedAt = "Processed_at"

  /** Publish-time render format (reference: helper_utils/helpers.py:53-69). */
  val IsoWithT = "yyyy-MM-dd'T'HH:mm:ss"

  /** Processed-at render format — SQLite CURRENT_TIMESTAMP is
    * space-separated (reference: database_utils/database_methods.py:86,93).
    */
  val IsoWithSpace = "yyyy-MM-dd HH:mm:ss"

  /** PhocusWire listing dates look like "July 28, 2025"
    * (reference: helper_utils/helpers.py:19-20).
    */
  val MonthDayYear = "MMMM d, yyyy"

  /** Cold-start watermark when the sink table is empty
    * (reference: database_utils/database_methods.py:21).
    */
  val DefaultWatermark = "2025-07-25T00:00:00"

  val schema: StructType = StructType(Seq(
    StructField(ArticleId, StringType, nullable = false),
    StructField(NewsLink, StringType, nullable = false),
    StructField(NewsTitle, StringType, nullable = false),
    StructField(AuthorName, StringType, nullable = true),
    StructField(NewsPublishedTime, TimestampType, nullable = false),
    StructField(SourceName, StringType, nullable = false),
    StructField(ProcessedAt, TimestampType, nullable = false),
  ))

  /** External column order, for stable selects at the serving edge. */
  val columns: Seq[String] = schema.fieldNames.toSeq

  /** What a source emits: everything except the sink-side Processed_at
    * (added by the merge, F6 — database_utils/database_methods.py:86,93).
    */
  val sourceSchema: StructType =
    StructType(schema.fields.filterNot(_.name == ProcessedAt))
}
