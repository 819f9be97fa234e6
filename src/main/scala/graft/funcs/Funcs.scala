package graft.funcs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.ArticleSchema._

/** The engine's scalar-function library — the Spark re-expression of the
  * reference's `helper_utils/helpers.py` (F1–F6 in SURVEY.md §2.3).
  *
  * Everything here is a thin composition of built-in, codegen'd
  * `org.apache.spark.sql.functions` — no UDFs, so every call site stays
  * inside whole-stage codegen and is pushdown/prune-friendly.
  */
object Funcs {

  /** F1 — deterministic article identity: lowercase-hex MD5 of the raw,
    * UNNORMALIZED link bytes (reference: helper_utils/helpers.py:40-50).
    * Built-in `md5` already yields lowercase hex over UTF-8 bytes.
    */
  def articleId(link: Column): Column = md5(link)

  /** F2 — per-source date parsing, null on failure
    * (reference: helper_utils/helpers.py:4-24). PhocusWire exposes only
    * "July 28, 2025"-style dates (parsed to midnight); everything else is
    * ISO-8601. `try_to_timestamp` matches the reference's None-on-failure.
    */
  def parseDate(raw: Column, sourceName: Column): Column =
    when(sourceName === lit("Phocuswire"),
         try_to_timestamp(trim(raw), lit(MonthDayYear)))
      .otherwise(try_to_timestamp(trim(raw)))

  /** F3 — drop (do NOT convert) a trailing timezone offset from an ISO
    * string, keeping the local wall-clock time
    * (reference: helper_utils/helpers.py:26-38). "2025-08-01T17:19:21+05:00"
    * becomes the naive timestamp 2025-08-01T17:19:21.
    */
  def dropTimezone(isoWithOffset: Column): Column =
    try_to_timestamp(regexp_replace(isoWithOffset, "([+-]\\d{2}:?\\d{2}|Z)$", ""))

  /** F4 — render a timestamp in the reference's T-separated publish-time
    * format (reference: helper_utils/helpers.py:53-69).
    */
  def isoWithT(ts: Column): Column = date_format(ts, IsoWithT)

  /** Processed_at render format: space-separated, SQLite-style
    * (reference: database_utils/database_methods.py:86,93).
    */
  def isoWithSpace(ts: Column): Column = date_format(ts, IsoWithSpace)

  /** F5 — zero the time parts of the watermark
    * (reference: database_utils/database_methods.py:62).
    */
  def truncToDay(ts: Column): Column = date_trunc("DAY", ts)

  /** F6 — sink-side processing-time stamp, truncated to seconds to match
    * the reference's second-granular CURRENT_TIMESTAMP.
    *
    * Replay/backfill seam: a run that sets `spark.graft.processedAt`
    * (session conf, `yyyy-MM-dd HH:mm:ss`) stamps that LOGICAL run time
    * instead of the wall clock. The reference's Processed_at churns on
    * every re-run (its one non-idempotent column); a logical stamp makes
    * a reprocessing run byte-stable — the property that lets
    * GoldenReplaySpec reconstruct the reference sink's full 97-row state
    * cohort-for-cohort, and that a production backfill needs anyway
    * (rows should carry the data's run time, not the repair's).
    */
  def processedNow(): Column = {
    val fixed = org.apache.spark.sql.SparkSession.active.conf
      .get("spark.graft.processedAt", "")
    if (fixed.isEmpty) date_trunc("SECOND", current_timestamp())
    else to_timestamp(lit(fixed))
  }

  /** P5 — author cleanup: strip the "By " prefix PhocusWire renders
    * (reference: PhocusWire/PhocusWireSource.py:160-163).
    *
    * DELIBERATE divergence: the reference's `str.replace("By ", "")`
    * removes EVERY occurrence (PhocusWireSource.py:163), so an author
    * literally named "Stand By Me" would lose its interior "By ". This
    * engine anchors the strip to the prefix (`^By `), which agrees with
    * the reference on every real byline ("By Jane Doe") and preserves
    * interior text — the prefix form is the intended semantics; the
    * replace-all is a Python idiom artifact.
    */
  def cleanAuthor(author: Column): Column =
    regexp_replace(author, "^By ", "")

  /** P6 — PhocusWire byline is "By X | July 28, 2025": the date is element
    * 2 of a '|' split, trimmed
    * (reference: PhocusWire/PhocusWireSource.py:166-173).
    */
  def bylineDate(byline: Column): Column =
    trim(element_at(split(byline, "\\|"), 2))
}
