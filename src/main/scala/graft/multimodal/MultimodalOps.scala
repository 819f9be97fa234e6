package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Multimodal columns for a training-data pipeline: media payloads ride
  * as opaque BINARY columns with typed metadata alongside; decode /
  * feature-extract / frame-sample run per-partition against the bytes.
  *
  * The decode step is a STUB — this container ships no image/audio
  * codecs, so [[DecodeStub.decode]] derives deterministic fake features
  * (a 16-bin byte histogram) from the payload bytes. Everything around it
  * is the real plumbing a production binding drops into: the BINARY
  * schema, the iterator-per-partition batch shape (no per-row JNI/codec
  * setup — one decoder instance per partition), and the typed Dataset
  * boundary. Swap `decode` for a codec call and nothing else changes.
  *
  * Scale shape: payload bytes never shuffle for metadata-only queries
  * (pruned at the scan); feature extraction is embarrassingly parallel
  * per partition; frame offsets are computed arithmetically, not by
  * materializing frames.
  */
object MultimodalOps {

  /** A media row: payload + typed metadata (the test corpus has no binary
    * table, so payloads are synthesized from `documents.text` bytes — the
    * BINARY column and everything downstream of it is real).
    */
  final case class MediaRow(doc_id: Long, format: String, payload: Array[Byte])

  /** Extracted features: byte histogram as the stand-in embedding. */
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                 hist: Array[Long])

  /** The media table: documents.text as bytes + a deterministic modality
    * tag. BINARY column + metadata, the multimodal storage shape.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      col("text").cast("binary").as("payload"))

  object DecodeStub {
    /** STUB decode: one "decoder" per partition, deterministic 16-bin
      * byte histogram per payload. A real binding opens the codec here
      * once per partition and emits frames/spectrograms instead.
      */
    def decode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
      // per-partition decoder setup would go here (expensive, once)
      rows.map { r =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xFF) >> 4) += 1
          i += 1
        }
        MediaFeatures(r.doc_id, r.format, r.payload.length.toLong, hist)
      }
    }
  }

  /** Feature extraction over the BINARY column: typed mapPartitions with
    * the per-partition decoder (the sanctioned imperative boundary —
    * everything before and after stays relational).
    */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions(DecodeStub.decode _)
  }

  /** Metadata + frame-sampling query over the BINARY column, fully
    * relational (no decode needed): byte length, 256-byte chunk count,
    * sampled frame offsets, content hash. Oracle-checked — the payload
    * IS bytes, so DuckDB computes the same answers over the BLOB cast.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("format"),
      length(col("payload")).as("n_bytes"),
      expr("(length(payload) + 255) div 256").as("n_chunks"),
      size(expr("sequence(1, length(payload), 256)")).as("n_frames"),
      md5(col("payload")).as("content_hash"))

  /** Frame sampling, fully relational: explode the arithmetic frame
    * offsets and slice the payload bytes per frame — 256-byte "frames"
    * stand in for decoded media frames; each carries its index, byte
    * range, and content hash. Payload bytes are touched only where a
    * frame is materialized; the offsets themselves cost no I/O.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("format"), col("payload"),
        explode(expr("sequence(1, length(payload), 256)")).as("frame_off"))
      .select(col("doc_id"), col("format"),
        ((col("frame_off") - 1) / 256).cast("int").as("frame_idx"),
        length(expr("substring(payload, frame_off, 256)")).as("frame_bytes"),
        md5(expr("substring(payload, frame_off, 256)")).as("frame_hash"))

  val oracles: Map[String, String] = Map(
    // DuckDB 1.0 lacks substring over BLOB; the payload bytes ARE the
    // ascii text bytes, so the oracle slices the VARCHAR — byte-identical.
    "frame_sample" -> """
      WITH media AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS format,
               text AS payload
        FROM documents),
      fr AS (SELECT doc_id, format, payload,
               unnest(range(1, length(payload) + 1, 256)) AS frame_off
             FROM media)
      SELECT doc_id, format,
             ((frame_off - 1) // 256)::INT AS frame_idx,
             length(substring(payload, frame_off::INT, 256)) AS frame_bytes,
             md5(substring(payload, frame_off::INT, 256)) AS frame_hash
      FROM fr""",
    "multimodal_meta" -> """
      WITH media AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS format,
               text::BLOB AS payload
        FROM documents)
      SELECT doc_id, format,
             octet_length(payload) AS n_bytes,
             (octet_length(payload) + 255) // 256 AS n_chunks,
             len(range(1, octet_length(payload) + 1, 256)) AS n_frames,
             md5(payload::VARCHAR) AS content_hash
      FROM media""",
  )
}
