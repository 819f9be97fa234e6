package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV ingestion with an explicit contract for malformed rows — the
  * format where bad data is a WHEN, not an if, at crawl scale.
  *
  * Three read modes, all schema-explicit (inference costs a full extra
  * pass and silently widens types on dirty data):
  *
  *  - [[read]] (PERMISSIVE): every malformed line survives, parsed
  *    columns null and the RAW line captured in `_corrupt_record` — the
  *    quarantine column a pipeline routes to a dead-letter sink instead
  *    of dropping on the floor. This is the production default: at
  *    100 TB you cannot fail a 6-hour job for one truncated line, and
  *    you cannot silently drop it either.
  *  - [[readDropMalformed]]: bad lines vanish — for ad-hoc exploration
  *    only (the loss is invisible, which is why it is a separate,
  *    deliberately-named entry point).
  *  - [[readStrict]] (FAILFAST): the first malformed line kills the
  *    read — for contracts where upstream GUARANTEES cleanliness and a
  *    violation must be loud.
  *
  * All three are plain per-row parses — no shuffle, fully parallel by
  * input split.
  */
object CsvSource {

  /** Quarantine column name. Spark refuses a query that reads ONLY this
    * column from raw files (internally the pruned parse would mark
    * nothing corrupt — the same physics as the DROPMALFORMED pruning
    * trap below), so route dead letters by filtering it AFTER a cache
    * or alongside at least one data column.
    */
  val CorruptColumn = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptColumn)) schema
    else StructType(schema.fields :+ StructField(CorruptColumn, StringType))

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .option("header", "true")
      .csv(path)

  /** CAUTION — the column-pruning trap (spec-demonstrated): malformed
    * rows are only dropped when the failing columns are actually PARSED.
    * `df.count()` references no columns, so the pruned parse converts
    * nothing, fails on nothing, and counts every raw line; the same
    * frame materialized with its full schema drops the bad rows. Any
    * row-count reconciliation over a DROPMALFORMED read must select the
    * schema explicitly.
    */
  def readDropMalformed(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .option("header", "true")
      .csv(path)

  def readStrict(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .option("header", "true")
      .csv(path)
}
