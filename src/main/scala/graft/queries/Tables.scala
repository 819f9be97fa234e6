package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver's test dirs (TESTDATA.md). */
object Tables {

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark 4 cannot map
    * to TimestampType natively (SPARK-40819): read as raw nanos (long) and
    * convert. Integer `div` — not double division — because ~1.7e18 ns
    * exceeds 2^53 and a double round-trip would corrupt microseconds.
    */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Session builders (Bench, Verify, SparkSpec) set this at build time; a
    // library must not flip session-wide flags per call, so this fallback
    // fires at most once, only for externally-built sessions (the driver's).
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanosColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }
  }

  /** Events scan with an incremental cutoff applied to the RAW nanos
    * column BEFORE the timestamp conversion. The converted predicate
    * `timestamp_micros(ts div 1000) >= T` cannot reach parquet (only
    * IsNotNull pushes — the scan reads every row group); the conversion
    * is monotone and T is µs-exact, so `ts_ns >= T·10⁶` is exactly
    * equivalent — a plain long comparison parquet evaluates against
    * row-group statistics, skipping whole row groups of old data. This is
    * the scan-level analog of the source's pagination early-stop (O1):
    * at 100 TB an incremental run touches only the new tail of the
    * table, not all of history.
    */
  def eventsSince(spark: SparkSession, dir: String,
                  cutoff: java.sql.Timestamp): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType) {
      // Full-precision cutoff: getTime truncates the Timestamp's nanos to
      // milliseconds, so reconstruct seconds*1e9 + nanos-of-second — a
      // sub-millisecond cutoff must agree with the timestamp-typed branch.
      // Floor to µs alignment: the typed branch compares against a Spark
      // timestamp literal (µs precision), so a 500 ns tail in the cutoff
      // must not exclude rows in that first partial microsecond.
      val cutoffNs = Math.multiplyExact(Math.floorDiv(Math.addExact(
        Math.multiplyExact(Math.floorDiv(cutoff.getTime, 1000L), 1000000000L),
        cutoff.getNanos.toLong), 1000L), 1000L)
      raw.filter(col("ts") >= cutoffNs)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else
      raw.filter(col("ts") >= lit(cutoff))
  }
}
