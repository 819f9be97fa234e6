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
}
