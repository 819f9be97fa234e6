package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.DataOps
import graft.sink.SignatureIndex

/** Dev tool (test scope): dump the PRE-checkpoint physical plans that
  * PLANS.md documents — some operators eagerly materialize their result
  * (localCheckpoint), so their interesting plans are visible only from
  * inside the package. Run: `sbt "Test/runMain graft.PlanDump"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("plan-sigidx-").toString
    val idx = new SignatureIndex(spark, tmp)
    idx.append(DataOps.shingledOn(d.filter(col("doc_id") % 2 =!= 0)))
    val batchSh = DataOps.shingledOn(d.filter(col("doc_id") % 2 === 0))
    val batchBands = DataOps.bandDigests(batchSh)
      .withColumn("pb", SignatureIndex.pb(col("h")))
    // the OPERATOR's own candidate builder — the dumped plan IS the plan
    val nh = DataOps.newHistCandidates(idx, batchBands, DataOps.BandBucketCap)
    println("=== dedup_incremental: new-vs-history band join ===")
    nh.explain("formatted")
    spark.stop()
  }
}
