package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: multi-dimensional data skipping for
  * the predicate mix a single sort order can't serve.
  *
  * [[PartitionedCorpus]] prunes on ONE directory column and sorts files
  * on ONE range column; a workload that filters sometimes by user and
  * sometimes by day then pays a full scan for whichever dimension lost
  * the sort. Interleaving the bits of both keys into one Morton code and
  * range-partitioning + sorting on THAT gives every file a tight min/max
  * envelope on BOTH original columns at once (a contiguous z-range is a
  * small rectangle in (a, b) space), so parquet footer stats skip
  * non-matching files/row groups for either predicate. This is the
  * standard lakehouse layout trick for exactly this workload shape, at
  * the cost of each single-dimension scan touching ~√files instead of
  * the 1..k a dedicated sort would give — the right trade when no single
  * dimension owns the workload.
  *
  * The z-value is a pure bit-shift fold over the built-in operators —
  * codegen-friendly, no UDF — and the writer's shape is the
  * [[PartitionedCorpus]] discipline: `repartitionByRange` on the z-value
  * bounds file count by the requested file count (deterministic since
  * ties are broken by the full z-value + both keys), and
  * `sortWithinPartitions` keeps row groups tight inside each file.
  *
  * Both dimensions must be NON-NEGATIVE ints below 2^bits (the caller
  * bucketizes first — e.g. day number, host hash bucket, length decile);
  * values at or above the bit budget would alias, so `zValue` range-checks
  * and nulls out-of-domain inputs for the caller to handle explicitly.
  */
object ZOrderCorpus {

  /** Morton code of two bucketized dimensions: bit i of `a` lands at
    * 2i+1, bit i of `b` at 2i. Null when either input falls outside
    * [0, 2^bits) — silent aliasing would scatter a hot key across the
    * curve and quietly destroy the envelope property.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val interleaved = (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
    when(a >= 0 && a < (1L << bits) && b >= 0 && b < (1L << bits), interleaved)
  }

  /** Write `df` z-ordered on (`dimA`, `dimB`) into ~`nFiles` files. */
  def write(df: DataFrame, dimA: String, dimB: String, bits: Int,
            path: String, nFiles: Int): Unit = {
    val z = df.withColumn("__z", zValue(col(dimA), col(dimB), bits))
    z.repartitionByRange(nFiles, col("__z"), col(dimA), col(dimB))
      .sortWithinPartitions(col("__z"), col(dimA), col(dimB))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
