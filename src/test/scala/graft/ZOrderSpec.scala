package graft

import org.apache.spark.sql.functions._

import graft.sink.ZOrderCorpus

/** Pins the property Z-ordering is FOR: after one layout pass, a
  * predicate on EITHER dimension concentrates its matching rows in a
  * small fraction of the files (tight per-file min/max envelopes on both
  * columns), where a single-dimension sort serves one dimension and
  * scatters the other across every file. Result-bearing file count is
  * the proxy: files without matching rows are exactly the ones parquet
  * footer min/max stats let the scan skip.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private val Side = 64 // 64 x 64 grid, bits = 6
  private val NFiles = 16

  private def grid = (0 until Side * Side)
    .map(i => (i.toLong, (i / Side).toLong, (i % Side).toLong))
    .toDF("id", "a", "b")

  test("zValue interleaves bits and nulls out-of-domain inputs") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (63L, 63L), (64L, 0L), (-1L, 3L))
      .toDF("a", "b")
      .select(ZOrderCorpus.zValue(col("a"), col("b"), 6).as("z"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // (1,0) -> bit of a at position 1 = 2; (0,1) -> bit of b at position 0 = 1
    out.toSeq shouldBe Seq(Some(0L), Some(2L), Some(1L), Some(15L), Some(4095L), None, None)
  }

  test("either-dimension predicate touches a small file fraction; single-sort serves only one") {
    val zPath = tmpDir("zorder") + "/grid"
    ZOrderCorpus.write(grid, "a", "b", 6, zPath, NFiles)

    val bPath = tmpDir("zorder-b") + "/grid"
    // the contrast layout: range-sorted by b alone (the PartitionedCorpus
    // in-file sort, no second dimension)
    grid.repartitionByRange(NFiles, col("b"), col("a"))
      .sortWithinPartitions(col("b"), col("a"))
      .write.parquet(bPath)

    def filesMatching(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    val zFilesA = filesMatching(zPath, col("a") === 17L)
    val zFilesB = filesMatching(zPath, col("b") === 5L)
    val bFilesA = filesMatching(bPath, col("a") === 17L)
    val bFilesB = filesMatching(bPath, col("b") === 5L)

    // one z-file covers a ~16x16 rectangle of the 64x64 grid, so a row or
    // column of the grid crosses ~sqrt(NFiles) files
    zFilesA should be <= 8L
    zFilesB should be <= 8L
    // the dedicated sort is better on its own dimension...
    bFilesB should be <= 2L
    // ...and degenerate on the other: every file holds every `a`
    bFilesA shouldBe NFiles.toLong
    zFilesA should be < bFilesA
  }

  test("per-file envelopes are small rectangles, and the layout loses no rows") {
    val path = tmpDir("zorder-env") + "/grid"
    ZOrderCorpus.write(grid, "a", "b", 6, path, NFiles)
    val back = ZOrderCorpus.read(spark, path)
    back.count() shouldBe (Side * Side).toLong
    back.select("id").exceptAll(grid.select("id")).count() shouldBe 0L

    val areas = back.groupBy(input_file_name())
      .agg(((max("a") - min("a") + 1) * (max("b") - min("b") + 1)).as("area"))
      .select("area").collect().map(_.getLong(0))
    val ideal = (Side.toLong * Side) / NFiles
    // every envelope within 4x of the perfect-rectangle area (the curve's
    // boundary files are ragged, never the whole domain)
    areas.max should be <= ideal * 4
  }
}
