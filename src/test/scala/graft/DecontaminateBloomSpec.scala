package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DataOps

/** [[DataOps.decontaminateBloom]] contract vs the graded exact form
  * (spec-bounded binding — the Bloom filter is probabilistic state no SQL
  * oracle replays):
  *
  *  - ZERO false negatives at two SFs: every doc the exact semi-join
  *    flags is flagged by the Bloom binding (a Bloom filter never misses
  *    an inserted element — and this assertion also proves the probe
  *    rendition matches the build rendition bit-for-bit);
  *  - over-flagging is ~zero: the dual salted-filter probe squares the
  *    32-bit double-hash aliasing floor of Spark's sketch (measured
  *    fpp-independent on a single filter; see the operator scaladoc) —
  *    the spec allows at most one stray doc;
  *  - deterministic across runs (fixed hash seeds, no RNG);
  *  - the native early-exit kernel agrees with a per-element built-ins
  *    probe (the repo's native-vs-mirror discipline).
  */
class DecontaminateBloomSpec extends SparkSpec {

  private def flagged(df: DataFrame): Set[Long] =
    df.filter(col("contaminated")).select("doc_id").collect()
      .map(_.getLong(0)).toSet

  private def all(df: DataFrame): Set[(Long, String, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"zero false negatives, bounded over-flagging ($dir)") {
      val exactDf = DataOps.decontaminate(spark, dir)
      val bloomDf = DataOps.decontaminateBloom(spark, dir)
      // identical doc universe (every non-eval doc appears exactly once)
      exactDf.select("doc_id", "lang").collect().toSet shouldBe
        bloomDf.select("doc_id", "lang").collect().toSet
      val exact = flagged(exactDf)
      val bloom = flagged(bloomDf)
      assert(exact.subsetOf(bloom),
        s"false negatives (impossible for a Bloom filter): ${exact.diff(bloom).take(5)}")
      val extras = bloom.diff(exact).size
      val nDocs = exactDf.count()
      withClue(s"$extras Bloom over-flags on $nDocs docs: ") {
        extras should be <= 1
      }
    }
  }

  test("deterministic: two runs agree exactly") {
    val dir = "/root/testdata/sf0.001"
    all(DataOps.decontaminateBloom(spark, dir)) shouldBe
      all(DataOps.decontaminateBloom(spark, dir))
  }

  test("native kernel agrees with a per-element built-ins probe") {
    import spark.implicits._
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 1e-9)
    Seq("alpha", "gamma").foreach(s => bf.putBinary(s.getBytes("UTF-8")))
    val df = Seq(
      Seq("alpha", "zeta"),     // hit on first element
      Seq("zeta", "gamma"),     // hit via early-exit continuation
      Seq("zeta", "eta"),       // clean
      Seq.empty[String]         // empty array -> false
    ).toDF("sh")
    val got = df.select(graft.funcs.BloomAnyContains(col("sh"), bf).as("c"))
      .collect().map(_.getBoolean(0)).toSeq
    got shouldBe Seq(true, true, false, false)
    // null array -> null, matching UnaryExpression null semantics
    val withNull = Seq(Option(Seq("alpha")), Option.empty[Seq[String]]).toDF("sh")
    val out = withNull.select(graft.funcs.BloomAnyContains(col("sh"), bf)).collect()
    out(0).getBoolean(0) shouldBe true
    assert(out(1).isNullAt(0))
  }

  test("null array ELEMENTS are skipped, eval and codegen alike (r8 ADVICE)") {
    import spark.implicits._
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 1e-9)
    bf.putBinary("alpha".getBytes("UTF-8"))
    // containsNull arrays are legal input: a null element can never be a
    // member (the filter holds bytes), so it must be skipped — the
    // unguarded probe NPE'd the task
    val df = Seq(
      Seq[Option[String]](None, Some("alpha")), // null then hit
      Seq[Option[String]](None),                // only null -> false
      Seq[Option[String]](Some("zeta"), None)   // miss then null -> false
    ).toDF("sh")
    val got = df.select(graft.funcs.BloomAnyContains(col("sh"), bf).as("c"))
      .collect().map(_.getBoolean(0)).toSeq
    got shouldBe Seq(true, false, false)
  }

  test("confirm filter: an element counts only when BOTH filters agree") {
    import spark.implicits._
    val bf1 = org.apache.spark.util.sketch.BloomFilter.create(100, 1e-9)
    val bf2 = org.apache.spark.util.sketch.BloomFilter.create(100, 1e-9)
    // "alpha" in both (under salt in bf2); "beta" only in bf1 — a stand-in
    // for an aliasing false positive the confirm probe must veto
    bf1.putBinary("alpha".getBytes("UTF-8"))
    bf1.putBinary("beta".getBytes("UTF-8"))
    bf2.putBinary("s:alpha".getBytes("UTF-8"))
    val df = Seq(Seq("alpha"), Seq("beta"), Seq("beta", "alpha")).toDF("sh")
    val got = df.select(
      graft.funcs.BloomAnyContains(col("sh"), bf1, bf2, "s:").as("c"))
      .collect().map(_.getBoolean(0)).toSeq
    got shouldBe Seq(true, false, true)
  }
}
