package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.queries.DataOps

/** Priority sampling (Duffield–Lund–Thorup): sample-shape, determinism,
  * estimator, and quantization-honesty invariants at two SFs. Exact
  * cross-engine equality is the driver's `priority_sample` oracle; these
  * specs pin what the oracle can't see — that the integer sort key never
  * reorders the exact rational priorities, and that the threshold
  * estimator's sampled sum actually tracks the corpus total.
  */
class PrioritySampleSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def md5PrefixLong(id: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"prio:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("exactly K rows, ranks 1..K, est >= own weight, deterministic re-run") {
    for (sf <- sfs) {
      val out = DataOps.prioritySample(spark, sf).cache()
      out.count() shouldBe DataOps.PrioK.toLong
      out.select("rn").collect().map(_.getInt(0)).sorted shouldBe
        (1 to DataOps.PrioK).toArray
      out.filter(col("est_milli") < col("n_tokens") * 1000L).count() shouldBe 0L
      val again = DataOps.prioritySample(spark, sf)
      out.exceptAll(again).count() shouldBe 0L
      out.unpersist()
    }
  }

  test("integer sort key preserves the exact rational priority order") {
    for (sf <- sfs) {
      // Priority order is w/u descending ⇔ h1/w ascending. The shipped key
      // ⌊h1·10^6/w⌋ quantizes h1/w; prove the quantization never flipped a
      // pair among the sampled ranks by cross-multiplying exact BigInts.
      val rows = DataOps.prioritySample(spark, sf)
        .select("rn", "doc_id", "n_tokens").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      rows.sliding(2).foreach { case Array((_, idA, wA), (_, idB, wB)) =>
        val (hA, hB) = (BigInt(md5PrefixLong(idA)) + 1, BigInt(md5PrefixLong(idB)) + 1)
        // rank A before rank B requires hA/wA <= hB/wB (ties broken by id)
        val cmp = (hA * BigInt(wB)) compare (hB * BigInt(wA))
        assert(cmp < 0 || (cmp == 0 && idA < idB),
          s"quantized key inverted exact priorities: doc $idA vs $idB")
      case _ => ()
      }
    }
  }

  test("threshold estimator: sampled est sum tracks the true total token count") {
    for (sf <- sfs) {
      val out = DataOps.prioritySample(spark, sf)
      val estTotal = out.agg(sum(col("est_milli"))).head().getLong(0) / 1000.0
      val trueTotal = spark.read
        .parquet(s"$sf/documents.parquet")
        .select(expr("greatest(1L, cast(size(split(text, ' ')) AS BIGINT))").as("w"))
        .agg(sum("w")).head().getLong(0).toDouble
      // K=25 without replacement: loose 2x band — the spec pins "tracks",
      // the unbiasedness argument is Duffield et al. Thm 1.
      assert(estTotal > trueTotal * 0.5 && estTotal < trueTotal * 2.0,
        s"est $estTotal vs true $trueTotal at $sf")
    }
  }

  test("census regime: corpus <= K docs makes tau null and est exact") {
    import spark.implicits._
    val tiny = tmpDir("prio-tiny")
    (1 to 10).map(i => (i.toLong, "a b c " * i, "en", "s", 6L * i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tiny/documents.parquet")
    val out = DataOps.prioritySample(spark, tiny).cache()
    out.count() shouldBe 10L
    // τ is absent ⇒ est = w exactly ⇒ the "estimate" is a census
    out.filter(col("est_milli") =!= col("n_tokens") * 1000L).count() shouldBe 0L
    out.unpersist()
  }
}
