package graft

import graft.queries.DataOps

/** [[DataOps.lshRecallSampled]] contract, at two SFs (the spec-bounded
  * binding pattern): every sampled row is a full-monitor row with the SAME
  * found_by_lsh flag (the exact side over the sample can't invent or
  * re-flag pairs), the sample yields a usable nonempty estimate, and the
  * estimate tracks the full recall.
  */
class SampledRecallSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet

  private def recall(s: Set[(Long, Long, Double, Boolean)]): Double =
    s.count(_._4).toDouble / s.size

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"sampled recall rows are a flag-exact subset of the full monitor ($dir)") {
      val full = rows(DataOps.lshRecall(spark, dir))
      val sampled = rows(DataOps.lshRecallSampled(spark, dir, denom = 2))
      assert(sampled.nonEmpty, "sample produced no true pairs to estimate from")
      assert(sampled.subsetOf(full))
      // the estimate the monitor exists for: close to the full-corpus value
      math.abs(recall(sampled) - recall(full)) should be <= 0.25
    }
  }
}
