package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.queries.{Relational, Skew, Tables}

/** Salted skew join: exact equivalence with the plain join, the salted
  * plan shape (join keys include the salt; dim side replicated), and the
  * scatter property (the hot key's rows spread across all salt values).
  */
class SkewSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def demoFrames() = {
    val e = Tables(spark, sf, "events").select(
      when(pmod(col("user_id"), lit(10)) < 5, 0L).otherwise(col("user_id")).as("k"),
      col("event_id"))
    val dim = e.select(col("k")).distinct()
      .withColumn("cohort", pmod(col("k"), lit(7)))
    (e, dim)
  }

  test("saltedJoin equals the plain join row-for-row") {
    val (e, dim) = demoFrames()
    val salted = Skew.saltedJoin(e, dim, "k", hash(col("event_id")), 16)
      .select("k", "event_id", "cohort")
    val plain = e.join(dim, "k").select("k", "event_id", "cohort")
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }

  test("the physical join keys on (k, salt) and the dim side carries 16 replicas") {
    val (e, dim) = demoFrames()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = Skew.saltedJoin(e, dim, "k", hash(col("event_id")), 16)
      out.count() // materialize so AQE finalizes the plan
      // AQE hides the final plan behind wrapper nodes — unwrap explicitly
      def joins(p: SparkPlan): Seq[Seq[String]] = p.collect {
        case a: AdaptiveSparkPlanExec => joins(a.executedPlan)
        case q: QueryStageExec => joins(q.plan)
        case j: SortMergeJoinExec => Seq(j.leftKeys.map(_.sql))
        case j: ShuffledHashJoinExec => Seq(j.leftKeys.map(_.sql))
      }.flatten
      val js = joins(out.queryExecution.executedPlan)
      js should not be empty
      val keys = js.head.mkString(" ")
      keys should include("k")
      keys should include("__salt")
      out.count() shouldBe e.join(dim, "k").count()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("the hot key scatters across every salt value") {
    val (e, _) = demoFrames()
    val scattered = e.filter(col("k") === 0L)
      .select(pmod(hash(col("event_id")), lit(16)).as("salt"))
      .groupBy("salt").count().collect()
    scattered.length shouldBe 16
    val counts = scattered.map(_.getLong(1))
    // uniform hash: no salt cell should hold more than 3× the mean
    counts.max should be <= counts.sum / 16 * 3
  }

  test("salted_join graded output matches the plain-join aggregate") {
    val out = Relational.saltedJoinHot(spark, sf)
    val (e, dim) = demoFrames()
    val plain = e.join(dim, "k").groupBy("cohort")
      .agg(count(lit(1)).as("n_events"), countDistinct(col("k")).as("n_keys"))
    out.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(out).count() shouldBe 0L
  }

  test("AQE splits the skewed partition without salting (skew=true in the SMJ)") {
    // The runtime complement of Skew.saltedJoin: when AQE's skew-join
    // optimization is live, the hot partition is split from shuffle
    // statistics at execution time — no code change, no salt column.
    // The thresholds are lowered so the test corpus's hot key (half of
    // all events mapped to k=0 by demoFrames) qualifies the same way a
    // multi-GB partition would in production; the salted form remains
    // the LIBRARY answer precisely for engines/paths where this
    // optimization is off (streaming joins, non-AQE deployments) or
    // where the skew is in an aggregation AQE cannot split.
    // 100k rows on ONE key + a uniform 10k tail: the hot shuffle
    // partition is ~100× the median, unambiguous at any byte threshold
    import spark.implicits._
    val e = spark.range(100000).select(lit(0L).as("k"), col("id").as("event_id"))
      .union(spark.range(10000).select((col("id") % 97 + 1).as("k"),
        (col("id") + 100000).as("event_id")))
    // built WITHOUT an aggregate: OptimizeSkewedJoin only matches a join
    // whose children are plain Sort(shuffle-stage) runs — an aggregate
    // between Sort and shuffle (e.g. from .distinct()) disqualifies the
    // pattern, which is itself worth knowing when a "why didn't AQE
    // split this" question comes up
    val dim = spark.range(98).select(col("id").as("k"),
      pmod(col("id"), lit(7)).as("cohort"))
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // bypass AQE's "would add a shuffle" cost veto — the point here is
      // the split mechanism, not the cost model's opinion of a toy plan
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val joined = e.join(dim, "k")
      // collect() (not count(), which builds a SEPARATE QueryExecution
      // over an added aggregate) so THIS frame's adaptive plan finalizes
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.take(30).mkString("\n")) {
        plan should include("skew=true")
      }
      // the split changes scheduling, never results
      n shouldBe e.join(dim, "k").count()
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
