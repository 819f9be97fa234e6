package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataOps, RefOps, Relational, Tables}

/** r15 operator batch — the daily-cells memo (the substring-memo
  * discipline applied to the statistics family) and the round's new
  * operators. The memo is a pure refactor: every public face that now
  * reads the session-memoized (type, day, n) frame must return exactly
  * what its On(pure frame) form computes from a fresh collapse of the
  * same events table.
  */
class Round15OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def pureDaily =
    Relational.dailyByTypeOf(Tables(spark, sf, "events"))

  test("daily-cells memo: every shared-frame face equals its pure un-memoized form") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    rows(Relational.theilSen(spark, sf)) shouldBe
      rows(Relational.theilSenOn(pureDaily))
    rows(Relational.cusumDays(spark, sf)) shouldBe
      rows(Relational.cusumDaysOn(pureDaily))
    rows(Relational.mannKendall(spark, sf)) shouldBe
      rows(Relational.mannKendallOn(pureDaily))
    rows(Relational.lMoments(spark, sf)) shouldBe
      rows(Relational.lMomentsOn(pureDaily))
  }

  test("doremi_mixture: each round is an exact ppm partition and mass moves toward max excess") {
    val t = DataOps.doremiMixture(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val rounds = t.map(_._1).distinct.sorted
    rounds shouldBe (0L to DataOps.DoremiRounds.toLong)
    // every round's weights sum to exactly one million ppm
    rounds.foreach { r =>
      t.filter(_._1 == r).map(_._4).sum shouldBe 1000000L
    }
    // round 0 is the uniform largest-remainder split
    val k = t.filter(_._1 == 0L).length
    t.filter(_._1 == 0L).foreach { case (_, _, _, w, _) =>
      w should (be(1000000L / k) or be(1000000L / k + 1)) }
    // the argmax-excess domain's weight is non-decreasing round over
    // round (the exponentiated-gradient direction) — with a 1-ppm
    // tolerance (r15 ADVICE #2): largest-remainder renormalization can
    // lose the +1 seat while the floor base stays flat, so the ROUNDED
    // weight may dip 1 ppm even though the exact rational share
    // strictly increases.
    val hot = t.maxBy(_._3)._2
    val hotW = rounds.map(r => t.find(x => x._1 == r && x._2 == hot).get._4)
    hotW.toSeq.sliding(2).foreach {
      case Seq(a, b) => b should be >= (a - 1)
      case _ => ()
    }
    t.map(_._2).distinct.foreach { l =>
      val avg = t.find(x => x._2 == l && x._1 == 1L).get._5
      val mean = (1L to DataOps.DoremiRounds.toLong)
        .map(r => t.find(x => x._1 == r && x._2 == l).get._4).sum /
        DataOps.DoremiRounds
      avg shouldBe mean
    }
  }

  test("diversity_sample: ranks are dense per cluster and agree with the graded assignment") {
    val ds = DataOps.diversitySampleCodes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val assign = DataOps.kmeansAssignments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    // every sampled vec carries the assignment the graded entry reports
    ds.foreach { case (v, c, _) => assign(v) shouldBe c }
    // ranks are dense 1..min(16, cluster population)
    ds.groupBy(_._2).foreach { case (c, g) =>
      val pop = assign.values.count(_ == c)
      g.map(_._3).sorted.toSeq shouldBe (1L to math.min(16L, pop.toLong))
    }
  }

  test("cluster_from_index (graded face) equals dedup_cluster_star") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    rows(DataOps.clusterFromIndexGraded(spark, sf)) shouldBe
      rows(DataOps.dedupClusterStar(spark, sf))
  }

  test("temperature_allocation: exact budget partition that flattens toward rare languages") {
    val rows = DataOps.temperatureAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val totalTokens = rows.map(_._2).sum
    // the allocation is an exact partition of B = total div 2
    rows.map(_._4).sum shouldBe totalTokens / 2
    // sqrt weight is the true isqrt of the mass
    rows.foreach { case (_, n, sq, _, _, _) =>
      sq * sq should be <= n
      (sq + 1) * (sq + 1) should be > n
    }
    // flattening: the dominant language's allocated share sits below
    // its natural share; the rarest language's above (tau = 1/2)
    val top = rows.maxBy(_._2)
    val bottom = rows.minBy(_._2)
    top._6 should be < top._5
    bottom._6 should be > bottom._5
  }

  test("csv_quarantine: the quarantine split matches the planting rule exactly") {
    val out = RefOps.csvQuarantine(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val e = Tables(spark, sf, "events")
    val planted = e.filter(col("event_id") % 500 === 0).count()
    val clean = e.filter(col("event_id") % 500 =!= 0)
    out("quarantined")._1 shouldBe planted
    out("clean")._1 shouldBe clean.count()
    out("clean")._2 shouldBe
      clean.agg(sum(col("user_id"))).head.getLong(0)
    // raw lines survive byte-for-byte: total quarantined length equals
    // the rendered planted lines
    out("quarantined")._3 shouldBe
      e.filter(col("event_id") % 500 === 0)
        .select(expr("length(concat(event_id, ',noise,', event_type))")
          .cast("long").as("l"))
        .agg(sum(col("l"))).head.getLong(0)
  }
}
