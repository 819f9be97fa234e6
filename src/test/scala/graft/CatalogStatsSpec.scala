package graft

import org.apache.spark.sql.functions._

/** Catalog statistics + cost-based optimization: ANALYZE TABLE feeds the
  * optimizer real row counts and column NDV/min/max, which is what lets
  * Catalyst size build sides and reorder joins at 100 TB instead of
  * guessing from file bytes. Pins the pieces that are stable across
  * Spark versions: stats land in the catalog, CBO propagates a row
  * count through the optimized plan, and a FILTER's estimate shrinks
  * below the table's total once column histograms exist — the signal
  * join planning actually consumes.
  */
class CatalogStatsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("ANALYZE TABLE computes row counts and column stats CBO can consume") {
    spark.conf.set("spark.sql.legacy.allowNonEmptyLocationInCTAS", "true")
    val wh = tmpDir("stats-wh")
    val table = "graft_stats_docs"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.queries.Tables(spark, sf, "documents")
      .write.option("path", s"$wh/$table").saveAsTable(table)
    val expected = spark.table(table).count()
    try {
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")
      val keep = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
        "spark.sql.statistics.histogram.enabled")
        .map(k => k -> spark.conf.getOption(k)).toMap
      try {
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        // catalog carries the analyzed row count
        val stats = spark.table(table).queryExecution.optimizedPlan.stats
        stats.rowCount shouldBe defined
        stats.rowCount.get.toLong shouldBe expected
        // a selective filter's CBO estimate is BELOW the table total —
        // the quantity join reordering ranks relations by
        val filtered = spark.table(table).filter(col("lang") === "en")
        val fStats = filtered.queryExecution.optimizedPlan.stats
        fStats.rowCount shouldBe defined
        fStats.rowCount.get.toLong should be < expected
        fStats.rowCount.get.toLong should be > 0L
        // attribute-level stats exist for the filter column
        val attr = filtered.queryExecution.optimizedPlan.references
          .find(_.name == "lang")
        attr shouldBe defined
      } finally keep.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      ()
    }
  }
}
