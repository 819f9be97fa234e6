package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit dev tool: prints each named query's physical plan summary
  * (Exchange count + the Exchange/Broadcast/Window/Scan lines) without
  * executing it — the `.explain("formatted")` loop the build brief asks
  * for, runnable against any SF dir. Run:
  *   sbt "runMain graft.tools.ExplainTool /root/testdata/sf0.001 q1 q2"
  * With no query names, audits the full SparkEntry surface.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val full = args.contains("--full")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (n, fn) =>
        println(s"===== $n")
        try {
          val p = fn(spark, sf).queryExecution.executedPlan.toString
          println("Exchanges: " + "Exchange".r.findAllIn(p).length)
          val keep = p.linesIterator.filter(l =>
            l.contains("Exchange") || l.contains("Broadcast") ||
              l.contains("Window") || l.contains("Scan parquet") ||
              l.contains("Sort") && full)
          println(if (full) p else keep.mkString("\n"))
        } catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
