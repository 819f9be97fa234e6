package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line. A failed query is recorded as failed (negative time
  * would hide it in the total) and flips the exit code — a broken query must
  * never masquerade as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Dev-loop filter: SPARK_GRAFT_ONLY=q1,q2 times just those queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed dry run at the smallest SF: pays JVM + whole-stage-codegen
    // compilation once so the timed pass measures operator cost, not
    // first-call Janino compilation (worth seconds on the widest plans).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache() // intra-query caches are query-scoped
    }
    var failed = List.empty[String]
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Release intra-query caches so frames cached by one query (e.g. the
      // shingle set in dedup_minhash_lsh) never accumulate across the run
      // or double-cache when corpus_select rebuilds the same lineage.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
