package graft

import java.util.concurrent.atomic.AtomicBoolean

import graft.queries.DataOps

/** Bench load-stability contract for the recall/cluster family — the three
  * queries whose r7 driver-bench samples inflated 14×/8×/3× under machine
  * contention (`lsh_recall` 3.2–78.1 s in one run) while the same commit
  * re-ran clean at 3.1 s.
  *
  * What is assertable in a unit test, and what is not: wall-clock under
  * UNCONTROLLED external load is not an invariant (the host may be arbitrarily
  * oversubscribed while this suite runs), so this spec does NOT gate on an
  * absolute time or on a clean-vs-loaded ratio. It gates on the two things the
  * operator itself controls:
  *
  *  1. **Run-to-run stability on the suite's own session**: repeated clean
  *     runs after warm-up stay within a generous spread bound — a cache
  *     that silently evicts and recomputes its lineage (the failure mode
  *     plain caching invites under memory pressure) shows up here as a
  *     multi-× outlier even on a quiet box.
  *  2. **Determinism under CPU contention**: with half the host's cores
  *     burned by synthetic spinners, the query's RESULT is bit-identical to
  *     its clean result. Contention may slow the query; it must never
  *     change what it computes (stragglers, task retries and speculative
  *     scheduling all reorder execution).
  *
  * The footprint FIX this spec guards is in [[DataOps.lshRecall]]: the LSH
  * side joins the candidate set instead of the verified pair set, dropping
  * the verification's two extra joins against the cached shingle corpus —
  * the flag equivalence is pinned in DataOpsSpec.
  */
class LoadStabilitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(): (Double, Set[(Long, Long, Double, Boolean)]) = {
    val t0 = System.nanoTime()
    val rows = DataOps.lshRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  test("lsh_recall: clean-run spread stays bounded after warm-up") {
    run() // warm-up: JIT + codegen compilation
    val samples = (1 to 3).map(_ => run())
    val times = samples.map(_._1)
    withClue(s"clean samples spread ${times.min}..${times.max}s: ") {
      times.max should be <= (5.0 * times.min)
    }
    // all clean runs agree exactly
    samples.map(_._2).distinct.size shouldBe 1
  }

  test("lsh_recall: shuffle work is load-invariant (telemetry counters agree clean vs loaded)") {
    // The r9 bench artifact carries per-query byte/record counters
    // (BenchTelemetry) precisely so a contention-inflated wall time can be
    // distinguished from a plan regression. This pins the invariant the
    // artifact relies on: the same query on the same data moves the same
    // shuffle ROWS whether or not the box is busy. Records are exact
    // (deterministic plan); bytes are post-compression and codec-sensitive
    // to fetch-order, so they get a small tolerance instead of equality.
    val telem = new BenchTelemetry(spark.sparkContext)
    def measured(): BenchTelemetry.Counters = {
      telem.reset()
      DataOps.lshRecall(spark, dir).count()
      telem.snapshot()
    }
    measured() // warm-up
    val clean = measured()
    val stop = new AtomicBoolean(false)
    val burners = (1 to math.max(2, Runtime.getRuntime.availableProcessors() / 2))
      .map { i =>
        val t = new Thread(() => {
          var x = 0L
          while (!stop.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
        }, s"telem-burner-$i")
        t.setDaemon(true)
        t.setPriority(Thread.MAX_PRIORITY)
        t.start()
        t
      }
    try {
      val loaded = measured()
      info(s"clean:  ${clean.toJson}")
      info(s"loaded: ${loaded.toJson}")
      loaded.shuffleReadRecords shouldBe clean.shuffleReadRecords
      loaded.shuffleWriteRecords shouldBe clean.shuffleWriteRecords
      val tol = 0.05
      loaded.shuffleReadBytes.toDouble shouldBe
        (clean.shuffleReadBytes.toDouble +- clean.shuffleReadBytes * tol)
      loaded.shuffleWriteBytes.toDouble shouldBe
        (clean.shuffleWriteBytes.toDouble +- clean.shuffleWriteBytes * tol)
      // no spill at this SF, clean or loaded — contention is CPU, not memory
      loaded.spillDiskBytes shouldBe 0L
      clean.spillDiskBytes shouldBe 0L
    } finally stop.set(true)
  }

  test("lsh_recall: result is bit-identical under synthetic CPU contention") {
    val (_, clean) = run()
    val stop = new AtomicBoolean(false)
    val burners = (1 to math.max(2, Runtime.getRuntime.availableProcessors() / 2))
      .map { i =>
        val t = new Thread(() => {
          var x = 0L
          while (!stop.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
        }, s"load-burner-$i")
        t.setDaemon(true)
        t.setPriority(Thread.MAX_PRIORITY)
        t.start()
        t
      }
    try {
      val (loadedTime, loaded) = run()
      info(f"loaded run: $loadedTime%.2fs with ${burners.size} burner threads")
      loaded shouldBe clean
    } finally stop.set(true)
  }
}
