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

  test("hashed shingle explode caches a measurably smaller frame than strings") {
    // The r9 footprint cut: ngramPairsOn explodes xxhash64 longs instead
    // of shingle strings. Honest accounting of where the cut lands:
    // columnar cache and LZ4 shuffle COMPRESS away most string
    // redundancy at rest (measured ~15-18% smaller, asserted below), so
    // the at-rest byte counters understate the change — the larger
    // effect is in EXECUTION: window-sort buffers hold raw UnsafeRows
    // (~2× narrower with longs) and every sort comparison is an 8-byte
    // compare instead of a string compare. This test pins the at-rest
    // direction with real counters; the wall-clock effect shows in the
    // bench medians under load, which is what the next driver record
    // will tell.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d = "/root/testdata/sf0.01"
    def cachedBytes(ex: org.apache.spark.sql.DataFrame): Long = {
      spark.catalog.clearCache()
      val byShingle = Window.partitionBy(col("s"))
      val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("f"), col("s"))
      val pex = ex.withColumn("f", count(lit(1)).over(byShingle))
        .select(col("doc_id"), col("s"),
          row_number().over(byRarity).as("rk"), col("n"))
        .filter(col("rk") <= col("n") - ceil(lit(0.5) * col("n")).cast("int") + 1)
        .select(col("doc_id"), col("s"))
      // measure the DELTA this cache adds, not total storage: the
      // localCheckpointed shingle frame (and, under a parallel suite
      // run, sibling suites' blocks) sit in the same storage pool as a
      // constant that dilutes the string-vs-hash ratio below its margin
      // (seen flaky only in full-suite runs; solo was always green)
      val before = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
      pex.cache()
      pex.count()
      val bytes =
        spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum - before
      spark.catalog.clearCache()
      bytes
    }
    val sh = DataOps.shingledForTest(spark, d).localCheckpoint(true)
    val stringBytes = cachedBytes(
      sh.select(col("doc_id"), expr("size(sh)").as("n"), explode(col("sh")).as("s")))
    val hashedBytes = cachedBytes(
      sh.select(col("doc_id"),
          expr("array_distinct(transform(sh, s -> xxhash64(s)))").as("hs"))
        .select(col("doc_id"), expr("size(hs)").as("n"), explode(col("hs")).as("s")))
    info(f"cached postings: strings $stringBytes%,d B vs hashed $hashedBytes%,d B")
    withClue(s"hashed $hashedBytes vs string $stringBytes: ") {
      hashedBytes.toDouble should be < (0.95 * stringBytes)
    }
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
