package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract coverage pins (pure set algebra — no Spark session):
  * every oracle references a real query, and every query is graded
  * (has an oracle). A query added without its oracle silently downgrades
  * to the driver's weaker rows-only check; a typo'd oracle key grades
  * nothing at all. Both mistakes fail here by name instead.
  */
class EntryContractSpec extends AnyFunSuite with Matchers {

  test("every oracleSql key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    withClue(s"oracles without a query: ${orphans.toSeq.sorted.mkString(", ")} ") {
      orphans shouldBe empty
    }
  }

  test("every query carries an oracle — additions must opt OUT here, not drift") {
    // intentionally oracle-free entries would be listed here with the
    // reason; today there are none — every graded query hash-compares
    val specOnly = Set.empty[String]
    val ungraded = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet).diff(specOnly)
    withClue(s"queries without an oracle: ${ungraded.toSeq.sorted.mkString(", ")} ") {
      ungraded shouldBe empty
    }
  }

  test("the surface only grows: the graded-query count floor ratchets") {
    // a refactor that drops map entries (e.g. a bad merge of the two
    // big literal maps) shrinks the graded surface silently — pin the
    // floor at the r13 count (the 164 r12-close entries + the r13
    // additions from N159 on, incl. the r13b batch N168-N174)
    SparkEntry.queries.size should be >= 244
    SparkEntry.oracleSql.size should be >= 244
  }

  test("the committed sf1 scale-point artifact is clean and self-consistent") {
    // r10 verdict #1 institutionalized: one 10× data point separates
    // linear operators from pruning- or SF-hidden superlinear ones.
    // BENCH_sf1.json is expensive (~1 h) and not regenerated per query
    // addition, so this pins integrity, not full coverage: the artifact
    // exists, recorded zero failures, timed a full-surface-sized set,
    // and names only queries that still exist (a renamed/dropped query
    // invalidates the scale record for its row).
    val path = Seq("BENCH_sf1.json", "/root/repo/BENCH_sf1.json")
      .map(java.nio.file.Paths.get(_)).find(java.nio.file.Files.exists(_))
    withClue("BENCH_sf1.json missing — run Bench with " +
      "SPARK_GRAFT_SF_DIR=<sf1 dir> (GenTestData writes it): ") {
      path.isDefined shouldBe true
    }
    val json = java.nio.file.Files.readString(path.get)
    val timedKeys = """"queries":\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json).map(_.group(1))
      .getOrElse(fail("no queries object in BENCH_sf1.json"))
    val covered = "\"([a-z0-9_]+)\":".r.findAllMatchIn(timedKeys)
      .map(_.group(1)).toSet
    covered.size should be >= 117
    val orphans = covered.diff(SparkEntry.queries.keySet)
    withClue(s"BENCH_sf1.json times queries that no longer exist: " +
      s"${orphans.toSeq.sorted.mkString(", ")} ") {
      orphans shouldBe empty
    }
    val failed = """"failed":\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    withClue(s"sf1 run recorded failures: $failed ") {
      failed.trim shouldBe empty
    }
  }

  test("the committed sf1 CORRECTNESS artifact records a full-surface pass") {
    // r11 advice institutionalized: the first CORRECTNESS_sf1.json was
    // committed with n_match 0/138 (every query felled by one DuckDB
    // glob bug in the checker, not by the engine) — an artifact that
    // *records a failure* must fail the gate, not sit in the tree
    // looking like evidence. Pins: the artifact exists, every checked
    // query matched, the mismatch list is empty, and the run covered a
    // full-surface-sized set. Regenerate with:
    //   sbt "runMain graft.Verify /tmp/verify_sf1 <sf1 dir>"
    //   python3 tools/oracle_check.py /tmp/verify_sf1 <sf1 dir> CORRECTNESS_sf1.json
    val path = Seq("CORRECTNESS_sf1.json", "/root/repo/CORRECTNESS_sf1.json")
      .map(java.nio.file.Paths.get(_)).find(java.nio.file.Files.exists(_))
    withClue("CORRECTNESS_sf1.json missing — run Verify + tools/oracle_check.py at sf1: ") {
      path.isDefined shouldBe true
    }
    val json = java.nio.file.Files.readString(path.get)
    def intField(k: String): Int = s""""$k":\\s*(\\d+)""".r
      .findFirstMatchIn(json).map(_.group(1).toInt)
      .getOrElse(fail(s"no $k in CORRECTNESS_sf1.json"))
    val (nMatch, nQueries) = (intField("n_match"), intField("n_queries"))
    // full-coverage coupling (the materialized-audit ratchet pattern,
    // r12): a query added without re-grading the sf1 scale point fails
    // HERE by count — the scale artifact must cover the whole surface,
    // because sf1 is where the sf0.01-invisible bugs live (the r12
    // sessionize seconds-truncation flip was caught only at sf1)
    withClue(s"sf1 correctness artifact covers $nQueries of " +
      s"${SparkEntry.queries.size} graded queries — re-run Verify + " +
      "oracle_check at sf1: ") {
      nQueries should be >= SparkEntry.queries.size
    }
    withClue(s"sf1 oracle run not clean: $nMatch/$nQueries matched ") {
      nMatch shouldBe nQueries
    }
    val mism = """"mismatches":\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    withClue(s"sf1 mismatches recorded: $mism ") { mism.trim shouldBe empty }
  }

  test("the committed materialized-mode audit covers every graded query") {
    // r10's lesson institutionalized: count()-based benching lets column
    // pruning delete output expressions, which hid an O(n²) per-doc
    // metric for six rounds. The noop-sink audit (SPARK_GRAFT_EVAL=
    // materialize → bench_materialized.json) evaluates every output
    // column; this ratchet makes it part of the GATE — a query added
    // without re-running the audit, or an audit run that failed a
    // query, fails here by name. Regenerate with:
    //   SPARK_GRAFT_EVAL=materialize sbt "runMain graft.Bench"
    val path = Seq("bench_materialized.json", "/root/repo/bench_materialized.json")
      .map(java.nio.file.Paths.get(_)).find(java.nio.file.Files.exists(_))
    withClue("bench_materialized.json missing — run the materialized audit: ") {
      path.isDefined shouldBe true
    }
    val json = java.nio.file.Files.readString(path.get)
    // the artifact is one JSON object; the queries map's keys are exactly
    // the successfully-timed queries (failures are excluded from it)
    val timedKeys = """"queries":\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json).map(_.group(1))
      .getOrElse(fail("no queries object in bench_materialized.json"))
    val covered = "\"([a-z0-9_]+)\":".r.findAllMatchIn(timedKeys)
      .map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet.diff(covered)
    withClue(s"graded queries absent from the materialized audit " +
      s"(stale artifact? failed run?): ${missing.toSeq.sorted.mkString(", ")} ") {
      missing shouldBe empty
    }
    val failed = """"failed":\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    withClue(s"materialized audit recorded failures: $failed ") {
      failed.trim shouldBe empty
    }
  }
}
