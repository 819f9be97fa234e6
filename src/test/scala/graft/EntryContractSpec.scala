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
    // floor at the r11 count (114 + int8_codes/kmeans_assign/pq_codes)
    SparkEntry.queries.size should be >= 117
    SparkEntry.oracleSql.size should be >= 117
  }
}
