package graft

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Cross-run, cross-partitioning determinism, pinned in CI: the five most
  * expensive graded queries (r5 bench) run in two FRESH sessions — one at
  * 4 shuffle partitions, one at 32 — must produce identical row-set
  * hashes. Partition count changes aggregation grouping order, shuffle
  * layout and window partition boundaries, so a nondeterministic
  * aggregate sneaking into a hot query (an unsorted float fold, an
  * unordered collect_list, a tie without a total order) fails HERE
  * instead of in the DuckDB oracle rounds later. Sessions are
  * `newSession()` forks: shared context, independent SQL conf — the
  * partition-count knob is session-scoped.
  */
class PartitionDeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  // five most expensive (r5 bench) + the r6 crawl-hygiene queries whose
  // aggregates are the exact class this spec exists for (an in-row-sorted
  // collect_list, a min-struct argmin, cross-partition count sums)
  private val heavy = Seq("html_extract", "dedup_cluster_star",
    "cluster_keep_best", "lsh_recall", "corpus_select",
    "dedup_paragraphs", "dup_windows", "doc_rarity",
    "dedup_spans", "hash_embed", "value_outliers",
    // r10 additions in this spec's risk class: an in-row sorted tree
    // hash (manifest), a LOCF window over a generated spine (gap_fill),
    // a cumulative-flag window (islands), and the deepest composition
    // (training_set joins three materialized flag frames)
    "corpus_manifest", "gap_fill", "islands_coverage", "training_set",
    // r11b additions in the risk class: a rank/cumsum window with a
    // tie-broken total order (zipf) and a carry-over running sum whose
    // every prefix must be engine- and partitioning-identical (sweep)
    "zipf_coverage", "concurrency_peak",
    // r12 additions in the risk class: a bounded single-partition
    // running-max window (pareto), two chained histogram medians whose
    // cumulative prefixes must not depend on partition layout (mad),
    // rank selections over per-key total orders (trimmed/gaps/latency),
    // and the k-th-smallest-of-merged sketch pick (kmv union)
    "pareto_front", "mad_outliers", "trimmed_stats",
    "interevent_gaps", "conversion_latency", "kmv_union_est")

  private def hash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val canon = df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(v => if (v == null) "\u0000" else v.toString)
        .mkString("\u0001"))
      .sorted.mkString("\n")
    MessageDigest.getInstance("MD5").digest(canon.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  heavy.foreach { name =>
    test(s"$name hashes identically at 4 and 32 shuffle partitions") {
      val fn = SparkEntry.queries(name)
      val s4 = spark.newSession()
      s4.conf.set("spark.sql.shuffle.partitions", "4")
      val s32 = spark.newSession()
      s32.conf.set("spark.sql.shuffle.partitions", "32")
      try hash(fn(s4, dir)) shouldBe hash(fn(s32, dir))
      finally { s4.catalog.clearCache(); s32.catalog.clearCache() }
    }
  }
}
