package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic TESTDATA.md-shaped table generator — the sf1 scale
  * point the driver does not ship (r10 verdict #1: one 10× data point
  * turns every "linear by design" claim into evidence). Produces the
  * same ten tables with the same schemas and closely matched value
  * domains/distributions as `/root/testdata/sf0.1` (inspected via the
  * parquet, TESTDATA.md's only contract), at `--scale` times sf0.1's
  * row counts.
  *
  * Everything derives from `xxhash64(id, salt)` — no RNG, no
  * partition-order dependence: the same (outDir, scale) always writes
  * byte-identical VALUES regardless of parallelism. Dev tool, not
  * library surface; run:
  *   sbt "runMain graft.tools.GenTestData /root/repo/testdata-sf1 10"
  */
object GenTestData {

  private def u(idCol: String, salt: Int): org.apache.spark.sql.Column =
    (pmod(xxhash64(col(idCol), lit(salt)), lit(1000000007L)).cast("double")
      / lit(1000000007.0))

  private def pick(idCol: String, salt: Int, vals: Seq[String]) =
    element_at(array(vals.map(lit): _*),
      pmod(xxhash64(col(idCol), lit(salt)), lit(vals.size)).cast("int") + 1)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val scale = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-gen-testdata").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nCustomer = 15000L * scale
    val nSupplier = 1000L * scale
    val nPart = 20000L * scale
    val nOrders = 150000L * scale
    val nLineitem = 600000L * scale
    val nEvents = 100000L * scale
    val nUsers = 1500L * scale
    val nDocs = 5000L * scale
    val nEmb = 2000L * 4 // sf0.01→sf0.1 grew embeddings 4×; keep the rule

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gen] $name done")
    }

    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region")

    write(spark.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")), "nation")

    write(spark.range(nCustomer).select(col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      pmod(xxhash64(col("id"), lit(1)), lit(25)).cast("int").as("c_nationkey"),
      round(u("id", 2) * 10999.0 - 999.0, 2).as("c_acctbal"),
      pick("id", 3, Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY")).as("c_mktsegment")), "customer")

    write(spark.range(nSupplier).select(col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(xxhash64(col("id"), lit(4)), lit(25)).cast("int").as("s_nationkey"),
      round(u("id", 5) * 10999.0 - 999.0, 2).as("s_acctbal")), "supplier")

    write(spark.range(nPart).select(col("id").as("p_partkey"),
      concat(pick("id", 6, Seq("large", "small", "hot", "cold", "blue",
          "red", "green", "shiny", "dull", "heavy")), lit(" "),
        pick("id", 7, Seq("ring", "bolt", "washer", "gear", "cog", "pin",
          "plate", "rod", "cap", "nut"))).as("p_name"),
      concat(lit("Brand#"),
        pmod(xxhash64(col("id"), lit(8)), lit(25)) + 1).as("p_brand"),
      pick("id", 9, Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD")).as("p_type"),
      (pmod(xxhash64(col("id"), lit(10)), lit(50)).cast("int") + 1).as("p_size"),
      round(lit(900.0) + col("id") * 0.1, 2).as("p_retailprice")), "part")

    // order dates span 1995-01-01 .. 2001-08-01 (2404 days), day-granular
    val oEpochDay = to_date(lit("1995-01-01"))
    write(spark.range(nOrders).select(col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit(11)), lit(nCustomer)).as("o_custkey"),
      pick("id", 12, Seq("O", "F", "P")).as("o_orderstatus"),
      round(u("id", 13) * 449100.0 + 900.0, 2).as("o_totalprice"),
      date_add(oEpochDay,
        pmod(xxhash64(col("id"), lit(14)), lit(2405)).cast("int"))
        .cast("timestamp").as("o_orderdate"),
      pick("id", 15, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")).as("o_orderpriority")), "orders")

    // lineitems pick a uniform order (per-order counts come out
    // Poisson(4)-ish, matching the inspected 1..17 spread); shipdate =
    // a uniform order-window day + 1..95 days of lag
    write(spark.range(nLineitem).select(col("id").as("rid"))
      .select(
        pmod(xxhash64(col("rid"), lit(16)), lit(nOrders)).as("l_orderkey"),
        pmod(xxhash64(col("rid"), lit(17)), lit(nPart)).as("l_partkey"),
        pmod(xxhash64(col("rid"), lit(18)), lit(nSupplier)).as("l_suppkey"),
        (pmod(xxhash64(col("rid"), lit(19)), lit(7)).cast("int") + 1)
          .as("l_linenumber"),
        (pmod(xxhash64(col("rid"), lit(20)), lit(50)) + 1).cast("double")
          .as("l_quantity"),
        round(u("rid", 21) * 104100.0 + 900.0, 2).as("l_extendedprice"),
        (pmod(xxhash64(col("rid"), lit(22)), lit(11)).cast("double") / 100.0)
          .as("l_discount"),
        (pmod(xxhash64(col("rid"), lit(23)), lit(9)).cast("double") / 100.0)
          .as("l_tax"),
        pick("rid", 24, Seq("A", "N", "R")).as("l_returnflag"),
        pick("rid", 25, Seq("O", "F")).as("l_linestatus"),
        date_add(oEpochDay,
          pmod(xxhash64(col("rid"), lit(26)), lit(2405)).cast("int")
            + pmod(xxhash64(col("rid"), lit(27)), lit(95)).cast("int") + 1)
          .cast("timestamp").as("l_shipdate")), "lineitem")

    // events: 30 days from 2024-01-01, ts monotone in event_id (the
    // driver's shape) with sub-slot jitter; mild user skew via two draws
    val slotMicros = 30L * 86400L * 1000000L / nEvents
    write(spark.range(nEvents).select(col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * slotMicros
        + pmod(xxhash64(col("id"), lit(28)), lit(slotMicros))).as("ts"),
      least(pmod(xxhash64(col("id"), lit(29)), lit(nUsers)),
        pmod(xxhash64(col("id"), lit(30)), lit(nUsers))).as("user_id"),
      pick("id", 31, Seq("click", "error", "purchase", "signup", "view"))
        .as("event_type"),
      round(u("id", 32) * 560.0, 2).as("value"),
      format_string("{\"k\": %d}",
        pmod(xxhash64(col("id"), lit(33)), lit(100))).as("props")), "events")

    // documents: word salad from a scale-grown vocabulary, 20
    // round-robin sources, weighted langs (en ~40%), ~0.2% exact clones
    // and ~1% near-clones (one appended word) of a nearby doc — the dup
    // structure the dedup family needs to find real work at sf1.
    //
    // The vocabulary MUST grow with scale (r13 verdict #1): at a fixed
    // 29 words the whole 3-shingle space is 29³ ≈ 24k, which the
    // ~nDocs/97 eval cohort (~515 docs × ~50 shingles at sf1) covers
    // COMPLETELY — every training doc then carries an eval shingle,
    // decontaminate flags the entire corpus and training_set grades a
    // vacuous 0-row frame. Real corpora obey Heaps' law (vocabulary
    // grows with corpus size); 20 extra tokens per scale step keeps
    // scale=1 byte-identical to the inspected sf0.1 shape while giving
    // sf1 a 209-word vocabulary (shingle space 9.1M, eval coverage
    // ~0.3%, expected contamination ~13% — non-trivial on BOTH sides of
    // the gate). The same saturation made the pairwise-monitor candidate
    // sets quadratic artifacts (130M sf1 pairs), so this also restores
    // honest selectivity to the n-gram/LSH recall monitors.
    val vocab = Seq("spark", "line", "column", "order", "small", "sort",
      "fast", "value", "scan", "hash", "slow", "group", "batch", "part",
      "query", "agg", "table", "vector", "stream", "filter", "big",
      "merge", "join", "window", "key", "customer", "data", "the", "a") ++
      (0 until 20 * (scale - 1)).map(i => s"tok$i")
    val vocabCol = array(vocab.map(lit): _*)
    val docsBase = spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("clone_sel", pmod(xxhash64(col("doc_id"), lit(34)), lit(1000)))
      // content source: exact clones (sel<2) and near-clones (2<=sel<12)
      // of doc_id-7 regenerate ITS words; everyone else their own
      .withColumn("content_id",
        when(col("clone_sel") < 12 && col("doc_id") >= 7, col("doc_id") - 7)
          .otherwise(col("doc_id")))
      .withColumn("n_words",
        (pmod(xxhash64(col("content_id"), lit(35)), lit(90)) + 8).cast("int"))
      .withColumn("words", transform(sequence(lit(1), col("n_words")),
        i => element_at(vocabCol,
          pmod(xxhash64(col("content_id") * 1000 + i, lit(36)),
            lit(vocab.size)).cast("int") + 1)))
      .withColumn("text0", array_join(col("words"), " "))
      .withColumn("text",
        when(col("clone_sel") >= 2 && col("clone_sel") < 12 &&
            col("doc_id") >= 7,
          concat(col("text0"), lit(" extra"))).otherwise(col("text0")))
    write(docsBase.select(col("doc_id"),
      col("text"),
      // weighted langs: 0-7 en, 8-9 de, 10-11 es, 12-13 fr, 14-15 zh…
      // over 20 cells ⇒ en 40%, the rest 15% each (the inspected mix)
      element_at(array((Seq.fill(8)("en") ++ Seq.fill(3)("de") ++
          Seq.fill(3)("es") ++ Seq.fill(3)("fr") ++ Seq.fill(3)("zh"))
          .map(lit): _*),
        pmod(xxhash64(col("doc_id"), lit(37)), lit(20)).cast("int") + 1)
        .as("lang"),
      concat(lit("src"), pmod(col("doc_id"), lit(20))).as("source"),
      length(col("text")).as("n_chars")), "documents")

    // embeddings: 64-dim float32, near-uniform in [-1, 1); label 0..9
    // near-uniform (the inspected sf0.1 shape — its omission failed
    // embedding_centroids in the first sf1 bench run)
    write(spark.range(nEmb).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("id") * 64 + d, lit(38)), lit(2000001))
          .cast("double") / 1000000.0 - 1.0).cast("float")).as("embedding"),
      pmod(xxhash64(col("id"), lit(39)), lit(10)).cast("int").as("label")),
      "embeddings")

    spark.stop()
  }
}
