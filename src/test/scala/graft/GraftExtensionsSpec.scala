package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.funcs._
import graft.text.TextOps

/** The SQL surface: a session created `withExtensions(new
  * GraftExtensions)` resolves every native kernel as a plain SQL
  * function, and each SQL call equals its Column-API twin on real data.
  * Also pins the analysis-time literal checks (a non-literal structural
  * argument fails with the function's name, not inside codegen).
  */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val ext: SparkSession = {
    // the shared fixture session predates the extensions; build a second
    // session OVER THE SAME context with the extensions installed, then
    // restore the fixture as default/active for the other suites
    val keep = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    SparkSession.setDefaultSession(keep)
    SparkSession.setActiveSession(keep)
    s
  }

  test("every registered function resolves in SQL and equals its Column-API twin") {
    val d = ext.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    d.createOrReplaceTempView("docs_ext")

    val viaSql = ext.sql(
      """SELECT doc_id,
                nfc_normalize(text) AS nrm,
                word_shingles(split(text, ' '), 3) AS sh,
                simhash_fp(word_shingles(split(text, ' '), 2)) AS fp
         FROM docs_ext""").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[String](2).toSet, r.getLong(3))))
      .toMap
    val viaApi = d.select(col("doc_id"),
        NfcNormalize(col("text")).as("nrm"),
        TextOps.shingles(split(col("text"), " "), 3).as("sh"),
        SimHashFp(TextOps.shingles(split(col("text"), " "), 2)).as("fp"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[String](2).toSet, r.getLong(3))))
      .toMap
    viaSql shouldBe viaApi

    val dots = ext.sql(
      """SELECT dot_product(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d,
                int8_dot(array(1Y, -2Y, 3Y), array(4Y, 5Y, -6Y)) AS q,
                minhash_sig(array('a b c', 'b c d'), 4) AS mh,
                tag_scope('<div class="x"><p>in</p></div><p>out</p>',
                          '<div class="x">', 'div') AS scoped,
                first_groups('<a href="u">t</a>', 'href="([^"]+)"') AS g,
                morton(5L, 3L) AS mz
      """).head()
    dots.getDouble(0) shouldBe 32.0
    dots.getLong(1) shouldBe (4 - 10 - 18).toLong
    dots.getSeq[String](2).size shouldBe 4
    dots.getString(3) should include("in")
    dots.getString(3) should not include "out"
    dots.getSeq[String](4) shouldBe Seq("u")
    // x=101b on even bits (1, 16), y=011b on odd bits (2, 8) -> 27
    dots.getLong(5) shouldBe 27L
  }

  test("misra_gries resolves in SQL as an aggregate and matches exact counts") {
    val rows = ext.sql(
      """SELECT misra_gries(t, 8) AS mg
         FROM (SELECT CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS t
               FROM range(9))""")
      .selectExpr("inline(mg)").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // vocab 2 < capacity 8: the summary is exact, bounds collapse
    rows shouldBe Map("a" -> ((3L, 3L)), "b" -> ((6L, 6L)))
  }

  test("top_k resolves in SQL as an aggregate with the documented order") {
    val got = ext.sql(
      """SELECT g, inline(top_k(s, id, 2))
         FROM VALUES (0L, 10L, 1L), (0L, 30L, 2L), (0L, 20L, 3L), (0L, 30L, 0L)
           AS t(g, s, id)
         GROUP BY g""")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // score desc, ties by id asc: (30, 0) before (30, 2)
    got.toSeq shouldBe Seq((30L, 0L), (30L, 2L))
  }

  test("wrong-typed input fails at ANALYSIS, not as a codegen ClassCastException") {
    val e = intercept[Exception] {
      ext.sql("SELECT int8_dot(array(1, 2), array(3, 4))").collect()
    }
    e.getMessage should include("array<tinyint>")
    val e2 = intercept[Exception] {
      ext.sql("SELECT nfc_normalize(42)").collect()
    }
    e2.getMessage should include("string")
  }

  test("a non-literal structural argument fails at analysis with the function named") {
    val e = intercept[Exception] {
      ext.sql("SELECT word_shingles(split('a b', ' '), cast(id AS int)) FROM range(1)")
        .collect()
    }
    e.getMessage should include("word_shingles")
  }

  test("a filter through the NTZ-normalizing cast still pushes to parquet") {
    // The Tables normalization (cast NTZ → TIMESTAMP) + a user filter on
    // the normalized column — the shape a library caller produces after
    // the r9 data flip. Catalyst's stock optimizer unwraps the cast and
    // pushes the bound (verified here on the PLAIN session — no graft
    // extension is needed or shipped for this; a bespoke unwrap rule was
    // built and deleted in r10 when this pin proved it redundant).
    val dir = tmpDir("ntzpush")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"))
      .write.parquet(s"$dir/events.parquet")
    val cutoff = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val q = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .filter(col("ts") >= lit(cutoff))
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts")
    val n = q.count()
    n should be > 0L
    n should be < spark.read.parquet(s"$dir/events.parquet").count()
  }
}
