package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.queries.{Relational, Tables}

/** The driver's testdata generator has shipped `events.ts` in two parquet
  * flavors across rounds — TIMESTAMP(NANOS) (r1–r8, read as raw longs under
  * `nanosAsLong`) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (r9+, read
  * as TIMESTAMP_NTZ) — and the r9 flip silently dropped the four
  * `unix_micros`-based queries from the graded record (`unix_micros`
  * rejects NTZ input). These tests pin that [[Tables]] normalizes every
  * flavor to the same session-UTC `TIMESTAMP` values, so the query surface
  * never again depends on which writer produced the data.
  */
class TablesFlavorSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** The same 20-row events slice written in each flavor under `dir`. */
  private def writeFlavors(): String = {
    val dir = tmpDir("flavors")
    val base = Tables(spark, sf, "events").limit(20).cache()
    // Flavor 1: session-local TIMESTAMP (isAdjustedToUTC=true) — the shape
    // Tables itself emits, round-tripped.
    base.write.parquet(s"$dir/ltz/events.parquet")
    // Flavor 2: TIMESTAMP_NTZ (isAdjustedToUTC=false) — the r9 generator.
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$dir/ntz/events.parquet")
    // Flavor 3: raw epoch nanos as long — what `nanosAsLong` yields from
    // TIMESTAMP(NANOS) files (Spark can't WRITE nanos, so store the long
    // directly; Tables' LongType branch is the code under test).
    base.withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.parquet(s"$dir/nanos/events.parquet")
    base.unpersist()
    dir
  }

  test("Tables normalizes all three ts flavors to identical TIMESTAMP values") {
    val dir = writeFlavors()
    val frames = Seq("ltz", "ntz", "nanos").map { f =>
      f -> Tables(spark, s"$dir/$f", "events")
    }
    for ((f, d) <- frames)
      withClue(s"flavor $f: ") {
        d.schema("ts").dataType shouldBe TimestampType
      }
    val ref = frames.head._2
      .select(col("event_id"), unix_micros(col("ts")).as("tu"))
    for ((f, d) <- frames.tail)
      withClue(s"flavor $f vs ltz: ") {
        val got = d.select(col("event_id"), unix_micros(col("ts")).as("tu"))
        got.except(ref).count() shouldBe 0L
        ref.except(got).count() shouldBe 0L
      }
  }

  test("eventsSince agrees across flavors and pushes the cutoff to the scan") {
    val dir = writeFlavors()
    // A cutoff strictly inside the slice's time range, so the filter is
    // non-trivial in both directions.
    val times = Tables(spark, s"$dir/ltz", "events")
      .select(unix_micros(col("ts"))).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    val cutUs = times(times.length / 2)
    val cutoff = new java.sql.Timestamp(Math.floorDiv(cutUs, 1000L))
    cutoff.setNanos(((cutUs % 1000000L + 1000000L) % 1000000L).toInt * 1000)
    val counts = Seq("ltz", "ntz", "nanos").map { f =>
      val d = Tables.eventsSince(spark, s"$dir/$f", cutoff)
      d.schema("ts").dataType shouldBe TimestampType
      f -> d.count()
    }.toMap
    counts("ntz") shouldBe counts("ltz")
    counts("nanos") shouldBe counts("ltz")
    counts("ltz") should be > 0L
    counts("ltz") should be < 20L
    // The NTZ branch must compare on the native column (a cast would block
    // parquet pushdown): the scan's pushed filters carry the ts bound.
    val plan = Tables.eventsSince(spark, s"$dir/ntz", cutoff)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"NTZ cutoff not pushed to parquet:\n$plan")
  }

  test("rollingRevenueRange agrees across all three o_orderdate flavors") {
    // orders is deliberately UNNORMALIZED in Tables (a wrapping projection
    // would block the literal-comparison queries' parquet pushdown), so
    // every orders consumer that derives values from o_orderdate must
    // branch on the physical type itself. The nanos flavor is the sharp
    // edge: bigint→timestamp CAST reads SECONDS, so an unbranched cast
    // yields garbage days silently while the DuckDB oracle reads real
    // timestamps — this pins the LongType branch added in r11.
    val dir = tmpDir("orders-flavors")
    // orders is unnormalized by design, so the slice arrives in whatever
    // flavor the current driver generation wrote — normalize to LTZ first
    // so each derived flavor starts from the same instants.
    val base = Tables(spark, sf, "orders").limit(50)
      .withColumn("o_orderdate", col("o_orderdate").cast(TimestampType))
      .cache()
    base.write.parquet(s"$dir/ltz/orders.parquet")
    base.withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
      .write.parquet(s"$dir/ntz/orders.parquet")
    base.withColumn("o_orderdate", unix_micros(col("o_orderdate")) * 1000L)
      .write.parquet(s"$dir/nanos/orders.parquet")
    base.unpersist()
    val frames = Seq("ltz", "ntz", "nanos").map { f =>
      f -> Relational.rollingRevenueRange(spark, s"$dir/$f")
    }
    val ref = frames.head._2
    ref.count() shouldBe 50L
    // days must be real epoch-days (post-1970 testdata), not the tiny
    // values a seconds-misread would produce
    val minDay = ref.agg(min(col("day"))).head().getLong(0)
    minDay should be > 1000L
    for ((f, d) <- frames.tail)
      withClue(s"flavor $f vs ltz: ") {
        d.except(ref).count() shouldBe 0L
        ref.except(d).count() shouldBe 0L
      }
  }

  test("the unix_micros query family runs against NTZ-flavored input") {
    val dir = writeFlavors()
    // The four queries that vanished from the r9 record: resolving at all
    // is the regression being pinned (NTZ input used to throw
    // DATATYPE_MISMATCH at analysis), and funnel's viewer count ties the
    // values back to the data.
    val viewers = Tables(spark, s"$dir/ntz", "events")
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    Relational.funnel(spark, s"$dir/ntz").count() shouldBe viewers
    Relational.eventTransitions(spark, s"$dir/ntz").count() should be >= 0L
    Relational.tableProfile(spark, s"$dir/ntz").count() shouldBe 6L
    graft.queries.RefOps.rangeJoin(spark, s"$dir/ntz").count() should be >= 0L
  }
}
