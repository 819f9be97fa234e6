package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM event-time interval join — the attribution
  * query ([[graft.queries.RefOps.rangeJoin]]'s click-within-±1h-of-
  * purchase semantics, N27) running continuously over two unbounded
  * streams.
  *
  * Why the shape matters at scale: a stream-stream inner join must
  * buffer each side's rows in the state store until the OTHER side can
  * no longer produce a match. That is only bounded when (a) both inputs
  * carry a watermark and (b) the join condition constrains the two
  * event times against each other — exactly the `BETWEEN p_ts - 1h AND
  * p_ts + 1h` range predicate here. With both in place Spark derives a
  * state watermark per side (other side's watermark minus the interval)
  * and EVICTS buffered rows behind it every trigger, so state is
  * O(rows in the tolerance+lateness window), not O(stream history) —
  * the difference between a join that runs forever and one that OOMs in
  * an afternoon. StreamJoinSpec pins both properties: batch-equivalent
  * output on in-order data, and `stateOperators.numRowsRemoved > 0`
  * once the watermark advances past buffered rows.
  *
  * The equi-key (`user_id`) rides WITH the time predicate so the state
  * store hash-partitions by user — the same keyed-shuffle shape as the
  * batch bucketed range join; matches emit as they arrive (inner join
  * needs no watermark to EMIT, only to evict — append mode works).
  */
object StreamJoin {

  /** `clicks(user_id, c_id, ts)` ⋈ `purchases(user_id, p_id, p_ts)`
    * within ± `toleranceMin` minutes, both sides tolerating
    * `latenessMin` minutes of disorder before eviction.
    */
  def clickPurchase(clicks: DataFrame, purchases: DataFrame,
                    toleranceMin: Int = 60, latenessMin: Int = 30): DataFrame = {
    val c = clicks.withWatermark("ts", s"$latenessMin minutes").alias("c")
    val p = purchases.withWatermark("p_ts", s"$latenessMin minutes").alias("p")
    c.join(p, expr(
      s"""c.user_id = p.user_id AND
          c.ts BETWEEN p.p_ts - INTERVAL $toleranceMin MINUTES
                   AND p.p_ts + INTERVAL $toleranceMin MINUTES"""))
      .select(col("c.c_id"), col("c.user_id"),
        col("c.ts"), col("p.p_id"), col("p.p_ts"),
        (unix_micros(col("c.ts")) - unix_micros(col("p.p_ts"))).as("dt_us"))
  }
}
