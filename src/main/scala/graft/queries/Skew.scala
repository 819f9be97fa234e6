package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins.
  *
  * A shuffled equi-join puts every row of one key into one task; a hot
  * key (a null-ish default, a celebrity user, a boilerplate URL) turns
  * that task into the stage's straggler no matter how many executors the
  * cluster has. AQE's skew-join split handles the sort-merge case
  * adaptively, but it cannot help when the hot side must ALSO aggregate
  * by the join key downstream, in stream-static joins, or when the skew
  * is known ahead of time and the plan should never materialize the hot
  * partition in the first place. Salting is the static answer: replicate
  * the small side `salts` times, scatter the big side uniformly across
  * the replicas, and the hot key's rows land on `salts` tasks instead of
  * one.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, with the hot-key rows of `fact`
    * spread over `salts` replicas of `dim`.
    *
    * `factSalt` must be a deterministic per-row expression of `fact`
    * (e.g. `hash` of a unique id) — it only scatters, it never reaches
    * the output, and the result equals the plain join EXACTLY (each fact
    * row meets each matching dim row exactly once: under the one salt
    * value it hashes to, against that one replica).
    *
    * Cost: the dim side shuffles `salts`× its size — the deliberate
    * trade. Size `salts` to the observed skew (`Relational.keySkew` is
    * the diagnostic): the hot key's share divided by `salts` should be
    * comparable to a typical key's share.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factSalt: Column, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not carry a __salt column — it is saltedJoin's internal name")
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // null-safe scatter: a null salt expression must not silently drop
    // the row from an inner join (the plain join would keep it) — null
    // rows all land on replica 0, preserving exact join equality.
    fact.withColumn("__salt",
        coalesce(pmod(factSalt, lit(salts)).cast("int"), lit(0)))
      .join(dimS, Seq(key, "__salt"))
      .drop("__salt")
  }
}
