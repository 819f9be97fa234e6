package graft

import org.apache.spark.sql.types._

import graft.queries.Tables

/** Schema contract for the driver's test tables AFTER Tables
  * normalization. The r9 data regeneration silently flipped `events.ts`
  * from TIMESTAMP(NANOS) to TIMESTAMP_NTZ and four queries vanished from
  * the graded record without any test failing; this spec makes the NEXT
  * writer-flavor flip (int32 ids, float32 values, restructured props,
  * renamed columns) fail loudly here, with the table and column named,
  * instead of surfacing as missing oracle entries three artifacts later.
  *
  * The contract is over POST-normalization types — the stable surface
  * the query layer programs against; raw-file flavor variance is
  * Tables' job (TablesFlavorSpec covers it).
  */
class TableContractSpec extends SparkSpec {

  private val expected: Map[String, Map[String, DataType]] = Map(
    "events" -> Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, true),
      "label" -> IntegerType),
    "orders" -> Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType),
    "lineitem" -> Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType))

  // event-time columns whose physical flavor legitimately varies —
  // asserted separately as "any of the flavors Tables handles"
  private val flexible: Map[String, Map[String, Set[DataType]]] = Map(
    "orders" -> Map("o_orderdate" ->
      Set[DataType](TimestampType, TimestampNTZType, LongType)),
    "lineitem" -> Map("l_shipdate" ->
      Set[DataType](TimestampType, TimestampNTZType, LongType)))

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"$sf: normalized table schemas match the query layer's contract") {
      for ((table, cols) <- expected) {
        val schema = Tables(spark, s"/root/testdata/$sf", table).schema
        for ((name, tpe) <- cols)
          withClue(s"$sf/$table.$name: ") {
            schema.fieldNames should contain(name)
            schema(name).dataType shouldBe tpe
          }
        for ((name, allowed) <- flexible.getOrElse(table, Map.empty))
          withClue(s"$sf/$table.$name (flexible event-time): ") {
            allowed should contain(schema(name).dataType)
          }
      }
    }
  }
}
