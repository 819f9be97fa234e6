package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for the similarity-search operators
  * (north-star components — BASELINE.json: ANN over the `embeddings`
  * table's `list<float>` column).
  *
  * The dot product is a native Catalyst expression
  * ([[graft.funcs.DotProduct]], codegen'd tight loop); everything
  * accumulates left-to-right in double precision, which the DuckDB
  * oracle reproduces bit-for-bit.
  */
object VectorOps {

  /** Double-precision dot product of two float-array columns (native
    * expression; [[foldDot]] is the built-ins-only reference semantics).
    */
  def dot(a: Column, b: Column): Column = graft.funcs.DotProduct(a, b)

  /** The same fold out of built-in higher-order functions — kept as the
    * executable specification for [[dot]] (HOFs are CodegenFallback, so
    * the native expression is the hot-path form).
    */
  def foldDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-LSH bucket id from `nBits` hyperplane tests. Plane k compares
    * dim k+1 against dim k+33 (a fixed sparse random-projection); strict
    * float comparison is exactly reproducible across engines, unlike a
    * subtract-then-sign in mixed precision. Bucketing turns ANN from an
    * all-pairs join into a per-bucket join — the scale path.
    */
  def signBucket(e: Column, nBits: Int): Column =
    (0 until nBits).map { k =>
      when(element_at(e, k + 1) > element_at(e, k + 33), lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)
}
