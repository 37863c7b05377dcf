package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for similarity search, composed from
  * codegen'd built-ins (`zip_with`/`aggregate`) — no UDFs, stays in
  * WholeStageCodegen. Floats are cast to double *before* any
  * arithmetic and folded strictly left-to-right, so the DuckDB oracle
  * (list_reduce over list_transform with explicit CASTs) produces
  * bit-identical doubles.
  */
object VectorFunctions {

  /** Σ a[i]·b[i], double accumulation in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ a[i]², double accumulation in index order. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** Cosine similarity; callers round before output (oracle parity). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Squared L2 distance, double accumulation in index order (strict
    * left fold — bit-identical to the DuckDB oracle rendering). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Sign-bit LSH bucket over the first `nBits` dimensions: bucket id
    * = Σ 2^i · [a[i] > 0]. A deterministic, data-independent random-
    * hyperplane surrogate (axis-aligned planes) — the 100 TB scale
    * path buckets candidates before any pairwise work. */
  def signBucket(a: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(a, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
