package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.functions._
import graft.plans.{CosineSim, DotProduct, FloatsFromPayload, L2Sq}

/** Embedding-vector primitives for similarity search.
  *
  * The hot kernels (dot / cosine / squared-L2) are native Catalyst
  * expressions ([[graft.plans.FloatVecFold]]) — one codegen'd loop per
  * row, no interpreted lambda per element. They produce bit-identical
  * doubles to the higher-order-function composition kept below as
  * `*Hof` (strict left-to-right double fold, same per-step IEEE ops),
  * which remains the oracle-documentation form and the property-test
  * twin (VectorExprsSpec asserts native == HOF on random vectors).
  * DuckDB oracles render the same fold via list_reduce/list_transform.
  */
object VectorFunctions {

  private def ex(c: Column) = GraftSqlShims.expressionOf(c)

  /** Σ a[i]·b[i], double accumulation in index order (native codegen). */
  def dot(a: Column, b: Column): Column =
    GraftSqlShims.column(DotProduct(ex(a), ex(b)))

  /** Cosine similarity (native codegen); callers round before output. */
  def cosine(a: Column, b: Column): Column =
    GraftSqlShims.column(CosineSim(ex(a), ex(b)))

  /** Squared L2 distance (native codegen). */
  def l2sq(a: Column, b: Column): Column =
    GraftSqlShims.column(L2Sq(ex(a), ex(b)))

  /** Big-endian float32 payload bytes → ARRAY<FLOAT> (native codegen;
    * the engine's vector-payload typed view — see
    * [[graft.plans.FloatsFromPayload]]). */
  def floatsFromPayload(c: Column): Column =
    GraftSqlShims.column(FloatsFromPayload(ex(c)))

  /** Σ a[i]², double accumulation in index order. Cold path (used once
    * per row side in normalization prep, not in pairwise loops). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  // ---- higher-order-function twins (spec reference semantics) ----

  /** HOF rendering of dot — the executable spec of the fold order. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** HOF rendering of cosine. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** HOF rendering of l2sq. */
  def l2sqHof(a: Column, b: Column): Column =
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
