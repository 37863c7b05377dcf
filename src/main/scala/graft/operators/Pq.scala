package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Product quantization (PQ) for ANN over an embedding column: the
  * vector space is split into `m` subspaces, each with its own
  * k-means codebook; a vector is stored as m small codes (one byte
  * each at k ≤ 256) instead of dim floats — a 64-dim float corpus
  * compresses 32× (256 B → 8 B per row), which is what makes a
  * 100 TB embedding sweep memory-feasible. Queries stay exact:
  * asymmetric distance computation (ADC) builds a per-query
  * (sub, code) → squared-distance table against the codebooks and
  * scores a corpus row by summing m table lookups — no corpus
  * vector is ever touched at search time.
  *
  * Scale shape: training is iters × (one broadcast pass + one
  * groupBy) over (vec_id, sub) subvector rows with only m·k tiny
  * centroid rows ever collected (the same documented plan-reset
  * contract as [[Ivf.train]]); encode is a broadcast join + one
  * (vec_id)-group collect of m codes; search broadcasts the
  * |q|·m·k distance table and partial-aggregates ADC sums map-side,
  * so the only shuffle carries (qid × corpus) partial sums, never
  * vectors. Determinism: init = subvectors of the first k vectors
  * by vec_id, assignment ties break by code id — same discipline as
  * Ivf.
  */
object Pq {

  /** Subvector rows (vec_id, sub, sv): sub ∈ [0, m), sv = the
    * sub-slice of the embedding as array<double>. `dim` must divide
    * evenly by m (the caller picks m that way). */
  private def subRows(vectors: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    vectors.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("embedding").cast("array<double>").as("ev"))
      .select(col("vec_id"), col("sub"),
        slice(col("ev"), col("sub") * sd + 1, lit(sd)).as("sv"))
  }

  /** Per-subspace deterministic k-means codebooks as (sub, cid, cv).
    * All m subspaces train in the SAME passes (grouped by (sub, cid)),
    * so the iteration cost is m-independent. */
  def train(vectors: DataFrame, m: Int, dim: Int, k: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val subs = subRows(vectors, m, dim)
    def materialize(df: DataFrame): DataFrame = {
      val rows = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      rows.toSeq.toDF("sub", "cid", "cv")
    }
    // init: the first k vectors BY ID ORDER seed every subspace —
    // order-based (not `vec_id < k`) so sparse or surrogate id spaces
    // (the Engine's hashed keys) still seed exactly k entries; for
    // dense 0..n ids (the embeddings table) the two selections are
    // identical, so existing consumers' codebooks are unchanged
    val initIds = vectors.select(col("vec_id")).orderBy(col("vec_id")).limit(k)
    var books = materialize(subs
      .join(broadcast(initIds), Seq("vec_id"))
      .select(col("sub").cast("int").as("sub"), col("vec_id").as("cid"), col("sv").as("cv")))
    for (_ <- 1 to iters) {
      val assigned = assignSubs(subs, books)
      val recomputed = assigned
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(avg(col("v")).as("mdim"))
        .groupBy(col("sub"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mdim")))).as("dims"))
        .select(col("sub"), col("cid"),
          transform(col("dims"), d => d.getField("mdim")).as("mv"))
      // an empty cell keeps its previous centroid (Ivf.train contract)
      books = materialize(books.join(recomputed, Seq("sub", "cid"), "left_outer")
        .select(col("sub"), col("cid"), coalesce(col("mv"), col("cv")).as("cv")))
    }
    books
  }

  /** Nearest codebook entry per (vec_id, sub). */
  private def assignSubs(subs: DataFrame, books: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("dist"), col("cid"))
    subs.join(broadcast(books), Seq("sub"))
      .withColumn("dist", l2sq(col("sv"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("cid"), col("sv"))
  }

  /** Encode every vector to its m codes: (vec_id, codes ARRAY<BIGINT>,
    * ordered by sub). This is the stored representation — m bytes per
    * row at k ≤ 256. */
  def encode(vectors: DataFrame, books: DataFrame, m: Int, dim: Int): DataFrame =
    assignSubs(subRows(vectors, m, dim), books)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("sc"))
      .select(col("vec_id"),
        transform(col("sc"), s => s.getField("cid")).as("codes"))

  /** ADC top-k: exact queries against the encoded corpus.
    * Output (qid, rk, nid, adc) — adc is the approximate squared L2.
    * The distance table (|q|·m·k rows) broadcasts; corpus codes
    * explode to (nid, sub, code) and partial-aggregate their m
    * lookups map-side. */
  def search(encoded: DataFrame, books: DataFrame, queries: DataFrame,
             m: Int, dim: Int, topk: Int): DataFrame = {
    val table = subRows(queries.select(col("vec_id"), col("embedding")), m, dim)
      .withColumnRenamed("vec_id", "qid")
      .join(books, Seq("sub"))
      .select(col("qid"), col("sub"), col("cid"), l2sq(col("sv"), col("cv")).as("dsq"))
    val codes = encoded.select(col("vec_id").as("nid"),
        posexplode(col("codes")).as(Seq("sub", "cid")))
      .select(col("nid"), col("sub").cast("int").as("sub"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
    codes.join(broadcast(table), Seq("sub", "cid"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("dsq")).as("adc"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= topk)
      .select(col("qid"), col("rk"), col("nid"), col("adc"))
  }
}
