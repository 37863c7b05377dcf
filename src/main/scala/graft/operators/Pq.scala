package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape: training is iters × (one zero-shuffle argmin pass +
  * one partial-agg mean) over (vec_id, sub) subvector rows with only
  * m·k tiny centroid rows ever collected (the same documented
  * plan-reset contract as [[Ivf.train]]); encode is ONE narrow pass
  * (codes computed per row against a 1-row codebook broadcast — no
  * explode, no shuffle); search broadcasts the distance table and
  * partial-aggregates ADC sums map-side, with the per-query top-k
  * kept by the k-bounded [[graft.functions.TopK]] aggregator instead
  * of a qid-partitioned window (whose single task would absorb a
  * query's whole candidate set at 100 TB). Determinism: init =
  * subvectors of the first k vectors by vec_id, assignment ties
  * break by code id — same discipline as Ivf.
  *
  * r14 optimization (guide §2.4 — remove shuffles outright): nearest-
  * code selection used to be a books broadcast-join (m·k rows touched
  * per vector) + a per-(vec, sub) window rank — a full shuffle+sort of
  * n·m rows per Lloyd iteration and per encode, just to pick an argmin
  * that is a pure per-row computation. The codebooks ride along as ONE
  * broadcast row holding the per-sub entries array; `array_sort(
  * struct(dist, cid))` reproduces the window's exact (dist, cid) tie
  * rule, so codes are bit-identical while the assign pass shuffles
  * NOTHING.
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

  /** Codebooks folded to ONE row carrying, per sub (ascending), that
    * sub's (cid, cv) entries — the broadcast side of every argmin
    * pass. Column: `__books` ARRAY<STRUCT<sub, entries ARRAY<STRUCT<
    * cid, cv>>>> sorted by sub. */
  def bookArray(books: DataFrame): DataFrame =
    books.groupBy(col("sub"))
      .agg(collect_list(struct(col("cid"), col("cv"))).as("entries"))
      .agg(array_sort(collect_list(struct(col("sub"), col("entries")))).as("__books"))

  /** Nearest entry (by the (dist, cid) tie rule) of `entries` to
    * `sv`: the shared argmin kernel — same l2sq inputs and the same
    * tie order as the old window rank, so the winner is bit-identical. */
  def argminCid(sv: Column, entries: Column): Column =
    element_at(array_sort(transform(entries, e =>
      struct(l2sq(sv, e.getField("cv")).as("d"), e.getField("cid").as("cid")))), 1)
      .getField("cid")

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

  /** Nearest codebook entry per (vec_id, sub) — one zero-shuffle
    * argmin pass over a 1-row codebook broadcast; the per-row `sub`
    * selects its entries from the array (filter, not position: robust
    * to any sub numbering). */
  private def assignSubs(subs: DataFrame, books: DataFrame): DataFrame =
    subs.crossJoin(broadcast(bookArray(books)))
      .select(col("vec_id"), col("sub"),
        argminCid(col("sv"),
          element_at(filter(col("__books"), b => b.getField("sub") === col("sub")), 1)
            .getField("entries")).as("cid"),
        col("sv"))

  /** Encode every vector to its m codes: (vec_id, codes ARRAY<BIGINT>,
    * ordered by sub). This is the stored representation — m bytes per
    * row at k ≤ 256. ONE narrow pass: no explode, no shuffle — each
    * row computes its m argmins against the broadcast codebook array.
    * The `transform(array(slice(…)), sv => …)` wrapper binds the
    * subvector to a lambda variable so the O(sd) slice is evaluated
    * once per (row, sub), not once per codebook entry (CollapseProject
    * would inline a plain alias into the inner lambda k times). */
  def encode(vectors: DataFrame, books: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    vectors.crossJoin(broadcast(bookArray(books)))
      .select(col("vec_id"),
        transform(col("__books"), b =>
          element_at(
            transform(
              array(slice(col("embedding").cast("array<double>"),
                b.getField("sub") * sd + 1, lit(sd))),
              sv => argminCid(sv, b.getField("entries"))),
            1)).as("codes"))
  }

  /** ADC top-k: exact queries against the encoded corpus.
    * Output (qid, rk, nid, adc) — adc is the approximate squared L2.
    * The distance table (|q|·m·k rows) broadcasts; corpus codes
    * explode to (nid, sub, code) and partial-aggregate their m
    * lookups map-side. Per-query top-k is the k-bounded TopK
    * aggregator on NEGATED adc (negation is IEEE-exact, so desc by
    * -adc IS asc by adc and the stored value round-trips bit-for-bit),
    * ties by nid — the old window's exact (adc, nid) rule. */
  def search(encoded: DataFrame, books: DataFrame, queries: DataFrame,
             m: Int, dim: Int, topk: Int): DataFrame = {
    val table = subRows(queries.select(col("vec_id"), col("embedding")), m, dim)
      .withColumnRenamed("vec_id", "qid")
      .join(books, Seq("sub"))
      .select(col("qid"), col("sub"), col("cid"), l2sq(col("sv"), col("cv")).as("dsq"))
    val codes = encoded.select(col("vec_id").as("nid"),
        posexplode(col("codes")).as(Seq("sub", "cid")))
      .select(col("nid"), col("sub").cast("int").as("sub"), col("cid"))
    val tk = udaf(graft.functions.TopK.TopKAgg(topk))
    codes.join(broadcast(table), Seq("sub", "cid"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("dsq")).as("adc"))
      .groupBy(col("qid")).agg(tk(col("nid"), -col("adc")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk0", "s")))
      .select(col("qid"), (col("rk0") + 1).as("rk"),
        col("s.id").as("nid"), (-col("s.score")).as("adc"))
  }
}
