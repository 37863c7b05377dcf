package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Trained IVF index for ANN over an embedding column: k-means coarse
  * centroids (deterministic Lloyd iterations — init is the first k
  * vectors by id, ties in assignment break by centroid id), an
  * inverted file (vector → cell), and cell-probed exact search.
  *
  * Scale shape: training is iters × (one zero-shuffle argmin pass +
  * one partial-agg mean); the inverted file is the partitioning key
  * for the corpus; a query touches nprobe/k of the data. Probing ALL
  * cells degenerates to exact brute force — the property the spec
  * pins (llm_similarity_ivf is the static-quantizer, oracle-verified
  * variant of the same idea).
  *
  * r14 optimization (guide §2.4 — remove shuffles outright): nearest-
  * cell selection used to be a crossJoin(n·k rows, each dragging the
  * full embedding) + a per-vector window rank — TWO shuffles of k
  * copies of every vector just to pick an argmin that is a pure
  * per-row computation. The centroid set rides along as ONE broadcast
  * row holding the (cid, cv) array; `array_sort(struct(dist, cid))`
  * reproduces the window's exact (dist, cid) tie rule, so assignments
  * are bit-identical while the assign pass shuffles NOTHING. */
object Ivf {

  /** Centroids folded to ONE row carrying the whole (cid, cv) array —
    * the broadcast side of every argmin pass. */
  def centArray(centroids: DataFrame): DataFrame =
    centroids.agg(collect_list(struct(col("cid"), col("cv"))).as("__cents"))

  /** (dist, cid)-sorted candidate array for `vec` against the cents
    * array — the shared argmin kernel. Same l2sq inputs and the same
    * (dist, cid) tie order as the old window rank, so element 1 IS
    * the old rn=1 winner and a prefix of length nprobe IS the old
    * rn <= nprobe set. */
  private def rankedCells(vec: Column, cents: Column): Column =
    array_sort(transform(cents, c =>
      struct(l2sq(vec, c.getField("cv")).as("d"), c.getField("cid").as("cid"))))

  /** Nearest cell id per row (ties by cid — the Ivf discipline). */
  def nearestCid(vec: Column, cents: Column): Column =
    element_at(rankedCells(vec, cents), 1).getField("cid")

  /** The nprobe nearest cell ids, nearest first. Prefix-consistent
    * across nprobe values (a sorted-array slice), which is what makes
    * recall monotone in nprobe (annRecallReport's gated invariant). */
  def nearestCids(vec: Column, cents: Column, nprobe: Int): Column =
    transform(slice(rankedCells(vec, cents), 1, nprobe), s => s.getField("cid"))

  /** Deterministic k-means centroids as (cid, cv). `vectors` must
    * have (vec_id LONG, embedding ARRAY<FLOAT|DOUBLE>). The centroid
    * table is collected to the driver after every iteration (k tiny
    * rows) and re-created — without that plan reset, each iteration
    * references the previous centroid PLAN twice and the unexecuted
    * tree (and recompute cost) grows as 2^iters. */
  def train(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    def materialize(df: DataFrame): DataFrame = {
      val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      rows.toSeq.toDF("cid", "cv")
    }
    var cent = materialize(vectors.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cv")))
    for (_ <- 1 to iters) {
      val assigned = assign(vectors, cent)
      // element-wise mean per cell: explode dims → avg → re-assemble
      val recomputed = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(col("cid"), transform(col("dims"), d => d.getField("m")).as("mv"))
      // a cell that attracted no points keeps its previous centroid —
      // otherwise k silently shrinks and probe()/nprobe sizing lies
      cent = materialize(cent.join(recomputed, Seq("cid"), "left_outer")
        .select(col("cid"), coalesce(col("mv"), col("cv")).as("cv")))
    }
    cent
  }

  /** Inverted file: each vector labeled with its nearest cell — one
    * zero-shuffle argmin pass over a 1-row centroid broadcast. */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centArray(centroids)))
      .select(col("vec_id"), col("embedding"),
        nearestCid(col("embedding"), col("__cents")).as("cid"))

  /** Exact top-k cosine over the nprobe nearest cells per query.
    * Takes the PRE-BUILT inverted file (from [[assign]], ideally
    * persisted/stored partitioned by cid) — rebuilding the corpus
    * assignment per probe call would defeat the index: the inverted
    * file is query-independent and amortizes across every probe.
    * Per-query top-k is the k-bounded [[graft.functions.TopK]]
    * aggregator (map-side combine), not a qid window — a query's
    * probed-cell population never funnels through one task.
    * Output: (qid, rk, nid, cos). */
  def probe(inverted: DataFrame, centroids: DataFrame, queries: DataFrame,
            nprobe: Int, topk: Int): DataFrame = {
    val inv = inverted
      .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("cid"))
    val probed = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(centArray(centroids)))
      .select(col("qid"), col("qv"),
        explode(nearestCids(col("qv"), col("__cents"), nprobe)).as("cid"))
    val tk = udaf(graft.functions.TopK.TopKAgg(topk))
    probed.join(inv, Seq("cid")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .groupBy(col("qid")).agg(tk(col("nid"), col("cos")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("rk0", "s")))
      .select(col("qid"), (col("rk0") + 1).as("rk"),
        col("s.id").as("nid"), col("s.score").as("cos"))
  }
}
