package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup finishing step: near-dup PAIRS (from MinHash/SimHash/Jaccard
  * candidates) → duplicate CLUSTERS → one keeper per cluster. Without
  * this, pair lists aren't actionable at scale; with it, dedup is
  * "keep min doc_id per connected component".
  *
  * Connected components via iterative min-label propagation —
  * driver-controlled loop of join+groupBy rounds (each round is one
  * shuffle; rounds ≈ graph diameter, which for near-dup clusters is
  * tiny). Converges when no label changes. Persist each round's
  * labels so lineage doesn't grow unboundedly.
  */
object Dedup {

  /** @param edges (d1, d2) undirected near-dup pairs
    * @return (id, comp) — comp = min doc id reachable; one row per
    *         vertex appearing in any edge */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // Persist the INPUT before symmetrizing: sym is a 2-way union over
    // the edges plan, so without this the (possibly expensive —
    // MinHash-LSH) pair pipeline executes twice just to materialize
    // sym.
    val in = edges.select(col("d1"), col("d2")).persist()
    // localCheckpoint, not persist: persist caches DATA but keeps the
    // logical lineage, so each round's plan contains every previous
    // round — planning cost grows quadratically with iterations (a
    // 20-round run was re-optimizing a plan with tens of thousands of
    // operators). Checkpointing truncates the plan to the materialized
    // RDD: constant-size plans, constant per-round cost. (On a real
    // cluster with failure-tolerance requirements, use reliable
    // checkpoint() to durable storage instead — localCheckpoint trades
    // executor-loss recovery for speed.)
    val sym = in.select(col("d1").as("src"), col("d2").as("dst"))
      .union(in.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint(true)
    // Fused init: comp = min(self, neighbors) — one groupBy does what
    // identity-init plus a full first propagation round (join +
    // aggregate + convergence count) would. Min-label propagation only
    // ever lowers labels toward the component min, so starting lower
    // is always safe.
    var labels = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("comp"))
      .select(col("src").as("id"), col("comp"))
      .localCheckpoint(true)
    // r14: label-state sides are node-sized and checkpointing erased
    // their stats, so every round sort-merged the full edge list. The
    // vertex count is constant across rounds — measure it ONCE and
    // broadcast-hint the state sides only when they fit AND the edge
    // list is big enough for its shuffle to matter (guide §3.1;
    // measured: on the tiny local graph the per-round broadcast
    // builds cost more than the small sort-merges they replace, and
    // at 100 TB the node side does not fit — both gates keep those
    // cases on the planner's join). Min-label math is integer,
    // unchanged.
    val nVerts = labels.count()
    val nEdges = sym.count() // checkpointed: an RDD count, no recompute
    def bc(df: DataFrame): DataFrame = SizedBroadcast.hintVs(df, nVerts, nEdges)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = sym.join(bc(labels), sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      val updated = labels.join(bc(neighborMin),
          labels("id") === neighborMin("nid"), "left_outer")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("ncomp"), labels("comp"))).as("newComp"),
          labels("comp").as("oldComp"))
        .localCheckpoint(true)
      changed = updated.filter(col("newComp") < col("oldComp")).count()
      if (changed == 0) {
        // Converged: labels are already the fixpoint — skip the
        // pointer-jump join and its materialization (at fixpoint the
        // jump is the identity anyway, so this saves the final
        // round's join + checkpoint without changing the result).
        updated.unpersist()
      } else {
        // Pointer jump: follow comp one extra hop (comp values are
        // themselves vertex ids, and comp[comp] ≤ comp). Chains collapse
        // in O(log diameter) rounds instead of O(diameter) — the
        // classic label-propagation accelerator.
        val next0 = updated.select(col("id"), col("newComp").as("comp"))
        val next = next0.as("a")
          .join(bc(next0.select(col("id").as("jid"), col("comp").as("jcomp")).as("b")),
            col("comp") === col("jid"), "left_outer")
          .select(col("id"), coalesce(col("jcomp"), col("comp")).as("comp"))
          .localCheckpoint(true)
        updated.unpersist()
        labels.unpersist()
        labels = next
      }
      iter += 1
    }
    sym.unpersist()
    in.unpersist()
    // Returning silently-unconverged labels would split one duplicate
    // cluster into several "keepers" — fail loudly instead (near-dup
    // clusters have tiny diameters; hitting this means maxIter is
    // genuinely too small for the graph, not a tuning detail).
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          s"($changed labels still changing); raise maxIter")
    // labels stays persisted for the caller's downstream joins; callers
    // running many dedup jobs in one session should unpersist() it.
    labels
  }

  /** Keeper table: per component, the minimum id survives; everything
    * else maps to it. */
  def keepers(components: DataFrame): DataFrame =
    components.select(col("id").as("doc_id"), col("comp").as("keeper_id"))
      .withColumn("is_keeper", (col("doc_id") === col("keeper_id")).cast("int"))
}
