package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct-value sketch — the third sketch
  * family next to HLL (cardinality, kdb_approx_distinct) and
  * Space-Saving (frequency, kdb_heavy_hitters). What KMV adds over
  * HLL is SET ALGEBRA: two summaries combine into union and
  * intersection estimates (audience overlap), which HLL registers
  * cannot do directly.
  *
  * The summary is the k smallest distinct 64-bit hashes of the
  * inputs, kept sorted. With hashes uniform on [0, 2^63) (the caller
  * hashes; see LlmQueries.hash60-style md5 prefixes), the classic
  * estimator applies: n̂ = (k−1) / x_(k) where x_(k) is the kth
  * smallest hash normalized to (0,1). Under k distinct inputs the
  * summary IS the distinct set — exact counts, no estimation.
  * Everything here is deterministic in the input set: same data →
  * same summary → same estimates, so estimate-quality flags are
  * stable gate material.
  */
object Kmv {

  /** Normalization base: hashes are taken mod 2^63 (non-negative). */
  val HashSpace: Double = java.lang.Math.pow(2.0, 63)

  final case class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0)

    override def zero: Seq[Long] = Nil

    override def reduce(b: Seq[Long], raw: Long): Seq[Long] = {
      val h = raw & Long.MaxValue // into [0, 2^63)
      if (b.size == k && h >= b.last) b
      else if (b.contains(h)) b // distinct values only
      else ((b :+ h).sorted).take(k)
    }

    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      (b1 ++ b2).distinct.sorted.take(k)

    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  def kmv(k: Int): TypedColumn[Long, Seq[Long]] = KmvAgg(k).toColumn

  /** Distinct-count estimate from a summary built with capacity k.
    * Exact when the summary holds fewer than k hashes (nothing was
    * ever discarded). */
  def estimate(summary: Seq[Long], k: Int): Double =
    if (summary.size < k) summary.size.toDouble
    else (k - 1).toDouble / (summary.last.toDouble / HashSpace)

  /** Union and intersection estimates from two same-k summaries.
    * The merged k smallest hashes are a valid KMV summary of A∪B;
    * the Jaccard estimate is the fraction of those that appear in
    * both input summaries (standard KMV set algebra). Returns
    * (unionEst, intersectionEst). */
  def setEstimates(a: Seq[Long], b: Seq[Long], k: Int): (Double, Double) = {
    val merged = (a ++ b).distinct.sorted.take(k)
    val unionEst = estimate(merged, k)
    val aSet = a.toSet
    val bSet = b.toSet
    val inBoth = merged.count(h => aSet.contains(h) && bSet.contains(h))
    val jaccard = if (merged.isEmpty) 0.0 else inBoth.toDouble / merged.size
    (unionEst, jaccard * unionEst)
  }
}
