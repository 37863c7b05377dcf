package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` — the one genuinely custom
  * aggregate the engine needs (SURVEY.md §7.2). A window + row_number
  * top-k sorts EVERY row of a group through one reducer; this keeps a
  * k-bounded buffer that combines map-side, so the shuffle carries at
  * most k rows per partition per key instead of the whole group — the
  * difference between feasible and not at 100 TB fan-in (e.g. top-k
  * neighbors per query across a sharded ANN scan).
  */
object TopK {

  /** One scored candidate. Ordering: score desc, id asc (total). */
  final case class Scored(id: Long, score: Double)

  /** Spark SQL's double comparison (Utils.nanSafeCompareDoubles):
    * NaN equals NaN and sorts greatest, and -0.0 == 0.0 — NOT
    * java.lang.Double.compare, which puts -0.0 strictly below 0.0.
    * Every aggregator here replaces a `row_number() OVER (ORDER BY
    * score …)` window, so the comparator must be the one the window
    * would have used or a ±0.0/NaN tie reorders the result set. */
  private def cmpD(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || x == y) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1
    else -1
  }

  /** Keep the k best candidates seen. Buffer is a sorted Seq capped at
    * k — O(k) merge, encodable as an array of structs (no UDT). */
  final case class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)
    private def cmp(a: Scored, b: Scored): Int = {
      val s = cmpD(b.score, a.score) // desc
      if (s != 0) s else java.lang.Long.compare(a.id, b.id)
    }
    private val ord: Ordering[Scored] = (a, b) => cmp(a, b)
    private def best(xs: Seq[Scored]): Seq[Scored] = xs.sorted(ord).take(k)
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      // fast path: buffer full and candidate can't displace the floor
      if (b.size == k && cmp(a, b.last) >= 0) b
      else best(b :+ a)
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = best(b1 ++ b2)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  def topK(k: Int): TypedColumn[Scored, Seq[Scored]] = TopKAgg(k).toColumn

  /** One ANN candidate with the probe paths' FULL tie key: score,
    * then the engine key columns (tags…, slot). `cid` rides along as
    * an UN-COMPARED payload (the ADC shortlist needs the winning
    * cell id for its exact-vector fetch prune); the (score, tags,
    * slot) key is already total — (tags, slot) is the engine's
    * unique row key — so cid never influences membership or order. */
  final case class TaggedCand(score: Double, tags: Seq[String], slot: Long, cid: Long)

  /** Total order matching Spark SQL's sort semantics exactly — the
    * bit-compatibility contract that lets the k-bounded aggregator
    * replace a `row_number() OVER (ORDER BY score [DESC], tags…,
    * slot)` window without moving a single result row:
    *  - doubles via nanSafeCompareDoubles ([[cmpD]]: NaN largest,
    *    -0.0 == 0.0 — what Catalyst's comparator does; NOT
    *    java.lang.Double.compare, which splits the zeros),
    *  - strings bytewise over UTF-8 (UTF8String.binaryCompare —
    *    Spark's string order is unsigned byte order, NOT Java's
    *    UTF-16 compareTo, which diverges on supplementary planes),
    *  - arrays elementwise, shorter prefix first (tag arity is fixed
    *    per engine, so the length rule never actually fires). */
  private def cmpTagged(asc: Boolean)(a: TaggedCand, b: TaggedCand): Int = {
    val s = if (asc) cmpD(a.score, b.score) else cmpD(b.score, a.score)
    if (s != 0) return s
    val n = math.min(a.tags.length, b.tags.length)
    var i = 0
    while (i < n) {
      val x = a.tags(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.tags(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val m = math.min(x.length, y.length)
      var j = 0
      while (j < m) {
        val c = (x(j) & 0xff) - (y(j) & 0xff)
        if (c != 0) return c
        j += 1
      }
      if (x.length != y.length) return x.length - y.length
      i += 1
    }
    if (a.tags.length != b.tags.length) return a.tags.length - b.tags.length
    java.lang.Long.compare(a.slot, b.slot)
  }

  /** Keep the k best (score asc|desc, tags, slot) candidates seen —
    * the ANN probes' per-query top-k WITHOUT the qid-partitioned
    * window (whose single task absorbs a query's entire probed-cell
    * population at 100 TB). Buffer bounded at k, combines map-side;
    * the shuffle carries at most k rows per query per partition.
    * Register with functions.udaf for DataFrame use. */
  final case class TopTaggedAgg(k: Int, asc: Boolean)
      extends Aggregator[TaggedCand, Seq[TaggedCand], Seq[TaggedCand]] {
    require(k > 0)
    private val ord: Ordering[TaggedCand] = (a, b) => cmpTagged(asc)(a, b)
    private def best(xs: Seq[TaggedCand]): Seq[TaggedCand] = xs.sorted(ord).take(k)
    override def zero: Seq[TaggedCand] = Nil
    override def reduce(b: Seq[TaggedCand], a: TaggedCand): Seq[TaggedCand] =
      // fast path: buffer full and candidate can't displace the floor
      if (b.size == k && cmpTagged(asc)(a, b.last) >= 0) b
      else best(b :+ a)
    override def merge(b1: Seq[TaggedCand], b2: Seq[TaggedCand]): Seq[TaggedCand] =
      best(b1 ++ b2)
    override def finish(r: Seq[TaggedCand]): Seq[TaggedCand] = r
    override def bufferEncoder: Encoder[Seq[TaggedCand]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[TaggedCand]] = ExpressionEncoder()
  }
}
