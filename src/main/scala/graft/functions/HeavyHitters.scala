package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch as a typed `Aggregator` — the
  * frequency counterpart of the HLL cardinality path
  * (kdb_approx_distinct): fixed-size state, map-side combine, one
  * shuffle carrying k counters per partition instead of one row per
  * distinct key. The classic guarantee holds: any item with true
  * frequency > N/k is present in a k-capacity summary, and every
  * reported count overestimates by at most the recorded `err`.
  *
  * Merge is the standard summary merge (add counts for shared keys,
  * treating an absent key's count as the other summary's min-count
  * bound carried in `err`), then retake the top k — associative
  * enough for Spark's partial aggregation contract: the heavy-hitter
  * containment guarantee survives any merge order even though exact
  * counter values may differ by merge order (which is why queries
  * gate on a containment property, not on sketch values).
  */
object HeavyHitters {

  /** One counter: estimated count, and max overestimation error. */
  final case class Counter(item: Long, count: Long, err: Long)

  final case class SpaceSavingAgg(k: Int)
      extends Aggregator[Long, Seq[Counter], Seq[Counter]] {
    require(k > 0)

    private def sorted(xs: Seq[Counter]): Seq[Counter] =
      xs.sortBy(c => (-c.count, c.item))

    override def zero: Seq[Counter] = Nil

    // reduce keeps the buffer UNSORTED (sorting per row would cost
    // k·log k per element); merge/finish sort. Eviction picks the min
    // counter deterministically by (count, item).
    override def reduce(b: Seq[Counter], item: Long): Seq[Counter] = {
      val i = b.indexWhere(_.item == item)
      if (i >= 0) b.updated(i, b(i).copy(count = b(i).count + 1))
      else if (b.size < k) b :+ Counter(item, 1L, 0L)
      else {
        // evict the min counter; the newcomer inherits its count as
        // both base and error bound (Space-Saving's replacement rule)
        val mi = b.indices.minBy(j => (b(j).count, b(j).item))
        b.updated(mi, Counter(item, b(mi).count + 1, b(mi).count))
      }
    }

    override def merge(b1: Seq[Counter], b2: Seq[Counter]): Seq[Counter] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      // An item absent from a SATURATED summary has count ≤ that
      // summary's min counter; absent from an unsaturated one (size <
      // k ⇒ nothing was ever evicted) means count 0 exactly — so the
      // fewer-distinct-than-k regime stays exact through any merge.
      val min1 = if (b1.size < k) 0L else b1.map(_.count).min
      val min2 = if (b2.size < k) 0L else b2.map(_.count).min
      val m1 = b1.map(c => c.item -> c).toMap
      val m2 = b2.map(c => c.item -> c).toMap
      val merged = (m1.keySet ++ m2.keySet).toSeq.map { it =>
        (m1.get(it), m2.get(it)) match {
          case (Some(a), Some(b)) => Counter(it, a.count + b.count, a.err + b.err)
          case (Some(a), None)    => Counter(it, a.count + min2, a.err + min2)
          case (None, Some(b))    => Counter(it, b.count + min1, b.err + min1)
          case _                  => throw new IllegalStateException("unreachable")
        }
      }
      sorted(merged).take(k)
    }

    override def finish(r: Seq[Counter]): Seq[Counter] = sorted(r)
    override def bufferEncoder: Encoder[Seq[Counter]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Counter]] = ExpressionEncoder()
  }

  def spaceSaving(k: Int): TypedColumn[Long, Seq[Counter]] =
    SpaceSavingAgg(k).toColumn
}
