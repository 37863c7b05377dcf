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

  /** Keep the k best candidates seen. Buffer is a sorted Seq capped at
    * k — O(k) merge, encodable as an array of structs (no UDT). */
  final case class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)
    private def best(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      // fast path: buffer full and candidate can't displace the floor
      if (b.size == k && {
        val last = b.last
        a.score < last.score || (a.score == last.score && a.id > last.id)
      }) b
      else best(b :+ a)
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = best(b1 ++ b2)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  def topK(k: Int): TypedColumn[Scored, Seq[Scored]] = TopKAgg(k).toColumn
}
