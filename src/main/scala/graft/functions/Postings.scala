package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded posting-list aggregation for the decontamination join
  * (SURVEY.md: llm_decontaminate). The inverted shingle index keeps
  * only shingles with document frequency ≤ dfCap, but a naive
  * `collect_list` materializes EVERY posting list — including a
  * stopword-like shingle's millions of doc_ids — in one aggregation
  * buffer before the df filter throws it away. At 100 TB that is an
  * OOM, not a slowdown. This Aggregator carries the exact df count
  * alongside posting lists capped at dfCap+1 entries each, so a
  * mega-df shingle costs O(dfCap) memory and is dropped by the same
  * `df <= dfCap` filter with its (truncated, never-read) lists.
  * Lists are EXACT whenever df ≤ dfCap — the only rows that survive —
  * so downstream results are identical to the unbounded version.
  * Same k-bounded mergeable-buffer pattern as [[TopK]]; the buffer
  * combines map-side, so the shuffle also carries at most dfCap+1
  * ids per side per shingle per partition.
  */
object Postings {

  /** One posting: a doc_id and which side of the train/eval split
    * it belongs to. */
  final case class PostIn(doc_id: Long, is_eval: Boolean)

  /** Exact df + per-side posting lists (each capped at dfCap+1). */
  final case class PostLists(df: Long, trains: Seq[Long], evals: Seq[Long])

  final case class BoundedPostings(dfCap: Int)
      extends Aggregator[PostIn, PostLists, PostLists] {
    require(dfCap > 0)
    private val keep = dfCap + 1
    override def zero: PostLists = PostLists(0L, Vector.empty, Vector.empty)
    override def reduce(b: PostLists, a: PostIn): PostLists =
      if (a.is_eval)
        PostLists(b.df + 1, b.trains,
          if (b.evals.size < keep) b.evals :+ a.doc_id else b.evals)
      else
        PostLists(b.df + 1,
          if (b.trains.size < keep) b.trains :+ a.doc_id else b.trains,
          b.evals)
    override def merge(b1: PostLists, b2: PostLists): PostLists =
      PostLists(b1.df + b2.df,
        (b1.trains ++ b2.trains).take(keep),
        (b1.evals ++ b2.evals).take(keep))
    override def finish(r: PostLists): PostLists = r
    override def bufferEncoder: Encoder[PostLists] = ExpressionEncoder()
    override def outputEncoder: Encoder[PostLists] = ExpressionEncoder()
  }
}
