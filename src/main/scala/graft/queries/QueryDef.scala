package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (usually) an
  * equivalent ANSI SQL oracle the driver runs in DuckDB over the same
  * parquet tables. `oracle = None` ⇒ the driver records a weaker
  * rows-only check (used for ops DuckDB can't express identically).
  *
  * Determinism rules every def follows (driver hash-compares values):
  *   - output ends with a total ORDER BY (no ties);
  *   - float aggregates rounded (sums→2dp, ratios/avgs→4dp) in BOTH
  *     engines so double summation-order noise can't flip the hash;
  *   - no raw TIMESTAMP outputs (tz metadata differs between Spark
  *     parquet and DuckDB) — cast to DATE / epoch BIGINT / STRING.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Expressions shared verbatim across operators so they cannot
  * de-synchronize: a tweak to one consumer's copy would silently split
  * semantics between the operator family and its oracles. */
private[queries] object SharedExprs {
  /** Exact-integer document quality score (distinct-token-percentage
    * · 1000, length tie-break capped at 999): lexical diversity
    * dominates, every term is integer arithmetic so argmax/argmin and
    * moment sums are branch-safe. Consumed by llm_preference_pairs
    * (pair construction) and llm_grpo_advantage (rollout reward).
    * Integer div (`div`//`//`), never `/` (Spark's / on ints is
    * double division). */
  val qualityScoreSpark: String =
    "(size(array_distinct(split(text, ' '))) * 100)" +
      " div size(split(text, ' ')) * 1000 + least(n_chars, 999L)"

  /** DuckDB rendering of [[qualityScoreSpark]]. */
  val qualityScoreDuck: String =
    "(len(list_distinct(string_split(text, ' '))) * 100) " +
      "// len(string_split(text, ' ')) * 1000 + least(n_chars, 999)"
}

trait QueryModule {
  def defs: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  final def oracles: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
