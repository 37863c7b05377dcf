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
private[graft] object SharedExprs {
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

  /** Deterministic 128-bit → double conversion, bit-identical across
    * engines up to |x| < 2⁹⁵. A plain cast diverges past 2⁶⁴: DuckDB
    * converts HUGEINT as `(double)upper·2⁶⁴ + (double)lower` (two
    * roundings) while Spark's Decimal→double is a single correctly-
    * rounded conversion — a 1-ulp split exactly in the regime the
    * 128-bit widening exists for. The fix is to take the conversion
    * OUT of engine cast code: split the integer at 2³² (both halves
    * < 2⁵³ ⇒ each converts exactly) and reconstruct with the SAME two
    * IEEE ops (one multiply-round, one add-round) on both sides. Not
    * correctly rounded past 2⁸⁵ — deterministic, which is what the
    * cross-engine gate needs.
    *
    * DETERMINISM CEILING — |x| < 2⁹⁵ (~4·10²⁸), NOT any magnitude:
    * the high half h = x div 2³² must itself convert identically in
    * both engines, which holds while |h| < 2⁶³ (DuckDB then converts
    * a plain BIGINT — one rounding, same as Spark). Past 2⁹⁵, h is
    * again a HUGEINT and DuckDB's own two-rounding hugeint→double
    * cast of h can re-diverge from Spark's correctly-rounded decimal
    * cast. Every consumer's documented headroom (≤ ~10²⁸ at 100×) is
    * safely inside the ceiling; a value beyond it needs a second
    * split level, not this helper. `%` follows the dividend's sign in
    * both engines, so the split is exact for negative cross-moments
    * too. */
  def hugeToDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    val m = c % lit(4294967296L)
    ((c - m) / lit(4294967296L)).cast("decimal(38,0)").cast("double") *
      lit(4294967296.0) + m.cast("double")
  }

  /** DuckDB rendering of [[hugeToDouble]] — same split, same two IEEE
    * ops. `//` is DuckDB's integer division (exact on HUGEINT); the
    * operand expression is referenced three times, so pass a COLUMN
    * NAME (or cheap expression), not an aggregate. */
  def hugeToDoubleDuck(e: String): String =
    s"(CAST((($e) - ($e) % 4294967296) // 4294967296 AS DOUBLE) " +
      s"* CAST(4294967296 AS DOUBLE) + CAST(($e) % 4294967296 AS DOUBLE))"
}

trait QueryModule {
  def defs: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  final def oracles: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
