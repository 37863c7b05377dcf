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

trait QueryModule {
  def defs: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  final def oracles: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
