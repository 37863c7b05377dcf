package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears in [[queries]],
  * and (when DuckDB can express identical semantics) in [[oracleSql]].
  * Implementations live in graft.queries.* modules. The storage-engine
  * API itself (Put/Get/Find/RemoveBefore over bucket-partitioned
  * parquet) is graft.core.Engine, golden-tested in EngineSpec against
  * the reference's own scenarios; KdbQueries expresses the same
  * operator semantics as oracle-verifiable queries over the driver's
  * events table. Streaming ingest: graft.streaming.StreamingIngest
  * (StreamingIngestSpec). Multimodal binary plumbing:
  * graft.multimodal.Multimodal (MultimodalSpec).
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    KdbQueries,
    LlmQueries,
    StatsQueries,
    TrainingQueries,
    SeriesOpsQueries,
    StreamingTwinQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    // toMap would silently shadow a duplicate name — one operator
    // would become unreachable and unverified with no error
    val dupes = all.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
    require(dupes.isEmpty, s"duplicate query names across modules: ${dupes.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
