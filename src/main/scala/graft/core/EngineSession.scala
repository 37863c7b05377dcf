package graft.core

import org.apache.spark.sql.SparkSession

/** The blessed SparkSession configuration for the engine — one place
  * for the settings every entry point (Verify, Bench, tests, user
  * code) must agree on, with the scale rationale attached:
  *
  *  - nanosAsLong: parquet ns timestamps stay int64 (kdb's exact ns
  *    math; TimestampType would truncate to µs).
  *  - AQE on: runtime partition coalescing + skew-join splitting —
  *    the production answer to stragglers this engine relies on
  *    instead of hand-tuned partition counts.
  *  - shuffle.partitions sized to cores locally; on a real cluster
  *    leave AQE's coalescing to shrink from a deliberately-high
  *    initial number.
  *  - UTC session timezone: no silent local-zone drift in date math.
  *  - GraftExtensions: native function surface (fnv64,
  *    double_from_payload).
  */
object EngineSession {

  /** Apply engine settings to an existing builder (does not set
    * master — the caller owns deployment). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")

  /** Local session for tools and tests. */
  def local(cores: Int, extra: Map[String, String] = Map.empty): SparkSession = {
    val b = configure(SparkSession.builder(), shufflePartitions = cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }
}
