package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are single parquet files under `sfDir`. Reads go through
  * `spark.read.parquet` so Catalyst gets real file-source scans with
  * predicate pushdown / column pruning — verified via `.explain`
  * (`PushedFilters`, `ReadSchema`) in the specs.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Canonical `events.ts` → int64 UTC-epoch nanoseconds.
    *
    * The engine keeps kdb's exact int64 ns math everywhere, but the
    * driver's parquet has shipped `ts` three different ways across
    * rounds: TIMESTAMP(NANOS) (reads as LongType under
    * spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP(MICROS,
    * adjustedToUTC) (TimestampType), and TIMESTAMP(MICROS, ntz) —
    * the current files — which Spark 4 reads as TimestampNTZType.
    * All three carry the same instants; this dispatch erases the
    * physical difference at the source so every downstream plan does
    * identical int64 arithmetic. The NTZ branch is a wall-clock
    * µs-since-epoch difference (timestampdiff over NTZ operands) —
    * deliberately independent of spark.sql.session.timeZone, so a
    * driver session with a non-UTC zone cannot shift results. A bare
    * cast("long") would yield epoch SECONDS — pinned as wrong by
    * DriverSessionCompatSpec.
    */
  def tsNsCol(dt: DataType): Column = dt match {
    case LongType      => col("ts")
    case TimestampType => unix_micros(col("ts")) * lit(1000L)
    case TimestampNTZType =>
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * lit(1000L)
    case other => throw new IllegalStateException(
      s"events.ts has unsupported type $other; expected int64 ns, " +
        "timestamp, or timestamp_ntz")
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")

  /** events with `ts` always int64 ns (see [[tsNsCol]]). */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.withColumn("ts", tsNsCol(df.schema("ts").dataType))
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
