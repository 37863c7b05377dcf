package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Session/source-compatibility contract for the events table.
  *
  * The driver's parquet has shipped `ts` three ways across rounds:
  * TIMESTAMP(NANOS) (LongType under nanosAsLong), TIMESTAMP(MICROS,
  * adjustedToUTC) (TimestampType), and — the current files —
  * TIMESTAMP(MICROS, ntz) (TimestampNTZType). Tables.tsNsCol erases
  * the physical difference into int64 UTC-epoch ns; these tests pin
  * that all three encodings of the same instants produce identical
  * query results, that the NTZ path is session-timezone-independent,
  * and that the tempting bare cast("long") (epoch SECONDS) stays
  * recognisably wrong rather than silently drifting in. */
class DriverSessionCompatSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** testdata events re-encoded with ts as the given expression, in a
    * dir shaped like a testdata sf dir. */
  private def reencoded(tsCol: org.apache.spark.sql.Column): String = {
    val dir = Files.createTempDirectory("graft-events-alt").toString
    graft.sources.Tables.events(spark, sf) // ts already int64 ns
      .withColumn("ts", tsCol)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ntz, µs-timestamp, and ns-long events sources give identical results") {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    assert(spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
      === TimestampNTZType) // what the driver currently ships

    val usDir = reencoded(timestamp_micros(expr("ts div 1000"))) // TimestampType
    val nsDir = reencoded(col("ts")) // LongType int64 ns
    assert(spark.read.parquet(s"$usDir/events.parquet").schema("ts").dataType === TimestampType)
    assert(spark.read.parquet(s"$nsDir/events.parquet").schema("ts").dataType === LongType)

    for (name <- Seq("kdb_tumbling_window", "kdb_get_gapfill", "kdb_sessionize")) {
      val ntz = SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
      val us = SparkEntry.queries(name)(spark, usDir).collect().map(_.toSeq).toSeq
      val ns = SparkEntry.queries(name)(spark, nsDir).collect().map(_.toSeq).toSeq
      assert(ntz === us, s"$name differs between ntz and µs-timestamp sources")
      assert(ntz === ns, s"$name differs between ntz and ns-long sources")
    }
  }

  test("the ntz→ns conversion does not depend on the session timezone") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.session.timeZone", "America/New_York")
    val here = graft.sources.Tables.events(spark, sf)
      .agg(min(col("ts")), max(col("ts"))).collect()(0).toSeq
    val there = graft.sources.Tables.events(alt, sf)
      .agg(min(col("ts")), max(col("ts"))).collect()(0).toSeq
    assert(here === there,
      s"ntz→ns drifted under a non-UTC session: $here vs $there")
  }

  test("a bare cast(ts as long) on ntz parquet fails at analysis — loud, not drift") {
    // Spark 4 refuses TIMESTAMP_NTZ → BIGINT outright
    // (DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION), so the tempting
    // shortcut cannot silently produce epoch-seconds; the only path
    // to int64 is the deliberate Tables.tsNsCol dispatch.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.parquet(s"$sf/events.parquet")
        .select(col("ts").cast("long").as("s")).collect()
    }
    assert(e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
    val ns = graft.sources.Tables.events(spark, sf)
      .agg(max(col("ts"))).collect()(0).getLong(0)
    assert(ns > 1000000000000000000L, s"normalized ts not ns-scale: $ns")
  }
}
