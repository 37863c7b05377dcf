package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Session-compatibility contract for external (driver) sessions.
  *
  * The testdata's events.ts is parquet TIMESTAMP(NANOS) — Spark 4
  * refuses to read that type at all unless
  * spark.sql.legacy.parquet.nanosAsLong is set (fail-loud, not silent
  * truncation). ev()'s TimestampType branch exists for genuinely
  * µs-precision event tables; it must produce results identical to
  * the ns path (the corpus is µs-aligned, and every oracle compares
  * at µs or coarser for exactly this reason). */
class DriverSessionCompatSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("a session without nanosAsLong fails loudly on ns parquet (no silent drift)") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val e = intercept[Exception] {
      alt.read.parquet(s"$sf/events.parquet").schema
    }
    assert(e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
      e.getMessage.contains("Illegal Parquet type"), e.getMessage)
  }

  test("kdb queries over a µs-timestamp events table equal the ns-long results") {
    // make a µs-TimestampType copy of events (what a non-ns source
    // would look like), in a dir shaped like a testdata sf dir
    val dir = Files.createTempDirectory("graft-usevents").toString
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.types.TimestampType
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType === TimestampType)

    for (name <- Seq("kdb_tumbling_window", "kdb_get_gapfill", "kdb_sessionize")) {
      val ns = SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq
      val us = SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
      assert(ns === us, s"$name differs between ns-long and µs-timestamp sources")
    }
  }
}
