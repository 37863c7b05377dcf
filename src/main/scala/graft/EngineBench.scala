package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.queries.KdbQueries.{Day, Hour, T0, T1}

/** Micro-bench of the engine surface itself (put / get / find /
  * removeBefore), the analog of the reference's go-bench harnesses
  * (dbase/dbase_test.go:394-466). Ingests the driver's events table
  * through Engine.put, then times the read surface. Records the
  * BASELINE.md engine rows. */
object EngineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.EngineSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-engine-bench").toString
    // events span 2024-01: 1h resolution, 1d buckets, tags = (type, user)
    val clock = new TestClock(T1)
    val engine = new Engine(spark,
      EngineOptions("bench", dir, indexDepth = 2, payloadSize = 8,
        bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
      clock)

    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("ts"),
        array(col("event_type"), col("user_id").cast("string")).as("tags"),
        // payload: the value as 8-byte big-endian bits (opaque to the engine)
        unhex(lpad(hex(expr("cast(value * 100 as bigint)")), 16, "0")).as("payload"),
        col("event_id").as("seq"))
    val nRows = events.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val (ledger, putSec) = time(engine.put(events))
    val (g, getSec) = time(
      engine.get(T0, T0 + 30 * Day, Seq("click", "7")).collect().length)
    val (f, findSec) = time(
      engine.find(T0, T0 + 30 * Day, Seq("purchase", "")).collect().length)
    // second put of the same batch = pure-superseded rows, then compact
    // one bucket: measures the LWW materialization rewrite and the
    // read-latency payback on a 2x-duplicated bucket
    engine.put(events)
    val bucket = engine.bucketsOnDisk().head
    val ((before, after), compactSec) = time(engine.compactBucket(bucket))
    val (_, getPostSec) = time(
      engine.get(T0, T0 + 30 * Day, Seq("click", "7")).collect().length)
    // continuous aggregate: first refresh folds the whole table (both
    // puts), the read merges partials for every series over the month
    val (nPartials, rollupRefreshSec) = time(engine.refreshRollup(Day))
    val (rRows, rollupReadSec) = time(
      engine.rollup(T0, T0 + 30 * Day, Seq("", ""), Day).collect().length)

    println(s"""{"metric":"engine_bench","rows":$nRows,"ok":${ledger.getOrElse("ok", 0L)},""" +
      s""""put_rows_per_s":${(nRows / putSec).toLong},"put_sec":$putSec,""" +
      s""""get_sec":$getSec,"get_rows":$g,"find_sec":$findSec,"find_rows":$f,""" +
      s""""compact_sec":$compactSec,"compact_rows_before":$before,"compact_rows_after":$after,""" +
      s""""get_post_compact_sec":$getPostSec,""" +
      s""""rollup_refresh_sec":$rollupRefreshSec,"rollup_partials":$nPartials,""" +
      s""""rollup_read_sec":$rollupReadSec,"rollup_rows":$rRows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
