package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core._

/** The InferBucketPruning optimizer rule: a user query constraining
  * only slot_ns must still partition-prune on bucket_ts. */
class InferBucketPruningSpec extends SparkTestBase {

  private val tag4 = Seq("a", "b", "c", "d")
  private def pld(b: Byte): Array[Byte] = Array[Byte](b, b, b, b)

  test("slot_ns-only filter gains bucket_ts partition pruning; results unchanged") {
    val dir = Files.createTempDirectory("graft-ibp").toString
    val clock = new TestClock(11999L)
    val opts = EngineOptions(
      databaseName = "ibp", dataDir = dir,
      indexDepth = 4, payloadSize = 4,
      bucketDuration = 1000L, resolution = 10L)
    val e = new Engine(spark, opts, clock)
    // three buckets' worth of data (9000, 10000, 11000)
    e.put(Seq(
      Point(9500L, tag4, pld(1)),
      Point(10500L, tag4, pld(2)),
      Point(11500L, tag4, pld(3))))

    val conf = spark.conf
    val old = conf.getOption("spark.graft.bucket.duration.ns")
    conf.set("spark.graft.bucket.duration.ns", opts.bucketDuration.toString)
    try {
      // user-style read: slot range only, no bucket_ts predicate
      val df = spark.read.parquet(s"$dir/ibp")
        .filter(col("slot_ns") >= 10200L && col("slot_ns") < 11600L)
      val rows = df.collect()
      assert(rows.map(_.getAs[Array[Byte]]("payload").toSeq).toSet ===
        Set(pld(2).toSeq, pld(3).toSeq))
      val plan = df.queryExecution.executedPlan.toString
      val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(scanLine.contains("bucket_ts"),
        s"expected derived bucket_ts partition filter, got: $scanLine")
      // derived bounds: bucket_ts >= 10000 and <= 11000
      assert(scanLine.contains("10000") && scanLine.contains("11000"), scanLine)

      // exact-slot equality derives an exact bucket
      val eq = spark.read.parquet(s"$dir/ibp").filter(col("slot_ns") === 10500L)
      assert(eq.count() === 1L)
      val eqLine = eq.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(eqLine.contains("bucket_ts") && eqLine.contains("10000"), eqLine)
    } finally {
      old match {
        case Some(v) => conf.set("spark.graft.bucket.duration.ns", v)
        case None    => conf.unset("spark.graft.bucket.duration.ns")
      }
    }
  }

  test("ns-scale epochs (LongType partition values) derive pruning bounds too") {
    val Day = 24L * 3600 * 1000000000L
    val Hour = 3600L * 1000000000L
    val T0 = 1704067200000000000L // 2024-01-01 ns — discovers as LongType
    val dir = Files.createTempDirectory("graft-ibp-ns").toString
    val clock = new TestClock(T0 + 3 * Day)
    val opts = EngineOptions(
      databaseName = "ibpns", dataDir = dir,
      indexDepth = 4, payloadSize = 4,
      bucketDuration = Day, resolution = Hour, maxHotBuckets = 10)
    val e = new Engine(spark, opts, clock)
    e.put(Seq(
      Point(T0 + 5 * Hour, tag4, pld(1)),
      Point(T0 + Day + 5 * Hour, tag4, pld(2)),
      Point(T0 + 2 * Day + 5 * Hour, tag4, pld(3))))
    spark.conf.set("spark.graft.bucket.duration.ns", Day.toString)
    try {
      val df = spark.read.parquet(s"$dir/ibpns")
        .filter(col("slot_ns") >= T0 + Day && col("slot_ns") < T0 + 2 * Day)
      assert(df.collect().map(_.getAs[Array[Byte]]("payload").toSeq).toSeq ===
        Seq(pld(2).toSeq))
      val line = df.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(line.contains("bucket_ts") && line.contains((T0 + Day).toString), line)
    } finally spark.conf.unset("spark.graft.bucket.duration.ns")
  }

  test("out-of-Int-range slot bounds on an Int-epoch table clamp instead of wrapping") {
    val dir = Files.createTempDirectory("graft-ibp-clamp").toString
    val clock = new TestClock(11999L)
    val opts = EngineOptions(
      databaseName = "ibpc", dataDir = dir,
      indexDepth = 4, payloadSize = 4,
      bucketDuration = 1000L, resolution = 10L)
    val e = new Engine(spark, opts, clock)
    e.put(Seq(Point(10500L, tag4, pld(2)), Point(11500L, tag4, pld(3))))
    spark.conf.set("spark.graft.bucket.duration.ns", opts.bucketDuration.toString)
    try {
      // 2^32 + 500: .toInt would wrap to a small value and the derived
      // bucket_ts <= bound would prune every live partition
      val df = spark.read.parquet(s"$dir/ibpc")
        .filter(col("slot_ns") <= 4294967796L)
      assert(df.count() === 2L, "clamped upper bound must keep all rows")
      // equality on an unrepresentable slot derives nothing and returns empty
      val eq = spark.read.parquet(s"$dir/ibpc").filter(col("slot_ns") === 4294967796L)
      assert(eq.count() === 0L)
    } finally spark.conf.unset("spark.graft.bucket.duration.ns")
  }

  test("path-keyed duration override wins over a wrong session-global duration") {
    val dir = Files.createTempDirectory("graft-ibp-path").toString
    val clock = new TestClock(11999L)
    val opts = EngineOptions(
      databaseName = "ibpp", dataDir = dir,
      indexDepth = 4, payloadSize = 4,
      bucketDuration = 1000L, resolution = 10L)
    val e = new Engine(spark, opts, clock)
    e.put(Seq(Point(10990L, tag4, pld(7))))
    val raw = new org.apache.hadoop.fs.Path(s"$dir/ibpp")
    val qualified = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(raw).toString
    // global duration 100 is WRONG for this table: slot >= 10900 would
    // derive bucket_ts >= 10900 and prune the live bucket 10000
    spark.conf.set("spark.graft.bucket.duration.ns", "100")
    spark.conf.set(s"spark.graft.bucket.duration.ns.path.$qualified", "1000")
    try {
      val df = spark.read.parquet(s"$dir/ibpp").filter(col("slot_ns") >= 10900L)
      assert(df.count() === 1L, "path-scoped duration must protect the live bucket")
      val line = df.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(line.contains("bucket_ts") && line.contains("10000"), line)
      // a non-positive override disables the rule for this table
      spark.conf.set(s"spark.graft.bucket.duration.ns.path.$qualified", "0")
      val off = spark.read.parquet(s"$dir/ibpp").filter(col("slot_ns") >= 10900L)
      assert(off.count() === 1L)
      val offLine = off.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(!offLine.contains("bucket_ts >="), offLine)
    } finally {
      spark.conf.unset("spark.graft.bucket.duration.ns")
      spark.conf.unset(s"spark.graft.bucket.duration.ns.path.$qualified")
    }
  }

  test("rule is a no-op when bucket_ts is already constrained or conf unset") {
    val dir = Files.createTempDirectory("graft-ibp2").toString
    val clock = new TestClock(11999L)
    val opts = EngineOptions(
      databaseName = "ibp2", dataDir = dir,
      indexDepth = 4, payloadSize = 4,
      bucketDuration = 1000L, resolution = 10L)
    val e = new Engine(spark, opts, clock)
    e.put(Seq(Point(10500L, tag4, pld(2)), Point(11500L, tag4, pld(3))))

    // conf unset: filter still answers correctly (no derived predicate)
    spark.conf.unset("spark.graft.bucket.duration.ns")
    val noRule = spark.read.parquet(s"$dir/ibp2").filter(col("slot_ns") >= 11000L)
    assert(noRule.count() === 1L)

    // explicit bucket_ts predicate: rule must not double-add (results stay right)
    spark.conf.set("spark.graft.bucket.duration.ns", opts.bucketDuration.toString)
    try {
      val explicit = spark.read.parquet(s"$dir/ibp2")
        .filter(col("bucket_ts") === 11000L && col("slot_ns") >= 11000L)
      assert(explicit.count() === 1L)
    } finally spark.conf.unset("spark.graft.bucket.duration.ns")
  }
}
