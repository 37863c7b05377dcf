package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core._
import graft.streaming.StreamingIngest

/** Structured Streaming ingest: MemoryStream → foreachBatch upsert
  * into the engine table, with the reference's validation surfaced as
  * a reject ledger instead of silently-dropped late rows. */
class StreamingIngestSpec extends SparkTestBase {

  private val tag4 = Seq("s", "t", "u", "v")
  private def pld(b: Byte): Array[Byte] = Array[Byte](b, b, b, b)

  test("stream ingest writes hot points, rejects cold/future ones, get() sees the data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    val clock = new TestClock(11999L)
    val opts = EngineOptions("sdb", dir, 4, 4, 1000L, 10L)
    val engine = new Engine(spark, opts, clock)
    val ingest = new StreamingIngest(engine)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val q = ingest.start(
      stream.toDF(),
      Files.createTempDirectory("graft-ckpt").toString)
    try {
      stream.addData(
        Point(11000L, tag4, pld(1), seq = 1),
        Point(11900L, tag4, pld(2), seq = 2), // hot
        Point(9000L, tag4, pld(3), seq = 3),  // cold bucket → rejected
        Point(12500L, tag4, pld(4), seq = 4)) // future → rejected
      q.processAllAvailable()
      // second micro-batch: last-writer-wins overwrite of slot 11000
      stream.addData(Point(11005L, tag4, pld(9), seq = 5))
      q.processAllAvailable()
    } finally q.stop()

    assert(ingest.rejectLedger === Map(
      "ok" -> 3L,
      "err_write_on_read_only" -> 1L,
      "err_invalid_timestamp" -> 1L))
    val got = engine.get(11000L, 11010L, tag4).collect()
      .map(_.getAs[Array[Byte]]("payload").toSeq)
    assert(got.toSeq === Seq(pld(9).toSeq)) // seq 5 won over seq 1
  }

  test("autoCompact folds a bucket exactly once when it leaves the hot window") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-autocompact").toString
    val clock = new TestClock(11999L)
    val engine = new Engine(spark,
      EngineOptions("adb", dir, 4, 4, 1000L, 10L), clock)
    val ingest = new StreamingIngest(engine)

    def bucketDirCount(bucket: Long): Int = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/adb")).iterator()
        .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      var n = 0
      it.forEachRemaining(p =>
        if (p.getFileName.toString == s"bucket_ts=$bucket") n += 1)
      n
    }

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val q = ingest.start(stream.toDF(),
      Files.createTempDirectory("graft-ckpt-ac").toString, autoCompact = true)
    try {
      // two micro-batches into the same hot bucket → two committed dirs
      stream.addData(Point(11000L, tag4, pld(1), seq = 1))
      q.processAllAvailable()
      stream.addData(Point(11010L, tag4, pld(2), seq = 2))
      q.processAllAvailable()
      assert(bucketDirCount(11000L) === 2, "hot bucket must NOT be compacted")
      assert(engine.fragmentedColdBuckets().isEmpty)

      // the bucket leaves the hot window; the next micro-batch's sweep
      // folds its two dirs into one clustered cold form
      clock.goto(13999L)
      stream.addData(Point(13990L, tag4, pld(3), seq = 3))
      q.processAllAvailable()
      assert(bucketDirCount(11000L) === 1, "cold bucket must be folded once")
      assert(engine.fragmentedColdBuckets().isEmpty)

      // idempotence: another batch re-lists but never re-folds
      stream.addData(Point(13995L, Seq("x", "y", "z", "w"), pld(4), seq = 4))
      q.processAllAvailable()
      assert(bucketDirCount(11000L) === 1)
    } finally q.stop()

    // reads serve the compacted history unchanged
    val got = engine.get(11000L, 11020L, tag4).collect()
      .map(_.getAs[Array[Byte]]("payload").toSeq)
    assert(got.toSeq === Seq(pld(1).toSeq, pld(2).toSeq))
  }

  test("file-source stream: parquet drop-dir feeds the same ingest path") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-filestream").toString
    val inDir = Files.createTempDirectory("graft-in").toString
    val clock = new TestClock(11999L)
    val engine = new Engine(spark,
      EngineOptions("fdb", dir, 4, 4, 1000L, 10L), clock)
    val ingest = new StreamingIngest(engine)

    // batch 1 lands before the stream starts; batch 2 arrives live
    Seq(Point(11000L, tag4, pld(1), 1)).toDS()
      .write.parquet(s"$inDir/batch1")
    val stream = spark.readStream
      .schema(Seq.empty[Point].toDS().schema)
      .option("maxFilesPerTrigger", "10")
      .parquet(s"$inDir/*")
    val q = ingest.start(stream, Files.createTempDirectory("graft-ckpt2").toString)
    try {
      q.processAllAvailable()
      Seq(Point(11010L, tag4, pld(2), 2)).toDS()
        .write.parquet(s"$inDir/batch2")
      q.processAllAvailable()
    } finally q.stop()

    val got = engine.get(11000L, 11020L, tag4).collect()
      .map(_.getAs[Array[Byte]]("payload").toSeq)
    assert(got.toSeq === Seq(pld(1).toSeq, pld(2).toSeq))
    assert(ingest.rejectLedger.getOrElse("ok", 0L) === 2L)
  }

  test("events table replayed as a stream lands identically to batch ingest") {
    import spark.implicits._
    import graft.plans.DoubleFromPayload.encode
    val Day = 24L * 3600 * 1000 * 1000 * 1000
    val Hour = Day / 24
    val T1 = 1704067200000000000L + 30 * Day // end of the events month
    // shape the real events into engine points
    val encodeUdf = udf((v: Double) => encode(v))
    val points = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"),
        array(col("event_type"), col("user_id").cast("string")).as("tags"),
        encodeUdf(col("value")).as("payload"),
        col("event_id").as("seq"))
    // replay in 3 chunks through a file stream
    val inDir = Files.createTempDirectory("graft-replay-in").toString
    points.filter(col("seq") % 3 === 0).write.parquet(s"$inDir/c0")
    points.filter(col("seq") % 3 === 1).write.parquet(s"$inDir/c1")
    points.filter(col("seq") % 3 === 2).write.parquet(s"$inDir/c2")

    val clock = new TestClock(T1)
    val engine = new Engine(spark,
      EngineOptions("replay", Files.createTempDirectory("graft-replay").toString,
        indexDepth = 2, payloadSize = 8,
        bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
      clock)
    val ingest = new StreamingIngest(engine)
    val q = ingest.start(
      spark.readStream.schema(points.schema)
        .option("maxFilesPerTrigger", "2").parquet(s"$inDir/*"),
      Files.createTempDirectory("graft-replay-ckpt").toString)
    try q.processAllAvailable() finally q.stop()

    assert(ingest.rejectLedger.getOrElse("ok", 0L) === points.count())
    // engine state == direct batch LWW aggregate for a probe series
    val expected = points
      .filter(element_at(col("tags"), 1) === "click" && element_at(col("tags"), 2) === "7")
      .withColumn("slot", col("ts") - col("ts") % Hour)
      .groupBy(col("slot"))
      .agg(max_by(col("payload"), col("seq")).as("payload"))
      .collect().map(r => r.getLong(0) ->
        graft.plans.DoubleFromPayload.decode(r.getAs[Array[Byte]]("payload"))).toMap
    val got = engine.getDoubles(T1 - 30 * Day, T1, Seq("click", "7"))
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("value"))).toMap
    assert(got.size === 720) // dense month at 1h
    got.foreach { case (slot, v) =>
      assert(v === expected.getOrElse(slot, 0.0), s"slot $slot")
    }
  }

  test("watermarked stream-stream interval join: clicks land in their purchase window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Point]
    val clicks = MemoryStream[Point]
    val joined = StreamingIngest.intervalJoin(
        purchases.toDF(), clicks.toDF(),
        toleranceNs = 5000000000L, watermarkNs = 10000000000L)
      .select(col("left_seq"), col("right_seq"))
    val q = joined.writeStream
      .format("memory").queryName("ssjoin_test").outputMode("append")
      .start()
    try {
      val t0 = 1000000000L // 1s in ns
      purchases.addData(Point(t0, tag4, pld(1), seq = 100))
      clicks.addData(
        Point(t0 + 2000000000L, tag4, pld(1), seq = 201), // +2s: inside window
        Point(t0 + 9000000000L, tag4, pld(1), seq = 202)) // +9s: outside
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssjoin_test").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((100L, 201L)))
  }

  test("flatMapGroupsWithState sessionization: state persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val sessions = StreamingIngest.sessionize(stream.toDF(), gapUs = 5000L)
    val q = sessions.writeStream
      .format("memory").queryName("sessions_test").outputMode("append")
      .start()
    try {
      // batch 1: two points 1ms apart → one open session (no output)
      stream.addData(
        Point(1000000L, tag4, pld(1), 1),  // 1000 µs
        Point(2000000L, tag4, pld(1), 2))  // 2000 µs
      q.processAllAvailable()
      assert(spark.table("sessions_test").count() === 0L)
      // batch 2: a point past the 5ms gap closes the first session —
      // proving SessionState survived the batch boundary
      stream.addData(Point(10000000L, tag4, pld(1), 3)) // 10000 µs
      q.processAllAvailable()
      val rows = spark.table("sessions_test").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq === Seq(("s", 1000L, 2000L, 2L)))
    } finally q.stop()
  }

  test("mapGroupsWithState latest snapshot: LWW state survives batches, late rows are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val latest = StreamingIngest.latestPerSeries(stream.toDF(), resolutionNs = 10L)
    val q = latest.writeStream
      .format("memory").queryName("latest_test").outputMode("update")
      .start()
    def snapshot(): Map[String, (Long, Long, Seq[Byte])] =
      spark.table("latest_test")
        .groupBy(col("tag0"))
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct(col("slot_ns"), col("seq"), col("payload")),
          org.apache.spark.sql.functions.struct(col("slot_ns"), col("seq"))).as("b"))
        .collect().map(r => r.getString(0) -> {
          val b = r.getStruct(1)
          (b.getLong(0), b.getLong(1), b.getAs[Array[Byte]](2).toSeq)
        }).toMap
    try {
      stream.addData(Point(100L, tag4, pld(1), 1))
      q.processAllAvailable()
      assert(snapshot()("s") === ((100L, 1L, pld(1).toSeq)))
      // batch 2: same slot higher seq wins; an older slot is a no-op
      stream.addData(Point(105L, tag4, pld(2), 2), Point(90L, tag4, pld(3), 3))
      q.processAllAvailable()
      assert(snapshot()("s") === ((100L, 2L, pld(2).toSeq)))
      // batch 3: a replay of seq 1 (at-least-once upstream) changes nothing
      stream.addData(Point(100L, tag4, pld(1), 1))
      q.processAllAvailable()
      assert(snapshot()("s") === ((100L, 2L, pld(2).toSeq)))
    } finally q.stop()
  }

  test("cdcApply: strict changelog semantics persist across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, String, Long)]
    val applied = StreamingIngest.cdcApply(
      stream.toDF().toDF("key", "ts", "seq", "op", "cents"))
    val q = applied.writeStream
      .format("memory").queryName("cdc_test").outputMode("update")
      .start()
    def state(): Map[Long, (Int, Long, Long, Long)] =
      spark.table("cdc_test")
        .groupBy(col("key"))
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct(col("is_present"), col("cents"),
            col("n_ops"), col("n_ignored")),
          col("n_ops")).as("b"))
        .collect().map(r => r.getLong(0) -> {
          val b = r.getStruct(1)
          (b.getInt(0), b.getLong(1), b.getLong(2), b.getLong(3))
        }).toMap
    try {
      // batch 1: update-before-insert is IGNORED (strict, not LWW);
      // the later insert in the same batch lands (ts order within batch)
      stream.addData((7L, 100L, 1L, "U", 500L), (7L, 200L, 2L, "I", 900L))
      q.processAllAvailable()
      assert(state()(7L) === ((1, 900L, 2L, 1L)))
      // batch 2: update now applies (state carried across batches)
      stream.addData((7L, 300L, 3L, "U", 950L))
      q.processAllAvailable()
      assert(state()(7L) === ((1, 950L, 3L, 1L)))
      // batch 3: delete resets; a trailing update is ignored again
      stream.addData((7L, 400L, 4L, "D", 0L), (7L, 500L, 5L, "U", 111L))
      q.processAllAvailable()
      assert(state()(7L) === ((0, 0L, 5L, 2L)))
      // batch 4: insert resurrects the deleted key
      stream.addData((7L, 600L, 6L, "I", 42L))
      q.processAllAvailable()
      assert(state()(7L) === ((1, 42L, 6L, 2L)))
    } finally q.stop()
  }

  test("stateful query restarts from checkpoint: LWW state survives stop/start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-ckpt-restart").toString
    val stream = MemoryStream[Point]
    // memory sink can't recover from a checkpoint; foreachBatch can
    val out = scala.collection.concurrent.TrieMap[Long, Array[StreamingIngest.LatestOut]]()
    def startQuery() =
      StreamingIngest.latestPerSeries(stream.toDF(), resolutionNs = 10L)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[StreamingIngest.LatestOut], id: Long) =>
            out.put(id, ds.collect()); ()
        }
        .start()

    val q1 = startQuery()
    try {
      stream.addData(Point(200L, tag4, pld(5), 1))
      q1.processAllAvailable()
    } finally q1.stop()

    // new query instance, same checkpoint: the state store must come
    // back with series "s" at (slot 200, seq 1)
    val q2 = startQuery()
    try {
      // an OLDER slot must lose against the RECOVERED state, not
      // against a fresh empty one
      stream.addData(Point(150L, tag4, pld(7), 2))
      q2.processAllAvailable()
    } finally q2.stop()
    val last = out(out.keySet.max).map(o =>
      (o.tag0, o.slot_ns, o.seq, o.payload.toSeq))
    assert(last.toSeq === Seq(("s", 200L, 1L, pld(5).toSeq)),
      "recovered state should have kept slot 200 / seq 1")
  }

  test("streaming tumbling-window aggregation with watermark (complete per-window counts)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val agg = StreamingIngest.tumblingCounts(
      stream.toDF(), windowNs = 1000000000L, watermarkNs = 2000000000L)
    val q = agg.writeStream
      .format("memory").queryName("tumbling_test").outputMode("complete")
      .start()
    try {
      stream.addData(
        Point(1000000000L, tag4, pld(1), 1),
        Point(1500000000L, tag4, pld(1), 2),
        Point(2000000000L, tag4, pld(1), 3))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("tumbling_test")
      .orderBy(col("w_start_us")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("s", 1000000L, 2L), ("s", 2000000L, 1L)))
  }

  test("streaming hopping windows: each point lands in size/slide overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val agg = StreamingIngest.hoppingCounts(
      stream.toDF(), windowNs = 2000000000L, slideNs = 1000000000L,
      watermarkNs = 2000000000L)
    val q = agg.writeStream
      .format("memory").queryName("hopping_test").outputMode("complete")
      .start()
    try {
      stream.addData(
        Point(1000000000L, tag4, pld(1), 1), // 1s → windows [0,2) and [1,3)
        Point(1500000000L, tag4, pld(1), 2), // 1.5s → same two windows
        Point(2000000000L, tag4, pld(1), 3)) // 2s → windows [1,3) and [2,4)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hopping_test")
      .orderBy(col("w_start_us")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      ("s", 0L, 2L), ("s", 1000000L, 3L), ("s", 2000000L, 1L)))
  }

  test("watermarked streaming dedup drops re-deliveries, state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val deduped = StreamingIngest.dedupStream(stream.toDF(), watermarkNs = 2000000000L)
    val q = deduped.writeStream
      .format("memory").queryName("dedup_test").outputMode("append")
      .start()
    try {
      // batch 1: same content delivered twice plus one distinct point
      stream.addData(
        Point(1000000000L, tag4, pld(1), 1),
        Point(1000000000L, tag4, pld(1), 2),  // exact re-delivery
        Point(1100000000L, tag4, pld(2), 3))  // different payload
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 2L)
      // batch 2: a re-delivery within the watermark window is still
      // suppressed — key state survived the micro-batch boundary
      stream.addData(Point(1200000000L, tag4, pld(1), 4))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 2L)
      // batch 3: advance the watermark far past the old keys, then a
      // fresh point lands — state for expired keys is dropped, the
      // new content passes
      stream.addData(Point(10000000000L, tag4, pld(3), 5))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() === 3L)
    } finally q.stop()
  }

  test("per-epoch rollup refresh: the continuous aggregate tracks streaming ingest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-streamroll").toString
    val clock = new TestClock(11999L)
    val engine = new Engine(spark,
      EngineOptions("rdb", dir, 2, 8, 1000L, 10L), clock)
    val ingest = new StreamingIngest(engine)
    def dpld(v: Double) = java.nio.ByteBuffer.allocate(8).putDouble(v).array()
    val t2 = Seq("cpu", "h1")
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val q = ingest.start(stream.toDF(),
      Files.createTempDirectory("graft-roll-ckpt").toString,
      rollupResolution = Some(100L))
    try {
      stream.addData(
        Point(11000L, t2, dpld(1.0), seq = 1),
        Point(11010L, t2, dpld(2.0), seq = 2))
      q.processAllAvailable()
      // the rollup serves epoch 1 without any manual refresh
      val r1 = engine.rollup(11000L, 11100L, t2, 100L).collect()
      assert(r1.length === 1 && r1(0).getLong(3) === 2L)
      stream.addData(Point(11020L, t2, dpld(3.0), seq = 3))
      q.processAllAvailable()
    } finally q.stop()
    val r = engine.rollup(11000L, 11100L, t2, 100L).collect()
    assert(r.length === 1)
    assert((r(0).getLong(3), r(0).getDouble(4), r(0).getDouble(5),
      r(0).getDouble(6), r(0).getDouble(7), r(0).getDouble(8)) ===
      ((3L, 6.0, 1.0, 3.0, 3.0, 2.0)))
    // one delta per epoch accumulated — the maintenance fold collapses them
    assert(engine.compactRollup() === 2)
  }

  test("vectorIndexCompactEvery bounds the delta cover across a 12-epoch stream") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-vstream").toString
    val clock = new TestClock(11999L)
    val engine = new Engine(spark,
      EngineOptions("vsdb", dir, 1, 16, 1000L, 10L, maxHotBuckets = 12), clock)
    def fv(x: Float, y: Float) =
      graft.plans.FloatsFromPayload.encode(Seq(x, y, 0f, 0f))
    // seed two clusters and build the stored index
    assert(engine.put(Seq(
      Point(11000L, Seq("a0"), fv(1f, 0f), seq = 1),
      Point(11000L, Seq("b0"), fv(0f, 1f), seq = 2))) === Map("ok" -> 2L))
    engine.buildVectorIndex(k = 2, iters = 1)
    val ingest = new StreamingIngest(engine)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Point]
    val q = ingest.start(stream.toDF().drop("seq"),
      Files.createTempDirectory("graft-vs-ckpt").toString,
      vectorIndexRefresh = true, allocateSeqs = true,
      vectorIndexCompactEvery = 4)
    val covers = Seq.newBuilder[Int]
    try {
      (1 to 12).foreach { i =>
        stream.addData(Point(11000L + 10L * i,
          Seq(s"s$i"), fv(if (i % 2 == 0) 1f else 0f, if (i % 2 == 0) 0f else 1f)))
        q.processAllAvailable()
        covers += engine.vectorIndexCoverSize()
      }
    } finally q.stop()
    // refresh appends one delta per epoch; compaction at epochs 4/8/12
    // folds the chain, so the cover never exceeds the cadence and ends
    // at ONE dir — the unbounded-listing scale hazard closed
    assert(covers.result().max <= 4, s"cover exceeded the cadence: ${covers.result()}")
    assert(engine.vectorIndexCoverSize() === 1,
      "a compaction-terminated stream must end with a single folded delta")
    // every streamed vector still serves after the folds
    assert(engine.vectorIndexWatermark() === engine.currentSeq())
    assert(engine.vectorIndexInverted().count() === 14L)
    val qdf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, Seq(1f, 0f, 0f, 0f))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("qv",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))))
    assert(engine.annSearch(qdf, nprobe = 2, topk = 14).count() === 14L)
  }

  test("serveAnn AnnTier.Adc serves the code-only tier: epoch result ≡ batch annSearchAdc") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sadc").toString
    val clock = new TestClock(11999L)
    val engine = new Engine(spark,
      EngineOptions("sadc", dir, 1, 16, 1000L, 10L, maxHotBuckets = 12), clock)
    def fv(x: Float, y: Float) =
      graft.plans.FloatsFromPayload.encode(Seq(x, y, 0f, 0f))
    assert(engine.put(Seq(
      Point(11000L, Seq("a0"), fv(1f, 0f), seq = 1),
      Point(11010L, Seq("a1"), fv(0.9f, 0.1f), seq = 2),
      Point(11000L, Seq("b0"), fv(0f, 1f), seq = 3),
      Point(11010L, Seq("b1"), fv(0.1f, 0.9f), seq = 4))) === Map("ok" -> 4L))
    engine.buildVectorIndex(k = 2, iters = 1,
      pq = Some(PqParams(m = 2, k = 4, iters = 1)))
    val ingest = new StreamingIngest(engine)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val served = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val q = ingest.serveAnn(stream.toDF().toDF("qid", "qv"),
      Files.createTempDirectory("graft-sadc-ckpt").toString,
      nprobe = 2, topk = 3, tier = StreamingIngest.AnnTier.Adc) { (res, _) =>
      served ++= res.collect().map(_.toSeq)
    }
    try {
      stream.addData((1L, Seq(1f, 0f, 0f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    val batch = engine.annSearchAdc(
      Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("qid", "qv"), nprobe = 2, topk = 3)
      .collect().map(_.toSeq)
    assert(served.toSeq === batch.toSeq,
      "the served ADC epoch must equal the batch code-only probe bit-for-bit")
    assert(served.size === 3)
  }

  test("streaming as-of join: O(1) latest-right state persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lefts = MemoryStream[Point]
    val rights = MemoryStream[Point]
    val out = StreamingIngest.asofLatest(
      lefts.toDF(), rights.toDF(), toleranceNs = 5000000000L) // 5s
    val q = out.toDF().writeStream
      .format("memory").queryName("asof_test").outputMode("append")
      .start()
    try {
      val S = 1000000000L // 1s in ns
      // batch 1: two rights, then a left at the same instant as the
      // second right — same-ts right matches with lag 0
      rights.addData(Point(1 * S, tag4, pld(1), seq = 201),
        Point(3 * S, tag4, pld(1), seq = 202))
      lefts.addData(Point(3 * S, tag4, pld(1), seq = 101))
      q.processAllAvailable()
      // batch 2: a left with NO right in this batch — the match must
      // come from state carried over (seq 202 at 3s, lag 4s < 5s)
      lefts.addData(Point(7 * S, tag4, pld(1), seq = 102))
      q.processAllAvailable()
      // batch 3: a left beyond tolerance of the carried right → unmatched
      lefts.addData(Point(20 * S, tag4, pld(1), seq = 103))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("asof_test")
      .select("left_seq", "right_seq", "lag_us", "matched")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    assert(rows.toSeq === Seq(
      (101L, 202L, 0L, 1),
      (102L, 202L, 4000000L, 1),
      (103L, -1L, -1L, 0)))
  }
}
