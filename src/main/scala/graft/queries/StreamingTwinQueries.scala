package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables._
import graft.streaming.StreamingIngest

/** Batch-twin oracle gates for the Structured Streaming paths.
  *
  * StreamingIngest's operators were spec-tested only (r5 VERDICT gap):
  * specs assert behavior on synthetic micro-batches, but nothing put
  * the streaming code under the same rows+schema+hash oracle gate as
  * every batch operator. These queries close that: each one replays a
  * driver parquet table through the REAL streaming operator (file
  * source → Trigger.AvailableNow → memory sink, a genuine
  * StreamingQuery with checkpointing, not a batch re-expression) and
  * returns the sink table, which the driver hash-compares against
  * DuckDB SQL over the same parquet. Replay-equivalence is exactly the
  * Structured Streaming promise (SIGMOD 2018: same declarative plan,
  * incrementalized), so any divergence is a real bug in our streaming
  * shaping (watermark column, window alignment, dedup key), which is
  * what this gate is for.
  *
  * Determinism: outputs carry no per-row arrival identity (counts per
  * window; the distinct content-key set) — whichever physical row wins
  * a dedup race, the gated result is identical.
  */
object StreamingTwinQueries extends QueryModule {

  private val Hour = 3600L * 1000 * 1000 * 1000 // ns

  /** Run `f` with shuffle partitions scoped down to 8 and restore the
    * session value after. Stateful streaming cost is dominated by
    * per-partition state-store instantiation + checkpoint commits —
    * 32 stores for a single-file replay is pure overhead (a real
    * deployment sizes this to state volume, which here is KBs). The
    * conf is read at query START, so scoping the start+await block is
    * sufficient; results are partition-count-invariant. */
  private def withReplayPartitions[T](s: SparkSession)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, "8")
    try f finally s.conf.set(key, old)
  }

  /** events.ts → int64 ns, same dispatch as KdbQueries.ev (the
    * session reads ns-annotated parquet as LongType via
    * spark.sql.legacy.parquet.nanosAsLong). */
  private def tsNs(df: DataFrame) =
    graft.sources.Tables.tsNsCol(df.schema("ts").dataType)

  /** Run a streaming transform of a parquet table end-to-end and hand
    * back the memory-sink table. AvailableNow processes the whole
    * table as a finite stream then stops — the replay harness. */
  private def replay(s: SparkSession, path: String, outputMode: String)(
      transform: DataFrame => DataFrame): DataFrame = {
    val schema = s.read.parquet(path).schema
    // the streaming file source lists a DIRECTORY; the driver tables
    // are single parquet files — expose the file through a temp-dir
    // symlink (no data copy)
    val p = java.nio.file.Paths.get(path)
    val dir =
      if (java.nio.file.Files.isDirectory(p)) path
      else {
        val tmp = graft.core.Scratch.path("graft-twin-src")
        java.nio.file.Files.createSymbolicLink(
          tmp.resolve(p.getFileName), p.toAbsolutePath)
        tmp.toString
      }
    val stream = s.readStream.schema(schema).parquet(dir)
    val table = s"stream_twin_${System.nanoTime()}"
    withReplayPartitions(s) {
      val q = transform(stream).writeStream
        .format("memory").queryName(table)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          graft.core.Scratch.dir("graft-twin-ckpt"))
        .start()
      q.awaitTermination()
    }
    s.table(table)
  }

  /** Streaming tumbling-window counts replayed over the events table,
    * gated against the same hourly-bucket SQL family as the batch
    * kdb_tumbling_window. Complete output mode: with a finite
    * AvailableNow replay the watermark never advances past the final
    * batch, so append mode would hold back the last windows — complete
    * emits every window, which is also the correct batch-equivalence
    * semantics (nothing is late on a replay). */
  private val tumblingTwin = QueryDef(
    "stream_tumbling_twin",
    (s, d) => {
      val out = replay(s, s"$d/events.parquet", "complete") { stream =>
        val pts = stream.select(
          tsNs(stream).as("ts"),
          array(col("event_type")).as("tags"))
        StreamingIngest.tumblingCounts(pts, Hour, watermarkNs = 0L)
      }
      out.select(col("tag0"), col("w_start_us"), col("n"))
        .orderBy(col("tag0"), col("w_start_us"))
    },
    Some(s"""
      SELECT event_type AS tag0,
             epoch_us(ts) - epoch_us(ts) % ${Hour / 1000} AS w_start_us,
             count(*) AS n
      FROM events
      GROUP BY 1, 2
      ORDER BY tag0, w_start_us"""))

  /** Streaming exact dedup replayed over the documents table, gated
    * against the distinct-content-hash set — the same content-key
    * semantics as the batch llm_dedup_exact. Output is the surviving
    * key set only: dropDuplicatesWithinWatermark keeps an arbitrary
    * physical row per key, so gating row identity would be
    * nondeterministic, while the key set is exact. (Replay contract:
    * a single-file table = one micro-batch; across batches a
    * zero-delay watermark would evict dedup state and re-admit old
    * keys — by design, state is watermark-bounded.) */
  private val dedupTwin = QueryDef(
    "stream_dedup_twin",
    (s, d) => {
      val out = replay(s, s"$d/documents.parquet", "append") { stream =>
        // +1 offset: event_time must stay ABOVE the initial watermark
        // (epoch 0) or the state op drops the row as late — doc_id 0
        // at exactly epoch 0 was silently filtered
        val pts = stream.select(
          ((col("doc_id") + lit(1L)) * lit(1000000L)).as("ts"),
          array(lit("doc")).as("tags"),
          col("text").cast("binary").as("payload"))
        StreamingIngest.dedupStream(pts, watermarkNs = 0L)
      }
      out.select(col("content_key")).orderBy(col("content_key"))
    },
    Some("""
      SELECT DISTINCT md5('doc' || text) AS content_key
      FROM documents
      ORDER BY content_key"""))

  /** Custom-state streaming sessionize replayed over the events table
    * — the flatMapGroupsWithState path, which no oracle row covered
    * (tumbling/dedup gate the declarative operators; this gates the
    * hand-written state fold). Same 30-min gap rule as the batch
    * kdb_sessionize. Two deliberate deltas the oracle encodes:
    * streaming emits a session only when a LATER point closes it, so
    * each user's final session is still open state at end-of-replay
    * and is excluded from the oracle via a max-session_seq window;
    * and the within-batch fold sorts by timestamp alone (ties share a
    * session either way, so boundaries and counts are unaffected).
    * Single-file replay = one micro-batch, so the per-batch sort sees
    * the full history — exactly the batch fold. */
  private val sessionizeTwin = QueryDef(
    "stream_sessionize_twin",
    (s, d) => {
      val GapUs = 30L * 60 * 1000 * 1000
      val out = replay(s, s"$d/events.parquet", "append") { stream =>
        val pts = stream.select(
          tsNs(stream).as("ts"),
          array(col("user_id").cast("string")).as("tags"))
        StreamingIngest.sessionize(pts, GapUs).toDF()
      }
      out.select(col("tag0"), col("start_us"), col("end_us"), col("n"))
        .orderBy(col("tag0"), col("start_us"))
    },
    Some(s"""
      WITH o AS (
        SELECT CAST(user_id AS VARCHAR) AS tag0, epoch_us(ts) AS ts_us,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${30L * 60 * 1000 * 1000}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      sess AS (
        SELECT tag0, ts_us,
               CAST(sum(new_s) OVER (PARTITION BY tag0 ORDER BY ts_us
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM o),
      agg AS (
        SELECT tag0, session_seq,
               min(ts_us) AS start_us, max(ts_us) AS end_us,
               count(*) AS n
        FROM sess GROUP BY 1, 2),
      ranked AS (
        SELECT *, max(session_seq) OVER (PARTITION BY tag0) AS last_seq
        FROM agg)
      SELECT tag0, start_us, end_us, n
      FROM ranked WHERE session_seq < last_seq
      ORDER BY tag0, start_us"""))

  /** Streaming hopping-window counts replayed over events — same
    * harness and complete-mode rationale as the tumbling twin, with
    * the window/slide multi-assignment (each point lands in
    * window/slide overlapping windows) gated against an explicit
    * generate_series explosion in SQL. */
  private val hoppingTwin = QueryDef(
    "stream_hopping_twin",
    (s, d) => {
      val out = replay(s, s"$d/events.parquet", "complete") { stream =>
        val pts = stream.select(
          tsNs(stream).as("ts"),
          array(col("event_type")).as("tags"))
        StreamingIngest.hoppingCounts(pts, windowNs = Hour, slideNs = Hour / 2,
          watermarkNs = 0L)
      }
      out.select(col("tag0"), col("w_start_us"), col("n"))
        .orderBy(col("tag0"), col("w_start_us"))
    },
    Some {
      val winUs = Hour / 1000
      val slideUs = Hour / 2000
      s"""
      WITH p AS (SELECT event_type AS tag0, epoch_us(ts) AS ts_us FROM events),
      x AS (
        SELECT tag0, ts_us,
               (ts_us - ts_us % $slideUs) - k * $slideUs AS w_start_us
        FROM p, generate_series(0, ${winUs / slideUs - 1}) AS t(k)
        WHERE ts_us >= (ts_us - ts_us % $slideUs) - k * $slideUs
          AND ts_us < (ts_us - ts_us % $slideUs) - k * $slideUs + $winUs)
      SELECT tag0, w_start_us, count(*) AS n
      FROM x GROUP BY 1, 2
      ORDER BY tag0, w_start_us"""
    })

  /** Streaming latest-value state (mapGroupsWithState LWW) replayed
    * over events: one series per event_type, slot = hourly floor,
    * ingest seq = event_id. Update mode emits each touched series'
    * CURRENT state once per micro-batch; state is monotone in
    * (slot, seq), so the final state per series — the thing that must
    * equal the batch argmax — is the max emitted (slot, seq), whether
    * the replay ran as one batch (single-file table, the usual case)
    * or several. Payload bytes are excluded from the gate (double →
    * string rendering differs across engines); payload identity is
    * pinned by StreamingIngestSpec's LWW tests. */
  private val latestTwin = QueryDef(
    "stream_latest_twin",
    (s, d) => {
      val out = replay(s, s"$d/events.parquet", "update") { stream =>
        val pts = stream.select(
          tsNs(stream).as("ts"),
          array(col("event_type")).as("tags"),
          col("value").cast("string").cast("binary").as("payload"),
          col("event_id").as("seq"))
        StreamingIngest.latestPerSeries(pts, resolutionNs = Hour).toDF()
      }
      out.groupBy(col("tag0"))
        .agg(max(struct(col("slot_ns"), col("seq"))).as("m"))
        .select(col("tag0"), col("m.slot_ns").as("slot_ns"), col("m.seq").as("seq"))
        .orderBy(col("tag0"))
    },
    Some(s"""
      WITH p AS (
        SELECT event_type AS tag0,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               event_id AS seq
        FROM events),
      r AS (
        SELECT tag0, slot_ns, seq,
               row_number() OVER (PARTITION BY tag0
                 ORDER BY slot_ns DESC, seq DESC) AS rn
        FROM p)
      SELECT tag0, slot_ns, seq FROM r WHERE rn = 1
      ORDER BY tag0"""))

  /** Watermarked stream-stream interval join replayed over events:
    * purchases pick up the clicks inside their 1-hour attribution
    * window by the same user (tags carry user_id) — gated against the
    * equivalent SQL range join. Event times are µs-floored on BOTH
    * sides of the oracle because the streaming operator compares µs
    * timestamps (and DuckDB truncates ns parquet to µs anyway). */
  private val intervalJoinTwin = QueryDef(
    "stream_interval_join_twin",
    (s, d) => {
      val out = replay2(s, s"$d/events.parquet", "append") { (left, right) =>
        def pts(stream: DataFrame, kind: String) = stream
          .filter(col("event_type") === kind)
          .select(tsNs(stream).as("ts"),
            array(col("user_id").cast("string")).as("tags"),
            col("event_id").as("seq"))
        StreamingIngest.intervalJoin(
          pts(left, "purchase"), pts(right, "click"),
          toleranceNs = Hour, watermarkNs = 0L)
      }
      out.select(col("left_seq"), col("right_seq"))
        .orderBy(col("left_seq"), col("right_seq"))
    },
    Some(s"""
      WITH p AS (SELECT event_id AS left_seq, user_id,
                        epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'),
      c AS (SELECT event_id AS right_seq, user_id,
                   epoch_us(ts) AS t FROM events WHERE event_type = 'click')
      SELECT p.left_seq, c.right_seq
      FROM p JOIN c ON p.user_id = c.user_id
        AND c.t >= p.t AND c.t < p.t + ${Hour / 1000}
      ORDER BY left_seq, right_seq"""))

  /** Two-stream variant of [[replay]] for stream-stream joins: both
    * sides read the same table dir as independent streaming sources
    * (micro-batches line up under AvailableNow; one batch for a
    * single-file table, so neither side waits on the other's
    * watermark to emit). */
  private def replay2(s: SparkSession, path: String, outputMode: String)(
      transform: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val schema = s.read.parquet(path).schema
    val p = java.nio.file.Paths.get(path)
    val dir =
      if (java.nio.file.Files.isDirectory(p)) path
      else {
        val tmp = graft.core.Scratch.path("graft-twin-src")
        java.nio.file.Files.createSymbolicLink(
          tmp.resolve(p.getFileName), p.toAbsolutePath)
        tmp.toString
      }
    val left = s.readStream.schema(schema).parquet(dir)
    val right = s.readStream.schema(schema).parquet(dir)
    val table = s"stream_twin_${System.nanoTime()}"
    withReplayPartitions(s) {
      val q = transform(left, right).writeStream
        .format("memory").queryName(table)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          graft.core.Scratch.dir("graft-twin-ckpt"))
        .start()
      q.awaitTermination()
    }
    s.table(table)
  }

  /** Checkpoint-recovery twin: the tumbling aggregation replayed in
    * TWO separate StreamingQuery lifetimes sharing one checkpoint —
    * run 1 sees only the first half of events and stops; run 2 starts
    * from the checkpoint, sees only the late-arriving second half,
    * and must produce the FULL aggregation from restored state. This
    * puts the recovery path itself (state store restore + file-source
    * offset log) under the DuckDB hash gate, not just under specs:
    * if restored state dropped or double-counted anything, the final
    * counts could not match the batch SQL over all events. */
  private val recoveryTwin = QueryDef(
    "stream_recovery_twin",
    (s, d) => {
      val src = s.read.parquet(s"$d/events.parquet")
      val inDir = graft.core.Scratch.dir("graft-twin-rec")
      val ckpt = graft.core.Scratch.dir("graft-twin-rec-ckpt")
      def run(tableSuffix: String): DataFrame = {
        val stream = s.readStream.schema(src.schema).parquet(s"$inDir/*")
        val pts = stream.select(
          tsNs(stream).as("ts"), array(col("event_type")).as("tags"))
        val table = s"stream_twin_rec_${tableSuffix}_${System.nanoTime()}"
        withReplayPartitions(s) {
          val q = StreamingIngest.tumblingCounts(pts, Hour, watermarkNs = 0L)
            .writeStream.format("memory").queryName(table)
            .outputMode("complete")
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt)
            .start()
          q.awaitTermination()
        }
        s.table(table)
      }
      src.filter(col("event_id") % 2 === 0).write.parquet(s"$inDir/chunk0")
      run("a") // first lifetime: half the data, then stops
      src.filter(col("event_id") % 2 =!= 0).write.parquet(s"$inDir/chunk1")
      val out = run("b") // second lifetime: resumes from the checkpoint
      out.select(col("tag0"), col("w_start_us"), col("n"))
        .orderBy(col("tag0"), col("w_start_us"))
    },
    Some(s"""
      SELECT event_type AS tag0,
             epoch_us(ts) - epoch_us(ts) % ${Hour / 1000} AS w_start_us,
             count(*) AS n
      FROM events
      GROUP BY 1, 2
      ORDER BY tag0, w_start_us"""))

  /** The CONTINUOUS AGGREGATE oracle-gated end to end: replay the
    * events table through a real Engine + StreamingIngest with
    * per-micro-batch rollup maintenance, then serve the result from
    * engine.rollup() — the full production path (validate → atomic
    * batch publish → seq-watermarked refresh → merge-on-read) — and
    * gate it against DuckDB aggregating the same rows DIRECTLY.
    * Every event is accepted by construction (hot window spans the
    * month, arity/payload valid), so observation-stream rollup
    * semantics equal plain aggregation here. Float discipline: sums
    * of 2-decimal doubles are order-sensitive in the last ulps, so
    * the gated sum is round(vsum·100) — an exact integer-cent total
    * both engines reach regardless of fold order — and the average
    * derives from it; min/max/last are single exact doubles. */
  private val rollupTwin = QueryDef(
    "stream_rollup_twin",
    (s, d) => {
      import s.implicits._
      import graft.queries.KdbQueries.{Day, T0, T1}
      val dir = graft.core.Scratch.dir("graft-rolltwin")
      val engine = new graft.core.Engine(s,
        graft.core.EngineOptions("rtwin", dir, indexDepth = 2, payloadSize = 8,
          bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
        new graft.core.TestClock(T1))
      val ingest = new StreamingIngest(engine)
      val path = s"$d/events.parquet"
      val p = java.nio.file.Paths.get(path)
      val srcDir =
        if (java.nio.file.Files.isDirectory(p)) path
        else {
          val tmp = graft.core.Scratch.path("graft-rolltwin-src")
          java.nio.file.Files.createSymbolicLink(
            tmp.resolve(p.getFileName), p.toAbsolutePath)
          tmp.toString
        }
      val schema = s.read.parquet(path).schema
      val stream = s.readStream.schema(schema).parquet(srcDir)
      val pts = stream.select(
          tsNs(stream).as("ts"),
          col("event_type"), col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
        .as[(Long, String, String, Double, Long)]
        .map { case (ts, et, uid, v, id) =>
          graft.core.Point(ts, Seq(et, uid),
            graft.plans.DoubleFromPayload.encode(v), id)
        }
      // the scope must cover processAllAvailable, not just start():
      // foreachBatch's engine jobs read the conf at micro-batch
      // planning time, which happens while we block here
      withReplayPartitions(s) {
        val q = ingest.start(pts.toDF(),
          graft.core.Scratch.dir("graft-rolltwin-ckpt"),
          rollupResolution = Some(Day))
        try { q.processAllAvailable() } finally q.stop()
      }
      engine.rollup(T0, T0 + 31 * Day, Seq("", ""), Day)
        .select(col("tag0").as("event_type"), col("tag1").as("user_id"),
          col("rslot_ns").as("day_ns"), col("cnt"),
          round(col("vsum") * 100).cast("long").as("sum_cents"),
          round(col("vmin"), 2).as("vmin"),
          round(col("vmax"), 2).as("vmax"),
          round(col("last_val"), 2).as("last_val"),
          (round(round(col("vsum") * 100).cast("long") /
            col("cnt").cast("double") / 100.0, 4) + lit(0.0)).as("avg4"))
        .orderBy(col("event_type"), col("user_id"), col("day_ns"))
    },
    Some(s"""
      SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
             epoch_ns(ts) - epoch_ns(ts) % ${24L * 3600 * 1000 * 1000 * 1000} AS day_ns,
             count(*) AS cnt,
             CAST(round(sum(value) * 100) AS BIGINT) AS sum_cents,
             round(min(value), 2) AS vmin,
             round(max(value), 2) AS vmax,
             round(arg_max(value, event_id), 2) AS last_val,
             round(CAST(round(sum(value) * 100) AS BIGINT) /
                   CAST(count(*) AS DOUBLE) / 100.0, 4) + 0.0 AS avg4
      FROM events
      GROUP BY 1, 2, 3
      ORDER BY event_type, user_id, day_ns"""))

  /** Streaming quantile sketch: the log₂-bucket histogram of
    * kdb_quantile_sketch maintained as STREAMING AGGREGATE STATE —
    * (event_type, bucket) counts, a bounded ≤64-rows-per-type state
    * that micro-batches merge into associatively — then finished
    * (cumulate → rank → bucket upper bound) in a batch step over the
    * tiny sink table. This is the operational point of shipping a
    * sketch: exact percentiles cannot be incrementally maintained
    * (they'd need every value in state), the mergeable histogram can;
    * the twin gates that the streamed state finishes to EXACTLY the
    * batch sketch (same estimates, same bucket counts) under the
    * replay-equivalence promise. All-integer state and finish math. */
  private val quantileSketchTwin = QueryDef(
    "stream_quantile_sketch_twin",
    (s, d) => {
      val out = replay(s, s"$d/events.parquet", "complete") { stream =>
        stream
          .select(col("event_type"),
            (round(col("value") * 100, 0).cast("long") + 1).as("cents1"))
          .withColumn("b", length(bin(col("cents1"))))
          .groupBy(col("event_type"), col("b"))
          .count()
      }
      import org.apache.spark.sql.expressions.Window
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wType = Window.partitionBy(col("event_type"))
      out
        .withColumn("cum", sum(col("count")).over(wCum))
        .withColumn("n", sum(col("count")).over(wType))
        .withColumn("r50", expr("(n + 1) div 2"))
        .withColumn("r95", expr("(19 * n + 19) div 20"))
        .withColumn("r99", expr("(99 * n + 99) div 100"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          count(lit(1)).as("n_buckets"),
          round(min(when(col("cum") >= col("r50"),
            expr("shiftleft(CAST(1 AS BIGINT), b) - 1"))) / 100.0, 2).as("p50_est"),
          round(min(when(col("cum") >= col("r95"),
            expr("shiftleft(CAST(1 AS BIGINT), b) - 1"))) / 100.0, 2).as("p95_est"),
          round(min(when(col("cum") >= col("r99"),
            expr("shiftleft(CAST(1 AS BIGINT), b) - 1"))) / 100.0, 2).as("p99_est"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH base AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) + 1 AS cents1
        FROM events),
      bk AS (
        SELECT event_type, length(bin(cents1)) AS b, count(*) AS c
        FROM base
        GROUP BY 1, 2),
      cm AS (
        SELECT event_type, b, c,
               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM bk),
      sk AS (
        SELECT event_type, max(n) AS n, count(*) AS n_buckets,
               round(min(CASE WHEN cum >= (n + 1) // 2
                              THEN (1::BIGINT << b) - 1 END) / 100.0, 2) AS p50_est,
               round(min(CASE WHEN cum >= (19 * n + 19) // 20
                              THEN (1::BIGINT << b) - 1 END) / 100.0, 2) AS p95_est,
               round(min(CASE WHEN cum >= (99 * n + 99) // 100
                              THEN (1::BIGINT << b) - 1 END) / 100.0, 2) AS p99_est
        FROM cm
        GROUP BY 1)
      SELECT * FROM sk ORDER BY event_type"""))

  /** Streaming cardinality sketch: 128 HLL register maxima carried as
    * mapGroupsWithState state per daily window
    * (StreamingIngest.hllRegisters) — the mergeable-sketch member the
    * quantile (bucket histogram) and frequency (Space-Saving) twins
    * bracket: exact streaming distinct needs per-key state that grows
    * with the universe; the register state is 128 longs per window
    * forever. The emitted state is EXACT integers (scaled harmonic
    * denominator Σ2^(54−M), zero-register count), the estimate is the
    * same spliced α·m²·2⁵⁴ expression as the batch kdb_sliding_hll,
    * and the oracle recomputes every register from md5 arithmetic —
    * the full estimate hash-gates, no property flag. Update-mode
    * replay; across batches the latest state per window wins (sreg is
    * monotonically non-increasing as registers fold in, so a
    * min-struct picks it deterministically). */
  private val hllTwin = QueryDef(
    "stream_hll_twin",
    (s, d) => {
      val Day = 24 * Hour
      val out = replay(s, s"$d/events.parquet", "update") { stream =>
        val pts = stream.select(
          tsNs(stream).as("ts"),
          col("user_id").cast("string").as("key"))
        StreamingIngest.hllRegisters(pts, Day).toDF()
      }
      out.groupBy(col("w_start_us"))
        .agg(min(struct(col("sreg"), col("v_zero"))).as("m"))
        .select(col("w_start_us"), col("m.sreg").as("sreg"),
          col("m.v_zero").as("v_zero"))
        .withColumn("est_users", round(expr(
          s"CASE WHEN v_zero > 0 AND ${KdbQueries.HllC} <= 320.0 * CAST(sreg AS DOUBLE) " +
            s"THEN 128.0 * ln(128.0 / v_zero) " +
            s"ELSE ${KdbQueries.HllC} / CAST(sreg AS DOUBLE) END"), 4) + lit(0.0))
        .select(col("w_start_us"), col("sreg"),
          col("v_zero").cast("int").as("v_zero"), col("est_users"))
        .orderBy(col("w_start_us"))
    },
    Some(s"""
      WITH du AS (
        SELECT epoch_us(ts) - epoch_us(ts) % ${24 * Hour / 1000} AS w,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM events),
      reg AS (
        SELECT w, h % 128 AS idx,
               max(CASE WHEN h // 128 = 0 THEN 54
                   ELSE 54 - length(bin(h // 128)) END) AS m
        FROM du GROUP BY 1, 2),
      grid AS (
        SELECT w, i.idx
        FROM (SELECT DISTINCT w FROM du), generate_series(0, 127) AS i(idx)),
      dense AS (
        SELECT g.w, coalesce(r.m, 0) AS m
        FROM grid g LEFT JOIN reg r ON r.w = g.w AND r.idx = g.idx),
      sket AS (
        SELECT w AS w_start_us,
               CAST(sum(CAST(1 AS BIGINT) << CAST(54 - m AS INTEGER)) AS BIGINT)
                 AS sreg,
               count(CASE WHEN m = 0 THEN 1 END) AS v_zero
        FROM dense GROUP BY 1)
      SELECT w_start_us, sreg, CAST(v_zero AS INTEGER) AS v_zero,
             round(CASE WHEN v_zero > 0
                         AND ${KdbQueries.HllC} <= 320.0 * CAST(sreg AS DOUBLE)
                   THEN 128.0 * ln(128.0 / v_zero)
                   ELSE ${KdbQueries.HllC} / CAST(sreg AS DOUBLE) END, 4) + 0.0
               AS est_users
      FROM sket
      ORDER BY w_start_us"""))

  /** Streaming heavy hitters: the Space-Saving summary
    * (graft.functions.HeavyHitters, kdb_heavy_hitters' sketch) carried
    * as STREAMING AGGREGATE STATE per event_type — bounded k=64
    * counters per type regardless of user cardinality, micro-batches
    * merging by the summary-merge rule. Exact per-key counts cannot be
    * streamed at 100 TB (state = every distinct user); the mergeable
    * summary can — this twin is the frequency-sketch sibling of
    * stream_quantile_sketch_twin. Gated exactly like the batch query:
    * sketch VALUES are merge-order-dependent, so the oracle-hashed
    * output is the exact top-5 per type plus int flags asserting the
    * theorems the streamed summary must satisfy — every reported
    * count brackets the true count (bounds_ok) and every key with
    * true frequency > N/k is present (containment_ok). */
  private val heavyHittersTwin = QueryDef(
    "stream_heavy_hitters_twin",
    (s, d) => {
      import s.implicits._
      val k = 64
      val sink = replay(s, s"$d/events.parquet", "complete") { stream =>
        stream
          .filter(col("user_id").isNotNull)
          .select(col("event_type"), col("user_id"))
          .as[(String, Long)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(graft.functions.HeavyHitters.spaceSaving(k).name("summary"))
          .toDF("event_type", "summary")
      }
      val summaries: Map[String, Seq[(Long, Long, Long)]] =
        sink.collect().map { r =>
          r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(c => (c.getLong(0), c.getLong(1), c.getLong(2)))
        }.toMap
      // ONE aggregation pass feeds the exact counts, totals, flags and
      // the output (kdb_heavy_hitters' persist discipline)
      val exact = events(s, d).filter(col("user_id").isNotNull)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n")).persist()
      val totals = exact.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val items = summaries.values.flatten.map(_._1).toSeq.distinct
      val exactBySummary = exact.filter(col("user_id").isin(items: _*))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val flags: Map[String, (Int, Int)] = summaries.map { case (et, cs) =>
        val boundsOk = cs.forall { case (item, cnt, err) =>
          val t = exactBySummary.getOrElse((et, item), 0L)
          cnt >= t && cnt - err <= t
        }
        val inSummary = cs.map(_._1).toSet
        val nt = totals.getOrElse(et, 0L)
        val containOk = exact
          .filter(col("event_type") === et && col("n") > nt / k)
          .collect().map(_.getLong(1)).forall(inSummary)
        et -> (if (boundsOk) 1 else 0, if (containOk) 1 else 0)
      }
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("user_id"))
      val top5 = exact.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).drop("rn")
        .orderBy(col("event_type"), col("n").desc, col("user_id"))
      val rows = top5.collect().map { r =>
        val (b, c) = flags.getOrElse(r.getString(0), (0, 0))
        org.apache.spark.sql.Row(r.getString(0), r.getLong(1), r.getLong(2), b, c)
      }
      exact.unpersist()
      s.createDataFrame(java.util.Arrays.asList(rows: _*),
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType) ::
          org.apache.spark.sql.types.StructField("user_id",
            org.apache.spark.sql.types.LongType) ::
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType) ::
          org.apache.spark.sql.types.StructField("bounds_ok",
            org.apache.spark.sql.types.IntegerType) ::
          org.apache.spark.sql.types.StructField("containment_ok",
            org.apache.spark.sql.types.IntegerType) :: Nil))
    },
    Some("""
      WITH c AS (
        SELECT event_type, user_id, count(*) AS n
        FROM events
        WHERE user_id IS NOT NULL
        GROUP BY 1, 2),
      r AS (
        SELECT event_type, user_id, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, user_id) AS rn
        FROM c)
      SELECT event_type, user_id, n, 1 AS bounds_ok, 1 AS containment_ok
      FROM r WHERE rn <= 5
      ORDER BY event_type, n DESC, user_id"""))

  /** Stream-static broadcast join: the arriving event stream is
    * enriched per micro-batch against a STATIC dimension computed
    * once at job start (per-type corpus totals — the "reference data
    * loaded beside the stream" pattern: tier tables, feature configs,
    * yesterday's rollup), then windowed into hourly per-type counts
    * with each hour's share of its type's total. Gates the one join
    * topology no other twin covers: stateless stream-static inner
    * join (no watermark, no join state — the static side broadcasts
    * inside every micro-batch plan) BELOW a complete-mode windowed
    * aggregation. Share = ONE double division of exact int64 counts.
    * At scale the static side is a broadcast dim (size-bounded),
    * and the post-join aggregation is the same partial-agg shuffle
    * as batch — no per-row state. */
  private val staticJoinTwin = QueryDef(
    "stream_static_join_twin",
    (s, d) => {
      val statics = s.read.parquet(s"$d/events.parquet")
        .groupBy(col("event_type").as("st_type"))
        .agg(count(lit(1)).as("type_total"))
      val out = replay(s, s"$d/events.parquet", "complete") { stream =>
        stream
          .withColumn("ts_ns", tsNs(stream))
          .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
          .join(broadcast(statics), col("event_type") === col("st_type"))
          .groupBy(col("event_type"), col("slot_1h"), col("type_total"))
          .agg(count(lit(1)).as("n"))
      }
      out.select(col("event_type"), col("slot_1h"), col("n"),
        (round(col("n") / col("type_total").cast("double"), 6) + lit(0.0))
          .as("share"))
        .orderBy(col("event_type"), col("slot_1h"))
    },
    Some(s"""
      WITH t AS (
        SELECT event_type AS st_type, count(*) AS type_total
        FROM events GROUP BY 1),
      h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               count(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT event_type, slot_1h, CAST(n AS BIGINT) AS n,
             round(CAST(n AS DOUBLE) / type_total, 6) + 0.0 AS share
      FROM h JOIN t ON event_type = st_type
      ORDER BY event_type, slot_1h"""))

  /** Streaming as-of join replayed over events: each purchase picks
    * up the latest same-user click within the preceding hour via
    * StreamingIngest.asofLatest — the O(1)-state-per-series state-op
    * formulation (latest-right fold), gated against the SQL as-of
    * (row_number over the backward window, unmatched lefts kept with
    * −1 receipts). The third join topology under the streaming gate:
    * stream-stream buffered interval join (intervalJoinTwin),
    * stream-static broadcast (staticJoinTwin), and now the custom
    * stateful as-of. Tie rule pinned by construction: a click at
    * exactly the purchase instant matches with lag 0. */
  private val asofTwin = QueryDef(
    "stream_asof_twin",
    (s, d) => {
      val out = replay2(s, s"$d/events.parquet", "append") { (left, right) =>
        def pts(stream: DataFrame, kind: String) = stream
          .filter(col("event_type") === kind)
          .select(tsNs(stream).as("ts"),
            array(col("user_id").cast("string")).as("tags"),
            col("event_id").as("seq"))
        StreamingIngest.asofLatest(
          pts(left, "purchase"), pts(right, "click"), toleranceNs = Hour).toDF()
      }
      out.select(col("tag0"), col("left_seq"), col("right_seq"),
        col("lag_us"), col("matched"))
        .orderBy(col("left_seq"))
    },
    Some(s"""
      WITH p AS (SELECT CAST(user_id AS VARCHAR) AS tag0, event_id AS left_seq,
                        epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'),
      c AS (SELECT CAST(user_id AS VARCHAR) AS tag0, event_id AS right_seq,
                   epoch_us(ts) AS t FROM events WHERE event_type = 'click'),
      j AS (
        SELECT p.tag0, p.left_seq, c.right_seq, p.t - c.t AS lag_us,
               row_number() OVER (PARTITION BY p.left_seq
                                  ORDER BY c.t DESC, c.right_seq DESC) AS rn
        FROM p JOIN c ON p.tag0 = c.tag0
          AND c.t <= p.t AND c.t > p.t - ${Hour / 1000})
      SELECT tag0, left_seq,
             coalesce(right_seq, -1) AS right_seq,
             coalesce(lag_us, -1) AS lag_us,
             CASE WHEN right_seq IS NULL THEN 0 ELSE 1 END AS matched
      FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) USING (tag0, left_seq)
      ORDER BY left_seq"""))

  /** Streaming CDC changelog apply replayed over events: each event
    * becomes a keyed INSERT / UPDATE / DELETE (deterministic op from
    * event_id), folded into per-user row state by StreamingIngest
    * .cdcApply with STRICT changelog semantics — updates to absent
    * rows are IGNORED (with a receipt), deletes reset, inserts
    * resurrect — which no LWW twin covers. The oracle replays the
    * identical ordered fold per user with a SCALAR-encoded
    * accumulator (nIgnored·2⁴⁰ + cents·2 + exists — DuckDB 1.0
    * list_reduce miscomputes struct accumulators, scalar folds are
    * exact; all ops are integer arithmetic, so the fold is
    * bit-deterministic in both engines). Negative cents would borrow
    * from the opc field in the packing, so BOTH sides assert
    * cents ≥ 0 loudly (raise_error / error()) instead of silently
    * hash-diverging on a future fixture. */
  private val cdcTwin = QueryDef(
    "stream_cdc_twin",
    (s, d) => {
      val out = replay(s, s"$d/events.parquet", "update") { stream =>
        val ops = stream.select(
          col("user_id").as("key"),
          tsNs(stream).as("ts"),
          col("event_id").as("seq"),
          when(col("event_id") % 10 === 0, "D")
            .when(col("event_id") % 3 === 0, "I")
            .otherwise("U").as("op"),
          // the oracle's scalar packing (opc·2⁴⁰ + cents) borrows from
          // the opc field if cents < 0 — fail LOUDLY on both sides
          // rather than hash-diverge if a future fixture goes negative
          when(round(col("value") * 100.0, 0) >= 0,
            round(col("value") * 100.0, 0).cast("long"))
            .otherwise(raise_error(lit(
              "stream_cdc_twin: negative cents breaks the oracle packing")))
            .as("cents"))
        StreamingIngest.cdcApply(ops).toDF()
      }
      // defensive final-state pick (n_ops is monotone per batch); a
      // single-file replay emits exactly one row per key anyway
      out.groupBy(col("key"))
        .agg(max(struct(col("n_ops"), col("is_present"), col("cents"),
          col("n_ignored"))).as("m"))
        .select(col("key").as("user_id"), col("m.is_present").as("is_present"),
          col("m.cents").as("cents"), col("m.n_ops").as("n_ops"),
          col("m.n_ignored").as("n_ignored"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ops AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id AS seq,
               CASE WHEN event_id % 10 = 0 THEN 3
                    WHEN event_id % 3 = 0 THEN 1
                    ELSE 2 END AS opc,
               CASE WHEN round(value * 100) >= 0
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE error('stream_cdc_twin: negative cents breaks packing')
               END AS cents
        FROM events),
      enc AS (
        SELECT user_id,
               list(opc * 1099511627776 + cents ORDER BY ts_ns, seq) AS es,
               count(*) AS n_ops
        FROM ops GROUP BY 1),
      folded AS (
        SELECT user_id, n_ops,
               list_reduce([0::BIGINT] || es, (a, e) ->
                 CASE e // 1099511627776
                   WHEN 1 THEN a - a % 1099511627776
                               + (e % 1099511627776) * 2 + 1
                   WHEN 2 THEN CASE WHEN a % 2 = 1
                               THEN a - a % 1099511627776
                                    + (e % 1099511627776) * 2 + 1
                               ELSE a + 1099511627776 END
                   ELSE a - a % 1099511627776 END) AS acc
        FROM enc)
      SELECT user_id,
             CAST(acc % 2 AS INTEGER) AS is_present,
             (acc % 1099511627776) // 2 AS cents,
             n_ops,
             acc // 1099511627776 AS n_ignored
      FROM folded
      ORDER BY user_id"""))

  /** Streaming ANN ingestion twin: the persisted IVF index
    * (Engine.buildVectorIndex) stays queryable UNDER ingest. Half the
    * embeddings table builds the stored index; the other half arrives
    * through the REAL StreamingIngest path split across 4 parquet
    * files with maxFilesPerTrigger=1 — four genuine micro-batches,
    * each folding one index delta against the stored centroids
    * (vectorIndexRefresh hook). The gate: every streamed vector's
    * post-stream cell assignment and stored float vector EXACTLY
    * equal the batch assignment (operators/Ivf.assign) against the
    * same stored centroids — assignment is a deterministic strict-
    * fold distance + (dist, cid) tie rule, and payload encode/decode
    * plus parquet round-trip float32s bit-exactly, so any mismatch is
    * a real ingest-path bug (delta misfold, watermark skip, wrong
    * cell), never float noise. Streamed epochs use ENGINE-ALLOCATED
    * seqs (allocateSeqs — Engine.putAllocated): micro-batch arrival
    * order is NOT vec_id order, and id-derived explicit seqs would
    * land retro rows below the already-advanced fold watermark, where
    * no refresh ever folds them — the exact hazard the allocation
    * mode exists for, exercised here as deployed. */
  private val annAssignTwin = QueryDef(
    "stream_ann_assign_twin",
    (s, d) => {
      import s.implicits._
      import graft.operators.Ivf
      val T0v = 1600000000L * 1000000000L
      val dir = graft.core.Scratch.dir("graft-sannt")
      val opts = graft.core.EngineOptions("sann", dir, indexDepth = 1,
        payloadSize = 256, bucketDuration = 86400L * 1000000000L,
        resolution = 1000000000L, maxHotBuckets = 40)
      val clock = new graft.core.TestClock(T0v + 86000L * 1000000000L)
      val engine = new graft.core.Engine(s, opts, clock)
      def toPoint(id: Long, v: Seq[Float], seq: Long) =
        // slot = id mod 80000 s: series identity is the TAG; bounded
        // slots keep scale-curve-replicated ids (shifted ~10^12) inside
        // the hot window instead of silently rejecting as future writes
        graft.core.Point(T0v + (id % 80000L) * 1000000000L, Seq(id.toString),
          graft.plans.FloatsFromPayload.encode(v), seq)
      val emb = graft.sources.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      engine.put(emb.filter(col("vec_id") % 2 === 0)
        .as[(Long, Seq[Float])]
        .map { case (id, v) => toPoint(id, v, id) }.toDF())
      engine.buildVectorIndex(k = 4, iters = 2)
      val wm0 = engine.vectorIndexWatermark()
      // streamed half: 4-file split → 4 micro-batches → 4 index deltas
      val srcDir = graft.core.Scratch.dir("graft-sannt-src")
      emb.filter(col("vec_id") % 2 === 1).repartition(4)
        .write.mode("overwrite").parquet(srcDir)
      val stream = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val pts = stream.as[(Long, Seq[Float])]
        .map { case (id, v) => toPoint(id, v, 0L) }
        .toDF().drop("seq")
      val ingest = new StreamingIngest(engine)
      // scope covers processAllAvailable: the per-epoch put/refresh
      // jobs plan (and read the conf) while we block on it
      withReplayPartitions(s) {
        // compactEvery=4 (= one fold, at the final of the 4 epochs):
        // exercise the lifecycle compaction at gate scale —
        // probe-invariant by the compactVectorIndex contract, so the
        // oracle hash is unchanged while the delta chain ends bounded
        // exactly as a production stream would run it; the 12-epoch
        // StreamingIngestSpec covers the repeated-fold cadence
        val q = ingest.start(pts,
          graft.core.Scratch.dir("graft-sannt-ckpt"),
          vectorIndexRefresh = true, allocateSeqs = true,
          vectorIndexCompactEvery = 4)
        try { q.processAllAvailable() } finally q.stop()
      }
      val cent = engine.vectorIndexCentroids()
      val streamed = engine.vectorIndexInverted()
        .filter(col("seq") > wm0)
        .select(col("tag0"), col("vec"), col("cid").as("s_cid"))
      val batch = Ivf.assign(emb.filter(col("vec_id") % 2 === 1), cent)
        .select(col("vec_id"), col("vec_id").cast("string").as("tag0"),
          col("embedding").as("b_vec"), col("cid").as("b_cid"))
      batch.join(streamed, Seq("tag0"), "left_outer")
        .select(col("vec_id"),
          when(col("s_cid") === col("b_cid"), lit(1)).otherwise(lit(0)).as("assign_ok"),
          when(col("vec") === col("b_vec"), lit(1)).otherwise(lit(0)).as("vec_ok"))
        .orderBy(col("vec_id"))
    },
    Some("""
      SELECT vec_id, 1 AS assign_ok, 1 AS vec_ok
      FROM embeddings WHERE vec_id % 2 = 1
      ORDER BY vec_id"""))

  /** Streaming ANN SERVING twin (StreamingIngest.serveAnn — the probe
    * face of the streaming story; annAssignTwin above is the ingest
    * face): the stored index is built once, then a stream of query
    * vectors arrives in 2 genuine micro-batches (file source,
    * maxFilesPerTrigger=1) and each epoch probes through the REAL
    * foreachBatch serving hook. Gate: the union of per-epoch results
    * EXACTLY equals the one-shot batch annSearch over the same query
    * set — probes are pure reads of an unchanged index and every
    * (neighbor, cos) is the same stored float math through the same
    * plan, so the equality is bit-exact, never tolerance-based; the
    * epoch count pins that serving really ran as two queries, not one
    * batch in disguise. */
  private val annProbeTwin = QueryDef(
    "stream_ann_probe_twin",
    (s, d) => {
      import s.implicits._
      val T0v = 1600000000L * 1000000000L
      val dir = graft.core.Scratch.dir("graft-sannp")
      val opts = graft.core.EngineOptions("sannp", dir, indexDepth = 1,
        payloadSize = 256, bucketDuration = 86400L * 1000000000L,
        resolution = 1000000000L, maxHotBuckets = 40)
      val clock = new graft.core.TestClock(T0v + 86000L * 1000000000L)
      val engine = new graft.core.Engine(s, opts, clock)
      def toPoint(id: Long, v: Seq[Float], seq: Long) =
        graft.core.Point(T0v + (id % 80000L) * 1000000000L, Seq(id.toString),
          graft.plans.FloatsFromPayload.encode(v), seq)
      val emb = graft.sources.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      engine.put(emb.as[(Long, Seq[Float])]
        .map { case (id, v) => toPoint(id, v, id) }.toDF())
      engine.buildVectorIndex(k = 4, iters = 2)
      // query stream: 8 fixed queries split into 2 genuine micro-batches
      val qAll = emb.filter(col("vec_id") <= 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val srcDir = graft.core.Scratch.dir("graft-sannp-src")
      qAll.repartition(2).write.mode("overwrite").parquet(srcDir)
      val qStream = s.readStream.schema(qAll.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val served = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
      val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      @volatile var servedSchema: org.apache.spark.sql.types.StructType = null
      val ingest = new StreamingIngest(engine)
      withReplayPartitions(s) {
        val q = ingest.serveAnn(qStream,
          graft.core.Scratch.dir("graft-sannp-ckpt"), nprobe = 2, topk = 5) {
          (res, epoch) =>
            servedSchema = res.schema
            epochs.add(epoch)
            res.collect().foreach(served.add) // bounded: |epoch queries|·topk
        }
        try { q.processAllAvailable() } finally q.stop()
      }
      import scala.jdk.CollectionConverters._
      val servedDf = s.createDataFrame(
        s.sparkContext.parallelize(served.asScala.toSeq, 1), servedSchema)
        .select(col("qid"), col("rk"), col("tag0").as("s_nid"),
          col("cos").as("s_cos"))
      val batch = engine.annSearch(qAll, nprobe = 2, topk = 5)
        .select(col("qid"), col("rk"), col("tag0").as("b_nid"),
          col("cos").as("b_cos"))
      batch.join(servedDf, Seq("qid", "rk"), "full_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_results"),
          count(when(col("s_nid") === col("b_nid") &&
            col("s_cos") === col("b_cos"), 1)).as("n_eq"))
        .select(col("qid"), col("n_results"),
          when(col("n_eq") === col("n_results"), lit(1)).otherwise(lit(0)).as("eq_ok"),
          lit(epochs.size).as("n_epochs"))
        .orderBy(col("qid"))
    },
    Some("""
      SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, 1 AS eq_ok,
             2 AS n_epochs
      FROM embeddings WHERE vec_id <= 7
      ORDER BY qid"""))

  /** Streaming ANN serving at the PRODUCTION tier (serveAnn with
    * AnnTier.Rerank — r13 served only the exact full-vector path; a
    * production deployment serves the two-stage ADC-shortlist +
    * exact-rerank tier, whose probe reads code-sized pages): the
    * stored index is built WITH its PQ tier, then 8 query vectors
    * arrive in 2 genuine micro-batches and each epoch serves through
    * the real foreachBatch hook at a small production-shaped
    * shortlist. Gate: the union of per-epoch served results EXACTLY
    * equals the one-shot batch annSearchRerank at the same
    * (nprobe, topk, shortlist) — pure reads of an unchanged index
    * through the identical two-stage plan are bit-exact, and the
    * epoch count pins that two real serving epochs ran. */
  private val annServeRerankTwin = QueryDef(
    "stream_ann_rerank_twin",
    (s, d) => {
      import s.implicits._
      val T0v = 1600000000L * 1000000000L
      val dir = graft.core.Scratch.dir("graft-sannr")
      val opts = graft.core.EngineOptions("sannr", dir, indexDepth = 1,
        payloadSize = 256, bucketDuration = 86400L * 1000000000L,
        resolution = 1000000000L, maxHotBuckets = 40)
      val clock = new graft.core.TestClock(T0v + 86000L * 1000000000L)
      val engine = new graft.core.Engine(s, opts, clock)
      def toPoint(id: Long, v: Seq[Float], seq: Long) =
        graft.core.Point(T0v + (id % 80000L) * 1000000000L, Seq(id.toString),
          graft.plans.FloatsFromPayload.encode(v), seq)
      val emb = graft.sources.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      // quarter-corpus index: the serve≡batch gate is structural (same
      // stored index both sides), so the full corpus would only tax
      // the per-pass k-means/PQ build; queries still draw from all ids
      engine.put(emb.filter(col("vec_id") % 4 === 0).as[(Long, Seq[Float])]
        .map { case (id, v) => toPoint(id, v, id) }.toDF())
      engine.buildVectorIndex(k = 4, iters = 2,
        pq = Some(graft.core.PqParams(m = 8, k = 16, iters = 1)))
      val qAll = emb.filter(col("vec_id") <= 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val srcDir = graft.core.Scratch.dir("graft-sannr-src")
      qAll.repartition(2).write.mode("overwrite").parquet(srcDir)
      val qStream = s.readStream.schema(qAll.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val served = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
      val epochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      @volatile var servedSchema: org.apache.spark.sql.types.StructType = null
      val ingest = new StreamingIngest(engine)
      withReplayPartitions(s) {
        val q = ingest.serveAnn(qStream,
          graft.core.Scratch.dir("graft-sannr-ckpt"), nprobe = 2, topk = 5,
          tier = StreamingIngest.AnnTier.Rerank(shortlist = 12)) {
          (res, epoch) =>
            servedSchema = res.schema
            epochs.add(epoch)
            res.collect().foreach(served.add) // bounded: |epoch queries|·topk
        }
        try { q.processAllAvailable() } finally q.stop()
      }
      import scala.jdk.CollectionConverters._
      val servedDf = s.createDataFrame(
        s.sparkContext.parallelize(served.asScala.toSeq, 1), servedSchema)
        .select(col("qid"), col("rk"), col("tag0").as("s_nid"),
          col("cos").as("s_cos"))
      val batch = engine.annSearchRerank(qAll, nprobe = 2, topk = 5,
        shortlist = 12)
        .select(col("qid"), col("rk"), col("tag0").as("b_nid"),
          col("cos").as("b_cos"))
      batch.join(servedDf, Seq("qid", "rk"), "full_outer")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_results"),
          count(when(col("s_nid") === col("b_nid") &&
            col("s_cos") === col("b_cos"), 1)).as("n_eq"))
        .select(col("qid"), col("n_results"),
          when(col("n_eq") === col("n_results"), lit(1)).otherwise(lit(0)).as("eq_ok"),
          lit(epochs.size).as("n_epochs"))
        .orderBy(col("qid"))
    },
    Some("""
      SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, 1 AS eq_ok,
             2 AS n_epochs
      FROM embeddings WHERE vec_id <= 7
      ORDER BY qid"""))

  override def defs: Seq[QueryDef] = Seq(
    tumblingTwin, dedupTwin, sessionizeTwin, hoppingTwin, latestTwin,
    intervalJoinTwin, recoveryTwin, rollupTwin, quantileSketchTwin, hllTwin,
    heavyHittersTwin, staticJoinTwin, asofTwin, cdcTwin, annAssignTwin,
    annProbeTwin, annServeRerankTwin)
}
