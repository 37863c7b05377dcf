package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Engine

/** Structured Streaming ingest for the engine: readStream → validate →
  * foreachBatch upsert, the streaming face of DBase.Put.
  *
  * The reference's "streaming" knobs map cleanly onto Spark:
  *  - writable window = hot buckets (dbucket/dbucket.go:119-122) —
  *    enforced by Engine.classify against the injected clock, NOT by
  *    a Spark watermark: a watermark silently drops late rows, while
  *    the reference returns ErrWriteOnReadOnly — we must surface
  *    rejects, so validation is explicit and the per-batch ledger is
  *    kept in [[rejectLedger]].
  *  - future-write rejection (dbase/dbase.go:129-132) — same path.
  *  - bucket eviction ≈ state cleanup: nothing to do here because the
  *    sink is the partitioned table itself; retention runs via
  *    Engine.removeBefore.
  *
  * foreachBatch gives exactly-once-per-epoch appends (batch id is
  * checkpointed); the engine's last-writer-wins `seq` makes replayed
  * epochs idempotent at (series, slot) granularity. Each micro-batch
  * publishes one atomic batch dir (Engine.publishBatch), so
  * high-frequency triggers accumulate dirs in the hot buckets —
  * schedule periodic Engine.compactBucket on buckets leaving the hot
  * window to fold a day's micro-batches into one clustered file set.
  *
  * Model: "Structured Streaming: A Declarative API for Real-Time
  * Applications in Apache Spark" (SIGMOD 2018) — incremental
  * micro-batch execution of the same declarative plan the batch
  * queries use.
  */
final class StreamingIngest(engine: Engine) {

  /** Per-epoch ledgers keyed by batch id: a replayed epoch (crash
    * between write and checkpoint commit) OVERWRITES its own entry
    * instead of double-counting — the engine write itself is
    * idempotent at (series, slot) via the LWW seq, and the ledger
    * must match it. */
  private val perBatch: TrieMap[Long, Map[String, Long]] = TrieMap.empty

  /** reason → row count, accumulated across all distinct micro-batches. */
  def rejectLedger: Map[String, Long] =
    perBatch.values.flatten
      .groupMapReduce(_._1)(_._2)(_ + _)

  /** Start the ingest query. `points` must be a streaming DataFrame
    * with columns (ts LONG, tags ARRAY<STRING>, payload BINARY,
    * seq LONG). `autoCompact = true` adds the hot→cold maintenance
    * sweep after each micro-batch: any bucket that has left the hot
    * window with its data still split across multiple micro-batch
    * dirs is folded once into its clustered cold form — the
    * reference's hot→cold transition (dbucket going cold becomes the
    * immutable read-optimized rblock, dbase/dbase.go:403-424) as a
    * streaming hook, so high-frequency triggers can't pile up
    * unbounded small dirs on cold buckets. The sweep is stateless and
    * idempotent: `fragmentedColdBuckets` asks the filesystem which
    * cold buckets hold >1 committed dir, so an already-folded bucket
    * costs one listing, never a rewrite, across restarts too.
    *
    * `rollupResolution = Some(res)` additionally maintains the
    * engine's continuous aggregate per micro-batch: after each epoch's
    * write, refreshRollup folds exactly that epoch's rows (they are
    * precisely the rows above the rollup watermark — the seq axis and
    * the epoch axis advance together). Replay safety composes: a
    * replayed epoch re-puts rows with FRESH seqs, so the refresh after
    * it folds them like any other new writes, and `last` still
    * resolves by max seq — dashboards served from the rollup converge
    * to exactly what get() serves, without the engine ever scanning
    * history twice.
    *
    * `vectorIndexRefresh = true` keeps the persisted ANN index
    * queryable UNDER ingest: after each epoch's write,
    * Engine.refreshVectorIndex assigns exactly that epoch's vectors
    * to the STORED coarse cells (one narrow broadcast pass — the
    * k-means assignment shape, no re-training) and appends one index
    * delta, so annSearch between micro-batches serves everything up
    * to the last committed epoch. Same exactly-once argument as the
    * rollup: the delta's seq range is its name, replayed epochs
    * re-fold under fresh seqs, and tombstones keep overwritten
    * vectors from ever serving stale. Requires a built index
    * (Engine.buildVectorIndex) — fails loudly otherwise.
    *
    * `allocateSeqs = true` drops the caller's seq column and lets the
    * engine allocate arrival-monotone seqs per epoch
    * (Engine.putAllocated). REQUIRED whenever a watermark consumer
    * (rollupResolution / vectorIndexRefresh) is on and the stream's
    * explicit seqs are not monotone with arrival: seq is the fold
    * axis, and a retro-seq row (id-derived seqs across shuffled
    * micro-batches) lands below the already-advanced watermark and is
    * silently never folded — the incremental consumers would
    * under-count forever. Replay caveat: engine-allocated seqs make a
    * replayed epoch's rows FRESH writes (new seqs), so the rollup
    * observation stream double-counts them — keep explicit idempotent
    * seqs when upstream delivery is at-least-once and you need
    * exactly-once counters; allocate when the consumer folds
    * LWW-style state (vector index, latest-value) or upstream is
    * exactly-once (checkpointed file source).
    *
    * `vectorIndexCompactEvery = N` (with vectorIndexRefresh on) folds
    * the index delta chain every N epochs: refresh appends ONE
    * `delta=` dir per micro-batch, so a week-long high-frequency
    * stream would otherwise grow an unbounded cover that every
    * annSearch lists and unions — probe latency degrading linearly
    * with uptime. Compaction is probe-invariant (per-key max-seq fold,
    * the compactVectorIndex contract), so wiring it into the lifecycle
    * changes no query result, only bounds the cover at ≤ N dirs. Keyed
    * to the checkpointed batchId, so replayed epochs compact at the
    * same points and a restart never drifts the cadence. The
    * bucket-autoCompact analog for the ANN store. */
  def start(points: DataFrame, checkpointDir: String,
      autoCompact: Boolean = false,
      rollupResolution: Option[Long] = None,
      vectorIndexRefresh: Boolean = false,
      allocateSeqs: Boolean = false,
      vectorIndexCompactEvery: Int = 0): StreamingQuery = {
    require(vectorIndexCompactEvery == 0 || vectorIndexRefresh,
      "vectorIndexCompactEvery needs vectorIndexRefresh = true (no chain grows without it)")
    require(vectorIndexCompactEvery >= 0,
      s"vectorIndexCompactEvery must be non-negative (got $vectorIndexCompactEvery)")
    points.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        perBatch.put(batchId,
          if (allocateSeqs) engine.putAllocated(batch) else engine.put(batch))
        if (autoCompact)
          engine.fragmentedColdBuckets().foreach(engine.compactBucket)
        rollupResolution.foreach(engine.refreshRollup)
        if (vectorIndexRefresh) engine.refreshVectorIndex()
        if (vectorIndexCompactEvery > 0 &&
          (batchId + 1) % vectorIndexCompactEvery == 0)
          engine.compactVectorIndex()
        ()
      }
      .start()
  }
  /** Streaming ANN serving — the PROBE face of the streaming story
    * (ingest above keeps the index fresh; this serves it): every
    * micro-batch of query rows (qid, qv) probes the stored index via
    * Engine.annSearch and hands the epoch's result to `sink` with its
    * batch id. Probes are pure reads of atomically-published state,
    * so an epoch sees one consistent index watermark — a concurrent
    * refresh/compact flips between epochs, never inside one. The
    * probe cost per epoch is the batch probe cost: the collected cid
    * set stays bounded by |epoch queries|·nprobe, and the static
    * partition prune holds exactly as in batch (the 100 TB serving
    * shape: a query stream reads nprobe/k of the index per epoch). */
  def serveAnn(queries: DataFrame, checkpointDir: String,
      nprobe: Int, topk: Int,
      tier: StreamingIngest.AnnTier = StreamingIngest.AnnTier.Exact)
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val res = tier match {
          case StreamingIngest.AnnTier.Exact =>
            engine.annSearch(batch, nprobe, topk)
          case StreamingIngest.AnnTier.Adc =>
            engine.annSearchAdc(batch, nprobe, topk)
          case StreamingIngest.AnnTier.Rerank(shortlist) =>
            engine.annSearchRerank(batch, nprobe, topk, shortlist)
        }
        sink(res, epoch)
        ()
      }
      .start()
}

object StreamingIngest {

  /** Which retrieval tier [[StreamingIngest.serveAnn]] serves per
    * epoch. Production deployments serve Adc or Rerank — the tiers
    * whose probe reads code-sized pages instead of full vectors (the
    * 100 TB serving shape); Exact is the small-index/debug path. */
  sealed trait AnnTier
  object AnnTier {
    /** Full-vector cosine top-k (Engine.annSearch). */
    case object Exact extends AnnTier
    /** PQ code-only asymmetric-distance top-k (Engine.annSearchAdc). */
    case object Adc extends AnnTier
    /** Two-stage: ADC shortlist, exact-vector rerank of `shortlist`
      * candidates per query (Engine.annSearchRerank). */
    final case class Rerank(shortlist: Int) extends AnnTier
  }

  /** Per-series session state carried across micro-batches. */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /** One closed session (gap exceeded). */
  final case class SessionOut(tag0: String, start_us: Long, end_us: Long, n: Long)

  /** Custom-state streaming: sessionize points per series with
    * flatMapGroupsWithState — the KeyValueGroupedDataset state API for
    * semantics windowed aggs can't express (variable-length sessions
    * keyed by activity gaps). State is one tiny SessionState per
    * series, persisted in the state store across micro-batches; a
    * session closes (emits) when the next point arrives more than
    * `gapUs` after the last. Events inside one micro-batch are sorted
    * per key before folding — cross-batch order is the stream's
    * responsibility (upstream watermark), as usual for state ops. */
  def sessionize(points: DataFrame, gapUs: Long): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(element_at(col("tags"), 1).as("tag0"), expr("ts div 1000").as("ts_us"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[SessionState]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { ts =>
            cur match {
              case Some(s) if ts - s.lastUs > gapUs =>
                closed += SessionOut(key, s.startUs, s.lastUs, s.n)
                cur = Some(SessionState(ts, ts, 1))
              case Some(s) =>
                cur = Some(s.copy(lastUs = ts, n = s.n + 1))
              case None =>
                cur = Some(SessionState(ts, ts, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Per-series LWW state carried across micro-batches. */
  final case class LatestState(slotNs: Long, seq: Long, payload: Array[Byte])

  /** The current value of one series after a micro-batch. */
  final case class LatestOut(tag0: String, slot_ns: Long, seq: Long, payload: Array[Byte])

  /** Streaming latest-value snapshot: mapGroupsWithState maintains,
    * per series, the write at the greatest (slot, seq) — kdb's LWW
    * positional-overwrite rule as live state, the streaming twin of
    * the batch kdb_latest query. Each micro-batch emits the updated
    * current value for every series it touched (sink runs in Update
    * mode); state is one tiny record per series, independent of
    * stream length. Late or replayed rows fold in exactly like the
    * batch LWW resolve: a (slot, seq) below the state's is a no-op,
    * so at-least-once delivery upstream cannot corrupt the snapshot. */
  def latestPerSeries(points: DataFrame, resolutionNs: Long): org.apache.spark.sql.Dataset[LatestOut] = {
    require(resolutionNs > 0, s"resolutionNs must be positive (got $resolutionNs)")
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(element_at(col("tags"), 1).as("tag0"),
        (col("ts") - col("ts") % resolutionNs).as("slot_ns"),
        col("seq"), col("payload"))
      .as[(String, Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Long, Array[Byte])],
         state: org.apache.spark.sql.streaming.GroupState[LatestState]) =>
          val best = rows.foldLeft(state.getOption) { (acc, r) =>
            val keep = acc.exists(b =>
              b.slotNs > r._2 || (b.slotNs == r._2 && b.seq >= r._3))
            if (keep) acc else Some(LatestState(r._2, r._3, r._4))
          }.get // rows is non-empty for every invoked key
          state.update(best)
          LatestOut(key, best.slotNs, best.seq, best.payload)
      }
  }

  /** Per-window HLL register state (128 registers). */
  final case class HllState(regs: Array[Long])
  final case class HllOut(w_start_us: Long, sreg: Long, v_zero: Int)

  /** Streaming distinct-cardinality sketch: mapGroupsWithState keyed
    * by tumbling window maintains 128 HLL register maxima — the
    * MERGEABLE sketch state whose size is constant in stream length
    * (the property that makes cardinality tractable in a stream at
    * all; exact distinct state grows with the key universe). Each
    * micro-batch folds its rows' (register, rho) pairs into the state
    * with max (idempotent and commutative, so at-least-once upstream
    * delivery and late replays cannot corrupt the sketch — the same
    * argument as latestPerSeries' LWW fold) and emits the window's
    * harmonic denominator Σ2^(54−M) as an EXACT scaled int64 plus
    * the zero-register count; the estimate itself is left to the
    * consumer so the emitted state is pure integers (the batch twin
    * kdb_sliding_hll and the stream_hll_twin oracle apply the same
    * spliced α·m²·2⁵⁴ constant). The hash/register math is
    * bit-identical to the batch rendering: h = first 15 md5 hex
    * chars, idx = h mod 128, rho = 54 − bitlen(h div 128). */
  def hllRegisters(points: DataFrame, windowNs: Long): org.apache.spark.sql.Dataset[HllOut] = {
    requireMicros("windowNs", windowNs)
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = points.sparkSession
    import spark.implicits._
    points // (ts ns, key string)
      .select(expr(s"(ts - ts % $windowNs) div 1000").as("w_start_us"),
        col("key"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (w: Long, rows: Iterator[(Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[HllState]) =>
          val regs = state.getOption.map(_.regs).getOrElse(new Array[Long](128))
          val md5 = java.security.MessageDigest.getInstance("MD5")
          rows.foreach { case (_, key) =>
            md5.reset()
            val dg = md5.digest(key.getBytes("UTF-8"))
            // first 15 hex chars of the digest = top 60 bits: pack the
            // leading 8 bytes big-endian, drop the 16th hex nibble —
            // bit-identical to the hash60/md5-substring rendering, no
            // per-row string allocation on the streaming hot path
            var packed = 0L
            var bi = 0
            while (bi < 8) { packed = (packed << 8) | (dg(bi) & 0xffL); bi += 1 }
            val h = packed >>> 4
            val idx = (h % 128).toInt
            val v = h / 128
            val rho =
              if (v == 0) 54L
              else 54L - (64 - java.lang.Long.numberOfLeadingZeros(v))
            if (rho > regs(idx)) regs(idx) = rho
          }
          state.update(HllState(regs))
          var sreg = 0L
          var vz = 0
          var i = 0
          while (i < 128) {
            sreg += 1L << (54 - regs(i))
            if (regs(i) == 0L) vz += 1
            i += 1
          }
          HllOut(w, sreg, vz)
      }
  }

  /** All streaming window/slide/watermark durations are rendered in µs
    * (event_time is a µs timestamp): a sub-µs or non-µs-aligned value
    * would silently truncate at /1000 and shift every window boundary
    * — surface it as a caller error instead (same contract as
    * intervalJoin's tolerance). Window/slide/tolerance must be ≥ 1 µs
    * (a zero-width window is meaningless); watermarks additionally
    * accept 0 — "0 microseconds" is a valid zero-lateness delay in
    * Spark and zero-delay callers predate this validation. */
  private def requireMicros(name: String, ns: Long, allowZero: Boolean = false): Unit =
    require((ns >= 1000 || (allowZero && ns == 0)) && ns % 1000 == 0,
      s"$name must be a ${if (allowZero) "non-negative" else "positive"} multiple of 1000 ns (got $ns)")

  /** Streaming tumbling-window aggregation over ingested points: the
    * Structured Streaming analog of the batch kdb_tumbling_window
    * query. Event time = ts ns → µs timestamp (window() needs
    * TimestampType); watermark delay expresses how long late data may
    * lag — set it to maxHotBuckets × bucketDuration to mirror the
    * reference's writable window. Emits one row per (tag0, window)
    * with the write count. */
  def tumblingCounts(points: DataFrame, windowNs: Long, watermarkNs: Long): DataFrame = {
    requireMicros("windowNs", windowNs)
    requireMicros("watermarkNs", watermarkNs, allowZero = true)
    points
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", s"${watermarkNs / 1000} microseconds")
      .withColumn("tag0", element_at(col("tags"), 1))
      .groupBy(col("tag0"), window(col("event_time"), s"${windowNs / 1000} microseconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("tag0"), unix_micros(col("window.start")).as("w_start_us"), col("n"))
  }

  /** Streaming hopping-window aggregation: window(ts, size, slide)
    * assigns each point to size/slide overlapping windows (the
    * streaming twin of the batch kdb_hopping_window explode). Same
    * watermark contract as tumblingCounts; the multi-assignment
    * happens before the partial aggregation, so map-side combine
    * absorbs the fan-out exactly as in the batch shape. */
  def hoppingCounts(points: DataFrame, windowNs: Long, slideNs: Long,
      watermarkNs: Long): DataFrame = {
    requireMicros("windowNs", windowNs)
    requireMicros("slideNs", slideNs)
    requireMicros("watermarkNs", watermarkNs, allowZero = true)
    points
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", s"${watermarkNs / 1000} microseconds")
      .withColumn("tag0", element_at(col("tags"), 1))
      .groupBy(col("tag0"),
        window(col("event_time"),
          s"${windowNs / 1000} microseconds", s"${slideNs / 1000} microseconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("tag0"), unix_micros(col("window.start")).as("w_start_us"), col("n"))
  }

  /** Watermarked stream-stream interval join: each left point picks up
    * the right-stream points landing within [left_time, left_time +
    * toleranceNs) on the same leading tag — the streaming enrichment
    * join (purchases × the clicks inside their attribution window).
    * Both sides carry the SAME watermark and the join predicate bounds
    * right_time relative to left_time, which is exactly what lets
    * Structured Streaming expire buffered state: a side's rows are
    * dropped once the other side's watermark passes their join window,
    * so state is O(watermark × rate), not stream-lifetime. Output
    * columns are role-prefixed (left_/right_) so self-joins of one
    * source stay unambiguous. */
  def intervalJoin(left: DataFrame, right: DataFrame, toleranceNs: Long,
      watermarkNs: Long): DataFrame = {
    requireMicros("toleranceNs", toleranceNs)
    requireMicros("watermarkNs", watermarkNs, allowZero = true)
    def shape(df: DataFrame, role: String) = df
      .select(col("seq").as(s"${role}_seq"),
        element_at(col("tags"), 1).as(s"${role}_tag"),
        timestamp_micros(expr("ts div 1000")).as(s"${role}_time"))
      .withWatermark(s"${role}_time", s"${watermarkNs / 1000} microseconds")
    shape(left, "left").join(shape(right, "right"),
      expr(s"""left_tag = right_tag AND
               right_time >= left_time AND
               right_time < left_time + interval ${toleranceNs / 1000} microseconds"""))
  }

  /** One as-of match: the latest right point at-or-before each left
    * point. `right_seq`/`lag_us` are −1 with matched=0 when no right
    * sits inside the tolerance window. */
  final case class AsofOut(tag0: String, left_seq: Long, left_ts_us: Long,
      right_seq: Long, lag_us: Long, matched: Int)

  /** Streaming as-of join — kdb's signature join as a STATE op, not a
    * buffered join: for each left point, the latest right point of the
    * same series with right_ts ∈ (left_ts − tolerance, left_ts]. The
    * insight that makes it streamable with O(1) state per series is
    * that as-of looks BACKWARD only — the sole state needed is the
    * latest (ts, seq) right point seen, monotonically folded, so state
    * is one tiny record per series regardless of stream length or
    * tolerance (a buffered interval join holds every right row inside
    * the watermark instead). Within a micro-batch rows fold in
    * (ts, role, seq) order with rights before lefts at equal ts, so a
    * same-instant right matches with lag 0; cross-batch order is the
    * stream's responsibility, as for every state op. Exclusive lower
    * bound mirrors [[intervalJoin]]'s exclusive upper bound. */
  def asofLatest(left: DataFrame, right: DataFrame,
      toleranceNs: Long): org.apache.spark.sql.Dataset[AsofOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    requireMicros("toleranceNs", toleranceNs)
    val tolUs = toleranceNs / 1000
    val spark = left.sparkSession
    import spark.implicits._
    def shape(df: DataFrame, role: Int) = df
      .select(element_at(col("tags"), 1).as("tag0"),
        expr("ts div 1000").as("ts_us"), col("seq"), lit(role).as("role"))
    shape(right, 0).unionByName(shape(left, 1))
      .as[(String, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Long, Int)],
            state: GroupState[(Long, Long)]) =>
          val sorted = rows.toSeq.sortBy { case (_, ts, seq, role) => (ts, role, seq) }
          var latest = state.getOption // latest right as (ts_us, seq)
          val out = Seq.newBuilder[AsofOut]
          sorted.foreach { case (_, ts, seq, role) =>
            if (role == 0) {
              if (latest.forall { case (lt, ls) => ts > lt || (ts == lt && seq > ls) })
                latest = Some((ts, seq))
            } else latest match {
              case Some((rt, rs)) if ts - rt < tolUs =>
                out += AsofOut(key, seq, ts, rs, ts - rt, 1)
              case _ =>
                out += AsofOut(key, seq, ts, -1L, -1L, 0)
            }
          }
          latest.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming exact dedup: drop re-deliveries of the same content key
    * while bounding state with the watermark —
    * dropDuplicatesWithinWatermark keeps a key's state only until the
    * watermark passes it, so state size tracks the late-data horizon,
    * not the stream's lifetime (the unbounded-state trap of plain
    * dropDuplicates on an infinite stream). The dedup key is the
    * md5 of the payload + the tag tuple — the streaming twin of
    * llm_dedup_exact's content hash. */
  def dedupStream(points: DataFrame, watermarkNs: Long): DataFrame = {
    requireMicros("watermarkNs", watermarkNs, allowZero = true)
    points
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", s"${watermarkNs / 1000} microseconds")
      .withColumn("content_key",
        md5(concat(concat_ws("\u0000", col("tags")).cast("binary"), col("payload"))))
      .dropDuplicatesWithinWatermark("content_key")
  }

  /** Per-key CDC row state: `exists` is the row's liveness, `cents`
    * its current value (0 while absent), plus apply receipts. */
  final case class CdcState(exists: Boolean, cents: Long, nOps: Long, nIgnored: Long)

  /** One emitted row-state snapshot per key touched by a micro-batch. */
  final case class CdcOut(key: Long, is_present: Int, cents: Long,
      n_ops: Long, n_ignored: Long)

  /** Streaming CDC changelog apply — the Debezium/Delta-merge ingestion
    * topology: a stream of keyed INSERT/UPDATE/DELETE operations folds
    * into per-key row state with STRICT changelog semantics (not plain
    * LWW): INSERT writes the row (resurrecting a deleted key), UPDATE
    * applies only if the row currently exists (an update to an absent
    * row is counted in the `n_ignored` receipt, exactly what a MERGE's
    * WHEN MATCHED clause would skip), DELETE removes the row and
    * resets its value. Ops apply in (ts, seq) order — the within-batch
    * sort is bounded by one key's batch volume, and state is one small
    * record per key regardless of stream length (the latestPerSeries
    * scale discipline). Update-mode sinks receive the post-batch state
    * of every touched key; the receipts (`n_ops`, `n_ignored`) are the
    * apply audit a CDC pipeline reconciles against the source ledger.
    *
    * Input columns: key (long), ts (long ns), seq (long),
    * op ("I" | "U" | "D"), cents (long). */
  def cdcApply(ops: DataFrame): org.apache.spark.sql.Dataset[CdcOut] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = ops.sparkSession
    import spark.implicits._
    ops.select(col("key"), col("ts"), col("seq"), col("op"), col("cents"))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[CdcState]) =>
          val init = state.getOption.getOrElse(CdcState(exists = false, 0L, 0L, 0L))
          val next = rows.toVector.sortBy(r => (r._2, r._3)).foldLeft(init) {
            (st, r) =>
              val applied = r._4 match {
                case "I" => st.copy(exists = true, cents = r._5)
                case "U" =>
                  if (st.exists) st.copy(cents = r._5)
                  else st.copy(nIgnored = st.nIgnored + 1)
                case "D" => st.copy(exists = false, cents = 0L)
                case other =>
                  throw new IllegalArgumentException(
                    s"cdcApply: unknown op '$other' for key $key")
              }
              applied.copy(nOps = applied.nOps + 1)
          }
          state.update(next)
          CdcOut(key, if (next.exists) 1 else 0, next.cents, next.nOps, next.nIgnored)
      }
  }
}
