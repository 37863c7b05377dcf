package graft.core

/** Engine configuration — the Spark-native mirror of the reference's
  * `Options` struct (dbase/dbase.go:30-53). All durations are in
  * nanoseconds, exactly as the reference documents
  * (dbase/dbase.go:44-49).
  *
  * @param databaseName  logical name; bucket partition dirs live under
  *                      `dataDir/databaseName`
  * @param dataDir       storage root (any Hadoop-compatible FS URI —
  *                      local path in tests, object store at scale)
  * @param indexDepth    fixed tag-tuple arity, enforced per write
  *                      (dbase/dbase.go:38-39, 134-142)
  * @param payloadSize   fixed payload byte size, enforced per write
  *                      (dbase/dbase.go:41-42, 144-146)
  * @param bucketDuration time-partition width in ns (one parquet
  *                      partition dir per bucket, dbucket/dbucket.go:62-65)
  * @param resolution    slot width in ns; ts is floored to it on both
  *                      write and read (dbase/dbase.go:127, 163-164)
  * @param maxHotBuckets number of most-recent buckets that accept
  *                      writes (dbase/dbase.go:17-18); older buckets
  *                      are read-only (dbucket/dbucket.go:119-122)
  * @param filesPerBucket ingest write fan-out per bucket per batch.
  *                      1 (default) = one task and one file per bucket
  *                      — minimal file count, right for steady small
  *                      batches. Raise for bulk backfills where a
  *                      single bucket's batch share exceeds what one
  *                      task should write (~a few hundred MB): writes
  *                      then spread over N series-hashed tasks per
  *                      bucket at the cost of N files per batch
  *                      (compaction re-merges them).
  * @param writerLeaseTtlMs staleness horizon (wall-clock ms) for the
  *                      cross-JVM destructive-writer lease: a lease
  *                      whose heartbeat is older than this is treated
  *                      as a crashed writer and stolen. Operational
  *                      tuning (not a layout property); lower it in
  *                      tests, raise it where clock skew between
  *                      writers exceeds the default.
  */
final case class EngineOptions(
    databaseName: String,
    dataDir: String,
    indexDepth: Int,
    payloadSize: Int,
    bucketDuration: Long,
    resolution: Long,
    maxHotBuckets: Int = 2,
    filesPerBucket: Int = 1,
    writerLeaseTtlMs: Long = 60000L) {
  require(bucketDuration > 0 && resolution > 0,
    "bucketDuration and resolution must be positive")
  // dbase/dbase.go:71-73 — bucket must hold a whole number of slots
  require(bucketDuration % resolution == 0,
    "bucketDuration must be a multiple of resolution")
  require(indexDepth > 0, "indexDepth must be positive")
  require(payloadSize > 0, "payloadSize must be positive")
  // maxHotBuckets = 0 would make minHotExclusive the current bucket
  // and reject EVERY write as err_write_on_read_only
  require(maxHotBuckets > 0, "maxHotBuckets must be positive")
  require(filesPerBucket > 0, "filesPerBucket must be positive")
  require(writerLeaseTtlMs > 0, "writerLeaseTtlMs must be positive")

  /** Slots per bucket = payloadCount of one record (dblock/dblock.go:80). */
  def payloadCount: Long = bucketDuration / resolution

  def tablePath: String = s"$dataDir/$databaseName"
}

/** Product-quantization parameters for the persisted vector index's
  * optional ADC tier (Jégou et al., PAMI 2011): the vector space
  * splits into `m` subspaces with a `k`-entry codebook each (trained
  * `iters` Lloyd rounds, graft.operators.Pq discipline), so a stored
  * row carries m small codes — at dim 64 / m 8 that is 8 codes in
  * place of 64 floats, the 32× byte cut that makes a 100 TB ANN scan
  * read code-sized pages instead of vectors. */
final case class PqParams(m: Int, k: Int, iters: Int) {
  require(m > 0 && k > 0 && iters >= 0, s"PqParams: m=$m k=$k iters=$iters")
}

/** Injectable time source (reference pattern: clock/clock.go:13-46 —
  * validation never reads the wall clock directly, so tests can pin
  * the timeline exactly like dbase_test.go:19-21 does). */
trait Clock {
  def nowNs: Long
}

object SystemClock extends Clock {
  override def nowNs: Long = System.currentTimeMillis() * 1000000L
}

/** Test clock with a settable instant (clock/clock.go:33-46 `Goto`). */
final class TestClock(@volatile private var now: Long) extends Clock {
  override def nowNs: Long = now
  def goto(ts: Long): Unit = { now = ts }
}

/** One time-series point (kdb.go:7): ns timestamp, fixed-arity tag
  * tuple, opaque fixed-size payload. `seq` is the ingest sequence used
  * for last-writer-wins resolution — the reference gets this for free
  * from positional mmap overwrites (dblock/dblock.go:198-205); a
  * distributed engine must carry it explicitly. */
final case class Point(ts: Long, tags: Seq[String], payload: Array[Byte], seq: Long = 0L)

/** Engine error taxonomy (dbase/dbase.go:22-28, dbucket/dbucket.go:19-22). */
object EngineErrors {
  val InvalidTimestamp = "err_invalid_timestamp"
  val InvalidIndexValues = "err_invalid_index_values"
  val InvalidPayload = "err_invalid_payload"
  val InvalidSeq = "err_invalid_seq"
  val WriteOnReadOnly = "err_write_on_read_only"
  /** Reopen with layout options differing from the table's persisted
    * manifest (indexDepth / payloadSize / bucketDuration / resolution
    * — the reference's New-validates-Options contract). */
  val OptionsMismatch = "err_options_mismatch"
  /** A destructive verb found another live writer's lease on the
    * table (cross-JVM single-writer guard) — fail loudly instead of
    * interleaving staging sweeps with the holder. */
  val WriterConflict = "err_writer_conflict"
  val Ok = "ok"
}
