package graft.queries

import java.nio.file.Files
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

  /** events.ts → int64 ns, same dispatch as KdbQueries.ev (the
    * session reads ns-annotated parquet as LongType via
    * spark.sql.legacy.parquet.nanosAsLong). */
  private def tsNs(df: DataFrame) = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType      => col("ts")
      case TimestampType => unix_micros(col("ts")) * lit(1000L)
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other")
    }
  }

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
        val tmp = Files.createTempDirectory("graft-twin-src")
        java.nio.file.Files.createSymbolicLink(
          tmp.resolve(p.getFileName), p.toAbsolutePath)
        tmp.toString
      }
    val stream = s.readStream.schema(schema).parquet(dir)
    val table = s"stream_twin_${System.nanoTime()}"
    val q = transform(stream).writeStream
      .format("memory").queryName(table)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-twin-ckpt").toString)
      .start()
    q.awaitTermination()
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
    * nondeterministic, while the key set is exact. */
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

  override def defs: Seq[QueryDef] = Seq(tumblingTwin, dedupTwin)
}
