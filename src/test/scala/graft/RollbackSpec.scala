package graft

import java.nio.file.Files
import graft.core._

/** Engine.rollbackTo — MVCC RESTORE: physical removal of every write
  * above a seq watermark (erase-style row-level rewrite, so files
  * compaction merged across the watermark still split correctly),
  * post-rollback writes landing on the rewritten store, idempotence,
  * and the rollup cascade (deltas past the watermark drop as a chain
  * SUFFIX and the next refresh re-folds survivors from the cut). */
class RollbackSpec extends SparkTestBase {

  private val U1 = Seq("cpu", "user1")
  private val U2 = Seq("cpu", "user2")

  private def mkEngine(now: Long = 11999L): (Engine, TestClock) = {
    val dir = Files.createTempDirectory("graft-rollback").toString
    val opts = EngineOptions(
      databaseName = "testdb", dataDir = dir,
      indexDepth = 2, payloadSize = 8,
      bucketDuration = 1000L, resolution = 10L)
    val clock = new TestClock(now)
    (new Engine(spark, opts, clock), clock)
  }

  private def vals(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    df.collect().map(_.getAs[Double]("value")).toSeq

  test("rollbackTo restores the watermark world; later writes are physically gone; idempotent") {
    val (e, _) = mkEngine()
    e.putDoubles(Seq((11000L, U1, 1.0), (11010L, U2, 2.0)))
    val wm = e.currentSeq()
    e.putDoubles(Seq((11000L, U1, 9.0), (11020L, U2, 8.0))) // overwrite + new slot
    assert(vals(e.getDoubles(11000L, 11010L, U1)) === Seq(9.0))
    val rewritten = e.rollbackTo(wm)
    assert(rewritten === Map(11000L -> ((4L, 2L))))
    // live reads == the pre-rollback as-of world
    assert(vals(e.getDoubles(11000L, 11010L, U1)) === Seq(1.0))
    assert(vals(e.getDoubles(11020L, 11030L, U2)) === Seq(0.0))
    // physically gone, not LWW-hidden: a FUTURE as-of sees nothing newer
    // (getAsOf serves raw payloads; compare against the encoded 1.0)
    assert(e.getAsOf(11000L, 11010L, U1, wm + 1000L).collect()
      .map(_.getAs[Array[Byte]]("payload").toSeq).toSeq ===
      Seq(graft.plans.DoubleFromPayload.encode(1.0).toSeq))
    // idempotent
    assert(e.rollbackTo(wm) === Map.empty[Long, (Long, Long)])
    // the store accepts writes after the rewrite, and they win LWW
    e.putDoubles(Seq((11000L, U1, 5.0)))
    assert(vals(e.getDoubles(11000L, 11010L, U1)) === Seq(5.0))
    assert(vals(e.getDoubles(11010L, 11020L, U2)) === Seq(2.0))
  }

  test("rollbackTo(negative) refuses; rollback at the current seq is a no-op") {
    val (e, _) = mkEngine()
    e.putDoubles(Seq((11000L, U1, 1.0)))
    intercept[IllegalArgumentException] { e.rollbackTo(-1L) }
    assert(e.rollbackTo(e.currentSeq()) === Map.empty[Long, (Long, Long)])
    assert(vals(e.getDoubles(11000L, 11010L, U1)) === Seq(1.0))
  }

  test("rollbackTo drops rollup deltas past the watermark (chain suffix); refresh re-folds") {
    val (e, _) = mkEngine()
    e.putDoubles(Seq((11000L, U1, 1.0), (11010L, U1, 2.0)))
    assert(e.refreshRollup(100L) === 1L) // delta1: one U1 partial
    val wm = e.currentSeq()
    e.putDoubles(Seq((11020L, U1, 4.0), (11000L, U2, 10.0)))
    assert(e.refreshRollup(100L) === 2L) // delta2: U1 + U2 partials
    e.rollbackTo(wm)
    // delta2 dropped whole: U2's aggregate is gone, U1 is delta1-only
    assert(e.rollup(11000L, 11100L, U2, 100L).collect().isEmpty)
    val got = e.rollup(11000L, 11100L, U1, 100L).collect()
    assert(got.length === 1)
    assert(got(0).getLong(3) === 2L)     // cnt
    assert(got(0).getDouble(4) === 3.0)  // vsum
    // the chain still covers and nothing is left to fold
    assert(e.refreshRollup(100L) === 0L)
    // a delta SPANNING the watermark must drop too, and refresh
    // re-folds the surviving half from the cut point
    e.putDoubles(Seq((11030L, U1, 8.0)))
    val wm2 = e.currentSeq()
    e.putDoubles(Seq((11040L, U1, 16.0)))
    assert(e.refreshRollup(100L) === 1L) // one delta spans wm2
    e.rollbackTo(wm2)
    assert(e.refreshRollup(100L) === 1L) // survivor 8.0 re-folded
    val g2 = e.rollup(11000L, 11100L, U1, 100L).collect()
    assert(g2.length === 1)
    assert(g2(0).getLong(3) === 3L)
    assert(g2(0).getDouble(4) === 11.0)
  }
}
