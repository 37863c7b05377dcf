package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SeriesScan

/** SeriesScan must reproduce the per-series window scans exactly —
  * exclusive prefix sum, grand total, and the tick-rule carried sign
  * (lag → sign-of-delta → last non-null) — including negative values,
  * zero-delta runs that straddle range-partition boundaries, and
  * single-row series — while never planning a window partitioned by
  * the series key alone (the per-series funnel it exists to remove). */
class SeriesScanSpec extends SparkTestBase {

  // 211 rows over 3 series; values mix sign and repeat (id div 3
  // collapses consecutive deltas to zero) so the carry must cross
  // zero-delta runs AND partition boundaries; one extra single-row
  // series exercises the degenerate fold
  private def fixture = spark.range(211)
    .selectExpr("id", "concat('s', id % 3) AS series",
      "CAST((id div 3) * CASE WHEN id % 7 = 0 THEN -5 ELSE 3 END AS LONG) AS v")
    .union(spark.range(1).selectExpr("9999L AS id", "'lone' AS series", "42L AS v"))

  private def reference = {
    val ws = Window.partitionBy(col("series")).orderBy(col("id"))
    val wr = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fixture
      .withColumn("excl_w", coalesce(sum(col("v")).over(
        ws.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot_w", sum(col("v")).over(Window.partitionBy(col("series"))))
      .withColumn("d", col("v") - lag(col("v"), 1).over(ws))
      .withColumn("s", when(col("d") > 0, 1L).when(col("d") < 0, -1L))
      .withColumn("dir_w", last(col("s"), ignoreNulls = true).over(wr))
  }

  test("scan equals the per-series window reference (excl, tot, dir)") {
    val got = SeriesScan.scan(fixture, "series", Seq(col("id")), col("v"),
        exclName = "excl", totName = Some("tot"), dirName = Some("dir"))
      .select("id", "excl", "tot", "dir").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3)))
      .toMap
    val want = reference
      .select("id", "excl_w", "tot_w", "dir_w").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3)))
      .toMap
    assert(got === want)
  }

  test("a NULL series key is its own group, not silently dropped") {
    // window PARTITION BY keeps null-key rows as one group; the scan's
    // correction join must be null-safe or they vanish from the output
    val df = spark.range(20)
      .selectExpr("id",
        "CASE WHEN id % 4 = 0 THEN CAST(NULL AS STRING) ELSE concat('s', id % 2) END AS series",
        "CAST(id - 7 AS LONG) AS v")
    val got = SeriesScan.scan(df, "series", Seq(col("id")), col("v"), "excl")
    assert(got.count() === 20L, "null-series rows must survive the scan")
    val nulls = got.filter(col("series").isNull)
      .select("id", "excl").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // exclusive prefix over the null group in id order
    val wantMap = Seq(0L, 4L, 8L, 12L, 16L)
      .foldLeft((Map.empty[Long, Long], 0L)) { case ((m, acc), id) =>
        (m + (id -> acc), acc + (id - 7))
      }._1
    assert(nulls === wantMap)
  }

  test("scan across sizes incl. empty and sub-partition-count inputs") {
    for (n <- Seq(0, 1, 2, 5, 32, 33)) {
      val df = spark.range(n.toLong)
        .selectExpr("id", "concat('t', id % 2) AS series",
          "CAST(id * 2 - 7 AS LONG) AS v")
      val got = SeriesScan.scan(df, "series", Seq(col("id")), col("v"), "excl")
        .select("id", "excl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._2, t._1))
        .groupBy(_._2).values.flatMap { rows =>
          // exclusive prefix: pair each row with the sum of its predecessors
          rows.toSeq.scanLeft((0L, 0L)) { case ((_, acc), (id, _, v)) => (id, acc + v) }
            .sliding(2).collect { case Seq((_, acc), (id, _)) => (id, acc) }
        }.toMap
      assert(got === want, s"n=$n")
    }
  }

  test("withLags equals per-series lag(1)/lag(2); leads via descending order") {
    val ws = Window.partitionBy(col("series")).orderBy(col("id"))
    val want = fixture
      .withColumn("l1_w", lag(col("v"), 1).over(ws))
      .withColumn("l2_w", lag(col("v"), 2).over(ws))
      .withColumn("ld_w", lead(col("v"), 1).over(ws))
      .collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4),
        if (r.isNullAt(5)) null else r.getLong(5)))
      .toMap
    val lagged = SeriesScan.withLags(fixture, "series", Seq(col("id")),
      Seq((col("v"), "l1", 1), (col("v"), "l2", 2)))
    val led = SeriesScan.withLags(fixture, "series",
      Seq(col("id").desc), Seq((col("v"), "ld", 1)))
    val gotLag = lagged.select("id", "l1", "l2").collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toMap
    val gotLead = led.select("id", "ld").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    want.foreach { case (id, (w1, w2, wd)) =>
      assert(gotLag(id) === ((w1, w2)), s"lag mismatch at id $id")
      assert(gotLead(id) === wd, s"lead mismatch at id $id")
    }
  }

  test("withLags across sizes: single-row series and partition-boundary tails") {
    for (n <- Seq(1, 2, 3, 33, 65)) {
      val df = spark.range(n.toLong)
        .selectExpr("id", "concat('t', id % 2) AS series",
          "CAST(id * 3 - 11 AS LONG) AS v")
      val ws = Window.partitionBy(col("series")).orderBy(col("id"))
      val want = df
        .withColumn("l2_w", lag(col("v"), 2).over(ws)).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) null else r.getLong(3))).toMap
      val got = SeriesScan.withLags(df, "series", Seq(col("id")),
        Seq((col("v"), "l2", 2))).select("id", "l2").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getLong(1))).toMap
      assert(got === want, s"n=$n")
    }
  }

  test("withPrefixMax equals the exclusive running max (the watermark shape)") {
    val ws = Window.partitionBy(col("series")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = fixture.withColumn("m_w", max(col("v")).over(ws)).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getLong(3))).toMap
    val got = SeriesScan.withPrefixMax(fixture, "series", Seq(col("id")),
      col("v"), "m").select("id", "m").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got === want)
  }

  test("no window partitioned by the series key alone (the funnel)") {
    import org.apache.spark.sql.execution.window.WindowExec
    // assert on the STAGED plan (pre-checkpoint): every window must
    // carry the physical partition id in its partition spec, so
    // parallelism is #partitions, never #series
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val staged = fixture
      .repartitionByRange(parts, col("series"), col("id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ps", sum(col("v")).over(
        Window.partitionBy(col("__pid"), col("series")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
    val wins = staged.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.partitionSpec.exists(_.toString.contains("__pid")),
        "window must be partitioned by (__pid, series), not series alone")
    }
    // and the public API's final output derives from the checkpoint
    val plan = SeriesScan.scan(fixture, "series", Seq(col("id")), col("v"), "excl")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      "expected the SeriesScan checkpoint boundary in the plan")
  }
}
