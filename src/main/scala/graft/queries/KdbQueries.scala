package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** kdb core operator semantics (SURVEY.md §2.A Q-1..Q-4, V-1, S rows)
  * expressed over the driver's `events` table.
  *
  * Mapping (FIXTURES.md §B): ts→`ts` (int64 ns; read via
  * spark.sql.legacy.parquet.nanosAsLong so the engine keeps kdb's exact
  * ns integer math — Spark TimestampType is µs and would truncate),
  * tags→(event_type, user_id), payload→`value`, ingest seq→event_id.
  *
  * All constants are UTC ns epochs; both engines do identical int64
  * arithmetic so results hash-match exactly (no float time math).
  *
  * Reference semantics preserved:
  *  - quantization `ts - ts % Resolution` (dbase/dbase.go:127)
  *  - last-writer-wins at (series, slot) (dblock/dblock.go:198-205)
  *  - dense gap-fill, zero for missing slots (dbase/dbase.go:208-225)
  *  - Find omits never-seen series but zero-fills seen ones
  *    (dbase/dbase.go:294-310)
  *  - RemoveBefore = whole-bucket drop (dbase/dbase.go:323-364)
  *  - future-write/cold-write rejection (dbase/dbase.go:129-132,
  *    dbucket/dbucket.go:119-122)
  */
object KdbQueries extends QueryModule {

  val Hour: Long = 3600L * 1000 * 1000 * 1000
  val Day: Long = 24 * Hour
  /** 2024-01-01T00:00Z in ns */
  val T0: Long = 1704067200000000000L
  /** 2024-01-31T00:00Z in ns (events end 2024-01-30) */
  val T1: Long = T0 + 30 * Day
  /** six-hour resolution for the dense-grid reads */
  val Res6h: Long = 6 * Hour

  /** events with ts as raw int64 ns. Our session builders set
    * spark.sql.legacy.parquet.nanosAsLong so parquet ns timestamps read
    * as LongType (exact int64 math, as in the reference). A session
    * WITHOUT the flag fails loudly on ns-annotated parquet
    * (PARQUET_TYPE_ILLEGAL — Spark 4 never silently truncates it); the
    * TimestampType branch below serves genuinely µs-precision event
    * tables, converting explicitly — a bare cast("long") there would
    * yield epoch SECONDS and empty results. Both facts are pinned by
    * DriverSessionCompatSpec. */
  private def ev(s: SparkSession, d: String): DataFrame = {
    // Tables.events already normalizes ts to int64 ns for every source
    // type the driver has shipped (ns-long / µs-timestamp / µs-ntz) —
    // see Tables.tsNsCol; the dispatch there is the single place that
    // knows about physical timestamp encodings.
    val df = events(s, d)
    df.withColumn("ts_ns", graft.sources.Tables.tsNsCol(df.schema("ts").dataType))
  }

  /** Q-1 Put: quantize to Resolution, route to bucket, last-writer-wins
    * upsert keyed by (tags, slot) with event_id as the ingest sequence.
    * Partial-agg friendly: one shuffle on the series+slot key; max_by
    * gives map-side combine (vs a row_number window which cannot). */
  private val put = QueryDef(
    "kdb_put_ingest",
    (s, d) => {
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("bucket_ns", col("ts_ns") - col("ts_ns") % Day)
        .groupBy(col("event_type"), col("user_id"), col("bucket_ns"), col("slot_ns"))
        .agg(round(max_by(col("value"), col("event_id")), 2).as("value"),
          count(lit(1)).as("n_writes"))
        .orderBy(col("event_type"), col("user_id"), col("slot_ns"))
    },
    Some(s"""
      SELECT event_type, user_id,
             epoch_ns(ts) - epoch_ns(ts) % ${Day} AS bucket_ns,
             epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
             round(arg_max(value, event_id), 2) AS value,
             count(*) AS n_writes
      FROM events
      GROUP BY 1, 2, 3, 4
      ORDER BY event_type, user_id, slot_ns"""))

  /** Q-2 Get: exact series (click, user 7), [T0,T1) at 6h resolution —
    * dense grid left join, `coalesce(value, 0)` = kdb's zero payload.
    * Result length is exactly (end-start)/res = 120 rows, always. */
  private val get = QueryDef(
    "kdb_get_gapfill",
    (s, d) => {
      val n = (T1 - T0) / Res6h
      val grid = s.range(n).select((lit(T0) + col("id") * Res6h).as("slot_ns"))
      val data = ev(s, d)
        .filter(col("event_type") === "click" && col("user_id") === 7 &&
          col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Res6h)
        .groupBy(col("slot_ns"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
      grid.join(data, Seq("slot_ns"), "left_outer")
        .select(col("slot_ns"), round(coalesce(col("v"), lit(0.0)), 2).as("value"))
        .orderBy(col("slot_ns"))
    },
    Some(s"""
      SELECT g.slot_ns, round(coalesce(d.v, 0.0), 2) AS value
      FROM range(${T0}, ${T1}, ${Res6h}) g(slot_ns)
      LEFT JOIN (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Res6h} AS slot_ns,
               arg_max(value, event_id) AS v
        FROM events
        WHERE event_type = 'click' AND user_id = 7
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1
      ) d USING (slot_ns)
      ORDER BY slot_ns"""))

  /** Q-3 Find: tags (purchase, *) — wildcard at the user position.
    * Series ever seen in range get a full dense zero-filled slab;
    * never-seen series are omitted (dbase/dbase.go:294-310). The grid
    * is a broadcast-able crossJoin (series × slots), never a shuffle. */
  private val find = QueryDef(
    "kdb_find_wildcard",
    (s, d) => {
      val n = (T1 - T0) / Res6h
      val grid = s.range(n).select((lit(T0) + col("id") * Res6h).as("slot_ns"))
      val data = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Res6h)
      val series = data.select(col("user_id")).distinct()
      val slots = series.crossJoin(broadcast(grid))
      val vals = data.groupBy(col("user_id"), col("slot_ns"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
      slots.join(vals, Seq("user_id", "slot_ns"), "left_outer")
        .select(col("user_id"), col("slot_ns"),
          round(coalesce(col("v"), lit(0.0)), 2).as("value"))
        .orderBy(col("user_id"), col("slot_ns"))
    },
    Some(s"""
      WITH data AS (
        SELECT user_id, epoch_ns(ts) - epoch_ns(ts) % ${Res6h} AS slot_ns,
               value, event_id
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
      ),
      series AS (SELECT DISTINCT user_id FROM data),
      vals AS (SELECT user_id, slot_ns, arg_max(value, event_id) AS v
               FROM data GROUP BY 1, 2)
      SELECT s.user_id, g.slot_ns, round(coalesce(v.v, 0.0), 2) AS value
      FROM series s
      CROSS JOIN range(${T0}, ${T1}, ${Res6h}) g(slot_ns)
      LEFT JOIN vals v ON v.user_id = s.user_id AND v.slot_ns = g.slot_ns
      ORDER BY s.user_id, g.slot_ns"""))

  /** Q-4 RemoveBefore: drop whole day-buckets below the cutoff (a
    * metadata-only partition delete in the engine); per-bucket stats
    * of what survives. Cutoff 2024-01-10. */
  private val cutoff: Long = T0 + 9 * Day
  private val removeBefore = QueryDef(
    "kdb_remove_before",
    (s, d) => {
      ev(s, d)
        .withColumn("bucket_ns", col("ts_ns") - col("ts_ns") % Day)
        .filter(col("bucket_ns") >= cutoff)
        .groupBy(col("bucket_ns"))
        .agg(count(lit(1)).as("n_points"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("bucket_ns"))
    },
    Some(s"""
      SELECT epoch_ns(ts) - epoch_ns(ts) % ${Day} AS bucket_ns,
             count(*) AS n_points,
             round(sum(value), 2) AS sum_value
      FROM events
      WHERE epoch_ns(ts) - epoch_ns(ts) % ${Day} >= ${cutoff}
      GROUP BY 1
      ORDER BY bucket_ns"""))

  /** V-1 validation ledger: with the clock pinned to 2024-01-25, every
    * write is classified exactly as DBase.Put would. Reference order is
    * floor-then-validate (dbase/dbase.go:127 `ts -= ts % Resolution`
    * BEFORE the :129-132 future check), so a write in
    * (now, now+Resolution] whose floored slot is <= now is accepted;
    * classification runs on slot_ns, not raw ts_ns. Cold-bucket writes
    * rejected per dbucket/dbucket.go:119-122 (hot window =
    * MaxHotBuckets=2 day buckets). */
  private val pinnedNow: Long = T0 + 24 * Day
  private val validate = QueryDef(
    "kdb_validation_rejects",
    (s, d) => {
      val hotStart = (pinnedNow - pinnedNow % Day) - Day // 2 hot buckets
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("reason",
          when(col("slot_ns") > pinnedNow, "err_future_timestamp")
            .when(col("slot_ns") < hotStart, "err_write_on_read_only")
            .otherwise("ok"))
        .groupBy(col("reason"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("reason"))
    },
    Some {
      val hotStart = (pinnedNow - pinnedNow % Day) - Day
      s"""
      WITH sl AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns, value
        FROM events)
      SELECT CASE WHEN slot_ns > ${pinnedNow} THEN 'err_future_timestamp'
                  WHEN slot_ns < ${hotStart} THEN 'err_write_on_read_only'
                  ELSE 'ok' END AS reason,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM sl
      GROUP BY 1
      ORDER BY reason"""
    })

  /** Streaming-analog tumbling window (1h) per event_type — the batch
    * equivalent of the Structured Streaming ingest agg (window($"ts"),
    * tested live in StreamingIngestSpec). */
  private val tumbling = QueryDef(
    "kdb_tumbling_window",
    (s, d) => {
      ev(s, d)
        .withColumn("w_start", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("w_start"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"), col("w_start"))
    },
    Some(s"""
      SELECT event_type,
             epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS w_start,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY event_type, w_start"""))

  /** As-of join (natural TSDB op the reference lacks): each click joins
    * the most recent purchase at-or-before it by the same user.
    * Spark impl is the scale path: union both sides, one window pass
    * per user ordered by ts — a single shuffle, no range explosion.
    * Comparison + gap in µs (ts_ns div 1000) because DuckDB truncates
    * parquet ns timestamps to µs TIMESTAMP; same-µs ties resolve
    * purchase-before-click on both sides (kind tiebreak ≡ p.ts<=c.ts). */
  private val asof = QueryDef(
    "kdb_asof_join",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"), lit(1).as("kind"))
      // Dedupe purchases per (user, µs instant) keeping max event_id —
      // DuckDB's ASOF JOIN picks an arbitrary row among equal-ts ties,
      // so both engines resolve ties identically before joining.
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("event_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"), lit(0).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      clicks.union(purchases)
        .withColumn("p_ts", last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
        .withColumn("p_id", last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("p_id").as("purchase_id"),
          (col("ts_us") - col("p_ts")).as("gap_us"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, epoch_us(ts) AS tus, max(event_id) AS event_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, epoch_us(ts))
      SELECT c.event_id, c.user_id, p.event_id AS purchase_id,
             epoch_us(c.ts) - p.tus AS gap_us
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND p.tus <= epoch_us(c.ts)
      ORDER BY c.event_id"""))

  /** As-of join with a match window (kdb wj-style): like the plain
    * as-of above, but a prior purchase only counts when it happened
    * within the last day — older state is stale, the row keeps left
    * semantics with a NULL match. Same single union+window pass as
    * kdb_asof_join (the tolerance is a post-window predicate, zero
    * extra shuffles); the oracle is DuckDB's native ASOF LEFT JOIN
    * with the same bound applied after the pick, which is equivalent
    * because as-of already selects the LATEST prior row — if that one
    * is outside the window, every earlier one is too. */
  private val asofWindowed = QueryDef(
    "kdb_asof_window_join",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tolUs = 24L * 3600 * 1000 * 1000
      val e = ev(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"), lit(1).as("kind"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("event_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"), lit(0).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val hit = col("p_ts").isNotNull && (col("ts_us") - col("p_ts")) <= tolUs
      clicks.union(purchases)
        .withColumn("p_ts", last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
        .withColumn("p_id", last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"),
          when(hit, col("p_id")).as("purchase_id"),
          when(hit, col("ts_us") - col("p_ts")).as("gap_us"),
          hit.cast("int").as("matched"))
        .orderBy(col("event_id"))
    },
    Some(s"""
      WITH p AS (
        SELECT user_id, epoch_us(ts) AS tus, max(event_id) AS event_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, epoch_us(ts))
      SELECT c.event_id, c.user_id,
             CASE WHEN p.tus IS NOT NULL AND epoch_us(c.ts) - p.tus <= ${24L * 3600 * 1000 * 1000}
                  THEN p.event_id END AS purchase_id,
             CASE WHEN p.tus IS NOT NULL AND epoch_us(c.ts) - p.tus <= ${24L * 3600 * 1000 * 1000}
                  THEN epoch_us(c.ts) - p.tus END AS gap_us,
             CASE WHEN p.tus IS NOT NULL AND epoch_us(c.ts) - p.tus <= ${24L * 3600 * 1000 * 1000}
                  THEN 1 ELSE 0 END AS matched
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND p.tus <= epoch_us(c.ts)
      ORDER BY c.event_id"""))

  /** Nearest-in-time as-of join (kdb `aj` picks the last prior row;
    * this is the |Δt|-minimizing variant): each purchase matches the
    * CLOSEST click by the same user within ±30 min, whichever side of
    * the purchase it falls on — sensor-fusion alignment ("pair each
    * trade with the nearest quote") that a backward-only as-of gets
    * wrong whenever the next sample is closer than the previous one.
    * Scale shape: the same union + window-pass trick as kdb_asof_join
    * run in BOTH directions over ONE shuffle on user_id (two sorts,
    * no range explosion, no nested loop); equal-µs ties go to the
    * backward side via the kind sort key, and equal |Δt| prefers the
    * earlier click (db <= df). Clicks are LWW-collapsed per (user, µs)
    * first so both engines resolve same-instant duplicates
    * identically. The oracle takes a genuinely different plan — two
    * native DuckDB ASOF joins (<= and >=) — so agreement checks the
    * semantics, not a shared shape. */
  private val asofNearest = QueryDef(
    "kdb_asof_nearest",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tolUs = 30L * 60 * 1000 * 1000
      val e = ev(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(round(max_by(col("value"), col("event_id")), 2).as("c_val"))
        .select(col("user_id"), col("ts_us"), lit(0).as("kind"),
          lit(-1L).as("event_id"), col("c_val"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), lit(1).as("kind"),
          col("event_id"), lit(null).cast("double").as("c_val"))
      val wB = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wF = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").desc, col("kind").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val isClick = col("kind") === 0
      val db = col("ts_us") - col("b_ts")
      val df = col("f_ts") - col("ts_us")
      val useB = col("b_ts").isNotNull && db <= tolUs &&
        (col("f_ts").isNull || df > tolUs || db <= df)
      // when-chain gives useB priority, so useF needs no negation
      val useF = col("f_ts").isNotNull && df <= tolUs
      clicks.union(purchases)
        .withColumn("b_ts", last(when(isClick, col("ts_us")), ignoreNulls = true).over(wB))
        .withColumn("b_val", last(when(isClick, col("c_val")), ignoreNulls = true).over(wB))
        .withColumn("f_ts", last(when(isClick, col("ts_us")), ignoreNulls = true).over(wF))
        .withColumn("f_val", last(when(isClick, col("c_val")), ignoreNulls = true).over(wF))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"),
          when(useB, "b").when(useF, "f").otherwise("none").as("side"),
          when(useB, db).when(useF, df).as("delta_us"),
          when(useB, col("b_val")).when(useF, col("f_val")).as("click_value"))
        .orderBy(col("event_id"))
    },
    Some(s"""
      WITH cl AS (
        SELECT user_id, epoch_us(ts) AS tus,
               round(arg_max(value, event_id), 2) AS c_val
        FROM events WHERE event_type = 'click'
        GROUP BY 1, 2),
      p AS (
        SELECT event_id, user_id, epoch_us(ts) AS tus
        FROM events WHERE event_type = 'purchase'),
      b AS (
        SELECT p.event_id, cl.tus AS b_ts, cl.c_val AS b_val
        FROM p ASOF LEFT JOIN cl
          ON p.user_id = cl.user_id AND cl.tus <= p.tus),
      f AS (
        SELECT p.event_id, cl.tus AS f_ts, cl.c_val AS f_val
        FROM p ASOF LEFT JOIN cl
          ON p.user_id = cl.user_id AND cl.tus >= p.tus)
      SELECT p.event_id, p.user_id,
             CASE WHEN b_ts IS NOT NULL AND p.tus - b_ts <= ${30L * 60 * 1000 * 1000}
                       AND (f_ts IS NULL OR f_ts - p.tus > ${30L * 60 * 1000 * 1000}
                            OR p.tus - b_ts <= f_ts - p.tus)
                  THEN 'b'
                  WHEN f_ts IS NOT NULL AND f_ts - p.tus <= ${30L * 60 * 1000 * 1000}
                  THEN 'f'
                  ELSE 'none' END AS side,
             CASE WHEN b_ts IS NOT NULL AND p.tus - b_ts <= ${30L * 60 * 1000 * 1000}
                       AND (f_ts IS NULL OR f_ts - p.tus > ${30L * 60 * 1000 * 1000}
                            OR p.tus - b_ts <= f_ts - p.tus)
                  THEN p.tus - b_ts
                  WHEN f_ts IS NOT NULL AND f_ts - p.tus <= ${30L * 60 * 1000 * 1000}
                  THEN f_ts - p.tus END AS delta_us,
             CASE WHEN b_ts IS NOT NULL AND p.tus - b_ts <= ${30L * 60 * 1000 * 1000}
                       AND (f_ts IS NULL OR f_ts - p.tus > ${30L * 60 * 1000 * 1000}
                            OR p.tus - b_ts <= f_ts - p.tus)
                  THEN b_val
                  WHEN f_ts IS NOT NULL AND f_ts - p.tus <= ${30L * 60 * 1000 * 1000}
                  THEN f_val END AS click_value
      FROM p JOIN b USING (event_id) JOIN f USING (event_id)
      ORDER BY p.event_id"""))

  /** Hopping (sliding) window: 2h windows advancing by 1h — each event
    * belongs to exactly two windows, generated by a 2-way explode (the
    * batch shape of Structured Streaming's window(ts, "2h", "1h")).
    * Still one shuffle on (type, window start); the explode doubles
    * rows BEFORE the partial agg so map-side combine absorbs it. */
  private val hopping = QueryDef(
    "kdb_hopping_window",
    (s, d) => {
      ev(s, d)
        .withColumn("hb", col("ts_ns") - col("ts_ns") % Hour)
        .select(col("event_type"), col("value"),
          explode(array(col("hb"), col("hb") - Hour)).as("w_start"))
        .groupBy(col("event_type"), col("w_start"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"), col("w_start"))
    },
    Some(s"""
      WITH hb AS (
        SELECT event_type, value,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS hb
        FROM events),
      w AS (
        SELECT event_type, value, hb AS w_start FROM hb
        UNION ALL
        SELECT event_type, value, hb - ${Hour} AS w_start FROM hb)
      SELECT event_type, w_start,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM w
      GROUP BY 1, 2
      ORDER BY event_type, w_start"""))

  /** Interval (range) join: count the clicks falling inside each
    * purchase's 1-hour follow-up window [p_ts, p_ts + 1h) for the same
    * user. The scale path avoids the classic range-join blowup by
    * bucketing both sides to the hour: a purchase window can only
    * overlap its own and the next hour bucket, so the join is an
    * equi-join on (user, hour bucket) fanned out 2× — never an
    * inequality-only nested loop. µs precision (DuckDB parity). */
  private val HourUs: Long = Hour / 1000
  private val intervalJoin = QueryDef(
    "kdb_interval_join",
    (s, d) => {
      val e = ev(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_ts"))
        .withColumn("hb", explode(array(
          col("p_ts") - col("p_ts") % HourUs,
          (col("p_ts") - col("p_ts") % HourUs) + HourUs)))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_ts"))
        .withColumn("hb", col("c_ts") - col("c_ts") % HourUs)
      purchases.join(clicks, Seq("user_id", "hb"))
        .filter(col("c_ts") >= col("p_ts") && col("c_ts") < col("p_ts") + HourUs)
        .groupBy(col("p_id"), col("user_id"))
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy(col("p_id"))
    },
    Some(s"""
      SELECT p.event_id AS p_id, p.user_id, count(*) AS n_clicks
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id
       AND epoch_us(c.ts) >= epoch_us(p.ts)
       AND epoch_us(c.ts) < epoch_us(p.ts) + ${HourUs}
      GROUP BY 1, 2
      ORDER BY p_id"""))

  /** Rolling analytics over a dense gap-filled series — the analytic
    * layer kdb's dense slot model exists to serve: 4-slot (24h) moving
    * average per series over the zero-filled 6h grid of Find. Window
    * partitioning = the series key, so the rolling pass rides the SAME
    * hash partitioning the gap-fill join produced — no extra shuffle. */
  private val rollingAvg = QueryDef(
    "kdb_rolling_avg",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val n = (T1 - T0) / Res6h
      val grid = s.range(n).select((lit(T0) + col("id") * Res6h).as("slot_ns"))
      val data = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Res6h)
      val series = data.select(col("user_id")).distinct()
      val vals = data.groupBy(col("user_id"), col("slot_ns"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
      val dense = series.crossJoin(broadcast(grid))
        .join(vals, Seq("user_id", "slot_ns"), "left_outer")
        .select(col("user_id"), col("slot_ns"), coalesce(col("v"), lit(0.0)).as("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("slot_ns"))
        .rowsBetween(-3, 0)
      dense
        .withColumn("avg4", round(avg(col("value")).over(w), 4))
        .filter(col("user_id") < 30)
        .select(col("user_id"), col("slot_ns"), round(col("value"), 2).as("value"), col("avg4"))
        .orderBy(col("user_id"), col("slot_ns"))
    },
    Some(s"""
      WITH data AS (
        SELECT user_id, epoch_ns(ts) - epoch_ns(ts) % ${Res6h} AS slot_ns,
               value, event_id
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      series AS (SELECT DISTINCT user_id FROM data),
      vals AS (SELECT user_id, slot_ns, arg_max(value, event_id) AS v
               FROM data GROUP BY 1, 2),
      dense AS (
        SELECT s.user_id, g.slot_ns, coalesce(v.v, 0.0) AS value
        FROM series s
        CROSS JOIN range(${T0}, ${T1}, ${Res6h}) g(slot_ns)
        LEFT JOIN vals v ON v.user_id = s.user_id AND v.slot_ns = g.slot_ns)
      SELECT user_id, slot_ns, round(value, 2) AS value,
             round(avg(value) OVER (PARTITION BY user_id ORDER BY slot_ns
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS avg4
      FROM dense
      WHERE user_id < 30
      ORDER BY user_id, slot_ns"""))

  /** Rolling MEDIAN over the dense grid — the robust-statistics twin
    * of kdb_rolling_avg (medians shrug off the spikes that drag a
    * mean). Spark has no median window function, so the 4-slot frame
    * collects into a bounded array (≤ 4 elements — frame-bounded, not
    * data-bounded) and the median is computed positionally from the
    * sorted array, interpolating even-length frames exactly as
    * DuckDB's quantile_cont-based median window does. Same
    * single-shuffle shape as the rolling average. */
  private val rollingMedian = QueryDef(
    "kdb_rolling_median",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val n = (T1 - T0) / Res6h
      val grid = s.range(n).select((lit(T0) + col("id") * Res6h).as("slot_ns"))
      val vals = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Res6h)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
      val types = vals.select(col("event_type")).distinct()
      val dense = types.crossJoin(broadcast(grid))
        .join(vals, Seq("event_type", "slot_ns"), "left_outer")
        .select(col("event_type"), col("slot_ns"),
          coalesce(col("v"), lit(0.0)).as("value"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("slot_ns"))
        .rowsBetween(-3, 0)
      dense
        .withColumn("vals", sort_array(collect_list(col("value")).over(w)))
        .withColumn("m", size(col("vals")))
        .select(col("event_type"), col("slot_ns"),
          round(col("value"), 2).as("value"),
          round(
            when(col("m") % 2 === 1,
              element_at(col("vals"), ((col("m") + 1) / lit(2)).cast("int")))
              .otherwise(
                (element_at(col("vals"), (col("m") / lit(2)).cast("int")) +
                  element_at(col("vals"), (col("m") / lit(2)).cast("int") + 1)) / 2.0),
            4).as("med4"))
        .orderBy(col("event_type"), col("slot_ns"))
    },
    Some(s"""
      WITH vals AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Res6h} AS slot_ns,
               max(value) AS v
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      types AS (SELECT DISTINCT event_type FROM vals),
      dense AS (
        SELECT t.event_type, g.slot_ns, coalesce(v.v, 0.0) AS value
        FROM types t
        CROSS JOIN range(${T0}, ${T1}, ${Res6h}) g(slot_ns)
        LEFT JOIN vals v ON v.event_type = t.event_type AND v.slot_ns = g.slot_ns)
      SELECT event_type, slot_ns, round(value, 2) AS value,
             round(median(value) OVER (PARTITION BY event_type ORDER BY slot_ns
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS med4
      FROM dense
      ORDER BY event_type, slot_ns"""))

  /** Skew-safe distinct count via explicit salting: event_type has
    * only a handful of values, so a naive count(DISTINCT user_id) per
    * type funnels each type through ONE reducer. Stage 1 shuffles on
    * (type, user-derived salt) — 16-way spread of every hot key — and
    * counts distinct users per shard (disjoint by construction, since
    * the salt is a function of user_id); stage 2 sums the shard
    * counts. Same answer, no single-reducer hotspot; the pattern AQE
    * skew-join handles for joins, done by hand for distinct aggs. */
  private val saltedAgg = QueryDef(
    "q_skew_salted_agg",
    (s, d) => {
      val stage1 = ev(s, d)
        .withColumn("salt", pmod(col("user_id"), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(countDistinct(col("user_id")).as("part_users"),
          count(lit(1)).as("part_rows"))
      stage1.groupBy(col("event_type"))
        .agg(sum(col("part_users")).as("n_users"),
          sum(col("part_rows")).as("n_rows"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
             count(DISTINCT user_id) AS n_users,
             count(*) AS n_rows
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Pivot: event counts per user day-bucket, one column per type —
    * Spark's pivot() compiles to conditional aggregation (exactly the
    * oracle SQL), a single shuffle with a fixed value list (never
    * pivot on unbounded cardinality at scale). */
  private val pivotQ = QueryDef(
    "kdb_pivot",
    (s, d) => {
      ev(s, d)
        .filter(col("user_id") < 50)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
             count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      FROM events
      WHERE user_id < 50
      GROUP BY user_id
      ORDER BY user_id"""))
      // count(CASE…), not sum(CASE…): DuckDB's sum() widens to HUGEINT
      // (int128) where Spark's pivot-count is BIGINT — identical values
      // that hash differently in the driver compare. count() is BIGINT
      // in both engines.

  /** HLL sketch distinct count (approx_count_distinct) — the sketch
    * path for cardinality at 100 TB (fixed-size partial state, one
    * shuffle). Sketch estimates are implementation-specific, so the
    * raw estimate cannot hash-match a DuckDB oracle; instead the query
    * emits the exact counts PLUS a boolean asserting the estimate
    * landed within 5% of exact (rsd=0.02 guarantees it w.h.p.), and
    * the oracle asserts that boolean — a hash-checked accuracy
    * property rather than a weaker rows-only check. */
  private val approxDistinct = QueryDef(
    "kdb_approx_distinct",
    (s, d) => {
      // Two-stage distinct instead of countDistinct-next-to-approx:
      // mixing them in one agg forces an Expand (row duplication per
      // distinct group). Deduping (type, user) first keeps both aggs
      // partial — and HLL over the deduped keys estimates the SAME
      // cardinality (sketches are duplicate-insensitive).
      ev(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"), sum(col("c")).as("n_rows"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .select(col("event_type"), col("n_users"), col("n_rows"),
          // int, not boolean: the driver hash has precedent for int
          // parity across engines (llm_lang_id.hit) but none for bool
          (abs(col("approx_users") - col("n_users")) <=
            col("n_users") * lit(0.05)).cast("int").as("approx_ok"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
             count(DISTINCT user_id) AS n_users,
             count(*) AS n_rows,
             1 AS approx_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Sliding-window distinct users via MERGEABLE HLL registers — the
    * sketch answer to kdb_rolling_wau's exact rolling distinct, and
    * the reason sketches exist at 100 TB: exact sliding distinct must
    * re-touch every (day, user) pair per window, while a mergeable
    * sketch keeps m=128 register maxima per day and merges 7 days with
    * a register-wise MAX (union of HLLs IS max — Flajolet et al.
    * 2007). Unlike kdb_approx_distinct (whose engine-internal sketch
    * can only be property-gated), every step here is explicit integer
    * arithmetic — register index = h mod 128, rho = 54 − bitlen of the
    * remaining 53 hash bits via length(bin(x)) STRING math, the
    * harmonic denominator as the EXACT scaled integer Σ 2^(54−M_j)
    * (≤ 128·2⁵⁴ < 2⁶²), the linear-counting small-range branch decided
    * by the same double compare in both engines, and the α·m²·2⁵⁴
    * constant spliced from ONE Scala double into both renderings — so
    * the ESTIMATE ITSELF hash-gates, not just an accuracy flag. The
    * exact count rides beside it (computed the explode-into-windows
    * way; the expensive path the sketch replaces) plus a ≤25% error
    * audit (m=128 → 9.2% standard error). Grid = observed days ×
    * 128 registers; the merge is one RANGE window over calendar days;
    * everything else is key-partitioned aggregation. */
  private[queries] val HllC: Double = 0.7213 / (1 + 1.079 / 128) * 16384.0 * (1L << 54).toDouble
  private val slidingHll = QueryDef(
    "kdb_sliding_hll",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val du = ev(s, d)
        .selectExpr(s"(ts_ns - ${T0}L) div $Day AS day", "user_id")
        .distinct()
      val days = du.select(col("day")).distinct()
      val reg = du
        .select(col("day"),
          graft.functions.TextFunctions.hash60(col("user_id").cast("string")).as("h"))
        .selectExpr("day", "h % 128 AS idx", "h div 128 AS v")
        .selectExpr("day", "idx",
          "CASE WHEN v = 0 THEN CAST(54 AS BIGINT) ELSE 54 - length(bin(v)) END AS rho")
        .groupBy(col("day"), col("idx")).agg(max(col("rho")).as("m"))
      val grid = days.select(col("day"), explode(sequence(lit(0), lit(127))).as("idx"))
      val wspec = Window.partitionBy(col("idx")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      val merged = grid.join(reg, Seq("day", "idx"), "left_outer")
        .withColumn("m0", coalesce(col("m"), lit(0L)))
        .withColumn("mw", max(col("m0")).over(wspec))
      val sket = merged.groupBy(col("day"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(54 - mw AS INT))")).as("sreg"),
          count(when(col("mw") === 0, 1)).as("v_zero"))
      val exact = du
        .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("day"))
        .join(days, "day")
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("n_exact"))
      sket.join(exact, "day")
        .withColumn("est", expr(
          s"CASE WHEN v_zero > 0 AND $HllC <= 320.0 * CAST(sreg AS DOUBLE) " +
            s"THEN 128.0 * ln(128.0 / v_zero) " +
            s"ELSE $HllC / CAST(sreg AS DOUBLE) END"))
        .withColumn("est_wau", round(col("est"), 4) + lit(0.0))
        .select(col("day"), col("n_exact"), col("v_zero"),
          expr(s"CASE WHEN v_zero > 0 AND $HllC <= 320.0 * CAST(sreg AS DOUBLE) " +
            "THEN 'linear' ELSE 'raw' END").as("regime"),
          col("est_wau"),
          (abs(col("est_wau") - col("n_exact")) <= col("n_exact") * lit(0.25))
            .cast("int").as("err_ok"))
        .orderBy(col("day"))
    },
    Some(s"""
      WITH du AS (
        SELECT DISTINCT (epoch_ns(ts) - ${T0}) // $Day AS day, user_id
        FROM events),
      days AS (SELECT DISTINCT day FROM du),
      reg AS (
        SELECT day, h % 128 AS idx,
               max(CASE WHEN h // 128 = 0 THEN 54
                   ELSE 54 - length(bin(h // 128)) END) AS m
        FROM (
          SELECT day,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM du)
        GROUP BY 1, 2),
      grid AS (
        SELECT day, i.idx FROM days, generate_series(0, 127) AS i(idx)),
      merged AS (
        SELECT g.day, g.idx,
               max(coalesce(r.m, 0)) OVER (PARTITION BY g.idx ORDER BY g.day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS mw
        FROM grid g LEFT JOIN reg r ON r.day = g.day AND r.idx = g.idx),
      sket AS (
        SELECT day,
               CAST(sum(CAST(1 AS BIGINT) << CAST(54 - mw AS INTEGER)) AS BIGINT)
                 AS sreg,
               count(CASE WHEN mw = 0 THEN 1 END) AS v_zero
        FROM merged GROUP BY 1),
      ex AS (
        SELECT w.day, count(DISTINCT du.user_id) AS n_exact
        FROM days w JOIN du ON du.day BETWEEN w.day - 6 AND w.day
        GROUP BY 1),
      est AS (
        SELECT s.day, e.n_exact, s.v_zero,
               CASE WHEN s.v_zero > 0 AND $HllC <= 320.0 * CAST(s.sreg AS DOUBLE)
                    THEN 'linear' ELSE 'raw' END AS regime,
               round(CASE WHEN s.v_zero > 0 AND $HllC <= 320.0 * CAST(s.sreg AS DOUBLE)
                     THEN 128.0 * ln(128.0 / s.v_zero)
                     ELSE $HllC / CAST(s.sreg AS DOUBLE) END, 4) + 0.0 AS est_wau
        FROM sket s JOIN ex e ON e.day = s.day)
      SELECT day, n_exact, v_zero, regime, est_wau,
             CASE WHEN abs(est_wau - n_exact) <= n_exact * 0.25 THEN 1 ELSE 0 END
               AS err_ok
      FROM est
      ORDER BY day"""))

  /** Gap-based sessionization (batch twin of
    * StreamingIngest.sessionize): a >30-minute silence per user starts
    * a new session. One shuffle on user_id; the session-boundary lag,
    * the running session counter, and the per-session rollup all reuse
    * that partitioning — Catalyst plans a single Exchange. µs
    * precision for DuckDB parity (ns timestamps truncate to µs there). */
  private val GapUs: Long = 30L * 60 * 1000 * 1000
  private val sessionize = QueryDef(
    "kdb_sessionize",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      ev(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > GapUs, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts_us")).as("session_start_us"),
          max(col("ts_us")).as("session_end_us"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_seq"))
    },
    Some(s"""
      WITH o AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GapUs}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      sess AS (
        SELECT user_id, ts_us,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM o)
      SELECT user_id, session_seq,
             min(ts_us) AS session_start_us,
             max(ts_us) AS session_end_us,
             count(*) AS n_events
      FROM sess
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq"""))

  /** Resolution re-alignment (downsample): materialize the hourly LWW
    * series per (type, user), then re-aggregate to 6h slots — rolling
    * a fine-resolution store into a coarse view, the TSDB op behind
    * retention tiering. Two shuffles, both partial-agg friendly, and
    * the second runs over the already-reduced hourly rows (~1/24 of
    * input). min/max/count only — order-insensitive, so the hash
    * can't be flipped by double summation order. */
  private val downsample = QueryDef(
    "kdb_downsample",
    (s, d) => {
      ev(s, d)
        .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("user_id"), col("slot_1h"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
        .withColumn("slot_6h", col("slot_1h") - col("slot_1h") % Res6h)
        .groupBy(col("event_type"), col("slot_6h"))
        .agg(count(lit(1)).as("n_slots"),
          round(min(col("v")), 2).as("min_v"),
          round(max(col("v")), 2).as("max_v"))
        .orderBy(col("event_type"), col("slot_6h"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type, user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               arg_max(value, event_id) AS v
        FROM events
        GROUP BY 1, 2, 3)
      SELECT event_type,
             slot_1h - slot_1h % ${Res6h} AS slot_6h,
             count(*) AS n_slots,
             round(min(v), 2) AS min_v,
             round(max(v), 2) AS max_v
      FROM h
      GROUP BY 1, 2
      ORDER BY event_type, slot_6h"""))

  /** Linear-interpolation gap fill: the zero-fill Get (Q-2) upgraded
    * to interpolation between the nearest observed slots on either
    * side — resample-and-interpolate over the dense grid. Boundary
    * slots clamp to the nearest neighbor. The two directional scans
    * are windows over the SAME 168-row grid (bounded by the query
    * range, never by data volume — single-partition by design); the
    * heavy lifting stays in the pruned, pre-aggregated scan. */
  private val interpFill = QueryDef(
    "kdb_interp_fill",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val end = T0 + 7 * Day
      val grid = s.range((end - T0) / Hour)
        .select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val data = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < end)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("slot_ns"))
        .agg(max(col("value")).as("v"))
      val wAsc = Window.orderBy(col("slot_ns")).rowsBetween(Window.unboundedPreceding, 0)
      val wDesc = Window.orderBy(col("slot_ns")).rowsBetween(0, Window.unboundedFollowing)
      grid.join(data, Seq("slot_ns"), "left_outer")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wAsc))
        .withColumn("ps", last(when(col("v").isNotNull, col("slot_ns")), ignoreNulls = true).over(wAsc))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wDesc))
        .withColumn("ns", first(when(col("v").isNotNull, col("slot_ns")), ignoreNulls = true).over(wDesc))
        .select(col("slot_ns"),
          round(
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                ((col("slot_ns") - col("ps")).cast("double") /
                  (col("ns") - col("ps")).cast("double"))),
            4).as("value"),
          col("v").isNotNull.cast("int").as("observed"))
        .orderBy(col("slot_ns"))
    },
    Some(s"""
      WITH grid AS (
        SELECT ${T0} + ${Hour} * g AS slot_ns FROM generate_series(0, 167) t(g)),
      d AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns, max(value) AS v
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 7 * Day}
        GROUP BY 1),
      j AS (SELECT g.slot_ns, d.v FROM grid g LEFT JOIN d USING (slot_ns)),
      f AS (
        SELECT slot_ns, v,
          last_value(v IGNORE NULLS) OVER
            (ORDER BY slot_ns ROWS UNBOUNDED PRECEDING) AS pv,
          last_value(CASE WHEN v IS NOT NULL THEN slot_ns END IGNORE NULLS) OVER
            (ORDER BY slot_ns ROWS UNBOUNDED PRECEDING) AS ps,
          first_value(v IGNORE NULLS) OVER
            (ORDER BY slot_ns ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN v IS NOT NULL THEN slot_ns END IGNORE NULLS) OVER
            (ORDER BY slot_ns ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ns
        FROM j)
      SELECT slot_ns,
             round(CASE WHEN v IS NOT NULL THEN v
                        WHEN pv IS NULL THEN nv
                        WHEN nv IS NULL THEN pv
                        ELSE pv + (nv - pv) *
                             (CAST(slot_ns - ps AS DOUBLE) / CAST(ns - ps AS DOUBLE))
                   END, 4) AS value,
             CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM f
      ORDER BY slot_ns"""))

  /** Forward fill (LOCF — last observation carried forward): the
    * third member of the fill family next to zero-fill (Q-2 Get) and
    * linear interpolation. Unlike kdb_interp_fill's single global
    * grid, this one fills PER SERIES under a partitioned window —
    * the horizontally scalable shape (each series' fill is an
    * independent partition; 1M series = 1M independent window
    * partitions, no global sort). Also emits the staleness age in
    * slots — the "how old is this carried value" metric a monitoring
    * read needs next to the value itself. */
  private val locfFill = QueryDef(
    "kdb_locf_fill",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val end = T0 + 7 * Day
      val data = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < end)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
      // type list from the already-reduced slot table, not a second
      // full-data scan (same [T0, end) filter ⇒ identical set)
      val types = data.select(col("event_type")).distinct()
      val grid = s.range((end - T0) / Hour)
        .select((lit(T0) + col("id") * Hour).as("slot_ns"))
        .crossJoin(types)
      val w = Window.partitionBy(col("event_type")).orderBy(col("slot_ns"))
        .rowsBetween(Window.unboundedPreceding, 0)
      grid.join(data, Seq("event_type", "slot_ns"), "left_outer")
        .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
        .withColumn("ps", last(when(col("v").isNotNull, col("slot_ns")), ignoreNulls = true).over(w))
        .select(col("event_type"), col("slot_ns"),
          round(col("fv"), 2).as("value"),
          col("v").isNotNull.cast("int").as("observed"),
          ((col("slot_ns") - col("ps")) / lit(Hour)).cast("long").as("age_slots"))
        .orderBy(col("event_type"), col("slot_ns"))
    },
    Some(s"""
      WITH types AS (
        SELECT DISTINCT event_type FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 7 * Day}),
      grid AS (
        SELECT t.event_type, ${T0} + ${Hour} * g AS slot_ns
        FROM generate_series(0, 167) s(g) CROSS JOIN types t),
      d AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 7 * Day}
        GROUP BY 1, 2),
      j AS (SELECT g.event_type, g.slot_ns, d.v
            FROM grid g LEFT JOIN d USING (event_type, slot_ns)),
      f AS (
        SELECT event_type, slot_ns, v,
          last_value(v IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY slot_ns ROWS UNBOUNDED PRECEDING) AS fv,
          last_value(CASE WHEN v IS NOT NULL THEN slot_ns END IGNORE NULLS) OVER
            (PARTITION BY event_type ORDER BY slot_ns ROWS UNBOUNDED PRECEDING) AS ps
        FROM j)
      SELECT event_type, slot_ns,
             round(fv, 2) AS value,
             CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
             CAST((slot_ns - ps) / ${Hour} AS BIGINT) AS age_slots
      FROM f
      ORDER BY event_type, slot_ns"""))

  /** Exponentially weighted moving average over each type's hourly
    * series: e_t = α·x_t + (1−α)·e_{t−1}, the classic smoothing op a
    * TSDB surface offers next to rolling means. EWMA is inherently
    * sequential per series, so it's computed as ONE strict left fold
    * over the slot-ordered value list per series (collect_list after
    * the per-slot pre-aggregation — bounded by slots-per-series, not
    * by raw points). Both engines run the identical fold expression in
    * the identical order, so the doubles are bit-identical pre-round.
    * Slot values use max() (order-insensitive) so the input to the
    * fold can't wobble. */
  private val ewma = QueryDef(
    "kdb_ewma",
    (s, d) => {
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_slots"),
          round(
            aggregate(
              transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
                r => r.getField("v")),
              lit(0.0),
              (acc, x) => lit(0.3) * x + lit(0.7) * acc),
            4).as("ewma"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2)
      SELECT event_type,
             count(*) AS n_slots,
             round(list_reduce([0.0] || list(v ORDER BY slot_ns),
                               (acc, x) -> 0.3 * x + 0.7 * acc), 4) AS ewma
      FROM h
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Irregular-interval EWMA — gap-aware exponential smoothing over
    * event streams that do NOT arrive on a slot grid (the per-user
    * purchase stream): e_t = w_t·x_t + (1−w_t)·e_{t−1} with the decay
    * weight a function of the ACTUAL gap, w_t = Δ/(Δ + τ) (Δ = gap
    * in minutes, τ = 30). The rational kernel is deliberate: the
    * classical exp(−Δ/τ) weight would put libm exp() inside a
    * sequential fold where 1-ulp engine differences compound, while
    * Δ/(Δ+τ) is pure IEEE arithmetic from exact integer gaps —
    * bit-identical in both engines per step (the kdb_holt_trend
    * determinism rule, extended to a time-varying α). Fold state is
    * a struct (e, prev_minute, n), so the oracle steps the identical
    * recurrence in a recursive CTE (DuckDB list_reduce cannot hold
    * struct state). Scale shape: raw events pre-aggregate to sparse
    * observed minutes (max-LWW per minute, order-insensitive); the
    * per-series fold input is observation-bounded, and the 20-series
    * grouping keeps every list small while staying genuinely
    * irregular. */
  private val ewmaIrregular = QueryDef(
    "kdb_ewma_irregular",
    (s, d) => {
      val acc0 = struct(lit(0.0).as("e"), lit(0L).as("pm"), lit(0).as("n"))
      ev(s, d)
        .filter(col("event_type") === "purchase")
        .withColumn("series", col("user_id") % 20)
        .withColumn("m", expr("ts_ns div 60000000000L"))
        .groupBy(col("series"), col("m"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("series"))
        .agg(count(lit(1)).as("n_obs"),
          (max(col("m")) - min(col("m"))).as("span_minutes"),
          aggregate(
            sort_array(collect_list(struct(col("m"), col("v")))),
            acc0,
            (acc, r) => {
              val m = r.getField("m"); val x = r.getField("v")
              val e = acc.getField("e"); val pm = acc.getField("pm")
              val n = acc.getField("n")
              val gap = (m - pm).cast("double")
              val w = gap / (gap + lit(30.0))
              when(n === 0, struct(x.as("e"), m.as("pm"), lit(1).as("n")))
                .otherwise(struct(
                  (w * x + (lit(1.0) - w) * e).as("e"),
                  m.as("pm"), (n + 1).as("n")))
            }).as("acc"))
        .select(col("series"), col("n_obs"), col("span_minutes"),
          round(col("acc.e"), 4).as("ewma"))
        .orderBy(col("series"))
    },
    Some(s"""
      WITH RECURSIVE p AS (
        SELECT user_id % 20 AS series, epoch_ns(ts) // 60000000000 AS m,
               max(value) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2),
      idx AS (
        SELECT series, row_number() OVER (PARTITION BY series ORDER BY m) AS i,
               m, v
        FROM p),
      nn AS (
        SELECT series, max(i) AS n, max(m) - min(m) AS span
        FROM idx GROUP BY 1),
      rec AS (
        SELECT series, CAST(1 AS BIGINT) AS i, v AS e, m AS pm
        FROM idx WHERE i = 1
        UNION ALL
        SELECT r.series, r.i + 1,
               (CAST(x.m - r.pm AS DOUBLE) / (CAST(x.m - r.pm AS DOUBLE) + 30.0)) * x.v
                 + (1.0 - (CAST(x.m - r.pm AS DOUBLE) / (CAST(x.m - r.pm AS DOUBLE) + 30.0))) * r.e,
               x.m
        FROM rec r JOIN idx x ON x.series = r.series AND x.i = r.i + 1)
      SELECT r.series, CAST(nn.n AS BIGINT) AS n_obs,
             CAST(nn.span AS BIGINT) AS span_minutes,
             round(r.e, 4) AS ewma
      FROM rec r JOIN nn ON nn.series = r.series AND r.i = nn.n
      ORDER BY r.series"""))

  /** OHLC bars: open/high/low/close per (type, 6h window) — the
    * canonical TSDB downsample for anything priced. Open/close are
    * defined by ingest order (min/max event_id), kdb's own notion of
    * first/last write at a slot — tie-free because event_id is unique,
    * so the hash can't wobble. One shuffle, fully partial-agg
    * friendly (min_by/max_by/min/max all combine map-side). */
  private val ohlc = QueryDef(
    "kdb_ohlc",
    (s, d) => {
      ev(s, d)
        .withColumn("slot_6h", col("ts_ns") - col("ts_ns") % Res6h)
        .groupBy(col("event_type"), col("slot_6h"))
        .agg(round(min_by(col("value"), col("event_id")), 2).as("open"),
          round(max(col("value")), 2).as("high"),
          round(min(col("value")), 2).as("low"),
          round(max_by(col("value"), col("event_id")), 2).as("close"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("slot_6h"))
    },
    Some(s"""
      SELECT event_type,
             epoch_ns(ts) - epoch_ns(ts) % ${Res6h} AS slot_6h,
             round(arg_min(value, event_id), 2) AS open,
             round(max(value), 2) AS high,
             round(min(value), 2) AS low,
             round(arg_max(value, event_id), 2) AS close,
             count(*) AS n
      FROM events
      GROUP BY 1, 2
      ORDER BY event_type, slot_6h"""))

  /** Counter rate (reset-aware): per-series monotonic increase à la
    * Prometheus — consecutive deltas in time order, a negative delta
    * means the counter reset so the new value IS the contribution.
    * One shuffle on the series key; the lag window and the final
    * rollup share its partitioning (single Exchange). µs ordering with
    * event_id tiebreak = deterministic deltas in both engines. */
  private val counterRate = QueryDef(
    "kdb_counter_rate",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"), col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      ev(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .groupBy(col("event_type"), col("user_id"))
        .agg(
          round(sum(
            when(col("delta").isNull, 0.0)
              .when(col("delta") < 0, col("value"))
              .otherwise(col("delta"))), 2).as("increase"),
          count(when(col("delta") < 0, 1)).as("n_resets"),
          count(lit(1)).as("n_samples"))
        .orderBy(col("event_type"), col("user_id"))
    },
    Some("""
      WITH o AS (
        SELECT event_type, user_id, value,
               value - lag(value) OVER (PARTITION BY event_type, user_id
                 ORDER BY epoch_us(ts), event_id) AS delta
        FROM events)
      SELECT event_type, user_id,
             round(sum(CASE WHEN delta IS NULL THEN 0
                            WHEN delta < 0 THEN value
                            ELSE delta END), 2) AS increase,
             count(CASE WHEN delta < 0 THEN 1 END) AS n_resets,
             count(*) AS n_samples
      FROM o
      GROUP BY 1, 2
      ORDER BY event_type, user_id"""))

  /** Latest-value snapshot: the current value of every series — kdb's
    * LWW semantics read back as a table (greatest hour slot per
    * series; within a slot the greatest ingest seq wins, exactly the
    * positional-overwrite rule of dblock.go:198-205). Two partial-agg
    * stages like downsample: slot-level LWW first, then max_by over
    * the now-unique slots — both deterministic, no struct-ordering
    * tricks needed. */
  private val latest = QueryDef(
    "kdb_latest",
    (s, d) => {
      ev(s, d)
        .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("user_id"), col("slot_1h"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(max(col("slot_1h")).as("last_slot_ns"),
          round(max_by(col("v"), col("slot_1h")), 2).as("last_value"),
          count(lit(1)).as("n_slots"))
        .orderBy(col("event_type"), col("user_id"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type, user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               arg_max(value, event_id) AS v
        FROM events
        GROUP BY 1, 2, 3)
      SELECT event_type, user_id,
             max(slot_1h) AS last_slot_ns,
             round(arg_max(v, slot_1h), 2) AS last_value,
             count(*) AS n_slots
      FROM h
      GROUP BY 1, 2
      ORDER BY event_type, user_id"""))

  /** Heavy hitters via the Space-Saving sketch (graft.functions.
    * HeavyHitters): top users by event count with a k=64-counter
    * summary — fixed-size partial state, map-side combine, k rows per
    * partition on the wire (the frequency twin of the HLL path in
    * kdb_approx_distinct). Sketch counter values depend on merge
    * order, so the output carries the EXACT top-5 (deterministic)
    * plus two flags asserting the sketch's theorems held: every
    * summary estimate brackets its true count (est ≥ true ≥ est−err),
    * and every item with true frequency > N/k is in the summary. The
    * oracle asserts the flags as constants — hash-gated sketch
    * correctness, not a rows-only check. Driver-side work is bounded
    * by k (the sketch collapses to one row by design). */
  private val heavyHitters = QueryDef(
    "kdb_heavy_hitters",
    (s, d) => {
      import s.implicits._
      val k = 64
      val idsDf = ev(s, d).filter(col("user_id").isNotNull).select(col("user_id"))
      val summary = idsDf.as[Long]
        .select(graft.functions.HeavyHitters.spaceSaving(k)).head()
      val inSummary = summary.map(_.item).toSet
      // ONE aggregation pass feeds every flag and the output: without
      // the persist, each driver action below re-scans the events
      // table (4 full scans for one query). The cached table is one
      // tiny row per user.
      val exact = idsDf.groupBy(col("user_id")).agg(count(lit(1)).as("n")).persist()
      val n = { val r = exact.agg(sum(col("n"))).head(); if (r.isNullAt(0)) 0L else r.getLong(0) }
      val exactForSummary = exact.filter(col("user_id").isin(inSummary.toSeq: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val boundsOk = summary.forall { c =>
        val t = exactForSummary.getOrElse(c.item, 0L)
        c.count >= t && c.count - c.err <= t
      }
      val containOk = exact.filter(col("n") > n / k)
        .collect().map(_.getLong(0)).forall(inSummary)
      // materialize the 5-row output, then drop the cached per-user
      // table — in the single-session 117-query gate run a leaked
      // cache would otherwise live for the rest of the session
      val top5 = exact.orderBy(col("n").desc, col("user_id")).limit(5)
        .select(col("user_id"), col("n"),
          lit(if (boundsOk) 1 else 0).as("bounds_ok"),
          lit(if (containOk) 1 else 0).as("containment_ok"))
      val out = s.createDataFrame(
        java.util.Arrays.asList(top5.collect(): _*), top5.schema)
      exact.unpersist()
      out
    },
    Some("""
      SELECT user_id, count(*) AS n, 1 AS bounds_ok, 1 AS containment_ok
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY user_id
      ORDER BY n DESC, user_id
      LIMIT 5"""))

  /** MAD (median-absolute-deviation) anomaly detection: the robust
    * twin of kdb_zscore_anomaly — median and MAD are immune to the
    * very outliers being hunted, which inflate mean/stddev and mask
    * anomalies near the z-score threshold. Modified z = 0.6745·(v −
    * med)/MAD, flagged at the Iglewicz–Hoaglin 3.5 cutoff. The two
    * exact-percentile windows (med, then MAD of deviations) chain
    * over the SAME per-type hash partitioning as the hourly
    * pre-aggregation — one Exchange total; every slot is emitted
    * with an int flag (zscore precedent: float-threshold row
    * filtering could flip membership between engines). */
  private val madAnomaly = QueryDef(
    "kdb_mad_anomaly",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .withColumn("med", percentile(col("v"), lit(0.5)).over(w))
        .withColumn("mad", percentile(abs(col("v") - col("med")), lit(0.5)).over(w))
        // MAD = 0 (a majority-flat series) makes the score undefined:
        // guard explicitly so both engines emit NULL/0 instead of
        // engine-specific inf/NaN division results.
        .withColumn("rz",
          when(col("mad") > 0, lit(0.6745) * (col("v") - col("med")) / col("mad")))
        .select(col("event_type"), col("slot_ns"),
          round(col("v"), 2).as("value"),
          (round(col("rz"), 4) + lit(0.0)).as("robust_z"),
          coalesce((abs(col("rz")) > 3.5).cast("int"), lit(0)).as("is_outlier"))
        .orderBy(col("event_type"), col("slot_ns"))
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      med AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM hourly GROUP BY 1),
      dev AS (SELECT h.*, m.med FROM hourly h JOIN med m USING (event_type)),
      mad AS (SELECT event_type, quantile_cont(abs(v - med), 0.5) AS mad
              FROM dev GROUP BY 1)
      SELECT d.event_type, d.slot_ns, round(d.v, 2) AS value,
             round(CASE WHEN a.mad > 0 THEN 0.6745 * (d.v - d.med) / a.mad END, 4) + 0.0 AS robust_z,
             CASE WHEN a.mad > 0 AND abs(0.6745 * (d.v - d.med) / a.mad) > 3.5
                  THEN 1 ELSE 0 END AS is_outlier
      FROM dev d JOIN mad a USING (event_type)
      ORDER BY d.event_type, d.slot_ns"""))

  /** Z-score anomaly detection: each hourly slot of a type's series
    * scored against the series' own mean/stddev — the alerting pass a
    * TSDB runs after downsampling. The stats window rides the SAME
    * hash partitioning as the slot pre-aggregation (one Exchange).
    * Every slot is emitted with its score and an int flag (row
    * membership stays deterministic; filtering on a float threshold
    * could flip rows at the boundary between engines). */
  private val zscore = QueryDef(
    "kdb_zscore_anomaly",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
      ev(s, d)
        .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_1h"))
        .agg(max(col("value")).as("v"))
        // sd > 0 guard mirrors kdb_mad_anomaly: a one-slot or constant
        // series has sd NULL/0 — Spark would emit NULL z while DuckDB's
        // IEEE division emits inf, flipping the flag. Degenerate → z=0.
        .withColumn("sd", stddev_samp(col("v")).over(w))
        .withColumn("z", when(col("sd") > 0,
          (col("v") - avg(col("v")).over(w)) / col("sd")))
        .select(col("event_type"), col("slot_1h"),
          round(col("v"), 2).as("v"),
          // + 0.0 canonicalizes IEEE −0.0 (a tiny negative z rounds to
          // −0.0 in one engine and +0.0 in the other — hash mismatch)
          (round(col("z"), 3) + lit(0.0)).as("z"),
          coalesce((abs(col("z")) > 2.5).cast("int"), lit(0)).as("anomaly"))
        .orderBy(col("event_type"), col("slot_1h"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      z AS (
        SELECT event_type, slot_1h, v,
               CASE WHEN stddev_samp(v) OVER w > 0
                    THEN (v - avg(v) OVER w) / stddev_samp(v) OVER w END AS z
        FROM h
        WINDOW w AS (PARTITION BY event_type))
      SELECT event_type, slot_1h,
             round(v, 2) AS v,
             round(z, 3) + 0.0 AS z,
             CASE WHEN abs(z) > 2.5 THEN 1 ELSE 0 END AS anomaly
      FROM z
      ORDER BY event_type, slot_1h"""))

  /** Series alignment + correlation: the hourly click and purchase
    * count series aligned on slot (conditional aggregation — one scan,
    * one shuffle, no join needed since both series come from the same
    * table), then Pearson correlation / covariance / stddevs across
    * the aligned slots. The statistical-aggregate surface (corr,
    * covar_pop, stddev_pop) every TSDB pairs-analysis needs. Absent
    * slots count as zero activity on both sides — the engine's
    * zero-fill semantic — via the dense grid join. */
  private val seriesCorr = QueryDef(
    "kdb_series_corr",
    (s, d) => {
      val n = (T1 - T0) / Hour
      val grid = s.range(n).select((lit(T0) + col("id") * Hour).as("slot_1h"))
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("slot_1h"))
        .agg(count(when(col("event_type") === "click", 1)).as("clicks"),
          count(when(col("event_type") === "purchase", 1)).as("purchases"))
      grid.join(counts, Seq("slot_1h"), "left_outer")
        .select(
          coalesce(col("clicks"), lit(0L)).cast("double").as("c"),
          coalesce(col("purchases"), lit(0L)).cast("double").as("p"))
        .agg(count(lit(1)).as("n_slots"),
          (round(corr(col("c"), col("p")), 4) + lit(0.0)).as("corr_cp"),
          (round(covar_pop(col("c"), col("p")), 4) + lit(0.0)).as("covar_cp"),
          round(stddev_pop(col("c")), 4).as("sd_clicks"),
          round(stddev_pop(col("p")), 4).as("sd_purchases"))
    },
    Some(s"""
      WITH counts AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      aligned AS (
        SELECT CAST(coalesce(c.clicks, 0) AS DOUBLE) AS c,
               CAST(coalesce(c.purchases, 0) AS DOUBLE) AS p
        FROM range(${T0}, ${T1}, ${Hour}) g(slot_1h)
        LEFT JOIN counts c USING (slot_1h))
      SELECT count(*) AS n_slots,
             round(corr(c, p), 4) + 0.0 AS corr_cp,
             round(covar_pop(c, p), 4) + 0.0 AS covar_cp,
             round(stddev_pop(c), 4) AS sd_clicks,
             round(stddev_pop(p), 4) AS sd_purchases
      FROM aligned"""))

  /** Out-of-order arrival audit: per type, the fraction of
    * consecutive-by-arrival events whose event time goes backwards —
    * the measurement behind every watermark/hot-window sizing decision
    * (the reference hard-rejects writes outside its hot window; this
    * query tells you what that policy would drop). event_id is the
    * arrival proxy; timestamps compare at µs so both engines see the
    * same inversions. The arrival lag is a
    * [[graft.operators.SeriesScan.withLags]] pass — range-partitioned
    * local windows + a driver-folded boundary tail, parallelism =
    * #partitions, never #series. */
  private val orderAudit = QueryDef(
    "kdb_order_audit",
    (s, d) => {
      val base = ev(s, d)
        .select(col("event_type"), col("event_id"), expr("ts_ns div 1000").as("ts_us"))
      graft.operators.SeriesScan.withLags(base, "event_type",
          Seq(col("event_id")), Seq((col("ts_us"), "prev_us", 1)))
        .filter(col("prev_us").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("prev_us") > col("ts_us"), 1)).as("n_inversions"),
          round(max(col("prev_us") - col("ts_us")) / 1000000.0, 2).as("max_backstep_s"))
        .withColumn("inv_rate",
          round(col("n_inversions").cast("double") / col("n_pairs"), 4))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, event_id, epoch_us(ts) AS ts_us,
               lag(epoch_us(ts), 1) OVER
                 (PARTITION BY event_type ORDER BY event_id) AS prev_us
        FROM events)
      SELECT event_type,
             count(*) AS n_pairs,
             count(CASE WHEN prev_us > ts_us THEN 1 END) AS n_inversions,
             round(max(prev_us - ts_us) / 1000000.0, 2) AS max_backstep_s,
             round(CAST(count(CASE WHEN prev_us > ts_us THEN 1 END) AS DOUBLE)
                   / count(*), 4) AS inv_rate
      FROM e
      WHERE prev_us IS NOT NULL
      GROUP BY 1
      ORDER BY event_type"""))

  /** Calendar heatmap: the (day-of-week × hour-of-day) activity
    * matrix for one event type — seasonality's 2-D sibling, the
    * dashboard grid behind staffing/capacity views. T0 is a Monday
    * (2024-01-01), so dow = (days since T0) % 7 with 0 = Monday —
    * pure integer epoch math, no calendar library drift between
    * engines. The range is exactly 28 days so every (dow, hod) cell
    * is covered exactly 4 times and the per-week mean is a constant
    * /4.0 (widening the range requires a per-cell cover count). One
    * reduce to 168 cells. */
  private val calendarHeatmap = QueryDef(
    "kdb_calendar_heatmap",
    (s, d) => {
      val end = T0 + 28 * Day // exactly 4 of each weekday
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < end &&
          col("event_type") === "click")
        .withColumn("day", expr(s"(ts_ns - ${T0}) div ${Day}"))
        .withColumn("dow", col("day") % 7)
        .withColumn("hod", expr(s"((ts_ns - ${T0}) div ${Hour}) % 24"))
        .groupBy(col("dow"), col("hod"))
        .agg(count(lit(1)).as("n"),
          round(count(lit(1)) / 4.0, 2).as("mean_per_week"))
        .orderBy(col("dow"), col("hod"))
    },
    Some(s"""
      SELECT ((epoch_ns(ts) - ${T0}) // ${Day}) % 7 AS dow,
             ((epoch_ns(ts) - ${T0}) // ${Hour}) % 24 AS hod,
             count(*) AS n,
             round(count(*) / 4.0, 2) AS mean_per_week
      FROM events
      WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 28 * Day}
        AND event_type = 'click'
      GROUP BY 1, 2
      ORDER BY dow, hod"""))

  /** Daily percentile bands (the SLO report): p50/p95/p99 of value
    * per (type, day) — exact percentiles, which buffer each group's
    * values by construction; the groups here are (types × days), so
    * per-group state is a day's samples for one type, the right
    * granularity to keep exact quantiles feasible at scale (the
    * all-data variant is what percentile_approx is for, covered by
    * q_approx_quantile). One shuffle on the composite key; 4dp
    * rounding in both engines keeps interpolation ulps out of the
    * hash. */
  private val latencyBands = QueryDef(
    "kdb_percentile_bands",
    (s, d) => {
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("day", ((col("ts_ns") - T0) / Day).cast("long"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.95)), 4).as("p95"),
          round(percentile(col("value"), lit(0.99)), 4).as("p99"))
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""
      SELECT event_type,
             CAST(floor((epoch_ns(ts) - ${T0}) / ${Day}) AS BIGINT) AS day,
             count(*) AS n,
             round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.95), 4) AS p95,
             round(quantile_cont(value, 0.99), 4) AS p99
      FROM events
      WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
      GROUP BY 1, 2
      ORDER BY event_type, day"""))

  /** Top movers: each type's three largest day-over-day activity
    * swings — the "biggest changes" dashboard read (change detection
    * ranked, not thresholded). Daily counts → lag(1) delta → rank by
    * |delta| within type, all integer math (counts and deltas), so
    * ranking is bit-exact across engines; day tiebreaks make the
    * top-3 cut deterministic. Everything after the daily reduce runs
    * on types × 30 rows. */
  private val topMovers = QueryDef(
    "kdb_top_movers",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wRank = Window.partitionBy(col("event_type"))
        .orderBy(abs(col("delta")).desc, col("day"))
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("day", ((col("ts_ns") - T0) / Day).cast("long"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev_n", lag(col("n"), 1).over(wLag))
        .filter(col("prev_n").isNotNull)
        .withColumn("delta", col("n") - col("prev_n"))
        .withColumn("rk", row_number().over(wRank))
        .filter(col("rk") <= 3)
        .select(col("event_type"), col("day"), col("n"), col("prev_n"),
          col("delta"), col("rk"))
        .orderBy(col("event_type"), col("rk"))
    },
    Some(s"""
      WITH daily AS (
        SELECT event_type,
               CAST(floor((epoch_ns(ts) - ${T0}) / ${Day}) AS BIGINT) AS day,
               count(*) AS n
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      lagged AS (
        SELECT event_type, day, n,
               lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
        FROM daily),
      ranked AS (
        SELECT event_type, day, n, prev_n, n - prev_n AS delta,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY abs(n - prev_n) DESC, day) AS rk
        FROM lagged WHERE prev_n IS NOT NULL)
      SELECT event_type, day, n, prev_n, delta, rk
      FROM ranked WHERE rk <= 3
      ORDER BY event_type, rk"""))

  /** Cross-series arithmetic (PromQL-style binary op): the derived
    * series error_count / click_count per hourly slot, aligned on the
    * dense grid so both operands exist at every slot — division by an
    * absent denominator yields NULL (not a dropped row), with an int
    * flag for slots where the ratio is defined. One pass builds BOTH
    * operand series (conditional aggregation — no second scan, no
    * join); the grid left-join zero-fills counts, and slots outside
    * observed data still appear. 720-row output regardless of data
    * volume. */
  private val seriesRatio = QueryDef(
    "kdb_series_ratio",
    (s, d) => {
      val end = T0 + 30 * Day
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < end &&
          col("event_type").isin("error", "click"))
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("slot_ns"))
        .agg(count(when(col("event_type") === "error", 1)).as("n_err"),
          count(when(col("event_type") === "click", 1)).as("n_click"))
      val grid = s.range((end - T0) / Hour)
        .select((lit(T0) + col("id") * Hour).as("slot_ns"))
      grid.join(counts, Seq("slot_ns"), "left_outer")
        .select(col("slot_ns"),
          coalesce(col("n_err"), lit(0L)).as("n_err"),
          coalesce(col("n_click"), lit(0L)).as("n_click"))
        .withColumn("ratio",
          when(col("n_click") > 0,
            round(col("n_err").cast("double") / col("n_click"), 4)))
        .withColumn("defined", col("ratio").isNotNull.cast("int"))
        .orderBy(col("slot_ns"))
    },
    Some(s"""
      WITH counts AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 30 * Day}
          AND event_type IN ('error', 'click')
        GROUP BY 1)
      SELECT g.slot_ns,
             coalesce(c.n_err, 0) AS n_err,
             coalesce(c.n_click, 0) AS n_click,
             CASE WHEN coalesce(c.n_click, 0) > 0
                  THEN round(CAST(coalesce(c.n_err, 0) AS DOUBLE) / c.n_click, 4) END AS ratio,
             CASE WHEN coalesce(c.n_click, 0) > 0 THEN 1 ELSE 0 END AS defined
      FROM range(${T0}, ${T0 + 30 * Day}, ${Hour}) g(slot_ns)
      LEFT JOIN counts c USING (slot_ns)
      ORDER BY g.slot_ns"""))

  /** Seasonality profile: each type's mean hourly activity by
    * hour-of-day over the 30-day range — the diurnal-pattern
    * decomposition behind capacity planning and "is tonight normal"
    * baselines — plus the peak hour flagged per type. Zero-count
    * slots need no grid here: every hour-of-day occurs exactly 30
    * times in the range, so mean = sum/30 is exact over the sparse
    * counts. Two reduce steps (slot counts, then 24-row profiles)
    * plus a tiny per-type window — nothing after the first shuffle
    * touches full data. */
  private val seasonality = QueryDef(
    "kdb_seasonality",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val end = T0 + 30 * Day
      val w = Window.partitionBy(col("event_type"))
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < end)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(count(lit(1)).as("n"))
        .withColumn("hod", expr(s"((slot_ns - ${T0}) div ${Hour}) % 24"))
        .groupBy(col("event_type"), col("hod"))
        .agg((sum(col("n")) / 30.0).as("mean_n"))
        .withColumn("is_peak",
          (col("mean_n") === max(col("mean_n")).over(w)).cast("int"))
        .select(col("event_type"), col("hod"),
          round(col("mean_n"), 4).as("mean_n"), col("is_peak"))
        .orderBy(col("event_type"), col("hod"))
    },
    Some(s"""
      WITH counts AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(*) AS n
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 30 * Day}
        GROUP BY 1, 2),
      prof AS (
        SELECT event_type, ((slot_ns - ${T0}) // ${Hour}) % 24 AS hod,
               sum(n) / 30.0 AS mean_n
        FROM counts GROUP BY 1, 2)
      SELECT event_type, hod, round(mean_n, 4) AS mean_n,
             CASE WHEN mean_n = max(mean_n) OVER (PARTITION BY event_type)
                  THEN 1 ELSE 0 END AS is_peak
      FROM prof
      ORDER BY event_type, hod"""))

  /** Pairwise correlation matrix: hourly activity counts per event
    * type, zero-filled onto the dense grid, then every unordered type
    * pair's Pearson correlation — the correlation heatmap over a
    * metric family (kdb_series_corr generalized from one pair to the
    * matrix). Scale shape: the ONLY full-data pass is the (type,
    * slot) pre-aggregation; the self-join runs on the already-reduced
    * grid (types × slots), shuffling on slot_ns, and emits
    * types²/2 rows. corr/order-insensitive co-moments, rounded —
    * no float-fold hazard. */
  private val corrMatrix = QueryDef(
    "kdb_corr_matrix",
    (s, d) => {
      val end = T0 + 30 * Day
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < end)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(count(lit(1)).as("n"))
      val types = counts.select(col("event_type")).distinct()
      val grid = s.range((end - T0) / Hour)
        .select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val dense = types.crossJoin(broadcast(grid))
        .join(counts, Seq("event_type", "slot_ns"), "left_outer")
        .select(col("event_type"), col("slot_ns"),
          coalesce(col("n"), lit(0L)).cast("double").as("v"))
      dense.as("a").join(dense.as("b"),
          col("a.slot_ns") === col("b.slot_ns") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("n_slots"),
          (round(corr(col("a.v"), col("b.v")), 4) + lit(0.0)).as("corr_v"))
        .orderBy(col("t1"), col("t2"))
    },
    Some(s"""
      WITH counts AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(*) AS n
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 30 * Day}
        GROUP BY 1, 2),
      types AS (SELECT DISTINCT event_type FROM counts),
      dense AS (
        SELECT t.event_type, g.slot_ns, CAST(coalesce(c.n, 0) AS DOUBLE) AS v
        FROM types t
        CROSS JOIN range(${T0}, ${T0 + 30 * Day}, ${Hour}) g(slot_ns)
        LEFT JOIN counts c ON c.event_type = t.event_type AND c.slot_ns = g.slot_ns)
      SELECT a.event_type AS t1, b.event_type AS t2,
             count(*) AS n_slots,
             round(corr(a.v, b.v), 4) + 0.0 AS corr_v
      FROM dense a JOIN dense b
        ON a.slot_ns = b.slot_ns AND a.event_type < b.event_type
      GROUP BY 1, 2
      ORDER BY t1, t2"""))

  /** Audience overlap via KMV sketches (graft.functions.Kmv): distinct
    * click-users vs purchase-users, their union and intersection — the
    * set algebra HLL registers cannot do. Each side collapses to a
    * k=256 summary (fixed-size partial state, one tiny row to the
    * driver); union/intersection estimates come from merging the two
    * summaries. Estimates are deterministic in the data (md-free
    * xxhash64, no RNG), so the within-20% quality flags are stable
    * gate material; the output rows themselves are the EXACT counts.
    * At gate scales the summaries hold fewer than k hashes, so the
    * estimates are exact by construction — the estimation regime is
    * exercised in FunctionsSpec. Two jobs total: one grouped typed
    * aggregation builds BOTH sketches (fixed-size partial state per
    * partition, merged at 2 reduce keys), and one per-user flags pass
    * yields all three exact counts without a distinct+intersect
    * re-shuffle — the same two-scan shape stands at 100 TB because
    * nothing but the k-hash summaries and one count row reach the
    * driver. */
  private val audienceOverlap = QueryDef(
    "kdb_audience_overlap",
    (s, d) => {
      import s.implicits._
      val k = 256
      val both = ev(s, d)
        .filter(col("event_type").isin("click", "purchase") && col("user_id").isNotNull)
        .select(col("event_type").as("t"), col("user_id").as("u"))
      // Job 1: both KMV summaries in one pass (2 reduce keys).
      val sketches = both
        .select(col("t"), xxhash64(col("u")).as("h")).as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(graft.functions.Kmv.kmv(k)).collect().toMap
      val sa = sketches.getOrElse("click", Nil)
      val sb = sketches.getOrElse("purchase", Nil)
      val estA = graft.functions.Kmv.estimate(sa, k)
      val estB = graft.functions.Kmv.estimate(sb, k)
      val (_, estI) = graft.functions.Kmv.setEstimates(sa, sb, k)
      // Job 2: per-user presence flags → all three exact counts.
      val exact = both
        .groupBy(col("u"))
        .agg(max(when(col("t") === "click", 1).otherwise(0)).as("a"),
             max(when(col("t") === "purchase", 1).otherwise(0)).as("b"))
        .agg(count(when(col("a") === 1, 1)).as("exact_a"),
             count(when(col("b") === 1, 1)).as("exact_b"),
             count(when(col("a") === 1 && col("b") === 1, 1)).as("exact_both"))
        .head()
      def ok(est: Double, exact: Long): Int =
        if (math.abs(est - exact) <= math.max(1.0, exact * 0.2)) 1 else 0
      val one = Seq((exact.getLong(0), exact.getLong(1), exact.getLong(2),
        ok(estA, exact.getLong(0)), ok(estB, exact.getLong(1)), ok(estI, exact.getLong(2))))
      one.toDF("exact_a", "exact_b", "exact_both", "a_ok", "b_ok", "both_ok")
    },
    Some("""
      WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
           p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      SELECT (SELECT count(*) FROM c) AS exact_a,
             (SELECT count(*) FROM p) AS exact_b,
             (SELECT count(*) FROM c JOIN p USING (user_id)) AS exact_both,
             1 AS a_ok, 1 AS b_ok, 1 AS both_ok"""))

  /** Rolling 7-day active users (WAU): sliding-window DISTINCT, the
    * metric a plain window sum cannot compute (distinct does not
    * decompose over overlapping windows). Scale shape: collapse raw
    * events to distinct (user, day) FIRST (the only pass over full
    * data), then explode each pair to the ≤7 window-end days it
    * supports and count distinct per end day — amplification runs on
    * the collapsed pair set, bounded by users × days, not on events.
    * Only full windows (day ≥ 6) are emitted. */
  private val rollingWau = QueryDef(
    "kdb_rolling_wau",
    (s, d) => {
      val ud = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .select(col("user_id"), ((col("ts_ns") - T0) / Day).cast("long").as("day"))
        .distinct()
      ud.select(col("user_id"),
          explode(sequence(col("day"), least(col("day") + 6, lit(29L)))).as("t_day"))
        .groupBy(col("t_day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .filter(col("t_day") >= 6)
        .orderBy(col("t_day"))
    },
    Some(s"""
      WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(floor((epoch_ns(ts) - ${T0}) / ${Day}) AS BIGINT) AS day
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      t AS (
        SELECT user_id, unnest(generate_series(day, least(day + 6, 29))) AS t_day
        FROM ud)
      SELECT t_day, count(DISTINCT user_id) AS wau
      FROM t WHERE t_day >= 6
      GROUP BY 1 ORDER BY t_day"""))

  /** Time-weighted average (TWAP): over irregular samples, each
    * observation holds until the next one, so its weight is that
    * holding duration (the last one is clamped to the range end) —
    * the correct mean for unevenly-sampled gauges, where the
    * arithmetic mean over-weights chatty periods. The next-sample
    * lookup is a [[graft.operators.SeriesScan.withLags]] pass (lead =
    * lag under the DESCENDING order): range-partitioned local windows
    * plus a driver-folded per-(partition, series) tail — parallelism
    * is #partitions, never #series (a per-type raw-event window would
    * funnel each type's whole history through one task at 100×);
    * per-series output is a single row. event_id tiebreak: under
    * equal timestamps, plain ORDER BY ts_ns would assign the holding
    * interval to an arbitrary tied row. */
  private val twap = QueryDef(
    "kdb_twap",
    (s, d) => {
      val base = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .select(col("event_type"), col("event_id"), col("ts_ns"), col("value"))
      graft.operators.SeriesScan.withLags(base, "event_type",
          Seq(col("ts_ns").desc, col("event_id").desc),
          Seq((col("ts_ns"), "next_ts", 1)))
        .withColumn("hold_ns",
          coalesce(col("next_ts"), lit(T1)) - col("ts_ns"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_obs"),
          round(sum(col("value") * col("hold_ns")) / sum(col("hold_ns")), 4).as("twap"),
          round(avg(col("value")), 4).as("naive_avg"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH e AS (
        SELECT event_type, event_id, epoch_ns(ts) AS ts_ns, value FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      h AS (
        SELECT event_type, value,
               coalesce(lead(ts_ns, 1) OVER
                 (PARTITION BY event_type ORDER BY ts_ns, event_id), ${T1}) - ts_ns AS hold_ns
        FROM e)
      SELECT event_type, count(*) AS n_obs,
             round(sum(value * hold_ns) / sum(hold_ns), 4) AS twap,
             round(avg(value), 4) AS naive_avg
      FROM h
      GROUP BY 1
      ORDER BY event_type"""))

  /** Gap detection: per-series sample intervals above a threshold —
    * the monitoring read behind "did this feed stop?". lead() over the
    * same one-shuffle per-series window as TWAP; emits each gap's
    * bounds and length in minutes. Output is proportional to the
    * number of GAPS, not samples, so it stays small at any scale. */
  private val gapDetect = QueryDef(
    "kdb_gap_detect",
    (s, d) => {
      // µs precision throughout: DuckDB truncates parquet ns
      // timestamps to µs, so emitting/comparing at ns can never
      // hash-match — floor-div by 1000 equals that truncation.
      // lead(ts) = SeriesScan lag under the DESC order (de-funneled:
      // a per-type raw-event window is one task per type at 100×);
      // the event_id tiebreak totalizes the order — gap rows are
      // unchanged (consecutive diffs depend only on the sorted
      // timestamp multiset).
      val thresholdUs = 30L * 60 * 1000 * 1000
      val base = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .select(col("event_type"), expr("ts_ns div 1000").as("ts_us"),
          col("event_id"))
      graft.operators.SeriesScan.withLags(base, "event_type",
          Seq(col("ts_us").desc, col("event_id").desc),
          Seq((col("ts_us"), "next_us", 1)))
        .filter(col("next_us") - col("ts_us") > thresholdUs)
        .select(col("event_type"), col("ts_us").as("gap_start_us"),
          col("next_us").as("gap_end_us"),
          ((col("next_us") - col("ts_us")) / lit(60L * 1000 * 1000)).cast("long")
            .as("gap_minutes"))
        .orderBy(col("event_type"), col("gap_start_us"))
    },
    Some(s"""
      WITH e AS (
        SELECT event_type, epoch_us(ts) AS ts_us FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      h AS (
        SELECT event_type, ts_us,
               lead(ts_us, 1) OVER (PARTITION BY event_type ORDER BY ts_us) AS next_us
        FROM e)
      SELECT event_type, ts_us AS gap_start_us, next_us AS gap_end_us,
             CAST(floor((next_us - ts_us) / ${60L * 1000 * 1000}) AS BIGINT) AS gap_minutes
      FROM h
      WHERE next_us - ts_us > ${30L * 60 * 1000 * 1000}
      ORDER BY event_type, gap_start_us"""))

  /** Ordered conversion funnel: view → click → purchase, each stage's
    * timestamp strictly after the previous stage's. Three chained
    * min-over-user windows (partitionBy only, no orderBy — no sort
    * needed) compute the stage times; they all share ONE hash exchange
    * on user_id, and the per-user collapse reuses that partitioning.
    * Per-user state is three longs regardless of event count, so the
    * shape stands at 100 TB: one shuffle of the type-filtered events,
    * then a constant-size global rollup. */
  private val funnel = QueryDef(
    "kdb_funnel",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val e = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1 &&
          col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"), col("ts_ns"))
      val staged = e
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts_ns"))).over(w))
        .withColumn("t_click",
          min(when(col("event_type") === "click" && col("ts_ns") > col("t_view"),
            col("ts_ns"))).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" && col("ts_ns") > col("t_click"),
            col("ts_ns"))).over(w))
      staged
        .groupBy(col("user_id"))
        .agg(min(col("t_view")).as("t_view"), min(col("t_click")).as("t_click"),
          min(col("t_purchase")).as("t_purchase"))
        .filter(col("t_view").isNotNull)
        .agg(count(lit(1)).as("n_view"),
          count(col("t_click")).as("n_click"),
          count(col("t_purchase")).as("n_purchase"))
        .select(col("n_view"), col("n_click"), col("n_purchase"),
          // zero-denominator guards: Spark Divide yields NULL, DuckDB
          // IEEE division yields NaN/inf — pin the degenerate case to
          // NULL in both engines. n_view CAN be 0: on empty input the
          // global agg still emits its one row with all counts 0.
          when(col("n_view") > 0,
            round(col("n_click").cast("double") / col("n_view"), 4))
            .as("conv_click"),
          when(col("n_click") > 0,
            round(col("n_purchase").cast("double") / col("n_click"), 4))
            .as("conv_purchase"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
          AND event_type IN ('view', 'click', 'purchase')),
      f1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_ns END)
               OVER (PARTITION BY user_id) AS t_view FROM e),
      f2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_ns > t_view THEN ts_ns END)
               OVER (PARTITION BY user_id) AS t_click FROM f1),
      f3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_ns > t_click THEN ts_ns END)
               OVER (PARTITION BY user_id) AS t_purchase FROM f2),
      u AS (SELECT user_id, min(t_view) AS t_view, min(t_click) AS t_click,
                   min(t_purchase) AS t_purchase
            FROM f3 GROUP BY 1),
      agg AS (
        SELECT count(*) AS n_view, count(t_click) AS n_click,
               count(t_purchase) AS n_purchase
        FROM u WHERE t_view IS NOT NULL)
      SELECT n_view, n_click, n_purchase,
             CASE WHEN n_view > 0
                  THEN round(CAST(n_click AS DOUBLE) / n_view, 4) END AS conv_click,
             CASE WHEN n_click > 0
                  THEN round(CAST(n_purchase AS DOUBLE) / n_click, 4) END AS conv_purchase
      FROM agg"""))

  /** Weekly cohort-retention matrix: users bucketed by the week of
    * their first event; each cell counts the cohort's distinct users
    * active `week_offset` weeks later, plus the rate vs. the cohort's
    * own size (offset 0 row — every user is active in their first
    * week by construction). ONE shuffle of events matters: the
    * min-over-user window (partitionBy only, no sort) attaches each
    * user's first-event time without the agg+self-join's second
    * event shuffle; the (cohort, offset) matrix is tiny (weeks²) so
    * its distinct shuffle and the offset-0 broadcast back are noise
    * at any scale. */
  private val retentionCohorts = QueryDef(
    "kdb_retention_cohorts",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val Week = 7 * Day
      val w = Window.partitionBy(col("user_id"))
      val cells = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .select(col("user_id"), col("ts_ns"))
        .withColumn("cohort_week",
          ((min(col("ts_ns")).over(w) - T0) / Week).cast("long"))
        .withColumn("week_offset",
          ((col("ts_ns") - T0) / Week).cast("long") - col("cohort_week"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = cells.filter(col("week_offset") === 0)
        .select(col("cohort_week"), col("n_active").as("cohort_size"))
      cells.join(broadcast(sizes), "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("n_active"),
          round(col("n_active").cast("double") / col("cohort_size"), 4).as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      first AS (
        SELECT user_id, CAST(floor((min(ts_ns) - ${T0}) / ${7 * Day}) AS BIGINT) AS cohort_week
        FROM e GROUP BY 1),
      cells AS (
        SELECT cohort_week,
               CAST(floor((ts_ns - ${T0}) / ${7 * Day}) AS BIGINT) - cohort_week AS week_offset,
               count(DISTINCT user_id) AS n_active
        FROM e JOIN first USING (user_id)
        GROUP BY 1, 2),
      sizes AS (
        SELECT cohort_week, n_active AS cohort_size FROM cells WHERE week_offset = 0)
      SELECT cohort_week, week_offset, n_active,
             round(CAST(n_active AS DOUBLE) / cohort_size, 4) AS retention
      FROM cells JOIN sizes USING (cohort_week)
      ORDER BY cohort_week, week_offset"""))

  /** PromQL-style histogram_quantile: bucket the value distribution
    * into cumulative le-bound counters per series (the layout a
    * Prometheus client exports), then linearly interpolate the p90
    * inside the bucket containing the target rank — the TSDB idiom
    * for computing quantiles from mergeable counters instead of raw
    * samples. ONE partial-agg pass builds all bucket counters (each
    * is a conditional count, so the shuffle moves 6 longs per type);
    * the interpolation is scalar arithmetic on the 5-row result.
    * Above the last finite bound the estimate clamps to that bound,
    * as PromQL does. The reached CASE branch always has
    * cum_hi > cum_lo (an empty bucket's branch is shadowed by the
    * earlier one), so no division guard is needed. */
  private val histogramQuantile = QueryDef(
    "kdb_histogram_quantile",
    (s, d) => {
      val bounds = Seq(10.0, 25.0, 50.0, 100.0, 250.0)
      val e = ev(s, d)
      val cums = bounds.zipWithIndex.map { case (b, i) =>
        count(when(col("value") <= b, 1)).cast("double").as(s"c$i")
      }
      val agg = e.groupBy(col("event_type"))
        .agg(cums.head, cums.tail :+ count(lit(1)).cast("double").as("total"): _*)
      val target = col("total") * 0.9
      val lo = 0.0 +: bounds.init
      val p90 = bounds.indices.foldRight(lit(bounds.last): org.apache.spark.sql.Column) {
        case (i, rest) =>
          val cumPrev = if (i == 0) lit(0.0) else col(s"c${i - 1}")
          when(target <= col(s"c$i"),
            lit(lo(i)) + lit(bounds(i) - lo(i)) * (target - cumPrev) / (col(s"c$i") - cumPrev))
            .otherwise(rest)
      }
      val outCols = col("event_type") +:
        bounds.indices.map(i => col(s"c$i").cast("long").as(s"le_${bounds(i).toInt}")) :+
        col("total").cast("long").as("total") :+
        round(p90, 4).as("p90_est")
      agg.select(outCols: _*)
        .orderBy(col("event_type"))
    },
    Some {
      val bounds = Seq(10.0, 25.0, 50.0, 100.0, 250.0)
      val lo = 0.0 +: bounds.init
      val cumSql = bounds.zipWithIndex.map { case (b, i) =>
        s"CAST(count(*) FILTER (value <= $b) AS DOUBLE) AS c$i"
      }.mkString(", ")
      val caseSql = bounds.indices.map { i =>
        val cumPrev = if (i == 0) "0.0" else s"c${i - 1}"
        s"WHEN total * 0.9 <= c$i THEN ${lo(i)} + ${bounds(i) - lo(i)} * (total * 0.9 - $cumPrev) / (c$i - $cumPrev)"
      }.mkString("\n               ")
      val les = bounds.zipWithIndex.map { case (b, i) =>
        s"CAST(c$i AS BIGINT) AS le_${b.toInt}"
      }.mkString(", ")
      s"""
      WITH agg AS (
        SELECT event_type, $cumSql,
               CAST(count(*) AS DOUBLE) AS total
        FROM events GROUP BY 1)
      SELECT event_type, $les, CAST(total AS BIGINT) AS total,
             round(CASE $caseSql
               ELSE ${bounds.last} END, 4) AS p90_est
      FROM agg
      ORDER BY event_type"""
    })

  /** Holt double-exponential smoothing (level + trend) per series over
    * the hourly max-LWW values — the forecasting op one step past EWMA:
    * l_t = α·x_t + (1−α)·(l_{t−1}+b_{t−1}),
    * b_t = β·(l_t−l_{t−1}) + (1−β)·b_{t−1}, init l_1 = x_1, b_1 = 0.
    * Like EWMA it is inherently sequential per series, so it runs as
    * ONE strict left fold with a (level, trend, n) struct accumulator
    * (Spark `aggregate` HOF; the oracle steps the same recurrence as a
    * recursive CTE — the first element is the init, matching the n=0
    * branch here). α=0.5, β=0.25 are exactly representable in binary, and both
    * engines evaluate the identical expression tree in the identical
    * order, so the doubles are bit-identical pre-round. The fold input
    * is bounded by slots-per-series (≤720 here), never raw points —
    * the per-slot pre-aggregation is the scale knob. */
  private val holtTrend = QueryDef(
    "kdb_holt_trend",
    (s, d) => {
      val acc0 = struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0).as("n"))
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_slots"),
          aggregate(
            transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
              r => r.getField("v")),
            acc0,
            (acc, x) => {
              val l = acc.getField("l"); val b = acc.getField("b"); val n = acc.getField("n")
              // lNew inlined twice exactly as in the oracle's lambda so
              // both engines compute b from the same expression shape
              val lNew = lit(0.5) * x + lit(0.5) * (l + b)
              when(n === 0, struct(x.as("l"), lit(0.0).as("b"), lit(1).as("n")))
                .otherwise(struct(
                  lNew.as("l"),
                  (lit(0.25) * (lNew - l) + lit(0.75) * b).as("b"),
                  (n + 1).as("n")))
            }).as("h"))
        .select(col("event_type"), col("n_slots"),
          round(col("h.l"), 4).as("level"),
          round(col("h.b"), 4).as("trend"),
          round(col("h.l") + lit(3.0) * col("h.b"), 4).as("forecast_3"))
        .orderBy(col("event_type"))
    },
    // NOTE the oracle is a recursive CTE, not list_reduce: DuckDB
    // 1.0.0 miscomputes struct-typed accumulators inside list_reduce
    // lambdas (scalar folds like kdb_ewma's are fine). The CTE steps
    // the identical recurrence one slot at a time, so the doubles
    // still match Spark's fold bit for bit pre-round.
    Some(s"""
      WITH RECURSIVE h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY slot_ns) AS i,
               v
        FROM h),
      nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
      rec AS (
        SELECT event_type, CAST(1 AS BIGINT) AS i, v AS l, CAST(0.0 AS DOUBLE) AS b
        FROM idx WHERE i = 1
        UNION ALL
        SELECT r.event_type, r.i + 1,
               0.5 * x.v + 0.5 * (r.l + r.b),
               0.25 * ((0.5 * x.v + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b
        FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1)
      SELECT r.event_type, nn.n AS n_slots,
             round(r.l, 4) AS level,
             round(r.b, 4) AS trend,
             round(r.l + 3.0 * r.b, 4) AS forecast_3
      FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.i = nn.n
      ORDER BY r.event_type"""))

  /** Holt-Winters ADDITIVE-SEASONAL smoothing (level + trend + a
    * 24-slot circular seasonal state) per series — the full triple-
    * exponential forecaster over the hourly max-LWW values:
    *   l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
    *   s_t = γ(x_t − l_t)   + (1−γ) s_{t−m},   m = 24, init l₁=x₁,
    * b₁=0, seasonal state all-zero (the first day runs as plain Holt
    * while the seasonal buffer fills — the naive-init convention).
    * Same strict-fold discipline as kdb_holt_trend, with the seasonal
    * buffer as an ARRAY field in the struct accumulator, updated by
    * position (pmod(n, 24)); the oracle steps the identical
    * recurrence in a recursive CTE carrying the same 24-list (DuckDB
    * list_reduce cannot hold struct state — the Holt precedent).
    * α=0.5, β=γ=0.25 are binary-exact; x inputs come from max() (no
    * sum ordering), so the doubles match bit for bit pre-round. The
    * fold input stays slot-bounded (≤720 values/series) — raw events
    * never reach the fold. */
  private val holtWinters = QueryDef(
    "kdb_holtwinters",
    (s, d) => {
      val m = 24
      val acc0 = struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0).as("n"),
        array_repeat(lit(0.0), m).as("sv"))
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_slots"),
          aggregate(
            transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
              r => r.getField("v")),
            acc0,
            (acc, x) => {
              val l = acc.getField("l"); val b = acc.getField("b")
              val n = acc.getField("n"); val sv = acc.getField("sv")
              val idx = pmod(n, lit(m)) + 1
              val sOld = element_at(sv, idx)
              val lNew = lit(0.5) * (x - sOld) + lit(0.5) * (l + b)
              val sNew = lit(0.25) * (x - lNew) + lit(0.75) * sOld
              val svNew = concat(slice(sv, lit(1), idx - 1), array(sNew),
                slice(sv, idx + 1, lit(m) - idx))
              when(n === 0,
                struct(x.as("l"), lit(0.0).as("b"), lit(1).as("n"), sv.as("sv")))
                .otherwise(struct(
                  lNew.as("l"),
                  (lit(0.25) * (lNew - l) + lit(0.75) * b).as("b"),
                  (n + 1).as("n"),
                  svNew.as("sv")))
            }).as("h"))
        .select(col("event_type"), col("n_slots"),
          round(col("h.l"), 4).as("level"),
          round(col("h.b"), 4).as("trend"),
          round(element_at(col("h.sv"), pmod(col("h.n"), lit(m)) + 1), 4)
            .as("s_next"),
          round(col("h.l") + col("h.b") +
            element_at(col("h.sv"), pmod(col("h.n"), lit(m)) + 1), 4)
            .as("forecast_1"),
          round(array_max(col("h.sv")) - array_min(col("h.sv")), 4)
            .as("season_amp"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH RECURSIVE h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY slot_ns) AS i,
               v
        FROM h),
      nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
      rec AS (
        SELECT event_type, CAST(1 AS BIGINT) AS i, v AS l,
               CAST(0.0 AS DOUBLE) AS b,
               list_transform(generate_series(1, 24), z -> CAST(0.0 AS DOUBLE)) AS sv
        FROM idx WHERE i = 1
        UNION ALL
        SELECT r.event_type, r.i + 1,
               0.5 * (x.v - r.sv[CAST(r.i % 24 + 1 AS INTEGER)])
                 + 0.5 * (r.l + r.b),
               0.25 * ((0.5 * (x.v - r.sv[CAST(r.i % 24 + 1 AS INTEGER)])
                          + 0.5 * (r.l + r.b)) - r.l)
                 + 0.75 * r.b,
               r.sv[1:CAST(r.i % 24 AS INTEGER)]
                 || [0.25 * (x.v - (0.5 * (x.v - r.sv[CAST(r.i % 24 + 1 AS INTEGER)])
                                      + 0.5 * (r.l + r.b)))
                     + 0.75 * r.sv[CAST(r.i % 24 + 1 AS INTEGER)]]
                 || r.sv[CAST(r.i % 24 + 2 AS INTEGER):24]
        FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1)
      SELECT r.event_type, nn.n AS n_slots,
             round(r.l, 4) AS level,
             round(r.b, 4) AS trend,
             round(r.sv[CAST(r.i % 24 + 1 AS INTEGER)], 4) AS s_next,
             round(r.l + r.b + r.sv[CAST(r.i % 24 + 1 AS INTEGER)], 4) AS forecast_1,
             round(list_aggregate(r.sv, 'max') - list_aggregate(r.sv, 'min'), 4)
               AS season_amp
      FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.i = nn.n
      ORDER BY r.event_type"""))

  /** Continuous-aggregate merge algebra, oracle-checked: split the
    * ingest stream into three "refresh generations" (event_id mod 3 —
    * standing in for Engine.refreshRollup's seq-range deltas),
    * partial-aggregate each generation per (series, hour slot), then
    * MERGE the partials (counts/sums add, min/max fold, last resolves
    * by max ingest id) — while the DuckDB oracle aggregates the same
    * rows DIRECTLY. Hash equality proves merge(partials) ≡ direct,
    * the invariant the engine's merge-on-read rollup rests on
    * (Engine.scala rollup section). Values quantize to integer cents
    * BEFORE summing so the sum is associative — partial-then-merge
    * order cannot drift from DuckDB's single-pass order (the
    * kdb_stl_decompose integer-quantization precedent). */
  private val rollupMerge = QueryDef(
    "kdb_rollup_merge",
    (s, d) => {
      val cents = round(col("value") * 100).cast("long")
      val partials = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cv", cents)
        .groupBy((col("event_id") % 3).as("gen"), col("event_type"), col("slot_ns"))
        .agg(count(lit(1)).as("cnt"), sum(col("cv")).as("csum"),
          min(col("cv")).as("cmin"), max(col("cv")).as("cmax"),
          max(col("event_id")).as("last_id"),
          max_by(col("cv"), col("event_id")).as("last_cv"))
      partials
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("csum")).as("csum"),
          min(col("cmin")).as("cmin"), max(col("cmax")).as("cmax"),
          max_by(col("last_cv"), col("last_id")).as("last_cv"))
        .select(col("event_type"), col("slot_ns"), col("cnt"),
          round(col("csum") / 100.0, 2).as("vsum"),
          round(col("cmin") / 100.0, 2).as("vmin"),
          round(col("cmax") / 100.0, 2).as("vmax"),
          round(col("last_cv") / 100.0, 2).as("last_val"),
          (round(col("csum").cast("double") / col("cnt") / 100.0, 4) + lit(0.0))
            .as("vavg"))
        .orderBy(col("event_type"), col("slot_ns"))
    },
    Some(s"""
      WITH q AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               CAST(round(value * 100) AS BIGINT) AS cv,
               event_id
        FROM events)
      SELECT event_type, slot_ns, count(*) AS cnt,
             round(CAST(sum(cv) AS BIGINT) / 100.0, 2) AS vsum,
             round(min(cv) / 100.0, 2) AS vmin,
             round(max(cv) / 100.0, 2) AS vmax,
             round(arg_max(cv, event_id) / 100.0, 2) AS last_val,
             round(CAST(CAST(sum(cv) AS BIGINT) AS DOUBLE) / count(*) / 100.0, 4)
               + 0.0 AS vavg
      FROM q
      GROUP BY 1, 2
      ORDER BY event_type, slot_ns"""))

  /** Anomaly ENSEMBLE: three independent detectors vote per hourly
    * slot — classical z-score (|z| > 2.5 vs the series' own
    * mean/stddev), robust modified-z (|0.6745·(v−med)/MAD| > 3.5, the
    * flat-series-proof detector), and a rate spike (v > 2× previous
    * slot) — and the per-series report counts each detector's hits
    * plus the 2-of-3 / 3-of-3 consensus slots. Consensus is the
    * production trick for alert fatigue: single-detector hits page
    * nobody, agreement pages. Thresholds compare RAW doubles (the
    * kdb_zscore/mad precedent: both engines compute the identical
    * expression; ~1e-12 stat drift only matters within 1e-12 of the
    * cut), all outputs are integer counts. One slot pre-agg feeds
    * every detector; the stats windows and the lag window share the
    * per-series partitioning. */
  private val anomalyEnsemble = QueryDef(
    "kdb_anomaly_ensemble",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wS = Window.partitionBy(col("event_type"))
      val wL = Window.partitionBy(col("event_type")).orderBy(col("slot_ns"))
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .withColumn("sd", stddev_samp(col("v")).over(wS))
        .withColumn("z", when(col("sd") > 0,
          (col("v") - avg(col("v")).over(wS)) / col("sd")))
        .withColumn("med", percentile(col("v"), lit(0.5)).over(wS))
        .withColumn("mad", percentile(abs(col("v") - col("med")), lit(0.5)).over(wS))
        .withColumn("rz",
          when(col("mad") > 0, lit(0.6745) * (col("v") - col("med")) / col("mad")))
        .withColumn("prev", lag(col("v"), 1).over(wL))
        .withColumn("f_z", coalesce((abs(col("z")) > 2.5).cast("int"), lit(0)))
        .withColumn("f_mad", coalesce((abs(col("rz")) > 3.5).cast("int"), lit(0)))
        .withColumn("f_spike",
          coalesce((col("v") > col("prev") * 2).cast("int"), lit(0)))
        .withColumn("votes", col("f_z") + col("f_mad") + col("f_spike"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_slots"),
          count(when(col("f_z") === 1, 1)).as("n_z"),
          count(when(col("f_mad") === 1, 1)).as("n_mad"),
          count(when(col("f_spike") === 1, 1)).as("n_spike"),
          count(when(col("votes") >= 2, 1)).as("n_consensus2"),
          count(when(col("votes") === 3, 1)).as("n_consensus3"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      st AS (
        SELECT event_type, avg(v) AS mu, stddev_samp(v) AS sd,
               quantile_cont(v, 0.5) AS med
        FROM h GROUP BY 1),
      md AS (
        SELECT h.event_type, quantile_cont(abs(h.v - st.med), 0.5) AS mad
        FROM h JOIN st USING (event_type) GROUP BY 1),
      fl AS (
        SELECT h.event_type,
               CASE WHEN st.sd > 0 AND abs((h.v - st.mu) / st.sd) > 2.5
                    THEN 1 ELSE 0 END AS f_z,
               CASE WHEN md.mad > 0 AND
                         abs(0.6745 * (h.v - st.med) / md.mad) > 3.5
                    THEN 1 ELSE 0 END AS f_mad,
               CASE WHEN h.v > lag(h.v, 1) OVER (PARTITION BY h.event_type
                                                 ORDER BY h.slot_ns) * 2
                    THEN 1 ELSE 0 END AS f_spike
        FROM h JOIN st USING (event_type) JOIN md
          ON md.event_type = h.event_type)
      SELECT event_type, count(*) AS n_slots,
             count(CASE WHEN f_z = 1 THEN 1 END) AS n_z,
             count(CASE WHEN f_mad = 1 THEN 1 END) AS n_mad,
             count(CASE WHEN f_spike = 1 THEN 1 END) AS n_spike,
             count(CASE WHEN f_z + f_mad + f_spike >= 2 THEN 1 END) AS n_consensus2,
             count(CASE WHEN f_z + f_mad + f_spike = 3 THEN 1 END) AS n_consensus3
      FROM fl
      GROUP BY 1
      ORDER BY event_type"""))

  /** Gorilla-style compression planning (Facebook's in-memory TSDB
    * encoding, VLDB'15): per series, estimate the stored bits per
    * point under delta-of-delta timestamp coding (zigzagged dod into
    * the 1/9/12/16/36-bit buckets) and XOR value coding (cent-
    * quantized; repeat → 1 bit, else control+window header ≈ 13 bits
    * + significant XOR bits) — the capacity-planning read that sizes
    * a retention budget before anyone writes a byte. Deliberately a
    * planning UPPER BOUND: real Gorilla reuses the previous leading/
    * trailing window. Everything is integer arithmetic — significant
    * bits come from length(bin(x)), a STRING length, not float log2
    * (identical in both engines; floor(log2) drifts at power-of-two
    * boundaries) — so the per-series sums are exact and the only
    * doubles are final ratios. All three lags come from ONE
    * [[graft.operators.SeriesScan.withLags]] pass (depth-2 boundary
    * tail threaded through the driver fold) — parallelism =
    * #partitions, never #series — then one rollup. */
  private val compressionPlan = QueryDef(
    "kdb_compression_plan",
    (s, d) => {
      val base = ev(s, d)
        .withColumn("cv", round(col("value") * 100).cast("long"))
      val rows = graft.operators.SeriesScan.withLags(base, "event_type",
          Seq(col("ts_ns"), col("event_id")),
          Seq((col("ts_ns"), "prev_ts", 1), (col("ts_ns"), "prev2_ts", 2),
            (col("cv"), "prev_cv", 1)))
        .withColumn("dod",
          (col("ts_ns") - col("prev_ts")) -
            coalesce(col("prev_ts") - col("prev2_ts"), lit(0L)))
        .withColumn("z",
          when(col("dod") >= 0, col("dod") * 2).otherwise(-col("dod") * 2 - 1))
        .withColumn("xorv", expr("cv ^ prev_cv"))
        .withColumn("ts_bits",
          when(col("prev_ts").isNull, lit(64L))
            .when(col("z") === 0, 1L).when(col("z") <= 127, 9L)
            .when(col("z") <= 511, 12L).when(col("z") <= 4095, 16L)
            .otherwise(36L))
        .withColumn("val_bits",
          when(col("prev_cv").isNull, lit(64L))
            .when(col("xorv") === 0, 1L)
            .otherwise(lit(13L) + length(bin(col("xorv"))).cast("long")))
      rows.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("ts_bits") + col("val_bits")).as("est_bits"),
          count(when(col("prev_ts").isNotNull && col("z") === 0, 1)).as("n_dod0"),
          count(when(col("prev_cv").isNotNull && col("xorv") === 0, 1)).as("n_rep"))
        .select(col("event_type"), col("n_points"),
          (col("n_points") * 16L).as("raw_bytes"),
          expr("(est_bits + 7) div 8").as("est_bytes"),
          (round(col("n_points").cast("double") * 128.0 / col("est_bits"), 4) + lit(0.0))
            .as("ratio"),
          when(col("n_points") > 1,
            round(col("n_dod0").cast("double") / (col("n_points") - 1), 4) + lit(0.0))
            .as("pct_ts_zero"),
          when(col("n_points") > 1,
            round(col("n_rep").cast("double") / (col("n_points") - 1), 4) + lit(0.0))
            .as("pct_val_repeat"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH q AS (
        SELECT event_type, epoch_ns(ts) AS ts_ns, event_id,
               CAST(round(value * 100) AS BIGINT) AS cv
        FROM events),
      l AS (
        SELECT event_type, ts_ns, cv,
               lag(ts_ns, 1) OVER w AS prev_ts,
               lag(ts_ns, 2) OVER w AS prev2_ts,
               lag(cv, 1) OVER w AS prev_cv
        FROM q WINDOW w AS (PARTITION BY event_type ORDER BY ts_ns, event_id)),
      b AS (
        SELECT event_type, prev_ts, prev_cv,
               (ts_ns - prev_ts) - COALESCE(prev_ts - prev2_ts, 0) AS dod,
               xor(cv, prev_cv) AS xorv
        FROM l),
      z AS (
        SELECT event_type, prev_ts, prev_cv, xorv,
               CASE WHEN dod >= 0 THEN dod * 2 ELSE -dod * 2 - 1 END AS z
        FROM b),
      bits AS (
        SELECT event_type,
               CASE WHEN prev_ts IS NULL THEN 64
                    WHEN z = 0 THEN 1 WHEN z <= 127 THEN 9
                    WHEN z <= 511 THEN 12 WHEN z <= 4095 THEN 16
                    ELSE 36 END AS ts_bits,
               CASE WHEN prev_cv IS NULL THEN 64
                    WHEN xorv = 0 THEN 1
                    ELSE 13 + length(bin(xorv)) END AS val_bits,
               CASE WHEN prev_ts IS NOT NULL AND z = 0 THEN 1 END AS dod0,
               CASE WHEN prev_cv IS NOT NULL AND xorv = 0 THEN 1 END AS rep
        FROM z)
      SELECT event_type, count(*) AS n_points,
             count(*) * 16 AS raw_bytes,
             (CAST(sum(ts_bits + val_bits) AS BIGINT) + 7) // 8 AS est_bytes,
             round(CAST(count(*) AS DOUBLE) * 128.0 /
                   CAST(sum(ts_bits + val_bits) AS BIGINT), 4) + 0.0 AS ratio,
             CASE WHEN count(*) > 1 THEN
               round(CAST(count(dod0) AS DOUBLE) / (count(*) - 1), 4) + 0.0 END
               AS pct_ts_zero,
             CASE WHEN count(*) > 1 THEN
               round(CAST(count(rep) AS DOUBLE) / (count(*) - 1), 4) + 0.0 END
               AS pct_val_repeat
      FROM bits
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Z-ORDER (Morton-curve) clustering audit — the multi-dimensional
    * data-skipping decision a 100 TB table layout turns on (the
    * public Delta/Iceberg OPTIMIZE ZORDER concept; Morton 1966):
    * row-major clustering gives file-level min/max pruning on the
    * LEADING dimension only, so a 2-D box predicate still scans every
    * file of the matching lead range; interleaving the dimensions'
    * bits bounds BOTH per file, shrinking candidates toward
    * O(√selectivity). This query runs the audit that justifies the
    * rewrite BEFORE paying for it: quantize events onto a 32×32
    * (day, user-cohort) grid, derive each row's 10-bit Morton code,
    * simulate 64-bucket layouts under z-order and row-major
    * clustering, compute every bucket's (min, max) footer stats, and
    * report how many buckets (and rows) a fixed box query must scan
    * under each layout. Everything is exact integer arithmetic — the
    * interleave is generated from ONE Scala definition into both
    * engines ([[mortonExpr]]) — and the real layout writer would be a
    * repartitionByRange on the same z column. One events scan
    * (stack() fans each row into its two layout rows), two key-
    * partitioned aggregations, output bounded at 4 rows (2 layouts ×
    * 2 boxes). */
  private def mortonExpr(xE: String, yE: String, idiv: String): String =
    (0 until 5).map { i =>
      s"(($xE) $idiv ${1 << i}) % 2 * ${1L << (2 * i)} + " +
        s"(($yE) $idiv ${1 << i}) % 2 * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  private val zorderPruning = QueryDef(
    "kdb_zorder_pruning",
    (s, d) => {
      val cells = ev(s, d).selectExpr(
        s"((ts_ns - ${T0}L) div $Day) % 32 AS x",
        "user_id % 32 AS y")
        .selectExpr("x", "y", s"${mortonExpr("x", "y", "div")} AS z")
        .selectExpr("x", "y",
          "stack(2, 'rowmajor', (x * 32 + y) div 16, 'zorder', z div 16) AS (layout, b)")
      // box 'lead' constrains both dims; box 'trail' constrains ONLY
      // the trailing dim — the case where row-major min/max stats are
      // useless (every bucket spans the full y range of its lead
      // slice) and z-order's per-tile bounds carry the whole win
      val hitLead = col("x").between(10, 14) && col("y").between(3, 6)
      val hitTrail = col("y").between(3, 6)
      val bstats = cells.groupBy(col("layout"), col("b"))
        .agg(count(lit(1)).as("rows"),
          min(col("x")).as("minx"), max(col("x")).as("maxx"),
          min(col("y")).as("miny"), max(col("y")).as("maxy"),
          count(when(hitLead, 1)).as("match_lead"),
          count(when(hitTrail, 1)).as("match_trail"))
      val candLead = col("minx") <= 14 && col("maxx") >= 10 &&
        col("miny") <= 6 && col("maxy") >= 3
      val candTrail = col("miny") <= 6 && col("maxy") >= 3
      bstats.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_buckets"),
          count(when(candLead, 1)).as("cb_lead"),
          coalesce(sum(when(candLead, col("rows"))), lit(0L)).as("rs_lead"),
          sum(col("match_lead")).as("rm_lead"),
          count(when(candTrail, 1)).as("cb_trail"),
          coalesce(sum(when(candTrail, col("rows"))), lit(0L)).as("rs_trail"),
          sum(col("match_trail")).as("rm_trail"),
          sum(col("rows")).as("total_rows"))
        .selectExpr("layout", "n_buckets",
          "stack(2, 'lead', cb_lead, rs_lead, rm_lead, " +
            "round(CAST(rs_lead AS DOUBLE) / total_rows, 4) + 0.0, " +
            "'trail', cb_trail, rs_trail, rm_trail, " +
            "round(CAST(rs_trail AS DOUBLE) / total_rows, 4) + 0.0) " +
            "AS (box, n_candidate_buckets, rows_scanned, rows_matching, scan_ratio)")
        .orderBy(col("box"), col("layout"))
    },
    Some(s"""
      WITH cells AS (
        SELECT ((epoch_ns(ts) - ${T0}) // $Day) % 32 AS x,
               user_id % 32 AS y
        FROM events),
      zc AS (SELECT x, y, ${mortonExpr("x", "y", "//")} AS z FROM cells),
      tagged AS (
        SELECT x, y, 'rowmajor' AS layout, (x * 32 + y) // 16 AS b FROM zc
        UNION ALL
        SELECT x, y, 'zorder', z // 16 FROM zc),
      bstats AS (
        SELECT layout, b, count(*) AS nrows,
               min(x) AS minx, max(x) AS maxx,
               min(y) AS miny, max(y) AS maxy,
               count(CASE WHEN x BETWEEN 10 AND 14 AND y BETWEEN 3 AND 6
                     THEN 1 END) AS match_lead,
               count(CASE WHEN y BETWEEN 3 AND 6 THEN 1 END) AS match_trail
        FROM tagged GROUP BY 1, 2),
      agg AS (
        SELECT layout, count(*) AS n_buckets,
               count(CASE WHEN minx <= 14 AND maxx >= 10 AND miny <= 6 AND maxy >= 3
                     THEN 1 END) AS cb_lead,
               coalesce(CAST(sum(CASE WHEN minx <= 14 AND maxx >= 10
                   AND miny <= 6 AND maxy >= 3 THEN nrows END) AS BIGINT), 0)
                 AS rs_lead,
               CAST(sum(match_lead) AS BIGINT) AS rm_lead,
               count(CASE WHEN miny <= 6 AND maxy >= 3 THEN 1 END) AS cb_trail,
               coalesce(CAST(sum(CASE WHEN miny <= 6 AND maxy >= 3
                   THEN nrows END) AS BIGINT), 0) AS rs_trail,
               CAST(sum(match_trail) AS BIGINT) AS rm_trail,
               CAST(sum(nrows) AS BIGINT) AS total_rows
        FROM bstats GROUP BY 1)
      SELECT layout, n_buckets, 'lead' AS box,
             cb_lead AS n_candidate_buckets, rs_lead AS rows_scanned,
             rm_lead AS rows_matching,
             round(CAST(rs_lead AS DOUBLE) / total_rows, 4) + 0.0 AS scan_ratio
      FROM agg
      UNION ALL
      SELECT layout, n_buckets, 'trail',
             cb_trail, rs_trail, rm_trail,
             round(CAST(rs_trail AS DOUBLE) / total_rows, 4) + 0.0
      FROM agg
      ORDER BY box, layout"""))

  /** Difference-in-differences estimator — the two-period causal
    * read behind "did the change help?" when treatment wasn't
    * randomized (Card–Krueger 1994, public econometrics): treated
    * cohort (even user ids) vs control, pre (days 0–14) vs post
    * (days 15–29), outcome = mean purchase cents; DiD = (T_post −
    * T_pre) − (C_post − C_pre) cancels both the stable cohort gap
    * and the common time trend. A PLACEBO estimate (fake cutover at
    * day 7, pre-period only) is reported beside it — the standard
    * no-effect-where-none-can-exist sanity check; a pipeline alarms
    * when |placebo| rivals |did|. Determinism: cell sums are exact
    * int64 cents, each mean is ONE double division, and the DiD
    * combines four such quotients with the identical association
    * order in both engines before the single 4dp round. One
    * purchase-filtered scan, one 4-cell (8 with placebo) aggregation
    * — aggregate-sized everything. */
  private val did = QueryDef(
    "kdb_did",
    (s, d) => {
      val cell = ev(s, d).filter(col("event_type") === "purchase")
        .selectExpr("user_id % 2 = 0 AS treated",
          s"(ts_ns - ${T0}L) div $Day AS day",
          "CAST(round(value * 100) AS LONG) AS cents")
        .groupBy(col("treated"))
        .agg(
          count(when(col("day") < 15, 1)).as("n_pre"),
          sum(when(col("day") < 15, col("cents"))).as("s_pre"),
          count(when(col("day") >= 15, 1)).as("n_post"),
          sum(when(col("day") >= 15, col("cents"))).as("s_post"),
          count(when(col("day") < 7, 1)).as("n_pl_pre"),
          sum(when(col("day") < 7, col("cents"))).as("s_pl_pre"),
          count(when(col("day") >= 7 && col("day") < 15, 1)).as("n_pl_post"),
          sum(when(col("day") >= 7 && col("day") < 15, col("cents"))).as("s_pl_post"))
      val m = Map(
        "pre" -> (col("s_pre").cast("double") / col("n_pre")),
        "post" -> (col("s_post").cast("double") / col("n_post")),
        "pl_pre" -> (col("s_pl_pre").cast("double") / col("n_pl_pre")),
        "pl_post" -> (col("s_pl_post").cast("double") / col("n_pl_post")))
      val wide = cell.groupBy()
        .agg(
          max(when(col("treated"), col("n_pre"))).as("n_t_pre"),
          max(when(col("treated"), col("n_post"))).as("n_t_post"),
          max(when(!col("treated"), col("n_pre"))).as("n_c_pre"),
          max(when(!col("treated"), col("n_post"))).as("n_c_post"),
          max(when(col("treated"), m("pre"))).as("mt_pre"),
          max(when(col("treated"), m("post"))).as("mt_post"),
          max(when(!col("treated"), m("pre"))).as("mc_pre"),
          max(when(!col("treated"), m("post"))).as("mc_post"),
          max(when(col("treated"), m("pl_post") - m("pl_pre"))).as("dt_pl"),
          max(when(!col("treated"), m("pl_post") - m("pl_pre"))).as("dc_pl"))
      wide.select(
        col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        (round(col("mt_pre"), 4) + lit(0.0)).as("mean_t_pre"),
        (round(col("mt_post"), 4) + lit(0.0)).as("mean_t_post"),
        (round(col("mc_pre"), 4) + lit(0.0)).as("mean_c_pre"),
        (round(col("mc_post"), 4) + lit(0.0)).as("mean_c_post"),
        (round((col("mt_post") - col("mt_pre")) - (col("mc_post") - col("mc_pre")), 4)
          + lit(0.0)).as("did_cents"),
        (round(col("dt_pl") - col("dc_pl"), 4) + lit(0.0)).as("placebo_cents"))
    },
    Some(s"""
      WITH cell AS (
        SELECT user_id % 2 = 0 AS treated,
               (epoch_ns(ts) - ${T0}) // $Day AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      agg AS (
        SELECT treated,
               count(CASE WHEN day < 15 THEN 1 END) AS n_pre,
               CAST(sum(CASE WHEN day < 15 THEN cents END) AS BIGINT) AS s_pre,
               count(CASE WHEN day >= 15 THEN 1 END) AS n_post,
               CAST(sum(CASE WHEN day >= 15 THEN cents END) AS BIGINT) AS s_post,
               count(CASE WHEN day < 7 THEN 1 END) AS n_pl_pre,
               CAST(sum(CASE WHEN day < 7 THEN cents END) AS BIGINT) AS s_pl_pre,
               count(CASE WHEN day >= 7 AND day < 15 THEN 1 END) AS n_pl_post,
               CAST(sum(CASE WHEN day >= 7 AND day < 15 THEN cents END) AS BIGINT)
                 AS s_pl_post
        FROM cell GROUP BY 1)
      SELECT
        max(CASE WHEN treated THEN n_pre END) AS n_t_pre,
        max(CASE WHEN treated THEN n_post END) AS n_t_post,
        max(CASE WHEN NOT treated THEN n_pre END) AS n_c_pre,
        max(CASE WHEN NOT treated THEN n_post END) AS n_c_post,
        round(max(CASE WHEN treated THEN CAST(s_pre AS DOUBLE) / n_pre END), 4)
          + 0.0 AS mean_t_pre,
        round(max(CASE WHEN treated THEN CAST(s_post AS DOUBLE) / n_post END), 4)
          + 0.0 AS mean_t_post,
        round(max(CASE WHEN NOT treated THEN CAST(s_pre AS DOUBLE) / n_pre END), 4)
          + 0.0 AS mean_c_pre,
        round(max(CASE WHEN NOT treated THEN CAST(s_post AS DOUBLE) / n_post END), 4)
          + 0.0 AS mean_c_post,
        round((max(CASE WHEN treated THEN CAST(s_post AS DOUBLE) / n_post END)
             - max(CASE WHEN treated THEN CAST(s_pre AS DOUBLE) / n_pre END))
            - (max(CASE WHEN NOT treated THEN CAST(s_post AS DOUBLE) / n_post END)
             - max(CASE WHEN NOT treated THEN CAST(s_pre AS DOUBLE) / n_pre END)), 4)
          + 0.0 AS did_cents,
        round(max(CASE WHEN treated THEN CAST(s_pl_post AS DOUBLE) / n_pl_post
                 - CAST(s_pl_pre AS DOUBLE) / n_pl_pre END)
            - max(CASE WHEN NOT treated THEN CAST(s_pl_post AS DOUBLE) / n_pl_post
                 - CAST(s_pl_pre AS DOUBLE) / n_pl_pre END), 4)
          + 0.0 AS placebo_cents
      FROM agg"""))

  /** 1-D Kalman filter per series (constant-level model) over the
    * hourly max-LWW values — the optimal-under-noise smoother the
    * EWMA family approximates, with an explicitly tracked error
    * variance instead of a fixed smoothing constant:
    *   predict: p' = p + q
    *   update:  k = p'/(p'+r),  x ← x + k(z−x),  p ← (1−k)p'
    * init x₁=z₁, p₁=1; q=2⁻⁶, r=2⁻² (binary-exact — 0.01-style
    * constants would round differently than their decimal spelling).
    * The gain k converges to a steady state, which the output exposes
    * (gain_final) alongside the filtered level and its variance —
    * the uncertainty readout EWMA can't give. Same strict-fold +
    * recursive-CTE-oracle discipline as kdb_holt_trend; scalar-only
    * struct state. */
  private val kalman = QueryDef(
    "kdb_kalman_filter",
    (s, d) => {
      val acc0 = struct(lit(0.0).as("x"), lit(0.0).as("p"),
        lit(0.0).as("k"), lit(0).as("n"))
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_slots"),
          aggregate(
            transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
              r => r.getField("v")),
            acc0,
            (acc, z) => {
              val x = acc.getField("x"); val p = acc.getField("p")
              val n = acc.getField("n")
              val pPred = p + lit(0.015625)
              val k = pPred / (pPred + lit(0.25))
              when(n === 0,
                struct(z.as("x"), lit(1.0).as("p"), lit(0.0).as("k"),
                  lit(1).as("n")))
                .otherwise(struct(
                  (x + k * (z - x)).as("x"),
                  ((lit(1.0) - k) * pPred).as("p"),
                  k.as("k"),
                  (n + 1).as("n")))
            }).as("f"))
        .select(col("event_type"), col("n_slots"),
          round(col("f.x"), 4).as("level"),
          round(col("f.p"), 6).as("err_var"),
          round(col("f.k"), 6).as("gain_final"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH RECURSIVE h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY slot_ns) AS i,
               v
        FROM h),
      nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
      rec AS (
        SELECT event_type, CAST(1 AS BIGINT) AS i, v AS x,
               CAST(1.0 AS DOUBLE) AS p, CAST(0.0 AS DOUBLE) AS k
        FROM idx WHERE i = 1
        UNION ALL
        SELECT r.event_type, r.i + 1,
               r.x + ((r.p + 0.015625) / ((r.p + 0.015625) + 0.25)) * (z.v - r.x),
               (1.0 - ((r.p + 0.015625) / ((r.p + 0.015625) + 0.25)))
                 * (r.p + 0.015625),
               (r.p + 0.015625) / ((r.p + 0.015625) + 0.25)
        FROM rec r JOIN idx z ON z.event_type = r.event_type AND z.i = r.i + 1)
      SELECT r.event_type, nn.n AS n_slots,
             round(r.x, 4) AS level,
             round(r.p, 6) AS err_var,
             round(r.k, 6) AS gain_final
      FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.i = nn.n
      ORDER BY r.event_type"""))

  /** Rauch–Tung–Striebel smoother — the BACKWARD pass the Kalman
    * filter (kdb_kalman_filter, same q=2⁻⁶/r=2⁻² constant-level
    * model) can't do online: once the series is closed, every slot's
    * estimate is revised using the FUTURE too (x_s(i) = x_f(i) +
    * C·(x_s(i+1) − x_f(i)), C = p_f/(p_f+q)), which collapses the
    * filter's early-sample transient — the definitive backfill read a
    * TSDB serves for historical ranges while the filter serves the
    * live edge. Implementation: the forward fold now carries the full
    * per-slot (x_f, p_f) ARRAYS in the struct accumulator (the
    * kdb_holtwinters array-in-accumulator precedent), the backward
    * fold walks the reversed pairs appending smoothed levels, and
    * every slot emits (filtered, smoothed) — the gate covers the
    * whole trajectory, not a summary. Oracle: the filter's forward
    * recursive CTE emitting ALL steps plus a second recursion walking
    * i = n → 1; both passes are the identical IEEE ops in the
    * identical order, so doubles are bit-exact pre-round. Slot tables
    * are grid-bounded (≤720/series); the folds are per-series
    * aggregate work after one slot shuffle. */
  private val kalmanSmoother = QueryDef(
    "kdb_kalman_smoother",
    (s, d) => {
      val q = lit(0.015625); val rr = lit(0.25)
      val accF = struct(
        array().cast("array<double>").as("xs"),
        array().cast("array<double>").as("ps"))
      val fwd = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(aggregate(
          transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
            r0 => r0.getField("v")),
          accF,
          (acc, z) => {
            val xs = acc.getField("xs"); val ps = acc.getField("ps")
            val x = element_at(xs, -1); val p = element_at(ps, -1)
            val pPred = p + q
            val k = pPred / (pPred + rr)
            when(size(xs) === 0,
              struct(array(z).as("xs"), array(lit(1.0)).as("ps")))
              .otherwise(struct(
                concat(xs, array(x + k * (z - x))).as("xs"),
                concat(ps, array((lit(1.0) - k) * pPred)).as("ps")))
          }).as("f"))
      val pairs = reverse(slice(
        arrays_zip(col("f.xs").as("fx"), col("f.ps").as("fp")),
        lit(1), size(col("f.xs")) - 1))
      val accB = struct(
        slice(col("f.xs"), -1, 1).as("sx"),
        element_at(col("f.xs"), -1).as("cx"),
        element_at(col("f.ps"), -1).as("cp"))
      fwd
        .withColumn("b", aggregate(pairs, accB, (acc, e) => {
          val xf = e.getField("fx"); val pf = e.getField("fp")
          val pPred = pf + q
          val c = pf / pPred
          val nx = xf + c * (acc.getField("cx") - xf)
          val np = pf + c * c * (acc.getField("cp") - pPred)
          struct(concat(acc.getField("sx"), array(nx)).as("sx"),
            nx.as("cx"), np.as("cp"))
        }))
        .select(col("event_type"),
          posexplode(arrays_zip(col("f.xs").as("xf"),
            reverse(col("b.sx")).as("xsm"))).as(Seq("i0", "pr")))
        .select(col("event_type"), (col("i0") + 1).as("i"),
          (round(col("pr.xf"), 4) + lit(0.0)).as("x_filt"),
          (round(col("pr.xsm"), 4) + lit(0.0)).as("x_smooth"))
        .orderBy(col("event_type"), col("i"))
    },
    Some(s"""
      WITH RECURSIVE h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY slot_ns) AS i,
               v
        FROM h),
      nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
      fwd_rec AS (
        SELECT event_type, CAST(1 AS BIGINT) AS i, v AS x,
               CAST(1.0 AS DOUBLE) AS p
        FROM idx WHERE i = 1
        UNION ALL
        SELECT r.event_type, r.i + 1,
               r.x + ((r.p + 0.015625) / ((r.p + 0.015625) + 0.25)) * (z.v - r.x),
               (1.0 - ((r.p + 0.015625) / ((r.p + 0.015625) + 0.25)))
                 * (r.p + 0.015625)
        FROM fwd_rec r JOIN idx z ON z.event_type = r.event_type AND z.i = r.i + 1),
      -- materialized: the backward recursion references the forward
      -- result PER ITERATION; inlined, each of the ~720 backward steps
      -- would re-run the whole forward recursion (the llm_kcore
      -- AS MATERIALIZED lesson, squared)
      fwd AS MATERIALIZED (SELECT * FROM fwd_rec),
      bwd AS (
        SELECT f.event_type, nn.n AS i, f.x AS sx, f.p AS sp
        FROM fwd f JOIN nn ON nn.event_type = f.event_type AND f.i = nn.n
        UNION ALL
        SELECT b.event_type, b.i - 1,
               f.x + (f.p / (f.p + 0.015625)) * (b.sx - f.x),
               f.p + (f.p / (f.p + 0.015625)) * (f.p / (f.p + 0.015625))
                 * (b.sp - (f.p + 0.015625))
        FROM bwd b JOIN fwd f ON f.event_type = b.event_type AND f.i = b.i - 1
        WHERE b.i > 1)
      SELECT f.event_type, f.i,
             round(f.x, 4) + 0.0 AS x_filt,
             round(b.sx, 4) + 0.0 AS x_smooth
      FROM fwd f JOIN bwd b ON b.event_type = f.event_type AND b.i = f.i
      ORDER BY f.event_type, f.i"""))

  /** One-sided CUSUM drift detection per series: z-normalize the
    * hourly values against the series' own mean/stddev, then fold
    * s_t = max(0, s_{t−1} + z_t − k) with slack k=0.5, alarming while
    * s_t > h=4 — the classic "slow drift the z-score test misses"
    * detector (a run of +0.6σ hours never trips |z|>3 but accumulates
    * here). Sequential by construction → same strict-fold shape as
    * EWMA/Holt, with a (s, max_s, alarms) struct accumulator and the
    * true s_0 = 0 as the prepended init element. The z inputs are
    * quantized to 6dp BEFORE the fold so both engines fold identical
    * doubles in identical order (mean/stddev partial-sum order differs
    * across engines at ~1e-12 — under the quantization grain). Two
    * passes over the slot table (stats, then fold), both on the
    * pre-aggregated slots; the stats side is 5 rows, broadcast. */
  private val cusumAlarm = QueryDef(
    "kdb_cusum_alarm",
    (s, d) => {
      val slots = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
      val stats = slots.groupBy(col("event_type"))
        .agg(avg(col("v")).as("mu"), stddev_pop(col("v")).as("sigma"))
        .filter(col("sigma") > 0)
      val acc0 = struct(lit(0.0).as("s"), lit(0.0).as("m"), lit(0L).as("a"))
      slots.join(broadcast(stats), Seq("event_type"))
        .withColumn("z", round((col("v") - col("mu")) / col("sigma"), 6))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_slots"),
          aggregate(
            transform(sort_array(collect_list(struct(col("slot_ns"), col("z")))),
              r => r.getField("z")),
            acc0,
            (acc, z) => {
              val sNew = greatest(lit(0.0), acc.getField("s") + z - lit(0.5))
              struct(
                sNew.as("s"),
                greatest(acc.getField("m"), sNew).as("m"),
                (acc.getField("a") + when(sNew > 4.0, 1L).otherwise(0L)).as("a"))
            }).as("c"))
        .select(col("event_type"), col("n_slots"),
          round(col("c.s"), 4).as("cusum_final"),
          round(col("c.m"), 4).as("cusum_max"),
          col("c.a").as("n_alarm_slots"))
        .orderBy(col("event_type"))
    },
    // Recursive-CTE oracle for the same struct-fold reason as
    // kdb_holt_trend (DuckDB 1.0.0 list_reduce struct bug); s_0 = 0 is
    // the i=0 seed row here, matching Spark's explicit init struct.
    Some(s"""
      WITH RECURSIVE h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      st AS (
        SELECT event_type, avg(v) AS mu, stddev_pop(v) AS sigma
        FROM h GROUP BY 1),
      idx AS (
        SELECT h.event_type,
               row_number() OVER (PARTITION BY h.event_type ORDER BY slot_ns) AS i,
               round((v - mu) / sigma, 6) AS z
        FROM h JOIN st USING (event_type)
        WHERE sigma > 0),
      nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
      rec AS (
        SELECT event_type, CAST(0 AS BIGINT) AS i, CAST(0.0 AS DOUBLE) AS s,
               CAST(0.0 AS DOUBLE) AS m, CAST(0 AS BIGINT) AS a
        FROM nn
        UNION ALL
        SELECT r.event_type, r.i + 1,
               greatest(0.0, r.s + x.z - 0.5),
               greatest(r.m, greatest(0.0, r.s + x.z - 0.5)),
               r.a + CASE WHEN greatest(0.0, r.s + x.z - 0.5) > 4.0 THEN 1 ELSE 0 END
        FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1)
      SELECT r.event_type, nn.n AS n_slots,
             round(r.s, 4) AS cusum_final,
             round(r.m, 4) AS cusum_max,
             r.a AS n_alarm_slots
      FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.i = nn.n
      ORDER BY r.event_type"""))

  /** Lead-lag cross-correlation: corr(clicks_t, purchases_{t+L}) for
    * L = 0..3 hours over the zero-filled hourly grid — "how many hours
    * does a click take to turn into a purchase" causality scanning,
    * the pairwise-series analytics kdb consumers run across metrics.
    * The hourly counts are integers, so every sum the correlation
    * needs is exact in both engines; only the final covariance
    * division sees fp, under the 4dp round. Shape: ONE partial-agg
    * pass builds the (slot, clicks, purchases) table (~720 rows for
    * the 30-day range — broadcastable at any corpus SF since it's
    * bounded by the time range, not the data), the 4 lag branches are
    * an explode of that small table joined back to itself on shifted
    * slots, and each lag aggregates to one row. The slot domain is
    * clamped to [T0, T1−3h) so every lag correlates the same N pairs. */
  private val leadLagCorr = QueryDef(
    "kdb_lead_lag_corr",
    (s, d) => {
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1 &&
          col("event_type").isin("click", "purchase"))
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("slot_ns"))
        .agg(count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
      val grid = s.range((T1 - T0) / Hour)
        .select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val full = grid.join(counts, Seq("slot_ns"), "left_outer")
        .select(col("slot_ns"),
          coalesce(col("n_click"), lit(0L)).as("n_click"),
          coalesce(col("n_purchase"), lit(0L)).as("n_purchase"))
      val base = full.filter(col("slot_ns") < T1 - 3 * Hour)
        .select(col("slot_ns"), col("n_click"),
          explode(sequence(lit(0L), lit(3L))).as("lag"))
      // corr() is an order-dependent streaming co-moment in both
      // engines — compute the correlation from EXACT integer sums
      // instead (counts are ints, so every Σ, Σ², Σxy is exact in
      // int64; the one fp step is the final identical-operand
      // division/sqrt, bit-identical across engines).
      val num = (col("n_slots") * col("sxy") - col("sx") * col("sy")).cast("double")
      val den = sqrt((col("n_slots") * col("sxx") - col("sx") * col("sx")).cast("double") *
        (col("n_slots") * col("syy") - col("sy") * col("sy")).cast("double"))
      base
        .join(full.select(col("slot_ns").as("p_slot"), col("n_purchase")),
          col("p_slot") === col("slot_ns") + col("lag") * Hour)
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_slots"),
          sum(col("n_click")).as("sx"), sum(col("n_purchase")).as("sy"),
          sum(col("n_click") * col("n_purchase")).as("sxy"),
          sum(col("n_click") * col("n_click")).as("sxx"),
          sum(col("n_purchase") * col("n_purchase")).as("syy"))
        .select(col("lag"), col("n_slots"),
          when(den > 0, round(num / den, 4)).as("xcorr"))
        .orderBy(col("lag"))
    },
    Some(s"""
      WITH counts AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
          AND event_type IN ('click', 'purchase')
        GROUP BY 1),
      full_grid AS (
        SELECT g.slot_ns,
               coalesce(c.n_click, 0) AS n_click,
               coalesce(c.n_purchase, 0) AS n_purchase
        FROM range(${T0}, ${T1}, ${Hour}) g(slot_ns)
        LEFT JOIN counts c USING (slot_ns)),
      sums AS (
        SELECT l.lag, count(*) AS n_slots,
               CAST(sum(b.n_click) AS BIGINT) AS sx,
               CAST(sum(p.n_purchase) AS BIGINT) AS sy,
               CAST(sum(b.n_click * p.n_purchase) AS BIGINT) AS sxy,
               CAST(sum(b.n_click * b.n_click) AS BIGINT) AS sxx,
               CAST(sum(p.n_purchase * p.n_purchase) AS BIGINT) AS syy
        FROM range(0, 4) l(lag)
        JOIN full_grid b ON b.slot_ns < ${T1 - 3 * Hour}
        JOIN full_grid p ON p.slot_ns = b.slot_ns + l.lag * ${Hour}
        GROUP BY l.lag)
      SELECT lag, n_slots,
             CASE WHEN sqrt(CAST(n_slots * sxx - sx * sx AS DOUBLE) *
                            CAST(n_slots * syy - sy * sy AS DOUBLE)) > 0
                  THEN round(CAST(n_slots * sxy - sx * sy AS DOUBLE) /
                             sqrt(CAST(n_slots * sxx - sx * sx AS DOUBLE) *
                                  CAST(n_slots * syy - sy * sy AS DOUBLE)), 4)
             END AS xcorr
      FROM sums
      ORDER BY lag"""))

  /** Theil–Sen robust trend: the median of all pairwise slopes per
    * series — the estimator that shrugs off the outliers a
    * least-squares fit chases (up to ~29% contamination). The pair
    * space is GRID-bounded: slots²/2 per series (~230k pairs for a
    * 30-day hourly range), fixed by the time range no matter how many
    * raw points fed each slot — so the self-join is a constant-cost
    * postscript to the one data-sized pass (the slot pre-agg), the
    * same scaling argument as kdb_corr_matrix. Slope denominators are
    * exact integer hour-deltas; the median interpolates over identical
    * doubles in both engines. */
  private val theilSen = QueryDef(
    "kdb_theilsen_slope",
    (s, d) => {
      val slots = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
      val a = slots.select(col("event_type"), col("slot_ns").as("s1"), col("v").as("v1"))
      val b = slots.select(col("event_type"), col("slot_ns").as("s2"), col("v").as("v2"))
      a.join(b, Seq("event_type")).filter(col("s1") < col("s2"))
        .select(col("event_type"),
          ((col("v2") - col("v1")) /
            expr(s"CAST((s2 - s1) div $Hour AS DOUBLE)")).as("slope"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          round(percentile(col("slope"), lit(0.5)), 6).as("slope_per_hour"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      pairs AS (
        SELECT a.event_type,
               (b.v - a.v) / CAST((b.slot_ns - a.slot_ns) // ${Hour} AS DOUBLE) AS slope
        FROM h a JOIN h b
          ON a.event_type = b.event_type AND a.slot_ns < b.slot_ns)
      SELECT event_type, count(*) AS n_pairs,
             round(quantile_cont(slope, 0.5), 6) AS slope_per_hour
      FROM pairs
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Multi-window SLO burn rate (the Google SRE-workbook alerting
    * idiom): with a 5% error-budget SLO, burn = error_rate / 0.05 per
    * window; a page fires only when BOTH the fast 1h window and the
    * slow 6h window burn > 1 — the fast window gives response time,
    * the slow one filters blips. One partial-agg pass builds the
    * hourly (errors, total) counters on the zero-filled grid; the 6h
    * view is a rolling window sum over slots (no second scan), and
    * the grid is time-range-bounded (~720 rows) no matter the corpus
    * size. Integer counters; ratios rounded; the alert flag compares
    * the ROUNDED burns in both engines. */
  private val burnRate = QueryDef(
    "kdb_sli_burn_rate",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("slot_ns"))
        .agg(count(when(col("event_type") === "error", 1)).as("n_err"),
          count(lit(1)).as("n_tot"))
      val grid = s.range((T1 - T0) / Hour)
        .select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val w6 = Window.orderBy(col("slot_ns")).rowsBetween(-5, 0)
      val burn1 = when(col("n_tot") > 0,
        round(col("n_err").cast("double") / col("n_tot") / 0.05, 4))
      val burn6 = when(col("tot6") > 0,
        round(col("err6").cast("double") / col("tot6") / 0.05, 4))
      grid.join(counts, Seq("slot_ns"), "left_outer")
        .select(col("slot_ns"),
          coalesce(col("n_err"), lit(0L)).as("n_err"),
          coalesce(col("n_tot"), lit(0L)).as("n_tot"))
        .withColumn("err6", sum(col("n_err")).over(w6))
        .withColumn("tot6", sum(col("n_tot")).over(w6))
        .select(col("slot_ns"), col("n_err"), col("n_tot"),
          burn1.as("burn_1h"), burn6.as("burn_6h"),
          (coalesce(burn1 > 1.0, lit(false)) &&
            coalesce(burn6 > 1.0, lit(false))).cast("int").as("page"))
        .orderBy(col("slot_ns"))
    },
    Some(s"""
      WITH counts AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
               count(*) AS n_tot
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      filled AS (
        SELECT g.slot_ns,
               coalesce(c.n_err, 0) AS n_err,
               coalesce(c.n_tot, 0) AS n_tot
        FROM range(${T0}, ${T1}, ${Hour}) g(slot_ns)
        LEFT JOIN counts c USING (slot_ns)),
      rolled AS (
        SELECT slot_ns, n_err, n_tot,
               CAST(sum(n_err) OVER (ORDER BY slot_ns ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS err6,
               CAST(sum(n_tot) OVER (ORDER BY slot_ns ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS tot6
        FROM filled)
      SELECT slot_ns, n_err, n_tot,
             CASE WHEN n_tot > 0 THEN round(CAST(n_err AS DOUBLE) / n_tot / 0.05, 4) END AS burn_1h,
             CASE WHEN tot6 > 0 THEN round(CAST(err6 AS DOUBLE) / tot6 / 0.05, 4) END AS burn_6h,
             CASE WHEN coalesce(CASE WHEN n_tot > 0 THEN round(CAST(n_err AS DOUBLE) / n_tot / 0.05, 4) END > 1.0, false)
                   AND coalesce(CASE WHEN tot6 > 0 THEN round(CAST(err6 AS DOUBLE) / tot6 / 0.05, 4) END > 1.0, false)
                  THEN 1 ELSE 0 END AS page
      FROM rolled
      ORDER BY slot_ns"""))

  /** Walk-forward forecast backtest: replay Holt(α=0.5, β=0.25) over
    * each series and score every ONE-STEP-AHEAD forecast against the
    * value that actually arrived — the honest accuracy number
    * (in-sample fit flatters; this is out-of-sample at every step).
    * The absolute-error accumulator rides INSIDE the same struct fold
    * as the level/trend state (forecast l+b is read before the update,
    * exactly the information an online forecaster had), so the
    * backtest costs nothing beyond the smoothing pass itself. Same
    * slot-bounded fold + recursive-CTE-oracle machinery as
    * kdb_holt_trend. MAE is over the n−1 forecastable steps. */
  private val forecastBacktest = QueryDef(
    "kdb_forecast_backtest",
    (s, d) => {
      val acc0 = struct(lit(0.0).as("l"), lit(0.0).as("b"),
        lit(0.0).as("sae"), lit(0).as("n"))
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_slots"),
          aggregate(
            transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
              r => r.getField("v")),
            acc0,
            (acc, x) => {
              val l = acc.getField("l"); val b = acc.getField("b")
              val n = acc.getField("n")
              val lNew = lit(0.5) * x + lit(0.5) * (l + b)
              when(n === 0, struct(x.as("l"), lit(0.0).as("b"),
                lit(0.0).as("sae"), lit(1).as("n")))
                .otherwise(struct(
                  lNew.as("l"),
                  (lit(0.25) * (lNew - l) + lit(0.75) * b).as("b"),
                  (acc.getField("sae") + abs(x - (l + b))).as("sae"),
                  (n + 1).as("n")))
            }).as("h"))
        .select(col("event_type"), col("n_slots"),
          round(col("h.sae") / (col("h.n") - 1), 4).as("mae"),
          round(col("h.l"), 4).as("level"),
          round(col("h.b"), 4).as("trend"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH RECURSIVE h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY slot_ns) AS i,
               v
        FROM h),
      nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
      rec AS (
        SELECT event_type, CAST(1 AS BIGINT) AS i, v AS l,
               CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS sae
        FROM idx WHERE i = 1
        UNION ALL
        SELECT r.event_type, r.i + 1,
               0.5 * x.v + 0.5 * (r.l + r.b),
               0.25 * ((0.5 * x.v + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b,
               r.sae + abs(x.v - (r.l + r.b))
        FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1)
      SELECT r.event_type, nn.n AS n_slots,
             round(r.sae / (r.i - 1), 4) AS mae,
             round(r.l, 4) AS level,
             round(r.b, 4) AS trend
      FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.i = nn.n
      ORDER BY r.event_type"""))

  /** STL-style decomposition: split each series into trend (centered
    * ±12h moving average), diurnal seasonal (hour-of-day means of the
    * DETRENDED values — unlike kdb_seasonality's raw means, these
    * aren't polluted by multi-day drift), and residual spread — the
    * "is tonight abnormal, net of both the weekly trend and the daily
    * cycle" baseline. Only full ±12-row windows contribute, so every
    * mean is over a complete frame. Emitted per (series, hour-of-day)
    * with the per-series amplitude and residual σ alongside. Shapes:
    * one (type, slot) partial-agg pass; the centered window and both
    * rollups run per-type; seasonal/amplitude broadcast back onto the
    * 120-row profile. The trend is an exact INTEGER window sum over
    * cent-quantized values (see inline note) so no engine-specific
    * summation order can flip a rounded digit. */
  private val stlDecompose = QueryDef(
    "kdb_stl_decompose",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wSlot = Window.partitionBy(col("event_type")).orderBy(col("slot_ns"))
      val wCenter = wSlot.rowsBetween(-12, 12)
      // Cent-quantize the slot values so the centered trend is an
      // EXACT integer window sum in both engines (window avg over
      // doubles sums in engine-specific order — Spark's frame
      // recompute vs DuckDB's segment tree — and the ~1e-12 drift
      // flipped 4dp rounds at the boundary). detr_int = 25·v_c −
      // Σ_frame v_c is all-integer; /2500 converts back to value
      // units only at the end, identically on both sides.
      val detr = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(round(max(col("value")) * 100).cast("long").as("vc"))
        .withColumn("k", row_number().over(wSlot))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .withColumn("trend25", sum(col("vc")).over(wCenter))
        .filter(col("k") > 12 && col("k") <= col("n") - 12)
        .withColumn("detr_int", lit(25L) * col("vc") - col("trend25"))
        .withColumn("hod", expr(s"(slot_ns div $Hour) % 24"))
      val seasonal = detr.groupBy(col("event_type"), col("hod"))
        .agg((sum(col("detr_int")).cast("double") / count(lit(1)) / 2500.0).as("seasonal_d"),
          count(lit(1)).as("n_obs"))
      val perType = seasonal.groupBy(col("event_type"))
        .agg(round(max(col("seasonal_d")) - min(col("seasonal_d")), 4).as("amplitude"))
      val resid = detr.join(broadcast(seasonal.select(col("event_type"), col("hod"), col("seasonal_d"))),
          Seq("event_type", "hod"))
        .groupBy(col("event_type"))
        .agg(round(stddev_pop(col("detr_int").cast("double") / 2500.0 - col("seasonal_d")), 4)
          .as("resid_sd"))
      seasonal.join(broadcast(perType), Seq("event_type"))
        .join(broadcast(resid), Seq("event_type"))
        .select(col("event_type"), col("hod"), col("n_obs"),
          round(col("seasonal_d"), 4).as("seasonal"),
          col("amplitude"), col("resid_sd"))
        .orderBy(col("event_type"), col("hod"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               CAST(round(max(value) * 100) AS BIGINT) AS vc
        FROM events
        GROUP BY 1, 2),
      tr AS (
        SELECT event_type, slot_ns, vc,
               row_number() OVER (PARTITION BY event_type ORDER BY slot_ns) AS k,
               count(*) OVER (PARTITION BY event_type) AS n,
               CAST(sum(vc) OVER (PARTITION BY event_type ORDER BY slot_ns
                            ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT) AS trend25
        FROM h),
      detr AS (
        SELECT event_type, (slot_ns // ${Hour}) % 24 AS hod,
               25 * vc - trend25 AS detr_int
        FROM tr WHERE k > 12 AND k <= n - 12),
      seasonal AS (
        SELECT event_type, hod,
               CAST(sum(detr_int) AS DOUBLE) / count(*) / 2500.0 AS seasonal_d,
               count(*) AS n_obs
        FROM detr GROUP BY 1, 2),
      per_type AS (
        SELECT event_type, round(max(seasonal_d) - min(seasonal_d), 4) AS amplitude
        FROM seasonal GROUP BY 1),
      resid AS (
        SELECT d.event_type,
               round(stddev_pop(CAST(d.detr_int AS DOUBLE) / 2500.0 - s.seasonal_d), 4) AS resid_sd
        FROM detr d JOIN seasonal s USING (event_type, hod)
        GROUP BY 1)
      SELECT s.event_type, s.hod, s.n_obs,
             round(s.seasonal_d, 4) AS seasonal,
             p.amplitude, r.resid_sd
      FROM seasonal s
      JOIN per_type p USING (event_type)
      JOIN resid r USING (event_type)
      ORDER BY s.event_type, s.hod"""))

  /** Watermark sizing from observed disorder: for each event stream,
    * the lateness of a row is how far the stream's running-max event
    * time had already advanced past it at arrival (arrival order =
    * ingest sequence event_id) — then p50/p95/p99/max lateness per
    * type IS the watermark decision table ("allow 99% of late data" →
    * set the delay to p99). Complements kdb_order_audit (which counts
    * inversions; this one sizes them). The running max comes from
    * [[graft.operators.SeriesScan.withPrefixMax]] (no per-type
    * raw-event window); integer µs lateness, exact interpolated
    * quantiles rounded. */
  private val watermarkSizing = QueryDef(
    "kdb_watermark_sizing",
    (s, d) => {
      // the running event-time max is a SeriesScan exclusive prefix
      // MAX (range-partitioned local scan + driver-folded carry) —
      // a per-type raw-event window would funnel each type's whole
      // arrival history through one task at 100×
      val base = ev(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      graft.operators.SeriesScan.withPrefixMax(base, "event_type",
          Seq(col("event_id")), col("ts_us"), "runmax_us")
        .withColumn("late_us",
          greatest(lit(0L), coalesce(col("runmax_us") - col("ts_us"), lit(0L))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(when(col("late_us") > 0, 1)).as("n_late"),
          round(percentile(col("late_us"), lit(0.5)), 2).as("p50_late_us"),
          round(percentile(col("late_us"), lit(0.95)), 2).as("p95_late_us"),
          round(percentile(col("late_us"), lit(0.99)), 2).as("p99_late_us"),
          max(col("late_us")).as("max_late_us"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH arr AS (
        SELECT event_type,
               greatest(0, coalesce(
                 max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 - epoch_us(ts), 0)) AS late_us
        FROM events)
      SELECT event_type, count(*) AS n,
             count(CASE WHEN late_us > 0 THEN 1 END) AS n_late,
             round(quantile_cont(late_us, 0.5), 2) AS p50_late_us,
             round(quantile_cont(late_us, 0.95), 2) AS p95_late_us,
             round(quantile_cont(late_us, 0.99), 2) AS p99_late_us,
             CAST(max(late_us) AS BIGINT) AS max_late_us
      FROM arr
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Incident extraction (gaps-and-islands): collapse consecutive
    * "bad" hours — error share above 30% — into maximal incident
    * intervals with start/end/duration and peak severity, the
    * "alert stream → incident list" rollup every on-call review
    * starts from. The island id is the classic technique the surface
    * didn't cover yet: slot_index − row_number() over bad slots is
    * constant within each consecutive run, needs ONE window pass and
    * no self-join. All-integer grid math; the only doubles are the
    * per-incident severity ratios, rounded. Grid-bounded (~720 rows)
    * after the one data-sized counting pass. */
  private val incidentIntervals = QueryDef(
    "kdb_incident_intervals",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("slot_ns"))
        .agg(count(when(col("event_type") === "error", 1)).as("n_err"),
          count(lit(1)).as("n_tot"))
        .withColumn("bad", col("n_err") * 10 > col("n_tot") * 3)
      val wOrd = Window.orderBy(col("slot_ns"))
      counts.filter(col("bad"))
        .withColumn("slot_idx", expr(s"(slot_ns - $T0) div $Hour"))
        .withColumn("island", col("slot_idx") - row_number().over(wOrd))
        .groupBy(col("island"))
        .agg(min(col("slot_ns")).as("start_ns"),
          max(col("slot_ns") + Hour).as("end_ns"),
          count(lit(1)).as("n_hours"),
          round(max(col("n_err").cast("double") / col("n_tot")), 4).as("peak_err_share"),
          sum(col("n_err")).as("total_errors"))
        .select(col("start_ns"), col("end_ns"), col("n_hours"),
          col("peak_err_share"), col("total_errors"))
        .orderBy(col("start_ns"))
    },
    Some(s"""
      WITH counts AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
               count(*) AS n_tot
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      bad AS (
        SELECT slot_ns, n_err, n_tot,
               (slot_ns - ${T0}) // ${Hour} AS slot_idx
        FROM counts
        WHERE n_err * 10 > n_tot * 3),
      isl AS (
        SELECT slot_ns, n_err, n_tot,
               slot_idx - row_number() OVER (ORDER BY slot_ns) AS island
        FROM bad)
      SELECT min(slot_ns) AS start_ns,
             max(slot_ns + ${Hour}) AS end_ns,
             count(*) AS n_hours,
             round(max(CAST(n_err AS DOUBLE) / n_tot), 4) AS peak_err_share,
             CAST(sum(n_err) AS BIGINT) AS total_errors
      FROM isl
      GROUP BY island
      ORDER BY start_ns"""))

  /** Reliability rollup over the incident stream: MTTR (mean
    * incident duration), MTBF (mean start-to-start spacing), total
    * downtime, and availability % — the SRE summary every
    * incident-interval consumer computes next (kdb_incident_intervals
    * emits the episodes; this is their scorecard). Same
    * threshold/island construction, then one aggregation over the
    * grid-bounded (≤720-row) incident table; the lag window for MTBF
    * runs over that bounded table. Exactness: durations and gaps are
    * exact int64 ns sums; each reported mean/percentage is ONE
    * double division of identical integers, 4dp-rounded, +0.0
    * canonicalized; fewer than two incidents report mtbf_min = −1
    * explicitly rather than NULL-vs-NaN engine drift. */
  private val reliability = QueryDef(
    "kdb_reliability",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("slot_ns"))
        .agg(count(when(col("event_type") === "error", 1)).as("n_err"),
          count(lit(1)).as("n_tot"))
      val wOrd = Window.orderBy(col("slot_ns"))
      val incidents = counts.filter(col("n_err") * 10 > col("n_tot") * 3)
        .withColumn("slot_idx", expr(s"(slot_ns - $T0) div $Hour"))
        .withColumn("island", col("slot_idx") - row_number().over(wOrd))
        .groupBy(col("island"))
        .agg(min(col("slot_ns")).as("start_ns"),
          max(col("slot_ns") + Hour).as("end_ns"))
      val wInc = Window.orderBy(col("start_ns"))
      incidents
        .withColumn("tbf_ns", col("start_ns") - lag(col("start_ns"), 1).over(wInc))
        .agg(count(lit(1)).as("n_incidents"),
          sum(col("end_ns") - col("start_ns")).as("down_ns"),
          sum(col("tbf_ns")).as("tbf_sum_ns"),
          count(col("tbf_ns")).as("n_gaps"))
        .select(col("n_incidents"),
          expr("down_ns div 60000000000").as("downtime_min"),
          (round(col("down_ns") / col("n_incidents") / 60e9, 4) + lit(0.0))
            .as("mttr_min"),
          when(col("n_gaps") > 0,
            round(col("tbf_sum_ns") / col("n_gaps") / 60e9, 4) + lit(0.0))
            .otherwise(lit(-1.0)).as("mtbf_min"),
          (round((lit(1.0) - col("down_ns") / lit((T1 - T0).toDouble)) * 100, 4)
            + lit(0.0)).as("availability_pct"))
    },
    Some(s"""
      WITH counts AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
               count(*) AS n_tot
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      bad AS (
        SELECT slot_ns, (slot_ns - ${T0}) // ${Hour} AS slot_idx
        FROM counts WHERE n_err * 10 > n_tot * 3),
      isl AS (
        SELECT slot_ns,
               slot_idx - row_number() OVER (ORDER BY slot_ns) AS island
        FROM bad),
      inc AS (
        SELECT min(slot_ns) AS start_ns, max(slot_ns + ${Hour}) AS end_ns
        FROM isl GROUP BY island),
      g AS (
        SELECT start_ns, end_ns,
               start_ns - lag(start_ns) OVER (ORDER BY start_ns) AS tbf_ns
        FROM inc)
      SELECT count(*) AS n_incidents,
             CAST(sum(end_ns - start_ns) AS BIGINT) // 60000000000 AS downtime_min,
             round(CAST(sum(end_ns - start_ns) AS BIGINT) / count(*) / 60e9, 4)
               + 0.0 AS mttr_min,
             CASE WHEN count(tbf_ns) > 0
                  THEN round(CAST(sum(tbf_ns) AS BIGINT) / count(tbf_ns) / 60e9, 4) + 0.0
                  ELSE -1.0 END AS mtbf_min,
             round((1.0 - CAST(sum(end_ns - start_ns) AS BIGINT)
                    / CAST(${T1 - T0} AS DOUBLE)) * 100, 4) + 0.0 AS availability_pct
      FROM g"""))

  /** Series-cardinality growth monitor: per day, how many NEVER-
    * BEFORE-SEEN (event_type, user) series first appeared, and the
    * cumulative series count — the "cardinality explosion" early
    * warning that every tag-indexed store needs (the reference's
    * trie grows a node per new series, mindex.go: an unbounded tag
    * value is its memory kill). First-seen = min(ts) per series (one
    * partial-agg shuffle, map-side combinable); the daily rollup and
    * cumulative window then run over ≤|days| rows. All integer
    * counts. */
  private val cardinalityGrowth = QueryDef(
    "kdb_cardinality_growth",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val firstSeen = ev(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("ts_ns")).as("first_ns"))
        .withColumn("day_ns", col("first_ns") - col("first_ns") % Day)
      val wCum = Window.orderBy(col("day_ns"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstSeen
        .groupBy(col("day_ns"))
        .agg(count(lit(1)).as("new_series"))
        .withColumn("cum_series", sum(col("new_series")).over(wCum))
        .orderBy(col("day_ns"))
    },
    Some(s"""
      WITH fs AS (
        SELECT event_type, user_id, min(epoch_ns(ts)) AS first_ns
        FROM events GROUP BY 1, 2),
      daily AS (
        SELECT first_ns - first_ns % ${Day} AS day_ns,
               count(*) AS new_series
        FROM fs GROUP BY 1)
      SELECT day_ns, new_series,
             CAST(sum(new_series) OVER (ORDER BY day_ns
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_series
      FROM daily
      ORDER BY day_ns"""))

  /** SAX motif discovery (Lin et al.: Symbolic Aggregate
    * approXimation, the iSAX-index lineage): z-normalize each series,
    * discretize every hourly value into a 4-letter alphabet at the
    * standard Gaussian breakpoints (−0.67, 0, 0.67), pack each
    * 6-hour window into a word, and surface the words that RECUR
    * within the same series — repeated shapes ("ramp-up-then-drop")
    * that raw-value matching can't see across level shifts. The z
    * inputs are 6dp-quantized pre-discretization (the kdb_cusum_alarm
    * determinism recipe), so the symbol strings are exact in both
    * engines. Shapes: slot pre-agg → broadcast stats → one window
    * pass per series for word assembly → word frequency rollup; the
    * word space is grid-bounded. */
  private val saxMotifs = QueryDef(
    "kdb_sax_motifs",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val slots = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
      val stats = slots.groupBy(col("event_type"))
        .agg(avg(col("v")).as("mu"), stddev_pop(col("v")).as("sigma"))
        .filter(col("sigma") > 0)
      val z = round((col("v") - col("mu")) / col("sigma"), 6)
      val sym = when(z < -0.67, "a").when(z < 0.0, "b").when(z < 0.67, "c").otherwise("d")
      val w6 = Window.partitionBy(col("event_type"), col("w_start")).orderBy(col("slot_ns"))
      val words = slots.join(broadcast(stats), Seq("event_type"))
        .withColumn("sym", sym)
        .withColumn("w_start", col("slot_ns") - col("slot_ns") % Res6h)
        .withColumn("word",
          concat_ws("", collect_list(col("sym"))
            .over(w6.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))))
        .withColumn("wlen", count(lit(1))
          .over(Window.partitionBy(col("event_type"), col("w_start"))))
        .filter(col("wlen") === 6)
        .select(col("event_type"), col("w_start"), col("word")).distinct()
      words.groupBy(col("event_type"), col("word"))
        .agg(count(lit(1)).as("n_windows"),
          min(col("w_start")).as("first_seen_ns"))
        .filter(col("n_windows") >= 2)
        .orderBy(col("event_type"), col("n_windows").desc, col("word"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      st AS (
        SELECT event_type, avg(v) AS mu, stddev_pop(v) AS sigma
        FROM h GROUP BY 1),
      symed AS (
        SELECT h.event_type, slot_ns,
               slot_ns - slot_ns % ${Res6h} AS w_start,
               CASE WHEN round((v - mu) / sigma, 6) < -0.67 THEN 'a'
                    WHEN round((v - mu) / sigma, 6) < 0.0 THEN 'b'
                    WHEN round((v - mu) / sigma, 6) < 0.67 THEN 'c'
                    ELSE 'd' END AS sym
        FROM h JOIN st USING (event_type)
        WHERE sigma > 0),
      words AS (
        SELECT event_type, w_start,
               string_agg(sym, '' ORDER BY slot_ns) AS word,
               count(*) AS wlen
        FROM symed
        GROUP BY 1, 2)
      SELECT event_type, word, count(*) AS n_windows,
             min(w_start) AS first_seen_ns
      FROM words
      WHERE wlen = 6
      GROUP BY 1, 2
      HAVING count(*) >= 2
      ORDER BY event_type, n_windows DESC, word"""))

  /** One-pass OLS trend per series: slope/intercept/R² of the hourly
    * slot values against hours-since-T0, via the co-moment regression
    * aggregates (`regr_slope`/`regr_intercept`/`regr_r2`). This is the
    * SCALE complement to kdb_theilsen_slope: Theil–Sen is exact-robust
    * but materializes slots²/2 pairwise slopes (the bench's 3 s
    * heavyweight); OLS folds the same evidence into five running sums —
    * one partial-agg shuffle, no pair space, same cost at 100× the
    * series count. x is an exact integer hour index cast to double, so
    * only the final co-moment division carries float noise (rounded,
    * −0.0 canonicalized). */
  private val olsTrend = QueryDef(
    "kdb_ols_trend",
    (s, d) => {
      ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .withColumn("x", expr(s"CAST((slot_ns - ${T0}) div ${Hour} AS DOUBLE)"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_slots"),
          (round(expr("regr_slope(v, x)"), 6) + lit(0.0)).as("slope_per_hour"),
          (round(expr("regr_intercept(v, x)"), 4) + lit(0.0)).as("intercept"),
          (round(expr("regr_r2(v, x)"), 4) + lit(0.0)).as("r2"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events
        GROUP BY 1, 2),
      xs AS (
        SELECT event_type, v,
               CAST((slot_ns - ${T0}) // ${Hour} AS DOUBLE) AS x
        FROM h)
      SELECT event_type, count(*) AS n_slots,
             round(regr_slope(v, x), 6) + 0.0 AS slope_per_hour,
             round(regr_intercept(v, x), 4) + 0.0 AS intercept,
             round(regr_r2(v, x), 4) + 0.0 AS r2
      FROM xs
      GROUP BY event_type
      ORDER BY event_type"""))

  /** M4 visualization downsampling (Jugel et al., PVLDB 2014): per
    * series × pixel-column time bucket, keep exactly the four points a
    * pixel-perfect line plot needs — first, last, min, max — plus the
    * bucket population. Pure single-shuffle partial aggregation
    * (min/max/min_by/max_by all combine map-side), so a 100 TB series
    * downsamples to (series × pixels) rows with no second pass and no
    * window sort — this is why M4 beats the row_number-per-bucket
    * formulation at scale. First/last tie-break on equal timestamps is
    * made total by a zero-padded (ts_µs, event_id) string key (DuckDB's
    * min_by cannot order by a struct, and both engines sort the padded
    * decimal string identically); the key and the emitted endpoint
    * times are µs-truncated because DuckDB reads parquet ns timestamps
    * at µs — sub-µs ordering would diverge between engines. */
  private val m4Downsample = QueryDef(
    "kdb_m4_downsample",
    (s, d) => {
      val bucket = 6 * Hour
      val ordKey = concat(lpad(expr("ts_ns div 1000").cast("string"), 20, "0"),
        lpad(col("event_id").cast("string"), 20, "0"))
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("bucket_ns", col("ts_ns") - col("ts_ns") % bucket)
        .withColumn("k", ordKey)
        .groupBy(col("event_type"), col("bucket_ns"))
        .agg(count(lit(1)).as("n"),
          (round(min(col("value")), 2) + lit(0.0)).as("v_min"),
          (round(max(col("value")), 2) + lit(0.0)).as("v_max"),
          (round(min_by(col("value"), col("k")), 2) + lit(0.0)).as("v_first"),
          (round(max_by(col("value"), col("k")), 2) + lit(0.0)).as("v_last"),
          min(expr("ts_ns div 1000")).as("t_first_us"),
          max(expr("ts_ns div 1000")).as("t_last_us"))
        .orderBy(col("event_type"), col("bucket_ns"))
    },
    Some(s"""
      SELECT event_type,
             epoch_ns(ts) - epoch_ns(ts) % ${6 * Hour} AS bucket_ns,
             count(*) AS n,
             round(min(value), 2) + 0.0 AS v_min,
             round(max(value), 2) + 0.0 AS v_max,
             round(min_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                                 lpad(CAST(event_id AS VARCHAR), 20, '0')), 2) + 0.0 AS v_first,
             round(max_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                                 lpad(CAST(event_id AS VARCHAR), 20, '0')), 2) + 0.0 AS v_last,
             min(epoch_us(ts)) AS t_first_us,
             max(epoch_us(ts)) AS t_last_us
      FROM events
      WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
      GROUP BY 1, 2
      ORDER BY event_type, bucket_ns"""))

  /** Benford first-digit audit: the leading-significant-digit
    * distribution of metric values per series vs Benford's law
    * (p_d = log10(1+1/d)), with the χ² goodness-of-fit statistic — the
    * standard screen for fabricated or unit-mangled telemetry. Digit
    * extraction is EXACT cross-engine: restrict to value ≥ 1 and read
    * the first character of the integer part's decimal string (floor →
    * BIGINT → VARCHAR is bit-identical in both engines, unlike
    * floor(log10(v)) which can straddle a ulp at powers of ten). One
    * counting shuffle over the data; the 9-digit dense grid, expected
    * masses, and χ² fold are per-series constant-size postscripts. */
  private val benford = QueryDef(
    "kdb_benford_audit",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = ev(s, d)
        .filter(col("value") >= 1)
        .withColumn("digit",
          substring(floor(col("value")).cast("long").cast("string"), 1, 1).cast("int"))
        .groupBy(col("event_type"), col("digit"))
        .agg(count(lit(1)).as("n"))
      val digits = s.range(1, 10).select(col("id").cast("int").as("digit"))
      val types = counts.select(col("event_type")).distinct()
      val w = Window.partitionBy(col("event_type"))
      types.crossJoin(broadcast(digits))
        .join(counts, Seq("event_type", "digit"), "left_outer")
        .select(col("event_type"), col("digit"),
          coalesce(col("n"), lit(0L)).as("n"))
        .withColumn("n_tot", sum(col("n")).over(w))
        .withColumn("exp_p", log(10.0, lit(1.0) + lit(1.0) / col("digit")))
        .withColumn("chi2_part",
          pow(col("n").cast("double") - col("n_tot") * col("exp_p"), 2) /
            (col("n_tot") * col("exp_p")))
        .select(col("event_type"), col("digit"), col("n"), col("n_tot"),
          (round(col("n").cast("double") / col("n_tot"), 4) + lit(0.0)).as("obs_p"),
          (round(col("exp_p"), 4) + lit(0.0)).as("exp_p"),
          (round(sum(col("chi2_part")).over(w), 4) + lit(0.0)).as("chi2"))
        .withColumn("suspect", (col("chi2") > 15.51).cast("int"))
        .orderBy(col("event_type"), col("digit"))
    },
    Some(s"""
      WITH counts AS (
        SELECT event_type,
               CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
               count(*) AS n
        FROM events
        WHERE value >= 1
        GROUP BY 1, 2),
      grid AS (
        SELECT t.event_type, g.digit, coalesce(c.n, 0) AS n
        FROM (SELECT DISTINCT event_type FROM counts) t
        CROSS JOIN range(1, 10) g(digit)
        LEFT JOIN counts c ON c.event_type = t.event_type AND c.digit = g.digit),
      stats AS (
        SELECT event_type, digit, n,
               CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_tot,
               log10(1.0 + 1.0 / digit) AS exp_p_raw
        FROM grid),
      chi AS (
        SELECT event_type, digit, n, n_tot, exp_p_raw,
               pow(CAST(n AS DOUBLE) - n_tot * exp_p_raw, 2) / (n_tot * exp_p_raw) AS chi2_part
        FROM stats)
      SELECT event_type, CAST(digit AS INT) AS digit, n, n_tot,
             round(CAST(n AS DOUBLE) / n_tot, 4) + 0.0 AS obs_p,
             round(exp_p_raw, 4) + 0.0 AS exp_p,
             round(sum(chi2_part) OVER (PARTITION BY event_type), 4) + 0.0 AS chi2,
             CASE WHEN round(sum(chi2_part) OVER (PARTITION BY event_type), 4) + 0.0 > 15.51
                  THEN 1 ELSE 0 END AS suspect
      FROM chi
      ORDER BY event_type, digit"""))

  /** Autocorrelation function (ACF) at lags 1..6h per series — the
    * primitive behind period detection and "is this series
    * self-similar" checks (kdb_seasonality asserts a 24h period; ACF
    * measures whatever period is there). Same exact-integer discipline
    * as kdb_lead_lag_corr: hourly counts are ints, so every Σ, Σ², Σxy
    * is an exact BIGINT in both engines and only the final Pearson
    * division sees a double (rounded). The lagged self-join runs on
    * the aggregated (types × slots) grid — grid-bounded, never
    * data-sized — and the slot domain is clamped to [T0, T1−6h) so
    * every lag correlates the same N pairs. */
  private val acf = QueryDef(
    "kdb_acf",
    (s, d) => {
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(count(lit(1)).as("n"))
      val types = counts.select(col("event_type")).distinct()
      val grid = s.range((T1 - T0) / Hour)
        .select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val dense = types.crossJoin(broadcast(grid))
        .join(counts, Seq("event_type", "slot_ns"), "left_outer")
        .select(col("event_type"), col("slot_ns"),
          coalesce(col("n"), lit(0L)).as("v"))
      val base = dense.filter(col("slot_ns") < T1 - 6 * Hour)
        .select(col("event_type"), col("slot_ns"), col("v").as("x"),
          explode(sequence(lit(1L), lit(6L))).as("lag"))
      val lagged = dense.select(col("event_type").as("y_type"),
        col("slot_ns").as("y_slot"), col("v").as("y"))
      val sums = base.join(lagged,
          col("event_type") === col("y_type") &&
            col("y_slot") === col("slot_ns") + col("lag") * Hour)
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val den = sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double") *
        (col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double"))
      sums.select(col("event_type"), col("lag"), col("n_pairs"),
          when(den > 0,
            round((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") / den, 4)
              + lit(0.0)).as("acf"))
        .orderBy(col("event_type"), col("lag"))
    },
    Some(s"""
      WITH counts AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(*) AS n
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      types AS (SELECT DISTINCT event_type FROM counts),
      dense AS (
        SELECT t.event_type, g.slot_ns, coalesce(c.n, 0) AS v
        FROM types t
        CROSS JOIN range(${T0}, ${T1}, ${Hour}) g(slot_ns)
        LEFT JOIN counts c ON c.event_type = t.event_type AND c.slot_ns = g.slot_ns),
      sums AS (
        SELECT b.event_type, l.lag, count(*) AS n_pairs,
               CAST(sum(b.v) AS BIGINT) AS sx,
               CAST(sum(p.v) AS BIGINT) AS sy,
               CAST(sum(b.v * p.v) AS BIGINT) AS sxy,
               CAST(sum(b.v * b.v) AS BIGINT) AS sxx,
               CAST(sum(p.v * p.v) AS BIGINT) AS syy
        FROM range(1, 7) l(lag)
        JOIN dense b ON b.slot_ns < ${T1 - 6 * Hour}
        JOIN dense p ON p.event_type = b.event_type
                    AND p.slot_ns = b.slot_ns + l.lag * ${Hour}
        GROUP BY 1, 2)
      SELECT event_type, lag, n_pairs,
             CASE WHEN sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
                            CAST(n_pairs * syy - sy * sy AS DOUBLE)) > 0
                  THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
                             sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
                                  CAST(n_pairs * syy - sy * sy AS DOUBLE)), 4) + 0.0
             END AS acf
      FROM sums
      ORDER BY event_type, lag"""))

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next event type | current event type) from observed
    * consecutive pairs — the next-event-prediction baseline and the
    * "what do users do after X" product question in one table. Order
    * within a user is (µs timestamp, event_id): the event_id
    * tie-break makes the sequence deterministic, and ordering at µs
    * (not raw ns) keeps both engines' sort keys identical under
    * DuckDB's ns→µs timestamp truncation. Scale shape: ONE window
    * shuffle on user_id (sequences are per-user, so the partition key
    * is the natural one and never skew-concentrates), then a
    * partial-agg count to a |types|² table; the row-conditional
    * probability is a window over that tiny aggregate, not the raw
    * events. */
  private val eventTransitions = QueryDef(
    "kdb_event_transitions",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val seqW = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val c = ev(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(seqW))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      val rowW = Window.partitionBy(col("from_type"))
      c.select(col("from_type"), col("to_type"), col("n_trans"),
          (round(col("n_trans").cast("double") /
            sum(col("n_trans")).over(rowW).cast("double"), 4) + lit(0.0)).as("p_trans"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
      c AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n_trans
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2)
      SELECT from_type, to_type, n_trans,
             round(CAST(n_trans AS DOUBLE) /
                   CAST(sum(n_trans) OVER (PARTITION BY from_type) AS DOUBLE),
                   4) + 0.0 AS p_trans
      FROM c
      ORDER BY from_type, to_type"""))

  /** Markov-chain stationary distribution — where does the user
    * behavior chain SETTLE? π = πP solved by 10 power-iteration
    * rounds over kdb_event_transitions' count matrix (the long-run
    * occupancy forecast that the raw transition table only implies),
    * reported beside the empirical occupancy (share of observed
    * transition sources) so the gap exposes how far the chain is
    * from mixed. The llm_bradley_terry / llm_textrank_keywords
    * integer-iteration discipline: π lives in micros (seed
    * 10⁶ div |states|), each update term is (π_i·c_ij) div r_i — one
    * integer division per matrix cell — summed as order-independent
    * BIGINTs, zero IEEE ops so Spark div ≡ DuckDB // and 10 rounds
    * cannot drift (the ≤|states| micros of div-floor mass leak per
    * round is deterministic and identical in both engines). Scale
    * shape: ONE user-partitioned lead() pass builds the |states|²
    * count matrix; every iteration runs on that constant-size table
    * (localCheckpoint per round); output is |states| rows. */
  private val markovStationary = QueryDef(
    "kdb_markov_stationary",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val seqW = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val c = ev(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(seqW))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val rowTot = c.groupBy(col("src")).agg(sum(col("cnt")).as("rtot"))
      val cm = c.join(rowTot, "src").localCheckpoint(true)
      val states = c.select(col("src").as("state")).distinct()
        .localCheckpoint(true)
      // |states| is one bounded driver read (the Ivf k-row collect
      // discipline) so the micro seed tracks the data's cardinality
      val nStates = states.count()
      var pi = states.withColumn("pi", lit(1000000L / nStates))
      for (_ <- 1 to 10) {
        pi = cm.join(pi.select(col("state").as("src"), col("pi")), "src")
          .select(col("dst"), expr("(pi * cnt) div rtot").as("term"))
          .groupBy(col("dst")).agg(sum(col("term")).as("pi"))
          .select(col("dst").as("state"), col("pi"))
          .localCheckpoint(true)
      }
      val emp = c.groupBy(col("src").as("state")).agg(sum(col("cnt")).as("n_from"))
      val tot = emp.agg(sum(col("n_from")).as("n_tot"))
      pi.join(emp, "state").crossJoin(broadcast(tot))
        .select(col("state"), col("pi").as("pi_micro"),
          expr("(n_from * 1000000L) div n_tot").as("empirical_micro"))
        .orderBy(col("state"))
    },
    Some {
      val iter = (1 to 10).map { i =>
        s"""p$i AS (
        SELECT m.dst AS state, CAST(sum((p.pi * m.cnt) // m.rtot) AS BIGINT)
          AS pi
        FROM cm m JOIN p${i - 1} p ON p.state = m.src
        GROUP BY 1)"""
      }.mkString(",\n      ")
      s"""
      WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
      c AS (
        SELECT event_type AS src, next_type AS dst, count(*) AS cnt
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2),
      rt AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS rtot FROM c GROUP BY 1),
      cm AS (SELECT c.src, c.dst, c.cnt, rt.rtot FROM c JOIN rt USING (src)),
      p0 AS (SELECT DISTINCT src AS state,
                    CAST(1000000 // (SELECT count(DISTINCT src) FROM c)
                      AS BIGINT) AS pi FROM c),
      $iter,
      emp AS (SELECT src AS state, CAST(sum(cnt) AS BIGINT) AS n_from
              FROM c GROUP BY 1),
      tot AS (SELECT CAST(sum(n_from) AS BIGINT) AS n_tot FROM emp)
      SELECT p10.state, p10.pi AS pi_micro,
             (e.n_from * 1000000) // t.n_tot AS empirical_micro
      FROM p10 JOIN emp e ON e.state = p10.state
      CROSS JOIN tot t
      ORDER BY p10.state"""
    })

  /** Max drawdown per series (event_type, user_id): running equity =
    * cumulative value, running peak, drawdown = peak − equity; report
    * each series' deepest drawdown, its trough time, and the peak
    * equity — the risk metric every monitoring/finance consumer of a
    * time-series store computes. All math in exact int64 cents
    * (round(value·100)): a double cumsum's value depends on
    * accumulation order (Spark windows fold left-to-right, DuckDB's
    * segment tree doesn't), which would make the `dd = max_dd`
    * trough-selection equality fragile under ulp drift; integer sums
    * are associativity-proof. Scale shape: one series-partitioned
    * window pass, then an aggregation on the SAME key — the window's
    * hash partitioning is reused, no second shuffle; parallelism =
    * series count, no global ordering anywhere. */
  private val drawdown = QueryDef(
    "kdb_drawdown",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wCum = Window.partitionBy(col("event_type"), col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"), col("user_id"))
      ev(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .withColumn("cum", sum(col("cents")).over(wCum))
        .withColumn("peak", max(col("cum")).over(wCum))
        .withColumn("dd", col("peak") - col("cum"))
        .withColumn("max_dd", max(col("dd")).over(wAll))
        .groupBy(col("event_type"), col("user_id"))
        .agg((max(col("dd")) / 100.0).as("max_drawdown"),
          min(when(col("dd") === col("max_dd"), col("ts_us"))).as("trough_us"),
          (max(col("peak")) / 100.0).as("peak_equity"))
        .orderBy(col("event_type"), col("user_id"))
    },
    Some("""
      WITH c AS (
        SELECT event_type, user_id, event_id, epoch_us(ts) AS ts_us,
               sum(CAST(round(value * 100, 0) AS BIGINT))
                 OVER (PARTITION BY event_type, user_id
                       ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM events),
      p AS (
        SELECT *, max(cum) OVER (PARTITION BY event_type, user_id
                                 ORDER BY ts_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM c),
      dd AS (
        SELECT *, peak - cum AS dd,
               max(peak - cum) OVER (PARTITION BY event_type, user_id) AS max_dd
        FROM p)
      SELECT event_type, user_id,
             max(dd) / 100.0 AS max_drawdown,
             min(CASE WHEN dd = max_dd THEN ts_us END) AS trough_us,
             max(peak) / 100.0 AS peak_equity
      FROM dd
      GROUP BY 1, 2
      ORDER BY event_type, user_id"""))

  /** Mean-shift changepoint per event_type: hourly per-event means,
    * then for each candidate hour compare the 24 observed hours
    * before vs the 24 from the candidate on (ROWS frames over present
    * hours); shift score = |mean_after − mean_before|, argmax hour
    * (earliest on ties) is the changepoint — the level-shift detector
    * behind "when did this metric move". Exactness: the window frames
    * sum int64 cents and counts (order-proof), each mean is ONE
    * double division of identical exact integers in both engines, so
    * the score ORDERING (row_number over a double) cannot diverge.
    * Scale shape: one data-sized hourly aggregation, then
    * type-partitioned windows over the ~720-row hourly table. */
  private val changepoint = QueryDef(
    "kdb_changepoint",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(sum(col("cents")).as("sc"), count(lit(1)).as("n"))
      val ord = Window.partitionBy(col("event_type")).orderBy(col("slot_ns"))
      val wPrev = ord.rowsBetween(-24, -1)
      val wNext = ord.rowsBetween(0, 23)
      val scored = hourly
        .withColumn("sp", sum(col("sc")).over(wPrev))
        .withColumn("np", sum(col("n")).over(wPrev))
        .withColumn("hp", count(lit(1)).over(wPrev))
        .withColumn("sn", sum(col("sc")).over(wNext))
        .withColumn("nn", sum(col("n")).over(wNext))
        .withColumn("hn", count(lit(1)).over(wNext))
        .filter(col("hp") === 24 && col("hn") === 24)
        .withColumn("score", abs(col("sn") / col("nn") - col("sp") / col("np")))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("score").desc, col("slot_ns"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("slot_ns").as("change_ns"),
          round(col("sp") / col("np") / 100.0, 4).as("mean_before"),
          round(col("sn") / col("nn") / 100.0, 4).as("mean_after"),
          round(col("score") / 100.0, 4).as("shift"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS sc,
               count(*) AS n
        FROM events
        GROUP BY 1, 2),
      w AS (
        SELECT event_type, slot_ns,
               sum(sc) OVER prev AS sp, sum(n) OVER prev AS np,
               count(*) OVER prev AS hp,
               sum(sc) OVER nxt AS sn, sum(n) OVER nxt AS nn,
               count(*) OVER nxt AS hn
        FROM hourly
        WINDOW prev AS (PARTITION BY event_type ORDER BY slot_ns
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
               nxt AS (PARTITION BY event_type ORDER BY slot_ns
                       ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING)),
      s AS (
        SELECT *, abs(sn / nn - sp / np) AS score,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(sn / nn - sp / np) DESC, slot_ns) AS rk
        FROM w
        WHERE hp = 24 AND hn = 24)
      SELECT event_type, slot_ns AS change_ns,
             round(sp / np / 100.0, 4) AS mean_before,
             round(sn / nn / 100.0, 4) AS mean_after,
             round(score / 100.0, 4) AS shift
      FROM s
      WHERE rk = 1
      ORDER BY event_type"""))

  /** Sliding-window rate-limit audit: per-user request count over a
    * trailing 1-hour RANGE frame (value-based, so burst spacing —
    * not row adjacency — defines the window); report users that ever
    * exceeded the limit, with their peak rate, violation count, and
    * first violation time. The limit (2/hour) is a parameter, set low
    * for the synthetic event density. All-integer math. Scale shape:
    * one user-partitioned window pass, then an aggregation on the
    * same key (shared shuffle); output is violators-only, never
    * event-sized. */
  private val rateLimitAudit = QueryDef(
    "kdb_rate_limit_audit",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val limit = 2L
      val hourUs = Hour / 1000
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-(hourUs - 1), Window.currentRow)
      ev(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("cnt_1h", count(lit(1)).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("cnt_1h")).as("peak_1h"),
          count(when(col("cnt_1h") > limit, 1)).as("n_violations"),
          min(when(col("cnt_1h") > limit, col("ts_us"))).as("first_violation_us"))
        .filter(col("n_violations") > 0)
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH c AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN ${Hour / 1000 - 1} PRECEDING AND CURRENT ROW) AS cnt_1h
        FROM events)
      SELECT user_id, max(cnt_1h) AS peak_1h,
             count(CASE WHEN cnt_1h > 2 THEN 1 END) AS n_violations,
             min(CASE WHEN cnt_1h > 2 THEN ts_us END) AS first_violation_us
      FROM c
      GROUP BY user_id
      HAVING count(CASE WHEN cnt_1h > 2 THEN 1 END) > 0
      ORDER BY user_id"""))

  /** Burstiness (Fano factor) per event_type over the [T0,T1) hourly
    * grid: index of dispersion var(c)/mean(c) of hourly counts, the
    * standard test for Poisson-vs-bursty arrivals. Zero hours are
    * accounted WITHOUT materializing a dense grid: they contribute
    * nothing to Σc or Σc², so mean = Σc/720 and var = (Σc² −
    * (Σc)²/720)/720 over the 720 fixed grid hours need only the
    * present-hour rows — no crossJoin, no nested-loop join. Σc and
    * Σc² are exact int64; each derived double is a fixed sequence of
    * identical IEEE ops in both engines. Scale: one hourly count
    * aggregation, one 5-row rollup. */
  private val burstiness = QueryDef(
    "kdb_burstiness",
    (s, d) => {
      val nHours = ((T1 - T0) / Hour).toDouble
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"),
          max(col("c")).as("peak_hour"))
        .select(col("event_type"),
          col("s1").as("n_events"),
          round(col("s1") / nHours, 4).as("mean_rate"),
          round((col("s2") - col("s1") * col("s1") / nHours) / nHours /
            (col("s1") / nHours), 4).as("fano"),
          col("peak_hour"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(*) AS c
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      agg AS (
        SELECT event_type, sum(c) AS s1, sum(c * c) AS s2, max(c) AS peak_hour
        FROM hourly
        GROUP BY 1)
      SELECT event_type,
             CAST(s1 AS BIGINT) AS n_events,
             round(s1 / 720.0, 4) AS mean_rate,
             round((s2 - s1 * s1 / 720.0) / 720.0 / (s1 / 720.0), 4) AS fano,
             CAST(peak_hour AS BIGINT) AS peak_hour
      FROM agg
      ORDER BY event_type"""))

  /** Log₂-bucket quantile sketch per event_type (the DDSketch/HDR-
    * histogram family at γ=2): values → int64 cents (+1 to dodge
    * zeros), bucket = significant-bit count via length(bin(x)) — exact
    * STRING math, identical in both engines (kdb_compression_plan
    * precedent) — so the whole sketch is a FIXED-SIZE (≤64-bucket)
    * integer histogram that map-side combines and merges
    * associatively: the only percentile structure that works as a
    * streaming/partial aggregate at 100 TB, where exact percentile
    * needs a per-group sort. The estimate for quantile q is the upper
    * bound (2^b−1) of the first bucket whose cumulative count reaches
    * rank ⌈qn⌉. The γ=2 guarantee est ∈ [disc, 2·disc−1] against the
    * exact discrete quantile is gated as an ALL-INTEGER invariant
    * (flags must be constant 1) — the exact-twin rank pass exists
    * only as the oracle harness; production runs just the sketch. */
  private val quantileSketch = QueryDef(
    "kdb_quantile_sketch",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = ev(s, d)
        .withColumn("cents1",
          round(col("value") * 100, 0).cast("long") + 1)
      // sketch leg: (type, bucket) counts → cumulative → est per q
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("b"))
      val wType = Window.partitionBy(col("event_type"))
      val sk = base
        .withColumn("b", length(bin(col("cents1"))))
        .groupBy(col("event_type"), col("b"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(wType))
        .withColumn("r50", expr("(n + 1) div 2"))
        .withColumn("r95", expr("(19 * n + 19) div 20"))
        .withColumn("r99", expr("(99 * n + 99) div 100"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          count(lit(1)).as("n_buckets"),
          min(when(col("cum") >= col("r50"), expr("shiftleft(CAST(1 AS BIGINT), b) - 1"))).as("e50"),
          min(when(col("cum") >= col("r95"), expr("shiftleft(CAST(1 AS BIGINT), b) - 1"))).as("e95"),
          min(when(col("cum") >= col("r99"), expr("shiftleft(CAST(1 AS BIGINT), b) - 1"))).as("e99"))
      // exact-twin leg (oracle harness only): discrete rank quantiles
      val wRank = Window.partitionBy(col("event_type"))
        .orderBy(col("cents1"), col("event_id"))
      val disc = base
        .withColumn("rn", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wType))
        .groupBy(col("event_type"))
        .agg(min(when(col("rn") === expr("(n + 1) div 2"), col("cents1"))).as("d50"),
          min(when(col("rn") === expr("(19 * n + 19) div 20"), col("cents1"))).as("d95"),
          min(when(col("rn") === expr("(99 * n + 99) div 100"), col("cents1"))).as("d99"))
      sk.join(disc, "event_type")
        .select(col("event_type"), col("n"), col("n_buckets"),
          round(col("e50") / 100.0, 2).as("p50_est"),
          round(col("e95") / 100.0, 2).as("p95_est"),
          round(col("e99") / 100.0, 2).as("p99_est"),
          when(col("e50") >= col("d50") && col("e50") <= lit(2) * col("d50") - 1, 1)
            .otherwise(0).as("ok50"),
          when(col("e95") >= col("d95") && col("e95") <= lit(2) * col("d95") - 1, 1)
            .otherwise(0).as("ok95"),
          when(col("e99") >= col("d99") && col("e99") <= lit(2) * col("d99") - 1, 1)
            .otherwise(0).as("ok99"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH base AS (
        SELECT event_type, event_id,
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
               min(CASE WHEN cum >= (n + 1) // 2 THEN (1::BIGINT << b) - 1 END) AS e50,
               min(CASE WHEN cum >= (19 * n + 19) // 20 THEN (1::BIGINT << b) - 1 END) AS e95,
               min(CASE WHEN cum >= (99 * n + 99) // 100 THEN (1::BIGINT << b) - 1 END) AS e99
        FROM cm
        GROUP BY 1),
      rk AS (
        SELECT event_type, cents1,
               row_number() OVER (PARTITION BY event_type ORDER BY cents1, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base),
      disc AS (
        SELECT event_type,
               min(CASE WHEN rn = (n + 1) // 2 THEN cents1 END) AS d50,
               min(CASE WHEN rn = (19 * n + 19) // 20 THEN cents1 END) AS d95,
               min(CASE WHEN rn = (99 * n + 99) // 100 THEN cents1 END) AS d99
        FROM rk
        GROUP BY 1)
      SELECT s.event_type, s.n, s.n_buckets,
             round(e50 / 100.0, 2) AS p50_est,
             round(e95 / 100.0, 2) AS p95_est,
             round(e99 / 100.0, 2) AS p99_est,
             CASE WHEN e50 >= d50 AND e50 <= 2 * d50 - 1 THEN 1 ELSE 0 END AS ok50,
             CASE WHEN e95 >= d95 AND e95 <= 2 * d95 - 1 THEN 1 ELSE 0 END AS ok95,
             CASE WHEN e99 >= d99 AND e99 <= 2 * d99 - 1 THEN 1 ELSE 0 END AS ok99
      FROM sk s JOIN disc USING (event_type)
      ORDER BY s.event_type"""))

  /** Repeat-event debounce audit: same-(user, type) events arriving
    * within 10 minutes of the previous one join its "press group" (UI
    * double-fires / client retry storms); per type we report how many
    * events survive debouncing and the worst burst length — the input
    * to a client-side dedup policy, complementing kdb_order_audit's
    * lateness read. Island ids via the cumulative count of gap-opens
    * (the kdb_incident_intervals precedent, but keyed per series): ONE
    * (user_id, event_type) shuffle is shared by the lag and the island
    * numbering, then a tiny per-type rollup. All integer ns math; the
    * single rounded division is the bounce rate. */
  private val debounce = QueryDef(
    "kdb_debounce",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gapNs = 600L * 1000 * 1000 * 1000 // 10 min
      val wKey = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_ns"), col("event_id"))
      val grouped = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("prev_ns", lag(col("ts_ns"), 1).over(wKey))
        .withColumn("is_start",
          when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1)
            .otherwise(0))
        .withColumn("gid", sum(col("is_start")).over(
          wKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("event_type"), col("gid"))
        .agg(count(lit(1)).as("burst"))
      grouped
        .groupBy(col("event_type"))
        .agg(sum(col("burst")).as("n_events"),
          count(lit(1)).as("n_groups"),
          max(col("burst")).as("max_burst"))
        .select(col("event_type"), col("n_events"), col("n_groups"),
          (col("n_events") - col("n_groups")).as("n_bounces"),
          round((col("n_events") - col("n_groups")) / col("n_events").cast("double"), 4)
            .as("bounce_rate"),
          col("max_burst"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      g AS (
        SELECT user_id, event_type, ts_ns,
               CASE WHEN lag(ts_ns) OVER w IS NULL
                         OR ts_ns - lag(ts_ns) OVER w > 600000000000
                    THEN 1 ELSE 0 END AS is_start
        FROM e
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_ns, event_id)),
      gi AS (
        SELECT user_id, event_type,
               sum(is_start) OVER (PARTITION BY user_id, event_type ORDER BY ts_ns
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        FROM g),
      bursts AS (
        SELECT user_id, event_type, gid, count(*) AS burst
        FROM gi GROUP BY 1, 2, 3)
      SELECT event_type,
             CAST(sum(burst) AS BIGINT) AS n_events,
             count(*) AS n_groups,
             CAST(sum(burst) - count(*) AS BIGINT) AS n_bounces,
             round((sum(burst) - count(*)) / CAST(sum(burst) AS DOUBLE), 4) AS bounce_rate,
             CAST(max(burst) AS BIGINT) AS max_burst
      FROM bursts
      GROUP BY event_type
      ORDER BY event_type"""))

  /** χ² independence test of event_type × hour-of-day — "is the
    * traffic mix time-dependent?", the statistical upgrade of
    * kdb_seasonality's eyeball diurnal profile. Zero-observation grid
    * cells enter ALGEBRAICALLY, never via a dense-grid join (the
    * kdb_burstiness precedent): since Σ_h E_th = rowtot_t, the per-type
    * statistic is Σ_observed[(obs−E)²/E − E] + rowtot. Each observed
    * cell's term is one double expression over exact integer counts
    * (products taken in double to dodge int64 overflow at corpus
    * scale — exact while < 2⁵³, i.e. ≥100× the sf0.1 event volume:
    * n·obs ≈ 8·10¹³ at 100× vs the 9·10¹⁵ exactness ceiling, and the
    * count products n·obs / r·c stay exactly-representable integer
    * doubles whose difference is again exact), quantized to integer micro-units
    * BEFORE the per-type sum so engine summation order can't move the
    * hash. One (type, hod) partial-agg pass; the row/col/grand totals
    * ride windows over the ≤ types×24-row cell table. */
  private val chisqIndependence = QueryDef(
    "kdb_chisq_independence",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cells = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("hod", expr(s"(ts_ns div ${Hour}L) % 24"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("obs"))
      val withTot = cells
        .withColumn("r", sum(col("obs")).over(Window.partitionBy(col("event_type"))))
        .withColumn("c", sum(col("obs")).over(Window.partitionBy(col("hod"))))
        .withColumn("n", sum(col("obs")).over(Window.partitionBy()))
      val dev = col("n").cast("double") * col("obs") - col("r").cast("double") * col("c")
      val e = col("r").cast("double") * col("c") / col("n")
      val termMicro = round(
        (dev * dev / (col("n").cast("double") * col("r") * col("c")) - e) * 1e6, 0)
        .cast("long")
      withTot
        .withColumn("term_u", termMicro)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_cells"),
          max(col("r")).as("row_total"),
          round((sum(col("term_u")) / 1e6) + max(col("r")), 4).as("chi2"))
        .withColumn("dof", lit(23))
        .withColumn("time_dependent",
          (col("chi2") > 42.0).cast("int"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH cells AS (
        SELECT event_type,
               (epoch_ns(ts) // ${Hour}) % 24 AS hod,
               count(*) AS obs
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      tot AS (
        SELECT event_type, hod, obs,
               sum(obs) OVER (PARTITION BY event_type) AS r,
               sum(obs) OVER (PARTITION BY hod) AS c,
               sum(obs) OVER () AS n
        FROM cells),
      terms AS (
        SELECT event_type, r,
               CAST(round(((CAST(n AS DOUBLE) * obs - CAST(r AS DOUBLE) * c)
                           * (CAST(n AS DOUBLE) * obs - CAST(r AS DOUBLE) * c)
                           / (CAST(n AS DOUBLE) * r * c)
                           - CAST(r AS DOUBLE) * c / n) * 1e6, 0) AS BIGINT) AS term_u
        FROM tot)
      SELECT event_type,
             count(*) AS n_cells,
             CAST(max(r) AS BIGINT) AS row_total,
             round(sum(term_u) / 1e6 + max(r), 4) AS chi2,
             23 AS dof,
             CASE WHEN round(sum(term_u) / 1e6 + max(r), 4) > 42.0 THEN 1 ELSE 0 END
               AS time_dependent
      FROM terms
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Two-proportion A/B significance test: users split 50/50 by the
    * shared 60-bit md5 hash of a salted user_id (deterministic,
    * engine-identical assignment — the llm_train_val_split precedent),
    * conversion = "≥ 14 purchases in the window" (the per-user median
    * at every SF — "power buyer"; plain "any purchase" is universal in
    * this corpus, which degenerates the pooled variance to 0). The
    * pooled z-score is ONE double expression over the four integer
    * counts, so both engines compute bit-identical doubles before the
    * 4dp round; every divisor rides nullif so a degenerate split
    * (empty variant, 0%/100% conversion) yields NULL z / significant=0
    * instead of an ANSI divide-by-zero. Plan: one user_id partial-agg
    * pass (conversion is a per-user conditional count), one
    * conditional-agg rollup to a single row — no joins at all. */
  private val abTest = QueryDef(
    "kdb_ab_test",
    (s, d) => {
      import graft.functions.TextFunctions.hash60
      def nz(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        nullif(c.cast("double"), lit(0.0))
      val perUser = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "purchase", 1).otherwise(0)) >= 14)
          .cast("int").as("converted"))
        .withColumn("variant",
          when(pmod(hash60(concat(lit("exp1:"), col("user_id").cast("string"))), lit(2L)) === 0,
            "A").otherwise("B"))
      val agg = perUser.groupBy().agg(
        sum(when(col("variant") === "A", 1).otherwise(0)).as("n_a"),
        sum(when(col("variant") === "B", 1).otherwise(0)).as("n_b"),
        sum(when(col("variant") === "A", col("converted")).otherwise(0)).as("conv_a"),
        sum(when(col("variant") === "B", col("converted")).otherwise(0)).as("conv_b"))
      val pa = col("conv_a") / nz(col("n_a"))
      val pb = col("conv_b") / nz(col("n_b"))
      val pp = (col("conv_a") + col("conv_b")) / nz(col("n_a") + col("n_b"))
      val z = (pa - pb) /
        nz(sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / nz(col("n_a")) + lit(1.0) / nz(col("n_b")))))
      agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(pa, 4).as("rate_a"), round(pb, 4).as("rate_b"),
        round(z, 4).as("z_score"),
        when(abs(round(z, 4)) > 1.96, 1).otherwise(0).as("significant"))
    },
    Some(s"""
      WITH pu AS (
        SELECT user_id,
               CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                    THEN 1 ELSE 0 END AS converted,
               CASE WHEN (('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                          % 2) = 0 THEN 'A' ELSE 'B' END AS variant
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY user_id),
      agg AS (
        SELECT sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS n_a,
               sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS n_b,
               sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS conv_a,
               sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS conv_b
        FROM pu),
      zc AS (
        SELECT n_a, n_b, conv_a, conv_b,
               round((conv_a / nullif(CAST(n_a AS DOUBLE), 0)
                      - conv_b / nullif(CAST(n_b AS DOUBLE), 0))
                   / nullif(sqrt(((conv_a + conv_b) / nullif(CAST(n_a + n_b AS DOUBLE), 0))
                          * (1.0 - (conv_a + conv_b) / nullif(CAST(n_a + n_b AS DOUBLE), 0))
                          * (1.0 / nullif(CAST(n_a AS DOUBLE), 0)
                             + 1.0 / nullif(CAST(n_b AS DOUBLE), 0))), 0), 4) AS z
        FROM agg)
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
             round(conv_a / nullif(CAST(n_a AS DOUBLE), 0), 4) AS rate_a,
             round(conv_b / nullif(CAST(n_b AS DOUBLE), 0), 4) AS rate_b,
             z AS z_score,
             CASE WHEN abs(z) > 1.96 THEN 1 ELSE 0 END AS significant
      FROM zc"""))

  /** Market-basket pair mining: event types co-occurring within the
    * same (user, hour) basket, with support and lift — "which behaviors
    * travel together?" per session-hour. The self-join runs on the
    * DISTINCT (user, slot, type) triples (≤ baskets × |types| rows,
    * already co-partitioned on the basket key, so the pair join adds
    * no shuffle), never on raw events; per-type basket counts and the
    * basket total broadcast back onto the ≤ |types|²⁄2-row pair table
    * via constant-key broadcast-hash joins. Lift is one division of
    * integer products, rounded 4dp. */
  private val frequentPairs = QueryDef(
    "kdb_frequent_pairs",
    (s, d) => {
      // the basket table feeds FOUR consumers (two self-join legs,
      // singles, basket count) and runtime exchange reuse does not
      // collapse them (probed) — materialize once. It is the DISTINCT
      // of (user, slot, type), far smaller than events, so one
      // materialization beats four scan+shuffle passes at any scale.
      val b = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .select(col("user_id"), col("slot_ns"), col("event_type"))
        .distinct()
        .localCheckpoint(true)
      val pairs = b.as("x")
        .join(b.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.slot_ns") === col("y.slot_ns") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      val singles = b.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id"), col("slot_ns")).as("n_t"))
      val nBaskets = b.select(col("user_id"), col("slot_ns")).distinct()
        .agg(count(lit(1)).as("n_baskets")).withColumn("one", lit(1))
      pairs
        .join(broadcast(singles.select(col("event_type").as("type_a"), col("n_t").as("n_a"))), "type_a")
        .join(broadcast(singles.select(col("event_type").as("type_b"), col("n_t").as("n_b"))), "type_b")
        .withColumn("one", lit(1))
        .join(broadcast(nBaskets), "one")
        .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"), col("n_b"),
          col("n_baskets"),
          round(col("n_ab") / col("n_baskets").cast("double"), 4).as("support"),
          round(col("n_ab").cast("double") * col("n_baskets") /
            (col("n_a").cast("double") * col("n_b")), 4).as("lift"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some(s"""
      WITH b AS (
        SELECT DISTINCT user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               event_type
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      pairs AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS n_ab
        FROM b x JOIN b y
          ON x.user_id = y.user_id AND x.slot_ns = y.slot_ns
         AND x.event_type < y.event_type
        GROUP BY 1, 2),
      singles AS (
        SELECT event_type, count(*) AS n_t FROM b GROUP BY 1),
      nb AS (
        SELECT count(*) AS n_baskets FROM (SELECT DISTINCT user_id, slot_ns FROM b))
      SELECT type_a, type_b, n_ab,
             sa.n_t AS n_a, sb.n_t AS n_b, n_baskets,
             round(n_ab / CAST(n_baskets AS DOUBLE), 4) AS support,
             round(CAST(n_ab AS DOUBLE) * n_baskets / (CAST(sa.n_t AS DOUBLE) * sb.n_t), 4) AS lift
      FROM pairs
      JOIN singles sa ON sa.event_type = type_a
      JOIN singles sb ON sb.event_type = type_b
      CROSS JOIN nb
      ORDER BY type_a, type_b"""))

  /** Association-rule mining on kdb_frequent_pairs' (user, hour)
    * baskets — the DIRECTED step the symmetric pair table stops short
    * of: each co-occurring pair yields both rules a→b and b→a, scored
    * by confidence (how often does a basket with a also hold b),
    * lift, and leverage, with the conf ≥ 1% screen and the lift > 1
    * positive-association test reported as decision flags. Every
    * score and BOTH decisions are exact integer arithmetic: conf_ppm
    * = (c_ab·10⁶) div c_a, lift_ppm = (c_ab·N·10⁶) div (c_a·c_b) —
    * magnitudes bounded by N²·10⁶, inside int64 up to ~3·10⁶
    * baskets, widen to decimal/HUGEINT past that — and the lift test
    * is the cross-multiplied c_ab·N > c_a·c_b (never a float
    * threshold), so the flagged rule set cannot differ between
    * engines. Shape: the basket distinct + pair self-join is
    * frequentPairs' (hour-blocked, |types|-bounded fan-out); rules
    * double the |types|²-bounded pair table, marginals broadcast; the
    * ORDER BY rides integer ppm values with a rule tiebreak. */
  private val associationRules = QueryDef(
    "kdb_association_rules",
    (s, d) => {
      val b = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .select(col("user_id"), col("slot_ns"), col("event_type"))
        .distinct()
        // four consumers (two self-join legs, singles, basket count) and
        // runtime exchange reuse does not collapse them (probed) —
        // materialize the distinct basket table once; it is far smaller
        // than events, so one materialization beats four scan+shuffle
        // passes at any scale
        .localCheckpoint(true)
      val pairs = b.as("x")
        .join(b.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.slot_ns") === col("y.slot_ns") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      val singles = b.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_t"))
      val nBaskets = b.select(col("user_id"), col("slot_ns")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val rules = pairs.select(col("type_a").as("lhs"), col("type_b").as("rhs"),
          col("n_ab"))
        .unionAll(pairs.select(col("type_b").as("lhs"), col("type_a").as("rhs"),
          col("n_ab")))
      rules
        .join(broadcast(singles.select(col("event_type").as("lhs"),
          col("n_t").as("n_lhs"))), "lhs")
        .join(broadcast(singles.select(col("event_type").as("rhs"),
          col("n_t").as("n_rhs"))), "rhs")
        .crossJoin(broadcast(nBaskets))
        .withColumn("conf_ppm", expr("(n_ab * 1000000L) div n_lhs"))
        .withColumn("lift_ppm",
          expr("(n_ab * n_baskets * 1000000L) div (n_lhs * n_rhs)"))
        .select(col("lhs"), col("rhs"), col("n_ab"), col("n_lhs"), col("n_rhs"),
          col("conf_ppm"), col("lift_ppm"),
          expr("n_ab * n_baskets - n_lhs * n_rhs").as("leverage_nsq"),
          (col("conf_ppm") >= 10000L).cast("int").as("is_confident"),
          expr("n_ab * n_baskets > n_lhs * n_rhs").cast("int").as("is_positive"))
        .orderBy(col("lift_ppm").desc, col("lhs"), col("rhs"))
    },
    Some(s"""
      WITH b AS (
        SELECT DISTINCT user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               event_type
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      pairs AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS n_ab
        FROM b x JOIN b y
          ON x.user_id = y.user_id AND x.slot_ns = y.slot_ns
         AND x.event_type < y.event_type
        GROUP BY 1, 2),
      singles AS (
        SELECT event_type, count(*) AS n_t FROM b GROUP BY 1),
      nb AS (
        SELECT count(*) AS n_baskets
        FROM (SELECT DISTINCT user_id, slot_ns FROM b)),
      rules AS (
        SELECT type_a AS lhs, type_b AS rhs, n_ab FROM pairs
        UNION ALL SELECT type_b, type_a, n_ab FROM pairs),
      scored AS (
        SELECT r.lhs, r.rhs, r.n_ab, sa.n_t AS n_lhs, sb.n_t AS n_rhs,
               (r.n_ab * 1000000) // sa.n_t AS conf_ppm,
               (r.n_ab * n_baskets * 1000000) // (sa.n_t * sb.n_t) AS lift_ppm,
               r.n_ab * n_baskets - sa.n_t * sb.n_t AS leverage_nsq,
               CASE WHEN (r.n_ab * 1000000) // sa.n_t >= 10000
                    THEN 1 ELSE 0 END AS is_confident,
               CASE WHEN r.n_ab * n_baskets > sa.n_t * sb.n_t
                    THEN 1 ELSE 0 END AS is_positive
        FROM rules r
        JOIN singles sa ON sa.event_type = r.lhs
        JOIN singles sb ON sb.event_type = r.rhs
        CROSS JOIN nb)
      SELECT lhs, rhs, n_ab, n_lhs, n_rhs,
             CAST(conf_ppm AS BIGINT) AS conf_ppm,
             CAST(lift_ppm AS BIGINT) AS lift_ppm,
             CAST(leverage_nsq AS BIGINT) AS leverage_nsq,
             is_confident, is_positive
      FROM scored
      ORDER BY lift_ppm DESC, lhs, rhs"""))

  /** RFM customer segmentation: per-user Recency (days since last
    * purchase at T1), Frequency (purchase count), Monetary (integer
    * CENTS — the rollup's integer-cent sum discipline, so per-user
    * totals are engine-exact regardless of summation order), each cut
    * into quintiles by ntile(5) with a user_id tie-break for a TOTAL
    * order (ntile on a partial order would let the two engines tile
    * ties differently). Output is the segment rollup — tile triple +
    * named segment, user counts, integer activity totals — not the
    * per-user table, so the result stays ≤125 rows at any corpus
    * size. One user_id partial-agg pass; the three quintiles come
    * from graft.operators.DistributedRank — exact SQL-ntile via
    * range-partitioned ranking, so NO |users|-row single-partition
    * sort exists anywhere in the plan (three range shuffles of the
    * per-user table instead, each checkpoint-pinned at its branch
    * point). */
  private val rfm = QueryDef(
    "kdb_rfm",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val perUser = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1 &&
          col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(col("ts_ns")).as("last_ns"),
          count(lit(1)).as("frequency"),
          sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        // integer div, not /-then-cast: Spark's cast truncates where
        // DuckDB's rounds — div floors identically in both engines
        .withColumn("recency_days", expr(s"(${T1} - last_ns) div ${Day}"))
        .drop("last_ns")
      // exact ntile WITHOUT partition-less windows: each quintile is
      // the DistributedRank range-partitioned decomposition (three
      // range shuffles of the per-user table instead of three
      // |users|-row single-partition sorts — the ntile results are
      // bit-identical to the oracle's literal ntile)
      import graft.operators.DistributedRank.withNtile
      val tiled = withNtile(withNtile(withNtile(perUser,
        "r_tile", 5, Seq(col("recency_days").desc, col("user_id"))),
        "f_tile", 5, Seq(col("frequency"), col("user_id"))),
        "m_tile", 5, Seq(col("cents"), col("user_id")))
      tiled
        .withColumn("segment",
          when(col("r_tile") >= 4 && col("f_tile") >= 4 && col("m_tile") >= 4, "champion")
            .when(col("r_tile") <= 2 && col("f_tile") >= 4, "at_risk")
            .when(col("r_tile") <= 2 && col("f_tile") <= 2, "lost")
            .otherwise("regular"))
        .groupBy(col("r_tile"), col("f_tile"), col("m_tile"), col("segment"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("frequency")).as("purchases"),
          sum(col("cents")).as("cents"))
        .orderBy(col("r_tile"), col("f_tile"), col("m_tile"))
    },
    Some(s"""
      WITH pu AS (
        SELECT user_id,
               (${T1} - max(epoch_ns(ts))) // ${Day} AS recency_days,
               count(*) AS frequency,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
          AND event_type = 'purchase'
        GROUP BY user_id),
      t AS (
        SELECT user_id, recency_days, frequency, cents,
               ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_tile,
               ntile(5) OVER (ORDER BY frequency, user_id) AS f_tile,
               ntile(5) OVER (ORDER BY cents, user_id) AS m_tile
        FROM pu),
      seg AS (
        SELECT r_tile, f_tile, m_tile, frequency, cents,
               CASE WHEN r_tile >= 4 AND f_tile >= 4 AND m_tile >= 4 THEN 'champion'
                    WHEN r_tile <= 2 AND f_tile >= 4 THEN 'at_risk'
                    WHEN r_tile <= 2 AND f_tile <= 2 THEN 'lost'
                    ELSE 'regular' END AS segment
        FROM t)
      SELECT r_tile, f_tile, m_tile, segment,
             count(*) AS n_users,
             CAST(sum(frequency) AS BIGINT) AS purchases,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM seg
      GROUP BY 1, 2, 3, 4
      ORDER BY r_tile, f_tile, m_tile"""))

  /** Last-touch marketing attribution: each purchase credits the most
    * recent preceding view/click by the same user within a 24 h
    * lookback, else 'direct'. The carried (ts, type) of the last
    * marketing touch rides TWO last(..., ignoreNulls) window columns
    * over the same (user, ts, event_id) order — both expressions are
    * null on exactly the non-marketing rows, so they always resolve to
    * the SAME row and stay consistent without a struct (DuckDB's
    * IGNORE NULLS twin cannot carry a struct_pack through parquet
    * hashing anyway). One user_id shuffle shared by the window pass;
    * the channel rollup is a tiny second agg, and the share divides
    * two exact integers once, 4dp. */
  private val attribution = QueryDef(
    "kdb_attribution",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lookbackNs = 24L * 3600 * 1000 * 1000 * 1000
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val mk = col("event_type").isin("view", "click")
      val touched = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("mk_ts", last(when(mk, col("ts_ns")), ignoreNulls = true).over(w))
        .withColumn("mk_type", last(when(mk, col("event_type")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("mk_ts").isNotNull && col("ts_ns") - col("mk_ts") <= lookbackNs,
            col("mk_type")).otherwise(lit("direct")))
      touched
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"))
        .withColumn("share", round(col("n_purchases") /
          sum(col("n_purchases")).over(Window.partitionBy()).cast("double"), 4))
        .orderBy(col("channel"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      t AS (
        SELECT user_id, event_type, ts_ns,
               last_value(CASE WHEN event_type IN ('view', 'click') THEN ts_ns END
                          IGNORE NULLS) OVER w AS mk_ts,
               last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
                          IGNORE NULLS) OVER w AS mk_type
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      p AS (
        SELECT CASE WHEN mk_ts IS NOT NULL AND ts_ns - mk_ts <= ${24L * 3600 * 1000000000L}
                    THEN mk_type ELSE 'direct' END AS channel
        FROM t WHERE event_type = 'purchase')
      SELECT channel, count(*) AS n_purchases,
             round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 4) AS share
      FROM p
      GROUP BY channel
      ORDER BY channel"""))

  /** Session entry-path mining: sessions are 30-min-gap islands per
    * user (the kdb_sessionize rule); each session's path is its first
    * three event types joined 'a>b>c' — the "how do journeys start"
    * navigation profile. The island numbering, the rank-within-session
    * window, and the per-session rollup all cluster on user_id, so the
    * whole pipeline rides ONE hash exchange (the later windows only
    * re-sort locally); the path table that leaves it is ≤ |types|³
    * rows. Determinism: ranks tie-break on event_id, and the Spark
    * side rebuilds the ordered triple via sort_array over (ts,
    * event_id, type) structs — collect_list order is not a contract. */
  private val sessionPaths = QueryDef(
    "kdb_session_paths",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gapNs = 1800L * 1000 * 1000 * 1000
      val wUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val wSess = Window.partitionBy(col("user_id"), col("sid"))
        .orderBy(col("ts_ns"), col("event_id"))
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("is_start",
          when(lag(col("ts_ns"), 1).over(wUser).isNull ||
            col("ts_ns") - lag(col("ts_ns"), 1).over(wUser) > gapNs, 1).otherwise(0))
        .withColumn("sid", sum(col("is_start")).over(
          wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(wSess))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"), col("sid"))
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("ts_ns"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      g AS (
        SELECT user_id, event_type, ts_ns, event_id,
               CASE WHEN lag(ts_ns) OVER w IS NULL
                         OR ts_ns - lag(ts_ns) OVER w > 1800000000000
                    THEN 1 ELSE 0 END AS is_start
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
      si AS (
        SELECT user_id, event_type, ts_ns, event_id,
               sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g),
      r AS (
        SELECT user_id, sid, event_type, ts_ns, event_id,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts_ns, event_id) AS rn
        FROM si),
      paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY ts_ns, event_id) AS path
        FROM r WHERE rn <= 3
        GROUP BY user_id, sid)
      SELECT path, count(*) AS n_sessions
      FROM paths
      GROUP BY path
      ORDER BY n_sessions DESC, path"""))

  /** Inter-arrival time profile: gaps between consecutive same-type
    * events of the same user, summarized per type as exact linearly-
    * interpolated quartiles/p90 in integer MINUTES (the percentile
    * operand is an exact integer, so the only doubles are each
    * percentile's single two-point interpolation — bit-identical in
    * both engines; a double-seconds operand would hash-diverge on
    * summation-free grounds alone). The lag window and the per-type
    * percentile agg are the whole plan — one series shuffle, one
    * small agg. The engine answer to "how often does each signal
    * actually fire?" — the sampling-rate audit behind watermark and
    * retention sizing (pairs with kdb_watermark_sizing). */
  private val interarrival = QueryDef(
    "kdb_interarrival",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_ns"), col("event_id"))
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("gap_min",
          ((col("ts_ns") - lag(col("ts_ns"), 1).over(w)) / lit(60L * 1000000000L))
            .cast("long"))
        .filter(col("gap_min").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          round(percentile(col("gap_min"), lit(0.25)), 4).as("p25_min"),
          round(percentile(col("gap_min"), lit(0.5)), 4).as("p50_min"),
          round(percentile(col("gap_min"), lit(0.75)), 4).as("p75_min"),
          round(percentile(col("gap_min"), lit(0.9)), 4).as("p90_min"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      g AS (
        SELECT event_type,
               (ts_ns - lag(ts_ns) OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts_ns, event_id))
                 // 60000000000 AS gap_min
        FROM e)
      SELECT event_type, count(*) AS n_gaps,
             round(quantile_cont(gap_min, 0.25), 4) AS p25_min,
             round(quantile_cont(gap_min, 0.5), 4) AS p50_min,
             round(quantile_cont(gap_min, 0.75), 4) AS p75_min,
             round(quantile_cont(gap_min, 0.9), 4) AS p90_min
      FROM g WHERE gap_min IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Cutler's RSI (14-hour) per event_type over the hourly cents
    * series: delta = hour-over-hour change of the hourly integer-cent
    * sum, gains/losses split, 14-present-hour ROWS frames, RSI =
    * 100 − 100/(1 + Σgain/Σloss) — the momentum oscillator behind
    * overbought/oversold monitoring. Cutler's SMA variant (not
    * Wilder's EWMA) is deliberate: the frame sums are exact int64 in
    * both engines, so the single double division chain — and
    * therefore the 70/30 threshold flags — is bit-identical, whereas
    * a recursive smoothed average would need a WITH RECURSIVE twin.
    * Degenerate frames: Σloss = 0 with gains → 100; all-zero frame
    * (flat series) → 50, by definition, not division. Scale shape:
    * one data-sized hourly aggregation, then type-partitioned windows
    * over the ~720-row/type hourly table — window input is GROUPED
    * data, never raw rows. */
  private val rsi = QueryDef(
    "kdb_rsi",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy(col("event_type")).orderBy(col("slot_1h"))
      val wFrame = wLag.rowsBetween(-13, 0)
      ev(s, d)
        .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), col("slot_1h"))
        .agg(sum(col("cents")).as("v"))
        .withColumn("delta", col("v") - lag(col("v"), 1).over(wLag))
        .filter(col("delta").isNotNull)
        .withColumn("gain", greatest(col("delta"), lit(0L)))
        .withColumn("loss", greatest(-col("delta"), lit(0L)))
        .withColumn("sg", sum(col("gain")).over(wFrame))
        .withColumn("sl", sum(col("loss")).over(wFrame))
        .withColumn("nf", count(lit(1)).over(wFrame))
        .filter(col("nf") === 14)
        .withColumn("rsi",
          when(col("sg") === 0 && col("sl") === 0, lit(50.0))
            .when(col("sl") === 0, lit(100.0))
            .otherwise(lit(100.0) - lit(100.0) /
              (lit(1.0) + col("sg").cast("double") / col("sl").cast("double"))))
        .select(col("event_type"), col("slot_1h"),
          (round(col("rsi"), 4) + lit(0.0)).as("rsi"),
          (col("rsi") > 70).cast("int").as("overbought"),
          (col("rsi") < 30).cast("int").as("oversold"))
        .orderBy(col("event_type"), col("slot_1h"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
      dl AS (
        SELECT event_type, slot_1h,
               v - lag(v) OVER (PARTITION BY event_type ORDER BY slot_1h) AS delta
        FROM h),
      g AS (
        SELECT event_type, slot_1h,
               greatest(delta, 0) AS gain, greatest(-delta, 0) AS loss
        FROM dl WHERE delta IS NOT NULL),
      f AS (
        SELECT event_type, slot_1h,
               CAST(sum(gain) OVER w AS BIGINT) AS sg,
               CAST(sum(loss) OVER w AS BIGINT) AS sl,
               count(*) OVER w AS nf
        FROM g
        WINDOW w AS (PARTITION BY event_type ORDER BY slot_1h
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
      r AS (
        SELECT event_type, slot_1h,
               CASE WHEN sg = 0 AND sl = 0 THEN 50.0
                    WHEN sl = 0 THEN 100.0
                    ELSE 100.0 - 100.0 /
                         (1.0 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE)) END AS rsi
        FROM f WHERE nf = 14)
      SELECT event_type, slot_1h,
             round(rsi, 4) + 0.0 AS rsi,
             CASE WHEN rsi > 70 THEN 1 ELSE 0 END AS overbought,
             CASE WHEN rsi < 30 THEN 1 ELSE 0 END AS oversold
      FROM r
      ORDER BY event_type, slot_1h"""))

  /** Local-maximum peak detection per event_type: a present hour is a
    * peak when its max-value cents strictly exceed both neighboring
    * present hours AND the series mean (Σcents/n, one double
    * division); prominence = height above the taller neighbor — the
    * spike finder behind alert review ("which hours stood out, and by
    * how much"). Exactness: neighbor comparisons are pure int64;
    * the mean gate compares CAST(v AS DOUBLE) > Σ/n where both sides
    * derive from identical exact integers, so membership cannot drift
    * under ulp noise. Scale shape: one data-sized hourly aggregation,
    * then ONE type-partitioned window pass (lag/lead/avg share the
    * partitioning); output is peaks only — tiny. */
  private val peakDetect = QueryDef(
    "kdb_peak_detect",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("slot_1h"))
      val wAll = Window.partitionBy(col("event_type"))
      ev(s, d)
        .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), col("slot_1h"))
        .agg(max(col("cents")).as("v"))
        .withColumn("prev", lag(col("v"), 1).over(w))
        .withColumn("nxt", lead(col("v"), 1).over(w))
        .withColumn("mean",
          sum(col("v")).over(wAll).cast("double") / count(lit(1)).over(wAll))
        .filter(col("prev").isNotNull && col("nxt").isNotNull &&
          col("v") > col("prev") && col("v") > col("nxt") &&
          col("v").cast("double") > col("mean"))
        .select(col("event_type"), col("slot_1h"),
          (col("v") / 100.0).as("height"),
          ((col("v") - greatest(col("prev"), col("nxt"))) / 100.0)
            .as("prominence"))
        .orderBy(col("event_type"), col("slot_1h"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               CAST(max(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
      n AS (
        SELECT event_type, slot_1h, v,
               lag(v)  OVER w AS prev,
               lead(v) OVER w AS nxt,
               CAST(CAST(sum(v) OVER wa AS BIGINT) AS DOUBLE)
                 / count(*) OVER wa AS mean
        FROM h
        WINDOW w AS (PARTITION BY event_type ORDER BY slot_1h),
               wa AS (PARTITION BY event_type))
      SELECT event_type, slot_1h,
             v / 100.0 AS height,
             (v - greatest(prev, nxt)) / 100.0 AS prominence
      FROM n
      WHERE prev IS NOT NULL AND nxt IS NOT NULL
        AND v > prev AND v > nxt AND CAST(v AS DOUBLE) > mean
      ORDER BY event_type, slot_1h"""))

  /** LTTB-style viz downsampling (parallel bucket-mean variant): one
    * representative point per (event_type, hour) — the point whose
    * triangle with the neighboring PRESENT buckets' mean points has
    * the largest area; the first/last bucket of each series keep
    * their first/last point (LTTB's global anchors). This is the
    * standard parallelizable LTTB approximation (true LTTB chains
    * each choice to the previous selection — inherently sequential),
    * and the shape-preserving cousin of kdb_m4_downsample's
    * min/max/first/last envelope. Exactness across engines: all
    * inputs are exact ints (ms offsets, cents, counts, sums); means
    * are ONE division each and the area is a fixed-order chain of
    * IEEE core ops (±, ×, abs — no libm), so the double is
    * bit-identical in both engines and the argmax (area DESC, ts)
    * cannot flip. Scale shape: per-bucket stats ride one
    * (type, bucket) partial-agg shuffle; the neighbor window runs
    * over the tiny bucket table; the argmax row_number partitions by
    * (type, bucket) — per-bucket work, no global sort, output =
    * |buckets|. */
  private val lttb = QueryDef(
    "kdb_lttb_downsample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val HourMs = 3600000L
      val pts = ev(s, d)
        .withColumn("x", expr("ts_ns div 1000000"))
        .withColumn("y", round(col("value") * 100, 0).cast("long"))
        .withColumn("bucket", col("x") - col("x") % HourMs)
      val wB = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      val stats = pts.groupBy(col("event_type").as("st_type"), col("bucket").as("st_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"))
        .withColumn("mxp", lag(col("sx"), 1).over(
          Window.partitionBy(col("st_type")).orderBy(col("st_bucket")))
          .cast("double") / lag(col("n"), 1).over(
          Window.partitionBy(col("st_type")).orderBy(col("st_bucket"))))
        .withColumn("myp", lag(col("sy"), 1).over(
          Window.partitionBy(col("st_type")).orderBy(col("st_bucket")))
          .cast("double") / lag(col("n"), 1).over(
          Window.partitionBy(col("st_type")).orderBy(col("st_bucket"))))
        .withColumn("mxn", lead(col("sx"), 1).over(
          Window.partitionBy(col("st_type")).orderBy(col("st_bucket")))
          .cast("double") / lead(col("n"), 1).over(
          Window.partitionBy(col("st_type")).orderBy(col("st_bucket"))))
        .withColumn("myn", lead(col("sy"), 1).over(
          Window.partitionBy(col("st_type")).orderBy(col("st_bucket")))
          .cast("double") / lead(col("n"), 1).over(
          Window.partitionBy(col("st_type")).orderBy(col("st_bucket"))))
        .select(col("st_type"), col("st_bucket"),
          col("mxp"), col("myp"), col("mxn"), col("myn"))
      val wPick = Window.partitionBy(col("event_type"), col("bucket"))
        .orderBy(col("score").desc, col("x"), col("y"))
      // no broadcast hint: the stats table is |series|×|buckets| rows
      // — tiny at gate scale (AQE broadcasts it), but at 100 TB it
      // must flow as a shuffle join on the SAME (type, bucket) key as
      // the argmax partitioning below
      pts.join(stats,
          col("event_type") === col("st_type") && col("bucket") === col("st_bucket"))
        .withColumn("area",
          abs((col("x").cast("double") - col("mxp")) * (col("myn") - col("myp")) -
            (col("mxn") - col("mxp")) * (col("y").cast("double") - col("myp"))))
        .withColumn("score",
          when(col("mxp").isNull, -col("x").cast("double"))
            .when(col("mxn").isNull, col("x").cast("double"))
            .otherwise(col("area")))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("bucket").as("bucket_ms"),
          col("x").as("ts_ms"), (col("y") / 100.0).as("v"),
          when(col("mxp").isNull, "first").when(col("mxn").isNull, "last")
            .otherwise("area").as("role"))
        .orderBy(col("event_type"), col("bucket_ms"))
    },
    Some("""
      WITH p AS (
        SELECT event_type,
               epoch_ns(ts) // 1000000 AS x,
               CAST(round(value * 100, 0) AS BIGINT) AS y
        FROM events),
      b AS (
        SELECT *, x - x % 3600000 AS bucket FROM p),
      st AS (
        SELECT event_type AS st_type, bucket AS st_bucket,
               count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy
        FROM b GROUP BY 1, 2),
      nb AS (
        SELECT st_type, st_bucket,
               CAST(lag(sx) OVER w AS DOUBLE) / lag(n) OVER w AS mxp,
               CAST(lag(sy) OVER w AS DOUBLE) / lag(n) OVER w AS myp,
               CAST(lead(sx) OVER w AS DOUBLE) / lead(n) OVER w AS mxn,
               CAST(lead(sy) OVER w AS DOUBLE) / lead(n) OVER w AS myn
        FROM st
        WINDOW w AS (PARTITION BY st_type ORDER BY st_bucket)),
      sc AS (
        SELECT b.event_type, b.bucket, b.x, b.y,
               abs((CAST(b.x AS DOUBLE) - mxp) * (myn - myp) -
                   (mxn - mxp) * (CAST(b.y AS DOUBLE) - myp)) AS area,
               mxp, mxn
        FROM b JOIN nb ON b.event_type = st_type AND b.bucket = st_bucket),
      rk AS (
        SELECT *,
               row_number() OVER (
                 PARTITION BY event_type, bucket
                 ORDER BY CASE WHEN mxp IS NULL THEN -CAST(x AS DOUBLE)
                               WHEN mxn IS NULL THEN CAST(x AS DOUBLE)
                               ELSE area END DESC, x, y) AS rn
        FROM sc)
      SELECT event_type, bucket AS bucket_ms, x AS ts_ms, y / 100.0 AS v,
             CASE WHEN mxp IS NULL THEN 'first'
                  WHEN mxn IS NULL THEN 'last'
                  ELSE 'area' END AS role
      FROM rk WHERE rn = 1
      ORDER BY event_type, bucket_ms"""))

  /** Right-to-erasure, oracle-gated end to end: ingest the whole
    * events table through Engine.put, fold the daily continuous
    * aggregate, ERASE one user's every series (wildcard metric), and
    * emit the surviving rollup plus two erasure receipts — the raw
    * survivor row count (gates the bucket rewrites) and the number of
    * rollup partials removed (gates the cascade) — against DuckDB
    * computing the same world as `WHERE user_id <> 13`. The full
    * production sequence (write → aggregate → erase → read) runs
    * inside one QueryDef exactly like stream_rollup_twin runs the
    * streaming path; EraseSpec covers the crash/guard corners this
    * end-to-end can't. cnt counts the observation stream (every
    * accepted write) and sum_cents is the rollupTwin discipline. */
  private val eraseTwin = QueryDef(
    "kdb_erase_twin",
    (s, d) => {
      import s.implicits._
      val dir = graft.core.Scratch.dir("graft-erasetwin")
      val engine = new graft.core.Engine(s,
        graft.core.EngineOptions("etwin", dir, indexDepth = 2, payloadSize = 8,
          bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
        new graft.core.TestClock(T1))
      val pts = ev(s, d)
        .select(col("ts_ns"), col("event_type"),
          col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
        .as[(Long, String, String, Double, Long)]
        .map { case (ts, et, uid, v, id) =>
          graft.core.Point(ts, Seq(et, uid),
            graft.plans.DoubleFromPayload.encode(v), id)
        }
      engine.put(pts.toDF())
      engine.refreshRollup(Day)
      val (_, partialsRemoved) = engine.erase(Seq("", "13"))
      val rawRows = engine.stats()
        .agg(sum(col("rows")).as("n")).collect()(0).getLong(0)
      engine.rollup(T0, T0 + 31 * Day, Seq("", ""), Day)
        .select(col("tag0").as("event_type"), col("tag1").as("user_id"),
          col("rslot_ns").as("day_ns"), col("cnt"),
          round(col("vsum") * 100).cast("long").as("sum_cents"),
          lit(rawRows).as("raw_rows"),
          lit(partialsRemoved).as("partials_removed"))
        .orderBy(col("event_type"), col("user_id"), col("day_ns"))
    },
    Some(s"""
      WITH survivors AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Day} AS day_ns,
               count(*) AS cnt,
               CAST(round(sum(value) * 100) AS BIGINT) AS sum_cents
        FROM events WHERE user_id <> 13
        GROUP BY 1, 2, 3),
      receipts AS (
        SELECT (SELECT count(*) FROM events WHERE user_id <> 13) AS raw_rows,
               (SELECT count(*) FROM (
                  SELECT DISTINCT event_type,
                         epoch_ns(ts) - epoch_ns(ts) % ${Day}
                  FROM events WHERE user_id = 13)) AS partials_removed)
      SELECT event_type, user_id, day_ns, cnt, sum_cents,
             raw_rows, partials_removed
      FROM survivors CROSS JOIN receipts
      ORDER BY event_type, user_id, day_ns"""))

  /** MVCC time travel, oracle-gated end to end: ingest the purchase
    * stream in TWO batches (even event_ids, then odd event_ids at a
    * higher seq block), capture the snapshot watermark between them
    * with currentSeq(), and read the SAME 3-day window twice —
    * findAsOf(watermark) vs find() — emitting each user's cents total
    * in both worlds plus a changed flag and the watermark itself.
    * DuckDB reconstructs both worlds from the events table: the as-of
    * world is LWW over even rows only, the current world is LWW with
    * odd rows seq-shifted above every even seq — exactly the engine's
    * append-only rule. What this pins that EngineSpec's MVCC specs
    * can't: the snapshot predicate (`seq <= watermark`) composing with
    * LWW resolve, wildcard series discovery (series first seen in
    * batch 2 must be ABSENT as-of, present now), and the dense-slab
    * zero-fill, all hash-gated at sf0.01. Scale shape: the seq filter
    * is one pushed-down parquet predicate (no version log, no state
    * reconstruction), so time travel costs the same scan as a current
    * read. */
  private val timeTravelTwin = QueryDef(
    "kdb_time_travel_twin",
    (s, d) => {
      import s.implicits._
      val SeqShift = 1L << 40 // above any event_id: batch 2 always wins LWW
      val dir = graft.core.Scratch.dir("graft-ttwin")
      val engine = new graft.core.Engine(s,
        graft.core.EngineOptions("ttwin", dir, indexDepth = 2, payloadSize = 8,
          bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
        new graft.core.TestClock(T1))
      val base = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < T0 + 3 * Day)
        .select(col("ts_ns"), col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
      def pts(df: DataFrame, shift: Long) = df
        .as[(Long, String, Double, Long)]
        .map { case (ts, uid, v, id) =>
          graft.core.Point(ts, Seq("purchase", uid),
            graft.plans.DoubleFromPayload.encode(v), id + shift)
        }.toDF()
      engine.put(pts(base.filter(col("event_id") % 2 === 0), 0L))
      val mark = engine.currentSeq()
      engine.put(pts(base.filter(col("event_id") % 2 === 1), SeqShift))
      def cents(dfr: DataFrame, out: String) = dfr
        .withColumn("v", call_function("double_from_payload", col("payload")))
        .groupBy(col("tag1").as("user_id"))
        .agg(sum(round(col("v") * 100, 0).cast("long")).as(out))
      val asof = cents(
        engine.findAsOf(T0, T0 + 3 * Day, Seq("purchase", ""), mark), "asof_cents")
      val now = cents(
        engine.find(T0, T0 + 3 * Day, Seq("purchase", "")), "now_cents")
      now.join(asof, Seq("user_id"), "left_outer")
        .select(col("user_id"), col("asof_cents"), col("now_cents"),
          when(col("asof_cents").isNull ||
            col("asof_cents") =!= col("now_cents"), 1).otherwise(0).as("changed"),
          lit(mark).as("snapshot_seq"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT user_id, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               value, event_id, event_id % 2 AS odd
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 3 * Day}),
      snap AS (
        SELECT CAST(user_id AS VARCHAR) AS user_id,
               CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS asof_cents
        FROM (SELECT user_id, slot_ns, arg_max(value, event_id) AS v
              FROM w WHERE odd = 0 GROUP BY 1, 2)
        GROUP BY 1),
      cur AS (
        SELECT CAST(user_id AS VARCHAR) AS user_id,
               CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS now_cents
        FROM (SELECT user_id, slot_ns,
                     arg_max(value, event_id +
                       CASE WHEN odd = 1 THEN ${1L << 40} ELSE 0 END) AS v
              FROM w GROUP BY 1, 2)
        GROUP BY 1),
      mark AS (
        SELECT CAST(max(event_id) AS BIGINT) AS snapshot_seq
        FROM w WHERE odd = 0)
      SELECT c.user_id, a.asof_cents, c.now_cents,
             CASE WHEN a.asof_cents IS NULL
                    OR a.asof_cents <> c.now_cents THEN 1 ELSE 0 END AS changed,
             snapshot_seq
      FROM cur c LEFT JOIN snap a USING (user_id) CROSS JOIN mark
      ORDER BY c.user_id"""))

  /** Bitemporal matrix, oracle-gated end to end — the two-time-axis
    * read a kdb+ shop calls "what did we believe about event time V
    * as of transaction time T": the purchase stream lands in THREE
    * batches (event_id mod 3, each at a higher seq block), marks are
    * captured between them, and the SAME 2-day event-time window is
    * read at all three transaction snapshots (findAsOf(mark1),
    * findAsOf(mark2), find()) — a snap × series × slot matrix showing
    * the record of the past being revised batch by batch. What this
    * pins beyond kdb_time_travel_twin's two-world per-user totals:
    * the snapshot predicate composing with LWW resolve at SLOT
    * granularity across MULTIPLE marks, series discovery varying per
    * snapshot (a user first seen in batch 2 must be absent from s1,
    * dense-zero-filled in s2/s3), and the gap-fill grid being
    * identical in every world. DuckDB reconstructs all three LWW
    * worlds from the raw ledger with the same seq shifts. Scale
    * shape: each snapshot read is one pushed-down seq predicate on
    * the same parquet scan — time travel never replays a log. */
  private val bitemporalTwin = QueryDef(
    "kdb_bitemporal_twin",
    (s, d) => {
      import s.implicits._
      val Shift1 = 1L << 40
      val Shift2 = 1L << 41
      val dir = graft.core.Scratch.dir("graft-btwin")
      val engine = new graft.core.Engine(s,
        graft.core.EngineOptions("btwin", dir, indexDepth = 2, payloadSize = 8,
          bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
        new graft.core.TestClock(T1))
      val base = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < T0 + 2 * Day)
        .select(col("ts_ns"), col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
      def pts(m: Long, shift: Long) = base
        .filter(col("event_id") % 3 === m)
        .as[(Long, String, Double, Long)]
        .map { case (ts, uid, v, id) =>
          graft.core.Point(ts, Seq("purchase", uid),
            graft.plans.DoubleFromPayload.encode(v), id + shift)
        }.toDF()
      engine.put(pts(0, 0L))
      val mark1 = engine.currentSeq()
      engine.put(pts(1, Shift1))
      val mark2 = engine.currentSeq()
      engine.put(pts(2, Shift2))
      def world(label: String, dfr: DataFrame) = dfr
        .select(lit(label).as("snap"), col("tag1").as("user_id"),
          col("slot_ns"),
          round(call_function("double_from_payload", col("payload")) * 100, 0)
            .cast("long").as("cents"))
      world("s1", engine.findAsOf(T0, T0 + 2 * Day, Seq("purchase", ""), mark1))
        .unionAll(world("s2",
          engine.findAsOf(T0, T0 + 2 * Day, Seq("purchase", ""), mark2)))
        .unionAll(world("s3", engine.find(T0, T0 + 2 * Day, Seq("purchase", ""))))
        .orderBy(col("snap"), col("user_id"), col("slot_ns"))
    },
    Some(s"""
      WITH w AS (
        SELECT CAST(user_id AS VARCHAR) AS uid,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               value, event_id % 3 AS b,
               event_id + CASE event_id % 3
                 WHEN 1 THEN ${1L << 40}
                 WHEN 2 THEN ${1L << 41}
                 ELSE 0 END AS seq
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 2 * Day}),
      worlds AS (
        SELECT * FROM (VALUES ('s1', 0), ('s2', 1), ('s3', 2)) v(snap, maxb)),
      lww AS (
        SELECT wd.snap, s.uid, s.slot_ns, arg_max(s.value, s.seq) AS v
        FROM worlds wd JOIN w s ON s.b <= wd.maxb
        GROUP BY 1, 2, 3),
      series AS (SELECT DISTINCT snap, uid FROM lww),
      grid AS (SELECT ${T0} + g.i * ${Hour} AS slot_ns FROM range(0, 48) g(i))
      SELECT se.snap, se.uid AS user_id, gr.slot_ns,
             coalesce(CAST(round(l.v * 100, 0) AS BIGINT), 0) AS cents
      FROM series se
      CROSS JOIN grid gr
      LEFT JOIN lww l ON l.snap = se.snap AND l.uid = se.uid
                     AND l.slot_ns = gr.slot_ns
      ORDER BY se.snap, user_id, gr.slot_ns"""))

  /** MVCC snapshot DIFF, oracle-gated end to end — the data-versioning
    * audit on top of kdb_time_travel_twin's two-world read: which
    * (series, slot) cells changed between the watermark version and
    * now, with before/after values — what a lakehouse surfaces as
    * "diff two table versions" before promoting a dataset. Same
    * two-batch ingest (even event_ids, currentSeq() watermark, odd
    * event_ids seq-shifted above), then the cell-level join of
    * findAsOf(mark) vs find(): a cell is 'added' when its as-of cents
    * are zero (absent series, zero-filled slot — zeros ARE absence in
    * the engine's own read model) and 'updated' otherwise; unchanged
    * cells are filtered, so the output is the diff, not the table.
    * The as-of world is a SUBSET of now (append-only), so one
    * left-outer join suffices. DuckDB reconstructs both worlds at
    * slot granularity (the ttwin LWW CTEs without the user rollup)
    * and needs no dense grid: a cell can only differ where data
    * exists. Scale shape: both reads are one pushed-down-predicate
    * scan each; the diff join keys on (series, slot) — the same
    * partitioning the store is clustered by. */
  private val snapshotDiffTwin = QueryDef(
    "kdb_snapshot_diff_twin",
    (s, d) => {
      import s.implicits._
      val SeqShift = 1L << 40
      val dir = graft.core.Scratch.dir("graft-sdtwin")
      val engine = new graft.core.Engine(s,
        graft.core.EngineOptions("sdtwin", dir, indexDepth = 2, payloadSize = 8,
          bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
        new graft.core.TestClock(T1))
      val base = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < T0 + 3 * Day)
        .select(col("ts_ns"), col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
      def pts(df: DataFrame, shift: Long) = df
        .as[(Long, String, Double, Long)]
        .map { case (ts, uid, v, id) =>
          graft.core.Point(ts, Seq("purchase", uid),
            graft.plans.DoubleFromPayload.encode(v), id + shift)
        }.toDF()
      engine.put(pts(base.filter(col("event_id") % 2 === 0), 0L))
      val mark = engine.currentSeq()
      engine.put(pts(base.filter(col("event_id") % 2 === 1), SeqShift))
      def cells(dfr: DataFrame, out: String) = dfr
        .withColumn("v", call_function("double_from_payload", col("payload")))
        .select(col("tag1").as("user_id"), col("slot_ns"),
          round(col("v") * 100, 0).cast("long").as(out))
      val asof = cells(
        engine.findAsOf(T0, T0 + 3 * Day, Seq("purchase", ""), mark), "asof_cents")
      val now = cells(
        engine.find(T0, T0 + 3 * Day, Seq("purchase", "")), "now_cents")
      now.join(asof, Seq("user_id", "slot_ns"), "left_outer")
        .withColumn("asof_cents", coalesce(col("asof_cents"), lit(0L)))
        .filter(col("now_cents") =!= col("asof_cents"))
        .select(col("user_id"), col("slot_ns"), col("asof_cents"),
          col("now_cents"),
          (col("now_cents") - col("asof_cents")).as("delta_cents"),
          when(col("asof_cents") === 0L, "added").otherwise("updated")
            .as("status"),
          lit(mark).as("snapshot_seq"))
        .orderBy(col("user_id"), col("slot_ns"))
    },
    Some(s"""
      WITH w AS (
        SELECT user_id, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               value, event_id, event_id % 2 AS odd
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 3 * Day}),
      snap AS (
        SELECT CAST(user_id AS VARCHAR) AS user_id, slot_ns,
               CAST(round(arg_max(value, event_id) * 100) AS BIGINT)
                 AS asof_cents
        FROM w WHERE odd = 0 GROUP BY 1, 2),
      cur AS (
        SELECT CAST(user_id AS VARCHAR) AS user_id, slot_ns,
               CAST(round(arg_max(value, event_id +
                 CASE WHEN odd = 1 THEN ${1L << 40} ELSE 0 END) * 100)
                 AS BIGINT) AS now_cents
        FROM w GROUP BY 1, 2),
      mark AS (
        SELECT CAST(max(event_id) AS BIGINT) AS snapshot_seq
        FROM w WHERE odd = 0)
      SELECT c.user_id, c.slot_ns,
             coalesce(a.asof_cents, 0) AS asof_cents, c.now_cents,
             c.now_cents - coalesce(a.asof_cents, 0) AS delta_cents,
             CASE WHEN coalesce(a.asof_cents, 0) = 0 THEN 'added'
                  ELSE 'updated' END AS status,
             snapshot_seq
      FROM cur c
      LEFT JOIN snap a ON a.user_id = c.user_id AND a.slot_ns = c.slot_ns
      CROSS JOIN mark
      WHERE c.now_cents <> coalesce(a.asof_cents, 0)
      ORDER BY c.user_id, c.slot_ns"""))

  /** MVCC ROLLBACK, oracle-gated end to end — time travel promoted
    * from a read view to the RESTORE write verb (Engine.rollbackTo):
    * ingest the even-event_id batch, take the currentSeq() watermark,
    * ingest the odd batch above it, physically roll the store back to
    * the watermark, then RE-INGEST only the event_id % 4 = 1 subset
    * on top — so the final world is evens LWW-overlaid by exactly
    * that subset, which the oracle reconstructs directly. What this
    * pins that kdb_time_travel_twin (read-only as-of) cannot: the
    * rolled-back rows are GONE from the serving path (any surviving
    * odd row with id % 4 = 3 would shift a user total), the store
    * accepts writes after the rewrite, and the reported removed-row
    * count equals the odd batch exactly. Cents discipline on cells,
    * exact-integer user rollups. Scale shape: rollback's candidate
    * scan carries a pushed-down seq predicate (immutable batches
    * have tight seq ranges → row-group skip), survivors republish as
    * one atomic batch, and the final read is one pushed-down find. */
  private val rollbackTwin = QueryDef(
    "kdb_rollback_twin",
    (s, d) => {
      import s.implicits._
      val SeqShift = 1L << 40
      val ReShift = 1L << 41
      val dir = graft.core.Scratch.dir("graft-rbtwin")
      val engine = new graft.core.Engine(s,
        graft.core.EngineOptions("rbtwin", dir, indexDepth = 2, payloadSize = 8,
          bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
        new graft.core.TestClock(T1))
      val base = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < T0 + 3 * Day)
        .select(col("ts_ns"), col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
      def pts(df: DataFrame, shift: Long) = df
        .as[(Long, String, Double, Long)]
        .map { case (ts, uid, v, id) =>
          graft.core.Point(ts, Seq("purchase", uid),
            graft.plans.DoubleFromPayload.encode(v), id + shift)
        }.toDF()
      engine.put(pts(base.filter(col("event_id") % 2 === 0), 0L))
      val mark = engine.currentSeq()
      engine.put(pts(base.filter(col("event_id") % 2 === 1), SeqShift))
      val removed = engine.rollbackTo(mark)
        .values.map { case (b, a) => b - a }.sum
      engine.put(pts(base.filter(col("event_id") % 4 === 1), ReShift))
      engine.find(T0, T0 + 3 * Day, Seq("purchase", ""))
        .withColumn("cents",
          round(call_function("double_from_payload", col("payload")) * 100, 0)
            .cast("long"))
        .groupBy(col("tag1").as("user_id"))
        .agg(count(when(col("cents") =!= 0L, 1)).as("nz_slots"),
          sum(col("cents")).as("total_cents"))
        .select(col("user_id"), col("nz_slots"), col("total_cents"),
          lit(removed).as("rolled_back"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT user_id, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               value, event_id, event_id % 2 AS odd
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 3 * Day}),
      world AS (
        SELECT user_id, slot_ns, arg_max(value, seq) AS v FROM (
          SELECT user_id, slot_ns, value, event_id AS seq
          FROM w WHERE odd = 0
          UNION ALL
          SELECT user_id, slot_ns, value, event_id + ${1L << 41}
          FROM w WHERE event_id % 4 = 1)
        GROUP BY 1, 2),
      cells AS (
        SELECT CAST(user_id AS VARCHAR) AS user_id, slot_ns,
               CAST(round(v * 100) AS BIGINT) AS cents
        FROM world),
      agg AS (
        SELECT user_id,
               count(CASE WHEN cents <> 0 THEN 1 END) AS nz_slots,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM cells GROUP BY 1),
      rb AS (
        SELECT CAST(count(*) AS BIGINT) AS rolled_back FROM w WHERE odd = 1)
      SELECT user_id, nz_slots, total_cents, rolled_back
      FROM agg CROSS JOIN rb
      ORDER BY user_id"""))

  /** One-way ANOVA F across all event types' payload distributions —
    * the parametric complement of kdb_kruskal_wallis (same question,
    * normality assumed, power gained): F = MSB/MSW from per-group
    * (n, Σx, Σx²) moments, η² = SSB/SST as the effect size. ONE
    * map-side-combinable aggregation to k rows, then closed-form
    * algebra — the cheapest shape at any scale, no windows, no
    * ranks. */
  private val anovaF = QueryDef(
    "kdb_anova_f",
    (s, d) => {
      // integer-cent moments: F and eta-sq are scale-invariant, so the
      // cents series gives the SAME statistics from exact int64 sums —
      // bit-identical in both engines (the kdb_lead_lag_corr rule)
      val g = ev(s, d)
        .withColumn("c", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("c")).cast("double").as("sx"),
          sum(col("c") * col("c")).cast("double").as("sxx"))
      val one = g.groupBy().agg(
        sum(col("n")).as("nt"), count(lit(1)).as("k"),
        sum(col("sx")).as("sxt"), sum(col("sxx")).as("sxxt"),
        sum(col("sx") * col("sx") / col("n")).as("sb"))
      val ssb = col("sb") - col("sxt") * col("sxt") / col("nt")
      val sst = col("sxxt") - col("sxt") * col("sxt") / col("nt")
      val ssw = sst - ssb
      one.select(
        col("nt").cast("long").as("n_total"),
        col("k").cast("int").as("k_groups"),
        round((ssb / (col("k") - 1)) / (ssw / (col("nt") - col("k"))), 4)
          .as("f_stat"),
        round(ssb / sst, 4).as("eta_sq"))
    },
    Some("""
      WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        FROM events),
      g AS (
        SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
               CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS sx,
               CAST(CAST(sum(c * c) AS BIGINT) AS DOUBLE) AS sxx
        FROM c GROUP BY 1),
      one AS (
        SELECT sum(n) AS nt, count(*) AS k,
               sum(sx) AS sxt, sum(sxx) AS sxxt,
               sum(sx * sx / n) AS sb
        FROM g)
      SELECT CAST(nt AS BIGINT) AS n_total, CAST(k AS INT) AS k_groups,
             round(((sb - sxt * sxt / nt) / (k - 1)) /
                   ((sxxt - sxt * sxt / nt - (sb - sxt * sxt / nt))
                    / (nt - k)), 4) AS f_stat,
             round((sb - sxt * sxt / nt) /
                   (sxxt - sxt * sxt / nt), 4) AS eta_sq
      FROM one"""))

  /** SQL-doorway twin: ingest the events table through Engine.put,
    * register the LWW-resolved store as a temp view, and answer an
    * AD-HOC spark.sql aggregation over it — gated against DuckDB
    * resolving the same last-writer-wins winners per (series, slot)
    * and aggregating them directly. What this pins that no other
    * query does: the VIEW path (SQL text → Catalyst over the store's
    * resolved relation) serves exactly the engine's read semantics —
    * LWW collapse included — without going through get/find. Cents
    * discipline on the winner values. */
  private val sqlViewTwin = QueryDef(
    "kdb_sql_view_twin",
    (s, d) => {
      import s.implicits._
      val dir = graft.core.Scratch.dir("graft-sqlviewtwin")
      val engine = new graft.core.Engine(s,
        graft.core.EngineOptions("vtwin", dir, indexDepth = 2, payloadSize = 8,
          bucketDuration = Day, resolution = Hour, maxHotBuckets = 40),
        new graft.core.TestClock(T1))
      val pts = ev(s, d)
        .select(col("ts_ns"), col("event_type"),
          col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
        .as[(Long, String, String, Double, Long)]
        .map { case (ts, et, uid, v, id) =>
          graft.core.Point(ts, Seq(et, uid),
            graft.plans.DoubleFromPayload.encode(v), id)
        }
      engine.put(pts.toDF())
      engine.sqlView("graft_sql_view_twin")
      s.sql("""
        SELECT tag0 AS event_type, tag1 AS user_id,
               count(*) AS n_slots,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM graft_sql_view_twin
        GROUP BY tag0, tag1
        ORDER BY event_type, user_id""")
    },
    Some(s"""
      WITH w AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               arg_max(value, event_id) AS value
        FROM events
        GROUP BY 1, 2, 3)
      SELECT event_type, user_id,
             count(*) AS n_slots,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM w
      GROUP BY 1, 2
      ORDER BY event_type, user_id"""))

  /** Maintenance pipeline, oracle-gated end to end: ingest the events
    * table, COMPACT the first three day-buckets (multi-batch dirs →
    * one clustered file set, per-key history collapsed to the LWW
    * winner), then REBUCKET the whole store Day → 2·Day (the layout
    * migration; the old handle's manifest check goes stale by design,
    * so the read reopens with the returned options) — and prove reads
    * are INVARIANT under both rewrites by hash-gating the post-
    * migration per-series rollup against DuckDB's LWW world computed
    * straight from events. Receipts gate the compaction itself: raw
    * rows before vs distinct (series, slot) after, both oracle-
    * computable. RollupSpec/EngineSpec cover crash corners; this pins
    * the happy-path semantics at sf0.01 the way kdb_erase_twin pins
    * erasure. */
  private val maintenanceTwin = QueryDef(
    "kdb_maintenance_twin",
    (s, d) => {
      import s.implicits._
      val dir = graft.core.Scratch.dir("graft-mainttwin")
      val opts0 = graft.core.EngineOptions("mtwin", dir, indexDepth = 2,
        payloadSize = 8, bucketDuration = Day, resolution = Hour,
        maxHotBuckets = 40)
      val clock = new graft.core.TestClock(T1)
      val engine = new graft.core.Engine(s, opts0, clock)
      val pts = ev(s, d)
        .select(col("ts_ns"), col("event_type"),
          col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
        .as[(Long, String, String, Double, Long)]
        .map { case (ts, et, uid, v, id) =>
          graft.core.Point(ts, Seq(et, uid),
            graft.plans.DoubleFromPayload.encode(v), id)
        }
      engine.put(pts.toDF())
      val compacted = (0 until 3).map(i => engine.compactBucket(T0 + i * Day))
      val before = compacted.map(_._1).sum
      val after = compacted.map(_._2).sum
      val newOpts = engine.rebucket(2 * Day)
      val reopened = new graft.core.Engine(s, newOpts, clock)
      reopened.sqlView("graft_maint_twin")
      s.sql("""
        SELECT tag0 AS event_type, tag1 AS user_id,
               count(*) AS n_slots,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM graft_maint_twin
        GROUP BY tag0, tag1""")
        .withColumn("compact_before", lit(before))
        .withColumn("compact_after", lit(after))
        .orderBy(col("event_type"), col("user_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               arg_max(value, event_id) AS value
        FROM events
        GROUP BY 1, 2, 3),
      receipts AS (
        SELECT
          (SELECT count(*) FROM events
           WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 3 * Day})
            AS compact_before,
          (SELECT count(*) FROM (
             SELECT DISTINCT event_type, user_id,
                    epoch_ns(ts) - epoch_ns(ts) % ${Hour}
             FROM events
             WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 3 * Day}))
            AS compact_after)
      SELECT event_type, user_id,
             count(*) AS n_slots,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             compact_before, compact_after
      FROM w CROSS JOIN receipts
      GROUP BY 1, 2, 5, 6
      ORDER BY event_type, user_id"""))

  /** Backup / restore, oracle-gated end to end: ingest the first week
    * in TWO seq blocks, exportSnapshot at the watermark BETWEEN them
    * (a consistent MVCC cut: the snapshot must contain the first
    * block's LWW world and none of the second), importSnapshot into a
    * FRESH engine, and hash-gate the restored engine's per-series
    * rollup — plus three oracle-computable receipts: exported rows
    * (export collapses history, so = distinct (series, slot) of the
    * cut), imported rows (all-or-nothing ⇒ equal), and the restored
    * engine's currentSeq (rows keep their seq ⇒ the cut watermark =
    * max first-block event_id). What this pins beyond the
    * EngineSpec/import specs: export's watermark × LWW composition
    * and seq continuity across a restore, at sf0.01 against DuckDB
    * reconstructing the cut from the raw events. */
  private val backupTwin = QueryDef(
    "kdb_backup_twin",
    (s, d) => {
      import s.implicits._
      val SeqShift = 1L << 40
      val dir = graft.core.Scratch.dir("graft-baktwin")
      val clock = new graft.core.TestClock(T1)
      def mkEngine(sub: String) = new graft.core.Engine(s,
        graft.core.EngineOptions(s"bak$sub", s"$dir/$sub", indexDepth = 2,
          payloadSize = 8, bucketDuration = Day, resolution = Hour,
          maxHotBuckets = 40), clock)
      val a = mkEngine("a")
      val base = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T0 + 7 * Day)
        .select(col("ts_ns"), col("event_type"),
          col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
      def pts(df: DataFrame, shift: Long) = df
        .as[(Long, String, String, Double, Long)]
        .map { case (ts, et, uid, v, id) =>
          graft.core.Point(ts, Seq(et, uid),
            graft.plans.DoubleFromPayload.encode(v), id + shift)
        }.toDF()
      a.put(pts(base.filter(col("event_id") % 2 === 0), 0L))
      val mark = a.currentSeq()
      a.put(pts(base.filter(col("event_id") % 2 === 1), SeqShift))
      val exported = a.exportSnapshot(mark, s"$dir/snap")
      val b = mkEngine("b")
      val imported = b.importSnapshot(s"$dir/snap")
      val restoredSeq = b.currentSeq()
      b.sqlView("graft_backup_twin")
      s.sql("""
        SELECT tag0 AS event_type, tag1 AS user_id,
               count(*) AS n_slots,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM graft_backup_twin
        GROUP BY tag0, tag1""")
        .withColumn("exported_rows", lit(exported))
        .withColumn("imported_rows", lit(imported))
        .withColumn("restored_seq", lit(restoredSeq))
        .orderBy(col("event_type"), col("user_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               value, event_id
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 7 * Day}
          AND event_id % 2 = 0),
      cut AS (
        SELECT event_type, user_id, slot_ns,
               arg_max(value, event_id) AS value
        FROM w GROUP BY 1, 2, 3),
      receipts AS (
        SELECT (SELECT count(*) FROM cut) AS exported_rows,
               (SELECT count(*) FROM cut) AS imported_rows,
               (SELECT CAST(max(event_id) AS BIGINT) FROM w) AS restored_seq)
      SELECT event_type, user_id,
             count(*) AS n_slots,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             exported_rows, imported_rows, restored_seq
      FROM cut CROSS JOIN receipts
      GROUP BY 1, 2, 5, 6, 7
      ORDER BY event_type, user_id"""))

  /** Incremental replication, oracle-gated end to end — the
    * primary → replica sync story a multi-site deployment needs (and
    * the single-node reference never grows, `dbase/dbase.go:24-38`):
    * a primary ingests the week's evens, DELTA-syncs a fresh replica
    * (exportDelta(−∞, w₁] → importSnapshot), then ingests the odds at
    * strictly higher seq and ships ONLY the second delta (w₁, w₂].
    * The replica's LWW world is hash-gated against DuckDB resolving
    * ALL the week's rows by effective seq (odd rows carry
    * seq = id + 2⁴⁰, so an odd write beats every even at its slot) —
    * which pins exactly the replication contract: cross-delta
    * overwrites of a (series, slot) already shipped in delta 1
    * resolve at the replica by the same LWW rule the primary uses,
    * in-range superseded versions never cross the wire (delta 2 rows
    * = distinct odd slots, an oracle receipt), and the replica's
    * currentSeq advances to the primary's watermark w₂ (receipt
    * three). Each delta export is one pushed-down seq-range scan +
    * LWW shuffle; each apply is one atomic batch publish. */
  private val replicationTwin = QueryDef(
    "kdb_replication_twin",
    (s, d) => {
      import s.implicits._
      val SeqShift = 1L << 40
      val dir = graft.core.Scratch.dir("graft-repltwin")
      val clock = new graft.core.TestClock(T1)
      def mkEngine(sub: String) = new graft.core.Engine(s,
        graft.core.EngineOptions(s"repl$sub", s"$dir/$sub", indexDepth = 2,
          payloadSize = 8, bucketDuration = Day, resolution = Hour,
          maxHotBuckets = 40), clock)
      val primary = mkEngine("p")
      val replica = mkEngine("r")
      val base = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T0 + 7 * Day)
        .select(col("ts_ns"), col("event_type"),
          col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
      def pts(df: DataFrame, shift: Long) = df
        .as[(Long, String, String, Double, Long)]
        .map { case (ts, et, uid, v, id) =>
          graft.core.Point(ts, Seq(et, uid),
            graft.plans.DoubleFromPayload.encode(v), id + shift)
        }.toDF()
      primary.put(pts(base.filter(col("event_id") % 2 === 0), 0L))
      val w1 = primary.currentSeq()
      val d1 = primary.exportDelta(Long.MinValue, w1, s"$dir/delta1")
      val a1 = replica.importSnapshot(s"$dir/delta1")
      primary.put(pts(base.filter(col("event_id") % 2 === 1), SeqShift))
      val w2 = primary.currentSeq()
      val d2 = primary.exportDelta(w1, w2, s"$dir/delta2")
      val a2 = replica.importSnapshot(s"$dir/delta2")
      val replicaSeq = replica.currentSeq()
      replica.sqlView("graft_replication_twin")
      s.sql("""
        SELECT tag0 AS event_type, tag1 AS user_id,
               count(*) AS n_slots,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM graft_replication_twin
        GROUP BY tag0, tag1""")
        .withColumn("delta1_rows", lit(d1))
        .withColumn("delta2_rows", lit(d2))
        .withColumn("applied_rows", lit(a1 + a2))
        .withColumn("replica_seq", lit(replicaSeq))
        .orderBy(col("event_type"), col("user_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               value, event_id
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 7 * Day}),
      world AS (
        SELECT event_type, user_id, slot_ns,
               arg_max(value,
                 event_id % 2 * ${1L << 40} + event_id) AS value
        FROM w GROUP BY 1, 2, 3),
      receipts AS (
        SELECT
          (SELECT count(*) FROM (
             SELECT DISTINCT event_type, user_id, slot_ns
             FROM w WHERE event_id % 2 = 0)) AS delta1_rows,
          (SELECT count(*) FROM (
             SELECT DISTINCT event_type, user_id, slot_ns
             FROM w WHERE event_id % 2 = 1)) AS delta2_rows,
          (SELECT CAST(max(event_id % 2 * ${1L << 40} + event_id) AS BIGINT)
           FROM w WHERE event_id % 2 = 1) AS replica_seq)
      SELECT event_type, user_id,
             count(*) AS n_slots,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             delta1_rows, delta2_rows,
             delta1_rows + delta2_rows AS applied_rows, replica_seq
      FROM world CROSS JOIN receipts
      GROUP BY 1, 2, 5, 6, 7, 8
      ORDER BY event_type, user_id"""))

  /** Divergence-detect → full-resync, oracle-gated end to end — the
    * receipt chain's CONSUMER side ([[graft.core.Engine.applyDelta]]:
    * import + verifyReceipt as one verb, so a sync loop cannot apply
    * a delta and skip the check). Cycle 1 behaves like
    * kdb_replication_twin (evens → delta → apply, receipt verifies
    * clean). Then the primary ingests the odds AND ERASES the busiest
    * series — a physical removal no state-based delta can carry — and
    * ships cycle 2. The replica's applyDelta MUST throw (its world
    * still holds the erased series' evens while the primary's receipt
    * was computed post-erase); the twin requires that loudly, records
    * `diverged = 1`, and runs the mandated recovery: full re-sync
    * (exportSnapshot at w₂ → fresh replica → applyDelta verifies
    * clean). The resynced replica's LWW world is hash-gated against
    * DuckDB resolving all week rows MINUS the victim series by
    * effective seq; receipts pin the delta-1 row count, the
    * divergence flag, the resync row count (= post-erase distinct
    * (series, slot)), the verified row count (receipt ⇒ equal), and
    * the resynced currentSeq. Victim selection (max row count, ties
    * by (type, uid) asc) is computed identically by both engines.
    * Scale shape: each export is one pushed-down seq-range scan + LWW
    * shuffle; each apply is one atomic publish + one checksum
    * aggregate — no per-row driver work anywhere. */
  private val resyncTwin = QueryDef(
    "kdb_resync_twin",
    (s, d) => {
      import s.implicits._
      val SeqShift = 1L << 40
      val dir = graft.core.Scratch.dir("graft-resynctwin")
      val clock = new graft.core.TestClock(T1)
      def mkEngine(sub: String) = new graft.core.Engine(s,
        graft.core.EngineOptions(s"rsy$sub", s"$dir/$sub", indexDepth = 2,
          payloadSize = 8, bucketDuration = Day, resolution = Hour,
          maxHotBuckets = 40), clock)
      val primary = mkEngine("p")
      val replica = mkEngine("r")
      val base = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T0 + 7 * Day)
        .select(col("ts_ns"), col("event_type"),
          col("user_id").cast("string").as("uid"),
          col("value"), col("event_id"))
      def pts(df: DataFrame, shift: Long) = df
        .as[(Long, String, String, Double, Long)]
        .map { case (ts, et, uid, v, id) =>
          graft.core.Point(ts, Seq(et, uid),
            graft.plans.DoubleFromPayload.encode(v), id + shift)
        }.toDF()
      primary.put(pts(base.filter(col("event_id") % 2 === 0), 0L))
      val w1 = primary.currentSeq()
      val d1 = primary.exportDelta(Long.MinValue, w1, s"$dir/delta1")
      replica.applyDelta(s"$dir/delta1") // cycle 1: receipt verifies clean
      primary.put(pts(base.filter(col("event_id") % 2 === 1), SeqShift))
      // destructive verb between sync cycles: erase the busiest series
      // (bounded driver read: one row)
      val victim = base.groupBy(col("event_type"), col("uid"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type"), col("uid"))
        .head()
      val (vType, vUid) = (victim.getString(0), victim.getString(1))
      primary.erase(Seq(vType, vUid))
      val w2 = primary.currentSeq()
      primary.exportDelta(w1, w2, s"$dir/delta2")
      val diverged =
        try { replica.applyDelta(s"$dir/delta2"); 0L }
        catch { case _: IllegalStateException => 1L }
      require(diverged == 1L,
        "kdb_resync_twin: post-erase divergence was NOT detected by applyDelta")
      // mandated recovery: full re-sync into a fresh replica
      val resyncRows = primary.exportSnapshot(w2, s"$dir/snap")
      val replica2 = mkEngine("r2")
      val (applied2, verified2, _) = replica2.applyDelta(s"$dir/snap")
      require(applied2 == resyncRows, "resync applied != exported")
      val replicaSeq = replica2.currentSeq()
      replica2.sqlView("graft_resync_twin")
      s.sql("""
        SELECT tag0 AS event_type, tag1 AS user_id,
               count(*) AS n_slots,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM graft_resync_twin
        GROUP BY tag0, tag1""")
        .withColumn("delta1_rows", lit(d1))
        .withColumn("diverged", lit(diverged))
        .withColumn("resync_rows", lit(resyncRows))
        .withColumn("verified_rows", lit(verified2))
        .withColumn("replica_seq", lit(replicaSeq))
        .orderBy(col("event_type"), col("user_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               value, event_id
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 7 * Day}),
      victim AS (
        SELECT event_type, user_id
        FROM w GROUP BY 1, 2
        ORDER BY count(*) DESC, event_type, user_id
        LIMIT 1),
      surv AS (
        SELECT * FROM w
        WHERE NOT EXISTS (SELECT 1 FROM victim v
          WHERE v.event_type = w.event_type AND v.user_id = w.user_id)),
      world AS (
        SELECT event_type, user_id, slot_ns,
               arg_max(value, event_id % 2 * ${1L << 40} + event_id) AS value
        FROM surv GROUP BY 1, 2, 3),
      receipts AS (
        SELECT
          (SELECT count(*) FROM (
             SELECT DISTINCT event_type, user_id, slot_ns
             FROM w WHERE event_id % 2 = 0)) AS delta1_rows,
          CAST(1 AS BIGINT) AS diverged,
          (SELECT count(*) FROM world) AS resync_rows,
          (SELECT count(*) FROM world) AS verified_rows,
          (SELECT CAST(max(event_id % 2 * ${1L << 40} + event_id) AS BIGINT)
           FROM surv) AS replica_seq)
      SELECT event_type, user_id,
             count(*) AS n_slots,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             delta1_rows, diverged, resync_rows, verified_rows, replica_seq
      FROM world CROSS JOIN receipts
      GROUP BY 1, 2, 5, 6, 7, 8, 9
      ORDER BY event_type, user_id"""))

  /** Garman–Klass + Parkinson range-based volatility — the realized-
    * volatility estimators a finance desk computes FROM kdb_ohlc's
    * bars (range-based σ² uses intraday high/low information the
    * close-to-close estimator throws away — ~7× more efficient per
    * Garman–Klass 1980): per (type, day) over the hourly cents
    * series, GK = ½ln(H/L)² − (2ln2−1)ln(C/O)², Parkinson =
    * ln(H/L)²/(4ln2). O/H/L/C are exact integers (arg-min/max and
    * min/max of hourly sums — LWW-style slot selection, no float
    * anywhere in bar construction); each estimator is ONE fixed-order
    * double chain on ratios of those exact ints with binary-identical
    * literal constants, micro-quantized (the psi ln discipline).
    * Degenerate days (a zero open/low, H = L flat bars) are kept out
    * by exact integer predicates, so both engines drop the same rows.
    * Shape: one hourly rollup, one (type, day) bar aggregation,
    * per-row estimator math — two map-side-combinable shuffles. */
  private val garmanKlass = QueryDef(
    "kdb_garman_klass",
    (s, d) => {
      val h = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"),
          expr(s"ts_ns div ${Day}L").as("day"), col("slot_ns"))
        .agg(sum(col("cents")).as("x"))
      val bars = h.groupBy(col("event_type"), col("day"))
        .agg(min_by(col("x"), col("slot_ns")).as("o"),
          max(col("x")).as("hi"), min(col("x")).as("lo"),
          max_by(col("x"), col("slot_ns")).as("c"),
          count(lit(1)).as("n_hours"))
        .filter(col("lo") > 0 && col("o") > 0 && col("hi") > col("lo"))
      val lnHL = log(col("hi").cast("double") / col("lo"))
      val lnCO = log(col("c").cast("double") / col("o"))
      bars.select(col("event_type"), col("day"), col("o"), col("hi"),
          col("lo"), col("c"), col("n_hours"),
          round((lit(0.5) * lnHL * lnHL -
            lit(0.3862943611198906) * lnCO * lnCO) * 1000000, 0)
            .cast("long").as("gk_micro"),
          round(lnHL * lnHL / lit(2.772588722239781) * 1000000, 0)
            .cast("long").as("park_micro"))
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type, epoch_ns(ts) // ${Day} AS day,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2, 3),
      bars AS (
        SELECT event_type, day,
               arg_min(x, slot_ns) AS o, max(x) AS hi,
               min(x) AS lo, arg_max(x, slot_ns) AS c,
               count(*) AS n_hours
        FROM h GROUP BY 1, 2),
      kept AS (SELECT * FROM bars WHERE lo > 0 AND o > 0 AND hi > lo)
      SELECT event_type, day, o, hi, lo, c, n_hours,
             CAST(round((0.5 * ln(CAST(hi AS DOUBLE) / lo) *
                         ln(CAST(hi AS DOUBLE) / lo) -
               0.3862943611198906 * ln(CAST(c AS DOUBLE) / o) *
                 ln(CAST(c AS DOUBLE) / o)) * 1000000, 0) AS BIGINT)
               AS gk_micro,
             CAST(round(ln(CAST(hi AS DOUBLE) / lo) *
                 ln(CAST(hi AS DOUBLE) / lo) / 2.772588722239781
                 * 1000000, 0) AS BIGINT) AS park_micro
      FROM kept
      ORDER BY event_type, day"""))

  /** Statistical process control with Western Electric runs rules —
    * the SPC chart a monitoring consumer layers on kdb_zscore_anomaly's
    * single-point view (runs rules catch small sustained shifts a 3σ
    * test misses): per event type over its present hourly cents,
    * rule 1 = point beyond 3σ, rule 2 = 2 of 3 consecutive beyond 2σ
    * on the SAME side, rule 8 = 8 consecutive on one side of center.
    * EVERY limit decision is exact integer cross-multiplication — with
    * S = Σx, Q = Σx², n per type: |x−μ| > kσ ⇔ (xn−S)² > k²(nQ−S²).
    * Q, S², dev² and varn accumulate in Spark decimal(38,0) ≡ DuckDB
    * HUGEINT (the kdb_skew_kurtosis Σc⁴ discipline) so the decisions
    * survive ≥100× the sf0.1 cents·slots volume without wrap
    * (headroom: dev² ≈ (n·x)² ≈ 5·10²⁷ at 100× still fits 38 digits);
    * no float ever enters a branch and the flagged set cannot drift
    * between engines; reported sigma bands are display-only 4dp
    * doubles of the same exact ints. Shape: one
    * hourly rollup, the (S, Q, n) moments broadcast back EQUI on type,
    * one type-partitioned window pass for the lagged/rolling run
    * counts, output only the firing slots. */
  private val controlRules = QueryDef(
    "kdb_control_rules",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(sum(col("cents")).as("x"))
      val m = h.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("q"))
      val dev = col("x") * col("n") - col("sx")       // n·(x−μ), exact int64
      val dev2 = dev.cast("decimal(38,0)") * dev      // 128-bit, no wrap
      val varn = col("n") * col("q") -
        col("sx").cast("decimal(38,0)") * col("sx")   // n²σ², exact 128-bit
      val w = Window.partitionBy(col("event_type")).orderBy(col("slot_ns"))
      val w3 = w.rowsBetween(-2, 0)
      val w8 = w.rowsBetween(-7, 0)
      h.join(m, "event_type")
        .withColumn("r1", (dev2 > lit(9L) * varn).cast("int"))
        .withColumn("hi2", (dev > 0 && dev2 > lit(4L) * varn).cast("int"))
        .withColumn("lo2", (dev < 0 && dev2 > lit(4L) * varn).cast("int"))
        .withColumn("side_hi", (dev > 0).cast("int"))
        .withColumn("side_lo", (dev < 0).cast("int"))
        .withColumn("r2",
          (sum(col("hi2")).over(w3) >= 2 || sum(col("lo2")).over(w3) >= 2)
            .cast("int"))
        .withColumn("r8",
          (sum(col("side_hi")).over(w8) === 8 || sum(col("side_lo")).over(w8) === 8)
            .cast("int"))
        .filter(col("r1") === 1 || col("r2") === 1 || col("r8") === 1)
        .select(col("event_type"), col("slot_ns"), col("x").as("cents"),
          col("r1"), col("r2"), col("r8"),
          (round(col("sx").cast("double") / col("n"), 4) + lit(0.0)).as("center"),
          (round(sqrt(SharedExprs.hugeToDouble(varn)) / col("n"), 4) +
            lit(0.0)).as("sigma"))
        .orderBy(col("event_type"), col("slot_ns"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      m AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               sum(CAST(x AS HUGEINT) * x) AS q
        FROM h GROUP BY 1),
      f AS (
        SELECT h.event_type, h.slot_ns, h.x, m.n, m.sx, m.q,
               h.x * m.n - m.sx AS dev,
               CAST(h.x * m.n - m.sx AS HUGEINT) *
                 (h.x * m.n - m.sx) AS dev2,
               m.n * m.q - CAST(m.sx AS HUGEINT) * m.sx AS varn
        FROM h JOIN m USING (event_type)),
      flags AS (
        SELECT event_type, slot_ns, x, n, sx, varn,
               CASE WHEN dev2 > 9 * varn THEN 1 ELSE 0 END AS r1,
               CASE WHEN dev > 0 AND dev2 > 4 * varn
                    THEN 1 ELSE 0 END AS hi2,
               CASE WHEN dev < 0 AND dev2 > 4 * varn
                    THEN 1 ELSE 0 END AS lo2,
               CASE WHEN dev > 0 THEN 1 ELSE 0 END AS side_hi,
               CASE WHEN dev < 0 THEN 1 ELSE 0 END AS side_lo
        FROM f),
      runs AS (
        SELECT event_type, slot_ns, x, n, sx, varn, r1,
               CASE WHEN sum(hi2) OVER w3 >= 2 OR sum(lo2) OVER w3 >= 2
                    THEN 1 ELSE 0 END AS r2,
               CASE WHEN sum(side_hi) OVER w8 = 8 OR sum(side_lo) OVER w8 = 8
                    THEN 1 ELSE 0 END AS r8
        FROM flags
        WINDOW w3 AS (PARTITION BY event_type ORDER BY slot_ns
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               w8 AS (PARTITION BY event_type ORDER BY slot_ns
                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
      SELECT event_type, slot_ns, x AS cents, r1, r2, r8,
             round(CAST(sx AS DOUBLE) / n, 4) + 0.0 AS center,
             round(sqrt(${SharedExprs.hugeToDoubleDuck("varn")}) / n, 4)
               + 0.0 AS sigma
      FROM runs
      WHERE r1 = 1 OR r2 = 1 OR r8 = 1
      ORDER BY event_type, slot_ns"""))

  /** Business-calendar rollup with the settlement-date convention —
    * the trading-calendar operator a finance consumer expects from a
    * kdb-style store (daily marks exist only on business days;
    * weekend activity SETTLES on the next Monday, it doesn't
    * disappear and doesn't form phantom weekend rows): purchase cents
    * roll up to EFFECTIVE business days (Sat → +2, Sun → +1), each
    * row carries how many calendar days folded in (3 on a Monday)
    * and the business-day-over-business-day return. Every piece is
    * integer arithmetic on epoch days — dow = (day+3) mod 7 with
    * Monday = 0 (1970-01-01 was a Thursday), so NO date/timezone
    * functions exist on either side to disagree, and return_ppm =
    * ((cur−prev)·10⁶) div prev is an exact integer. Shape: one
    * data-sized rollup to ≤22 business days, then a bounded lag
    * window — the kdb_downsample cost with calendar semantics. */
  private val businessRollup = QueryDef(
    "kdb_business_rollup",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < T0 + 28 * Day)
        .withColumn("day", expr(s"ts_ns div ${Day}L"))
        .withColumn("dow", expr("(day + 3) % 7"))
        .withColumn("eff_day", expr(
          "day + CASE WHEN (day + 3) % 7 = 5 THEN 2 " +
            "WHEN (day + 3) % 7 = 6 THEN 1 ELSE 0 END"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val w = Window.orderBy(col("eff_day")) // ≤22-row business-day frame
      e.groupBy(col("eff_day"))
        .agg(countDistinct(col("day")).as("n_days_folded"),
          count(lit(1)).as("n_events"),
          sum(col("cents")).as("cents_sum"))
        .withColumn("prev", lag(col("cents_sum"), 1).over(w))
        .select(col("eff_day"), expr("(eff_day + 3) % 7").as("dow"),
          col("n_days_folded"), col("n_events"), col("cents_sum"),
          when(col("prev").isNotNull && col("prev") > 0,
            expr("((cents_sum - prev) * 1000000L) div prev"))
            .as("return_ppm"))
        .orderBy(col("eff_day"))
    },
    Some(s"""
      WITH e AS (
        SELECT epoch_ns(ts) // ${Day} AS day,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 28 * Day}),
      eff AS (
        SELECT day,
               day + CASE WHEN (day + 3) % 7 = 5 THEN 2
                          WHEN (day + 3) % 7 = 6 THEN 1 ELSE 0 END
                 AS eff_day,
               cents
        FROM e),
      roll AS (
        SELECT eff_day,
               count(DISTINCT day) AS n_days_folded,
               count(*) AS n_events,
               CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM eff GROUP BY 1),
      lagd AS (
        SELECT eff_day, n_days_folded, n_events, cents_sum,
               lag(cents_sum) OVER (ORDER BY eff_day) AS prev
        FROM roll)
      SELECT eff_day, (eff_day + 3) % 7 AS dow,
             n_days_folded, n_events, cents_sum,
             CASE WHEN prev IS NOT NULL AND prev > 0
                  THEN ((cents_sum - prev) * 1000000) // prev END
               AS return_ppm
      FROM lagd ORDER BY eff_day"""))

  /** Haar wavelet multi-resolution energy — at WHICH timescale does
    * the purchase series vary? (2 h pair noise vs daily cycle vs
    * multi-day regime shifts — the multi-scale complement of
    * kdb_periodogram's fixed candidate periods and kdb_seasonality's
    * single daily profile.) 512 hourly slots, unnormalized Haar
    * detail d_ℓ(i) = block-sum difference at level ℓ ∈ 1..9; the
    * orthonormal-basis energy E_ℓ = Σd²/2^ℓ enters the cross-level
    * comparison as the EXACT integer Σd²·2^(9−ℓ), so the total, the
    * shares' numerators/denominator, and the dominant-level argmax
    * are all integer arithmetic (the one IEEE op is the final share
    * division of two exact ints, 4dp-rounded identically). The
    * classic pyramid is a ⌈log₂ n⌉-step loop; here ALL levels fold in
    * ONE aggregation — each slot carries a ±1 sign per level
    * ((t div 2^(ℓ−1)) mod 2) and blocks are t div 2^ℓ — because
    * zero slots contribute nothing, which also kills the dense-grid
    * join: absent hours ARE zeros. Shape: one data-sized hourly
    * rollup (≤512 rows), a ×9 level explode on that bounded table,
    * one (level, block) aggregation, and a 1-row total broadcast
    * (at int64 scale limits: Σd² wraps only past ~10⁹ cents/hour —
    * widen to decimal(38,0)/HUGEINT at that volume). */
  private val haarEnergy = QueryDef(
    "kdb_haar_energy",
    (s, d) => {
      val e = ev(s, d)
        .filter(col("event_type") === "purchase" &&
          col("ts_ns") >= T0 && col("ts_ns") < T0 + 512 * Hour)
        .withColumn("t", expr(s"(ts_ns - ${T0}L) div ${Hour}L"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val slots = e.groupBy(col("t")).agg(sum(col("cents")).as("v"))
      val dd = slots
        .select(col("t"), col("v"),
          explode(array((1 to 9).map(lit): _*)).as("level"))
        .withColumn("block", expr("t div shiftleft(1L, level)"))
        .withColumn("sgn",
          when(expr("(t div shiftleft(1L, level - 1)) % 2") === 0, 1L)
            .otherwise(-1L))
        .groupBy(col("level"), col("block"))
        .agg(sum(col("v") * col("sgn")).as("dcoef"))
      val en = dd.groupBy(col("level"))
        .agg(sum(col("dcoef") * col("dcoef")).as("sumsq"))
        .withColumn("scaled", expr("sumsq * shiftleft(1L, 9 - level)"))
      val tot = en.agg(sum(col("scaled")).as("total"), max(col("scaled")).as("mx"))
      en.crossJoin(broadcast(tot))
        .select(col("level").cast("long").as("level"),
          expr("512 div shiftleft(1L, level)").cast("long").as("n_coeffs"),
          col("sumsq"),
          (round(col("scaled").cast("double") / col("total").cast("double"), 4)
            + lit(0.0)).as("energy_share"),
          (col("scaled") === col("mx")).cast("int").as("dominant"))
        .orderBy(col("level"))
    },
    Some(s"""
      WITH slots AS (
        SELECT (epoch_ns(ts) - ${T0}) // ${Hour} AS t,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T0 + 512 * Hour}
        GROUP BY 1),
      lv AS (SELECT unnest(generate_series(1, 9)) AS level),
      dd AS (
        SELECT level, t // (CAST(1 AS BIGINT) << level) AS block,
               CAST(sum(v * CASE WHEN (t // (CAST(1 AS BIGINT) << (level - 1))) % 2 = 0
                 THEN 1 ELSE -1 END) AS BIGINT) AS dcoef
        FROM slots CROSS JOIN lv
        GROUP BY 1, 2),
      en AS (
        SELECT level, CAST(sum(dcoef * dcoef) AS BIGINT) AS sumsq,
               CAST(sum(dcoef * dcoef) AS BIGINT) *
                 (CAST(1 AS BIGINT) << (9 - level)) AS scaled
        FROM dd GROUP BY 1),
      tot AS (
        SELECT CAST(sum(scaled) AS BIGINT) AS total, max(scaled) AS mx
        FROM en)
      SELECT CAST(level AS BIGINT) AS level,
             CAST(512 // (CAST(1 AS BIGINT) << level) AS BIGINT) AS n_coeffs,
             sumsq,
             round(CAST(scaled AS DOUBLE) / CAST(total AS DOUBLE), 4) + 0.0
               AS energy_share,
             CASE WHEN scaled = mx THEN 1 ELSE 0 END AS dominant
      FROM en CROSS JOIN tot ORDER BY level"""))

  /** Bollinger bands (24-hour, k=2) per event_type over the hourly
    * integer-cent sums: mean ± 2σ of the trailing 24 present hours,
    * with band-breakout flags — the volatility-envelope monitor
    * pairing kdb_rsi's momentum view. Exactness: the frame carries
    * only exact int64 Σx / Σx² / n; variance is the algebraic
    * (n·Σx² − Σx²ᵖᵃⁱʳ)/n² from those ints, sqrt is IEEE
    * correctly-rounded (not libm-approximated), and both engines
    * evaluate the identical mean ± 2.0·σ chain — so the breakout
    * DECISION compares bit-identical doubles and cannot drift; only
    * the REPORTED band edges are 4dp-rounded. Full-frame gate
    * (nf = 24) keeps early unstable bands out. Scale shape: one
    * data-sized hourly aggregation, then ONE type-partitioned window
    * pass sharing Σ/Σ²/count over grouped (~720-row/type) data. */
  private val bollinger = QueryDef(
    "kdb_bollinger",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wF = Window.partitionBy(col("event_type")).orderBy(col("slot_1h"))
        .rowsBetween(-23, 0)
      ev(s, d)
        .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), col("slot_1h"))
        .agg(sum(col("cents")).as("v"))
        .withColumn("sx", sum(col("v")).over(wF))
        .withColumn("sxx", sum(col("v") * col("v")).over(wF))
        .withColumn("nf", count(lit(1)).over(wF))
        .filter(col("nf") === 24)
        .withColumn("mean", col("sx").cast("double") / col("nf"))
        .withColumn("sigma", sqrt(
          (col("nf") * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("nf") * col("nf"))))
        .withColumn("upper", col("mean") + lit(2.0) * col("sigma"))
        .withColumn("lower", col("mean") - lit(2.0) * col("sigma"))
        .select(col("event_type"), col("slot_1h"),
          (col("v") / 100.0).as("value"),
          (round(col("upper") / 100.0, 4) + lit(0.0)).as("upper_band"),
          (round(col("lower") / 100.0, 4) + lit(0.0)).as("lower_band"),
          (col("v").cast("double") > col("upper")).cast("int").as("break_up"),
          (col("v").cast("double") < col("lower")).cast("int").as("break_dn"))
        .orderBy(col("event_type"), col("slot_1h"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
      f AS (
        SELECT event_type, slot_1h, v,
               CAST(sum(v) OVER w AS BIGINT) AS sx,
               CAST(sum(v * v) OVER w AS BIGINT) AS sxx,
               count(*) OVER w AS nf
        FROM h
        WINDOW w AS (PARTITION BY event_type ORDER BY slot_1h
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
      b AS (
        SELECT event_type, slot_1h, v,
               CAST(sx AS DOUBLE) / nf AS mean,
               sqrt(CAST(nf * sxx - sx * sx AS DOUBLE) / (nf * nf)) AS sigma
        FROM f WHERE nf = 24)
      SELECT event_type, slot_1h,
             v / 100.0 AS value,
             round((mean + 2.0 * sigma) / 100.0, 4) + 0.0 AS upper_band,
             round((mean - 2.0 * sigma) / 100.0, 4) + 0.0 AS lower_band,
             CASE WHEN CAST(v AS DOUBLE) > mean + 2.0 * sigma
                  THEN 1 ELSE 0 END AS break_up,
             CASE WHEN CAST(v AS DOUBLE) < mean - 2.0 * sigma
                  THEN 1 ELSE 0 END AS break_dn
      FROM b
      ORDER BY event_type, slot_1h"""))

  /** Filter-by-group-aggregate — q's `fby` verb shape ("rows above
    * their own group's average"): keep events whose value exceeds the
    * mean of their (user, type) series, then roll the survivors up
    * per type. The group mean never materializes as a double: the
    * predicate is the exact integer cross-multiplication
    * cents·n > Σcents, so membership can't drift at the boundary.
    * Scale shape: ONE (user,type) shuffle feeds a whole-partition
    * window (Σ, n shared), then a tiny per-type rollup; no join —
    * the window form of the correlated-subquery pattern
    * q_corr_subquery pays a join for. */
  private val fbyFilter = QueryDef(
    "kdb_fby_filter",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wg = Window.partitionBy(col("user_id"), col("event_type"))
      ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .withColumn("gsum", sum(col("cents")).over(wg))
        .withColumn("gn", count(lit(1)).over(wg))
        .withColumn("above", (col("cents") * col("gn") > col("gsum")).cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("above") === 1, lit(1))).as("n_above"),
          (round(sum(when(col("above") === 1, col("cents"))
            .otherwise(lit(0L))).cast("double") / 100.0, 2) + lit(0.0))
            .as("above_value_sum"),
          round(count(when(col("above") === 1, lit(1))).cast("double") /
            count(lit(1)), 4).as("above_ratio"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      g AS (
        SELECT event_type, cents,
               CAST(sum(cents) OVER (PARTITION BY user_id, event_type)
                 AS BIGINT) AS gsum,
               count(*) OVER (PARTITION BY user_id, event_type) AS gn
        FROM e),
      f AS (
        SELECT event_type, cents,
               CASE WHEN cents * gn > gsum THEN 1 ELSE 0 END AS above
        FROM g)
      SELECT event_type,
             count(*) AS n_total,
             count(CASE WHEN above = 1 THEN 1 END) AS n_above,
             round(CAST(CAST(sum(CASE WHEN above = 1 THEN cents ELSE 0 END)
               AS BIGINT) AS DOUBLE) / 100.0, 2) + 0.0 AS above_value_sum,
             round(CAST(count(CASE WHEN above = 1 THEN 1 END) AS DOUBLE)
               / count(*), 4) AS above_ratio
      FROM f
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Spearman rank correlation for every event-type pair over their
    * common hourly grid — the monotone-association complement of the
    * Pearson queries (kdb_series_corr / kdb_corr_matrix), robust to
    * the outliers that dominate a product-moment estimate. Ranks are
    * assigned AFTER the pair join (within the common-hour sample,
    * as the statistic requires) by row_number with the deterministic
    * (value, slot) tie-break — both engines produce identical integer
    * ranks, so Σd² is exact int64 and ρ = 1 − 6Σd²/(n(n²−1)) is ONE
    * double division chain; pairs with n < 2 report NULL explicitly.
    * Scale shape: one hourly aggregation, a slot-equi self-join of
    * the tiny hourly table, and per-pair windows over the
    * |pairs| × |hours| grid — window input is grouped data, never
    * raw rows. */
  private val spearman = QueryDef(
    "kdb_spearman",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = ev(s, d)
        .withColumn("slot_1h", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), col("slot_1h"))
        .agg(sum(col("cents")).as("v"))
      val a = h.select(col("event_type").as("t1"), col("slot_1h").as("s1"),
        col("v").as("v1"))
      val b = h.select(col("event_type").as("t2"), col("slot_1h").as("s2"),
        col("v").as("v2"))
      val w1 = Window.partitionBy(col("t1"), col("t2"))
        .orderBy(col("v1"), col("s1"))
      val w2 = Window.partitionBy(col("t1"), col("t2"))
        .orderBy(col("v2"), col("s1"))
      a.join(b, col("s1") === col("s2") && col("t1") < col("t2"))
        .withColumn("r1", row_number().over(w1))
        .withColumn("r2", row_number().over(w2))
        .withColumn("d", (col("r1") - col("r2")).cast("long"))
        .groupBy(col("t1"), col("t2"))
        .agg(count(lit(1)).as("n_hours"), sum(col("d") * col("d")).as("sd2"))
        .withColumn("rho",
          when(col("n_hours") < 2, lit(null).cast("double"))
            .otherwise(round(lit(1.0) -
              lit(6.0) * col("sd2").cast("double") /
                (col("n_hours") * (col("n_hours") * col("n_hours") - lit(1L))),
              4) + lit(0.0)))
        .select(col("t1"), col("t2"), col("n_hours"), col("sd2"), col("rho"))
        .orderBy(col("t1"), col("t2"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_1h,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT a.event_type AS t1, b.event_type AS t2, a.slot_1h AS s1,
               a.v AS v1, b.v AS v2
        FROM h a JOIN h b ON a.slot_1h = b.slot_1h
                         AND a.event_type < b.event_type),
      r AS (
        SELECT t1, t2,
               row_number() OVER (PARTITION BY t1, t2 ORDER BY v1, s1) AS r1,
               row_number() OVER (PARTITION BY t1, t2 ORDER BY v2, s1) AS r2
        FROM p),
      agg AS (
        SELECT t1, t2, count(*) AS n_hours,
               CAST(sum(CAST(r1 - r2 AS BIGINT) * CAST(r1 - r2 AS BIGINT))
                 AS BIGINT) AS sd2
        FROM r GROUP BY 1, 2)
      SELECT t1, t2, n_hours, sd2,
             CASE WHEN n_hours < 2 THEN NULL
                  ELSE round(1.0 - 6.0 * CAST(sd2 AS DOUBLE) /
                       (n_hours * (n_hours * n_hours - 1)), 4) + 0.0
             END AS rho
      FROM agg
      ORDER BY t1, t2"""))

  /** Kaplan–Meier survival curve for signup → first purchase — the
    * time-to-event estimator behind churn/conversion-lag analysis
    * (the censoring-aware statistic a naive "average days to
    * purchase" gets wrong). Per user: first signup in the window,
    * first purchase at-or-after it; non-converters are right-censored
    * at the window end. S(t) = Π over event days ≤ t of
    * (n_risk − d)/n_risk. Cross-engine exactness: d/c/n_risk are all
    * exact int64 (n_risk via total-minus-cumulative-exits windows);
    * each factor is ONE double division of exact ints; the running
    * product is a fixed ascending-day fold (Spark aggregate-HOF over
    * the sort_array'd factor list ↔ DuckDB list_reduce over
    * list(ORDER BY) — multiplication is IEEE-exact per step, so the
    * fold is bit-identical; llm_similarity_topk fold precedent).
    * Scale shape: two per-user rollups on the user shuffle, then
    * everything — cumulative windows, the ≤|window-days| × ≤|days|
    * factor join (broadcast NLJ, grid-bounded), the fold — runs on
    * the day table, which is bounded by the 30-day range, never by
    * |users| (kdb_rfm bounded-input precedent for the partition-less
    * windows). */
  private val survivalKm = QueryDef(
    "kdb_survival_km",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
      val su = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as("s_ns"))
      val pu = e.filter(col("event_type") === "purchase")
        .join(su, "user_id")
        .filter(col("ts_ns") >= col("s_ns"))
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as("p_ns"))
      val days = su.join(pu, Seq("user_id"), "left")
        .withColumn("dur_day",
          when(col("p_ns").isNotNull, expr(s"(p_ns - s_ns) div ${Day}"))
            .otherwise(expr(s"(${T1} - 1 - s_ns) div ${Day}")))
        .withColumn("evt", col("p_ns").isNotNull.cast("int"))
        .groupBy(col("dur_day"))
        .agg(count(when(col("evt") === 1, lit(1))).as("d"),
          count(when(col("evt") === 0, lit(1))).as("c"))
      val wAll = Window.orderBy(col("dur_day"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wCum = Window.orderBy(col("dur_day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val evd = days
        .withColumn("n_risk", sum(col("d") + col("c")).over(wAll) -
          coalesce(sum(col("d") + col("c")).over(wCum), lit(0L)))
        .filter(col("d") > 0)
        .withColumn("factor",
          (col("n_risk") - col("d")).cast("double") / col("n_risk"))
      val lhs = evd.select(col("dur_day").as("t"), col("d"), col("c"),
        col("n_risk"))
      val rhs = evd.select(col("dur_day").as("sd"), col("factor"))
      lhs.join(rhs, col("sd") <= col("t"))
        .groupBy(col("t"), col("d"), col("c"), col("n_risk"))
        .agg(aggregate(
          transform(sort_array(collect_list(struct(col("sd"), col("factor")))),
            x => x.getField("factor")),
          lit(1.0), (acc, v) => acc * v).as("surv"))
        .select(col("t").as("dur_day"), col("n_risk"),
          col("d").as("d_events"), col("c").as("n_censored"),
          (round(col("surv"), 4) + lit(0.0)).as("survival"))
        .orderBy(col("dur_day"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      su AS (
        SELECT user_id, min(ts_ns) AS s_ns FROM e
        WHERE event_type = 'signup' GROUP BY 1),
      pu AS (
        SELECT e.user_id, min(e.ts_ns) AS p_ns
        FROM e JOIN su ON e.user_id = su.user_id
        WHERE e.event_type = 'purchase' AND e.ts_ns >= su.s_ns
        GROUP BY 1),
      dur AS (
        SELECT su.user_id,
               CASE WHEN p_ns IS NOT NULL THEN (p_ns - s_ns) // ${Day}
                    ELSE (${T1} - 1 - s_ns) // ${Day} END AS dur_day,
               CASE WHEN p_ns IS NOT NULL THEN 1 ELSE 0 END AS evt
        FROM su LEFT JOIN pu ON su.user_id = pu.user_id),
      days AS (
        SELECT dur_day,
               count(CASE WHEN evt = 1 THEN 1 END) AS d,
               count(CASE WHEN evt = 0 THEN 1 END) AS c
        FROM dur GROUP BY 1),
      evd AS (
        SELECT dur_day, d, c, n_risk,
               CAST(n_risk - d AS DOUBLE) / n_risk AS factor
        FROM (
          SELECT dur_day, d, c,
                 CAST(sum(d + c) OVER () AS BIGINT)
                   - coalesce(CAST(sum(d + c) OVER (ORDER BY dur_day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS BIGINT), 0) AS n_risk
          FROM days)
        WHERE d > 0),
      surv AS (
        SELECT a.dur_day, a.d, a.c, a.n_risk,
               list_reduce([1.0] || list(b.factor ORDER BY b.dur_day),
                 (x, y) -> x * y) AS sv
        FROM evd a JOIN evd b ON b.dur_day <= a.dur_day
        GROUP BY 1, 2, 3, 4)
      SELECT dur_day, n_risk, d AS d_events, c AS n_censored,
             round(sv, 4) + 0.0 AS survival
      FROM surv ORDER BY dur_day"""))

  /** Partial autocorrelation (PACF) at lags 1..3 per series, via
    * Durbin–Levinson on the autocovariance ratios — the AR-order
    * diagnostic that completes [[acf]]: ACF says "correlated at lag
    * k", PACF says "correlated at lag k AFTER removing lags < k"
    * (an AR(1) series has ACF at every lag but PACF only at lag 1).
    * Exact-integer discipline one step further than acf: the centered
    * autocovariances are cleared of the rational mean by multiplying
    * through by n² — n²·S_k = n²·Σvₜvₜ₊ₖ − n·T·(Hₖ+Tₖ) + (n−k)·T²
    * is exact integer algebra in both engines, with the product
    * terms in decimal(38,0) ≡ HUGEINT (n²·Σv² grazes int64 max
    * already at ~10⁵ events/hour; 128-bit gives ≥100× headroom past
    * the sf0.1 volume), so ρ₁..ρ₃ are bit-identical
    * doubles and the Durbin–Levinson recursion (fixed closed-form
    * algebra, three levels) cannot diverge between engines. The
    * data-sized work is ONE hourly rollup; the lagged self-join runs
    * on the (types × 720-slot) grid. */
  /** Hourly-grid slot count over [T0, T1) — 720; shared by the pacf/
    * periodogram oracles (the SQL strings are built outside the
    * query lambdas). */
  private val GridN: Long = (T1 - T0) / Hour

  private val pacf = QueryDef(
    "kdb_pacf",
    (s, d) => {
      val n = GridN // 720 — fixed by the time range
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(count(lit(1)).as("nv"))
      val types = counts.select(col("event_type")).distinct()
      val grid = s.range(n).select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val dense = types.crossJoin(broadcast(grid))
        .join(counts, Seq("event_type", "slot_ns"), "left_outer")
        .select(col("event_type"), col("slot_ns"),
          coalesce(col("nv"), lit(0L)).as("v"))
      val base = dense
        .select(col("event_type"), col("slot_ns"), col("v").as("x"),
          explode(sequence(lit(0L), lit(3L))).as("lag"))
        .filter(col("slot_ns") < lit(T1) - col("lag") * Hour)
      val lagged = dense.select(col("event_type").as("y_type"),
        col("slot_ns").as("y_slot"), col("v").as("y"))
      val moms = base.join(lagged,
          col("event_type") === col("y_type") &&
            col("y_slot") === col("slot_ns") + col("lag") * Hour)
        .groupBy(col("event_type"), col("lag"))
        .agg(sum(col("x").cast("decimal(38,0)") * col("y")).as("a"),
          sum(col("x")).as("hx"), sum(col("y")).as("ty"))
      def pick(k: Int, c: String) = max(when(col("lag") === k, col(c)))
      val wide = moms.groupBy(col("event_type")).agg(
        pick(0, "a").as("a0"), pick(0, "hx").as("t"),
        pick(1, "a").as("a1"), pick(1, "hx").as("h1"), pick(1, "ty").as("t1"),
        pick(2, "a").as("a2"), pick(2, "hx").as("h2"), pick(2, "ty").as("t2"),
        pick(3, "a").as("a3"), pick(3, "hx").as("h3"), pick(3, "ty").as("t3"))
      def sK(a: Column, h: Column, t: Column, k: Int): Column =
        lit(n * n) * a - lit(n) * col("t").cast("decimal(38,0)") * (h + t) +
          lit(n - k) * col("t").cast("decimal(38,0)") * col("t")
      val withS = wide
        .withColumn("s0", sK(col("a0"), col("t"), col("t"), 0))
        .withColumn("s1", sK(col("a1"), col("h1"), col("t1"), 1))
        .withColumn("s2", sK(col("a2"), col("h2"), col("t2"), 2))
        .withColumn("s3", sK(col("a3"), col("h3"), col("t3"), 3))
        .withColumn("s0d", SharedExprs.hugeToDouble(col("s0")))
        .withColumn("r1", SharedExprs.hugeToDouble(col("s1")) / col("s0d"))
        .withColumn("r2", SharedExprs.hugeToDouble(col("s2")) / col("s0d"))
        .withColumn("r3", SharedExprs.hugeToDouble(col("s3")) / col("s0d"))
        // Durbin–Levinson, levels 1..3
        .withColumn("p11", col("r1"))
        .withColumn("p22",
          (col("r2") - col("r1") * col("r1")) / (lit(1.0) - col("r1") * col("r1")))
        .withColumn("p21", col("r1") * (lit(1.0) - col("p22")))
        .withColumn("p33",
          (col("r3") - col("p21") * col("r2") - col("p22") * col("r1")) /
            (lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2")))
      withS.select(col("event_type"),
          (round(col("r1"), 4) + lit(0.0)).as("rho1"),
          (round(col("r2"), 4) + lit(0.0)).as("rho2"),
          (round(col("r3"), 4) + lit(0.0)).as("rho3"),
          (round(col("p11"), 4) + lit(0.0)).as("pacf1"),
          (round(col("p22"), 4) + lit(0.0)).as("pacf2"),
          (round(col("p33"), 4) + lit(0.0)).as("pacf3"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH counts AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(*) AS nv
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      types AS (SELECT DISTINCT event_type FROM counts),
      dense AS (
        SELECT t.event_type, g.slot_ns, coalesce(c.nv, 0) AS v
        FROM types t
        CROSS JOIN range(${T0}, ${T1}, ${Hour}) g(slot_ns)
        LEFT JOIN counts c ON c.event_type = t.event_type AND c.slot_ns = g.slot_ns),
      moms AS (
        SELECT b.event_type, l.lag,
               sum(CAST(b.v AS HUGEINT) * p.v) AS a,
               CAST(sum(b.v) AS BIGINT) AS hx,
               CAST(sum(p.v) AS BIGINT) AS ty
        FROM range(0, 4) l(lag)
        JOIN dense b ON b.slot_ns < ${T1} - l.lag * ${Hour}
        JOIN dense p ON p.event_type = b.event_type
                    AND p.slot_ns = b.slot_ns + l.lag * ${Hour}
        GROUP BY 1, 2),
      wide AS (
        SELECT event_type,
               max(CASE WHEN lag = 0 THEN a END) AS a0,
               max(CASE WHEN lag = 0 THEN hx END) AS t,
               max(CASE WHEN lag = 1 THEN a END) AS a1,
               max(CASE WHEN lag = 1 THEN hx END) AS h1,
               max(CASE WHEN lag = 1 THEN ty END) AS t1,
               max(CASE WHEN lag = 2 THEN a END) AS a2,
               max(CASE WHEN lag = 2 THEN hx END) AS h2,
               max(CASE WHEN lag = 2 THEN ty END) AS t2,
               max(CASE WHEN lag = 3 THEN a END) AS a3,
               max(CASE WHEN lag = 3 THEN hx END) AS h3,
               max(CASE WHEN lag = 3 THEN ty END) AS t3
        FROM moms GROUP BY 1),
      ss AS (
        SELECT event_type,
               ${GridN * GridN} * a0 - ${GridN} * CAST(t AS HUGEINT) * (t + t)
                 + ${GridN} * CAST(t AS HUGEINT) * t AS s0,
               ${GridN * GridN} * a1 - ${GridN} * CAST(t AS HUGEINT) * (h1 + t1)
                 + ${GridN - 1} * CAST(t AS HUGEINT) * t AS s1,
               ${GridN * GridN} * a2 - ${GridN} * CAST(t AS HUGEINT) * (h2 + t2)
                 + ${GridN - 2} * CAST(t AS HUGEINT) * t AS s2,
               ${GridN * GridN} * a3 - ${GridN} * CAST(t AS HUGEINT) * (h3 + t3)
                 + ${GridN - 3} * CAST(t AS HUGEINT) * t AS s3
        FROM wide),
      rr AS (
        SELECT event_type,
               ${SharedExprs.hugeToDoubleDuck("s1")}
                 / ${SharedExprs.hugeToDoubleDuck("s0")} AS r1,
               ${SharedExprs.hugeToDoubleDuck("s2")}
                 / ${SharedExprs.hugeToDoubleDuck("s0")} AS r2,
               ${SharedExprs.hugeToDoubleDuck("s3")}
                 / ${SharedExprs.hugeToDoubleDuck("s0")} AS r3
        FROM ss),
      dl2 AS (
        SELECT event_type, r1, r2, r3,
               (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
        FROM rr),
      dl AS (
        SELECT event_type, r1, r2, r3, p22,
               r1 * (1.0 - p22) AS p21
        FROM dl2)
      SELECT event_type,
             round(r1, 4) + 0.0 AS rho1,
             round(r2, 4) + 0.0 AS rho2,
             round(r3, 4) + 0.0 AS rho3,
             round(r1, 4) + 0.0 AS pacf1,
             round(p22, 4) + 0.0 AS pacf2,
             round((r3 - p21 * r2 - p22 * r1) /
                   (1.0 - p21 * r1 - p22 * r2), 4) + 0.0 AS pacf3
      FROM dl
      ORDER BY event_type"""))

  /** Periodogram at candidate periods {168, 48, 24, 12, 8, 6} h per
    * series: normalized spectral power P(p) = (C² + S²)/(n·σ̂²) with
    * C = Σ(vₜ−v̄)cos(2πt/p), S likewise — the "WHICH period is
    * there?" scan (kdb_seasonality asserts 24 h; this ranks the
    * candidates, including the weekly harmonic a daily model misses).
    * Angle arguments are reduced BEFORE the trig call — θ =
    * 2π·(t mod p)/p with integer t, p — so both engines evaluate
    * cos/sin on identical small arguments in [0, 2π) and libm
    * large-argument reduction differences never appear. The data-
    * sized work is ONE hourly rollup; the trig pass runs on the
    * (types × 720 slots × 6 periods) grid — constant in data size,
    * broadcast-free single aggregation. */
  private val periodogram = QueryDef(
    "kdb_periodogram",
    (s, d) => {
      val n = (T1 - T0) / Hour
      val periods = Seq(168L, 48L, 24L, 12L, 8L, 6L)
      val counts = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(count(lit(1)).as("nv"))
      val types = counts.select(col("event_type")).distinct()
      val grid = s.range(n).select(col("id").as("t"),
        (lit(T0) + col("id") * Hour).as("slot_ns"))
      val dense = types.crossJoin(broadcast(grid))
        .join(counts, Seq("event_type", "slot_ns"), "left_outer")
        .select(col("event_type"), col("t"),
          coalesce(col("nv"), lit(0L)).as("v"))
        .localCheckpoint() // grid frame, read twice (moments + trig)
      val mom = dense.groupBy(col("event_type")).agg(
        sum(col("v")).as("tt"), sum(col("v") * col("v")).as("vv"))
      val theta = lit(2.0 * math.Pi) * (col("t") % col("p")).cast("double") / col("p")
      val trig = dense
        .withColumn("p", explode(lit(periods.toArray)))
        .groupBy(col("event_type"), col("p"))
        .agg(sum(col("v") * cos(theta)).as("sc"),
          sum(col("v") * sin(theta)).as("ssn"),
          sum(cos(theta)).as("cc"),
          sum(sin(theta)).as("s2"))
      val joined = trig.join(broadcast(mom), Seq("event_type"))
      val m = col("tt").cast("double") / lit(n.toDouble)
      val cBig = col("sc") - m * col("cc")
      val sBig = col("ssn") - m * col("s2")
      val varN = col("vv").cast("double") - col("tt").cast("double") * m
      joined.select(col("event_type"), col("p").cast("int").as("period_h"),
          round((cBig * cBig + sBig * sBig) / varN, 4).as("power"))
        .orderBy(col("event_type"), col("period_h").desc)
    },
    Some(s"""
      WITH counts AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(*) AS nv
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      types AS (SELECT DISTINCT event_type FROM counts),
      dense AS (
        SELECT t.event_type, (g.slot_ns - ${T0}) // ${Hour} AS t,
               coalesce(c.nv, 0) AS v
        FROM types t
        CROSS JOIN range(${T0}, ${T1}, ${Hour}) g(slot_ns)
        LEFT JOIN counts c ON c.event_type = t.event_type AND c.slot_ns = g.slot_ns),
      mom AS (
        SELECT event_type, CAST(sum(v) AS BIGINT) AS tt,
               CAST(sum(v * v) AS BIGINT) AS vv
        FROM dense GROUP BY 1),
      trig AS (
        SELECT d.event_type, p.p,
               sum(d.v * cos(2 * pi() * (d.t % p.p) / p.p)) AS sc,
               sum(d.v * sin(2 * pi() * (d.t % p.p) / p.p)) AS ssn,
               sum(cos(2 * pi() * (d.t % p.p) / p.p)) AS cc,
               sum(sin(2 * pi() * (d.t % p.p) / p.p)) AS s2
        FROM dense d CROSS JOIN (
          SELECT unnest([168, 48, 24, 12, 8, 6]) AS p) p
        GROUP BY 1, 2)
      SELECT t.event_type, CAST(t.p AS INT) AS period_h,
             round((pow(t.sc - (CAST(m.tt AS DOUBLE) / ${GridN}) * t.cc, 2) +
                    pow(t.ssn - (CAST(m.tt AS DOUBLE) / ${GridN}) * t.s2, 2)) /
                   (CAST(m.vv AS DOUBLE)
                    - CAST(m.tt AS DOUBLE) * m.tt / ${GridN}), 4) AS power
      FROM trig t JOIN mom m ON m.event_type = t.event_type
      ORDER BY t.event_type, period_h DESC"""))

  /** Matrix profile (Yeh et al. 2016) under the SAD metric — the
    * all-pairs nearest-neighbor window distance that powers motif
    * (recurring shape) and discord (anomalous shape) mining, run
    * over the hourly total-cents series with window m = 24 h and the
    * standard trivial-match exclusion zone |i−j| ≥ m. Using SAD
    * (Σ|xᵢ₊ₖ − xⱼ₊ₖ|) instead of z-normalized Euclidean keeps EVERY
    * distance an exact int64 (≤ 24·|Δcents|, ~2.4·10¹² even at 100×
    * volume), so the profile (min distance + argmin index, ties to
    * the smallest j via one lexicographic struct-min) is
    * bit-identical in both engines with no float anywhere. Scale
    * shape: ONE data-sized hourly rollup; the window table and the
    * 697² pair space are GRID-bounded (constant in data size — the
    * kdb_mann_kendall broadcast non-equi-join shape), each pair
    * folding a 24-element zip. The discord = the profile row with
    * the LARGEST nn distance; motifs = the smallest. */
  private val matrixProfile = QueryDef(
    "kdb_matrix_profile",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val m = 24
      val grid = s.range((T1 - T0) / Hour).select(col("id").as("t"))
      val sums = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("t", expr(s"(ts_ns - ${T0}L) div ${Hour}L"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("t")).agg(sum(col("cents")).as("x"))
      val dense = grid.join(sums, Seq("t"), "left_outer")
        .withColumn("x", coalesce(col("x"), lit(0L)))
      val w = Window.orderBy(col("t")).rowsBetween(0, m - 1)
      // materialize the 697-row window table once: both legs of the
      // pair join read it, and without the checkpoint each leg re-runs
      // the data-sized hourly rollup (a 2x events scan at scale)
      val wins = dense
        .withColumn("win", collect_list(col("x")).over(w))
        .filter(size(col("win")) === m)
        .select(col("t").as("i"), col("win"))
        .localCheckpoint(true)
      val b = wins.select(col("i").as("j"), col("win").as("wb"))
      wins.join(broadcast(b), abs(col("i") - col("j")) >= m)
        .withColumn("sad", aggregate(
          zip_with(col("win"), col("wb"), (x, y) => abs(x - y)),
          lit(0L), (acc, v) => acc + v))
        .groupBy(col("i"))
        .agg(min(struct(col("sad"), col("j"))).as("nn"))
        .select(col("i"), col("nn.sad").as("nn_sad"), col("nn.j").as("nn_j"))
        .orderBy(col("i"))
    },
    Some(s"""
      WITH sums AS (
        SELECT (epoch_ns(ts) - ${T0}) // ${Hour} AS t,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      dense AS (
        SELECT g.t, coalesce(s.x, 0) AS x
        FROM range(0, ${(T1 - T0) / Hour}) g(t) LEFT JOIN sums s USING (t)),
      wins AS (
        SELECT t AS i,
               list(x) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                             AND 23 FOLLOWING) AS win
        FROM dense
        QUALIFY len(win) = 24),
      sad AS (
        SELECT a.i, b.i AS j,
               CAST(list_sum(list_transform(list_zip(a.win, b.win),
                    p -> abs(p[1] - p[2]))) AS BIGINT) AS sad
        FROM wins a JOIN wins b ON abs(a.i - b.i) >= 24),
      prof AS (SELECT i, min(sad) AS nn_sad FROM sad GROUP BY 1)
      SELECT s.i, p.nn_sad, min(s.j) AS nn_j
      FROM sad s JOIN prof p ON s.i = p.i AND s.sad = p.nn_sad
      GROUP BY 1, 2
      ORDER BY s.i"""))

  /** Renko bar construction per event type — the price-threshold
    * (not time-threshold) bar family a charting consumer expects
    * beside kdb_ohlc's time bars: a brick prints only when the
    * hourly cents series moves a full brick size B from the last
    * printed level, B adapted per type as (max − min) div 16
    * (floored at 1). The fold is inherently path-dependent state —
    * Spark runs it as ONE strict left-fold over the type's sorted
    * slot array (the kdb_holt_trend discipline, struct accumulator
    * carrying ref level + emitted bricks); the oracle steps the
    * identical recurrence in a recursive CTE (DuckDB list_reduce
    * cannot hold struct state). Every quantity is exact int64: the
    * brick count per step is a floor division of positive operands
    * computed as (p − p mod B)/p-exact-double (integral quotient
    * ≪ 2⁵³, so the IEEE division is exact), the level advances by
    * n·B. Fold input is slot-bounded (≤720 values/series); raw
    * events never reach the fold. */
  private val renkoBars = QueryDef(
    "kdb_renko_bars",
    (s, d) => {
      val h = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(sum(col("cents")).as("x"))
      val acc0 = struct(lit(0L).as("ref"), lit(0).as("n"),
        expr("CAST(array() AS array<struct<slot_ns:bigint,n_bricks:bigint,level_cents:bigint>>)")
          .as("bricks"))
      def divPos(p: Column, b: Column): Column =
        ((p - pmod(p, b)) / b).cast("long") // exact: integral quotient ≪ 2⁵³
      h.groupBy(col("event_type"))
        .agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
          sort_array(collect_list(struct(col("slot_ns"), col("x")))).as("arr"))
        .withColumn("b", greatest(expr("(hi - lo) div 16"), lit(1L)))
        .withColumn("folded", aggregate(col("arr"), acc0, (acc, e) => {
          val x = e.getField("x"); val slot = e.getField("slot_ns")
          val ref = acc.getField("ref"); val n = acc.getField("n")
          val nb = when(x >= ref + col("b"), divPos(x - ref, col("b")))
            .when(x <= ref - col("b"), -divPos(ref - x, col("b")))
            .otherwise(lit(0L))
          val newRef = when(n === 0, x).otherwise(ref + nb * col("b"))
          struct(
            newRef.as("ref"), (n + 1).as("n"),
            when(n === 0 || nb === 0L, acc.getField("bricks"))
              .otherwise(concat(acc.getField("bricks"),
                array(struct(slot.as("slot_ns"), nb.as("n_bricks"),
                  newRef.as("level_cents"))))).as("bricks"))
        }))
        .select(col("event_type"), explode(col("folded.bricks")).as("br"))
        .select(col("event_type"), col("br.slot_ns"), col("br.n_bricks"),
          col("br.level_cents"))
        .orderBy(col("event_type"), col("slot_ns"))
    },
    Some(s"""
      WITH RECURSIVE h AS (
        SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY slot_ns) AS i,
               slot_ns, x
        FROM h),
      bs AS (
        SELECT event_type, greatest((max(x) - min(x)) // 16, 1) AS b
        FROM h GROUP BY 1),
      rec AS (
        SELECT i.event_type, CAST(1 AS BIGINT) AS i, i.x AS ref,
               CAST(0 AS BIGINT) AS nb, i.slot_ns
        FROM idx i WHERE i.i = 1
        UNION ALL
        SELECT r.event_type, r.i + 1,
               CASE WHEN x.x >= r.ref + bs.b
                      THEN r.ref + ((x.x - r.ref) // bs.b) * bs.b
                    WHEN x.x <= r.ref - bs.b
                      THEN r.ref - ((r.ref - x.x) // bs.b) * bs.b
                    ELSE r.ref END,
               CASE WHEN x.x >= r.ref + bs.b THEN (x.x - r.ref) // bs.b
                    WHEN x.x <= r.ref - bs.b THEN -((r.ref - x.x) // bs.b)
                    ELSE CAST(0 AS BIGINT) END,
               x.slot_ns
        FROM rec r
        JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
        JOIN bs ON bs.event_type = r.event_type)
      SELECT event_type, slot_ns, nb AS n_bricks, ref AS level_cents
      FROM rec WHERE nb <> 0
      ORDER BY event_type, slot_ns"""))

  /** Volume-clock bars (López de Prado's information-driven sampling,
    * "Advances in Financial Machine Learning" ch. 2) — bars close
    * after a fixed amount of VOLUME rather than a fixed amount of
    * time, so bursty regimes get more bars and quiet ones fewer. Per
    * event type: events in (ts, event_id) total order, exclusive
    * prefix volume `cum − cents` floor-divided by the per-type target
    * V = total div 64 assigns the bar; each bar reports OHLC (open/
    * close via lexicographic struct min/max over the unique order
    * key — no second window pass, partial-agg friendly), extremes,
    * volume and time span. Everything is exact int64 (cents, ns,
    * counts) — no float anywhere. Scale shape: the per-type exclusive
    * prefix volume comes from [[graft.operators.SeriesScan]] — range-
    * partition the (type, ts, id) order, scan each physical partition
    * locally, add back driver-folded per-(partition, type) offsets —
    * so parallelism is #partitions, never #series (a per-type window
    * over raw events would funnel each type's whole history through
    * ONE task at 100×); then one aggregation on (series, bar). Bar
    * assignment uses FLOOR division ((x − pmod(x, v)) div v), matching
    * DuckDB's `//` even when negative cents dip the prefix below zero
    * (Spark's bare `div` truncates toward zero and would split bars
    * cross-engine). Headroom: the running cents sum is
    * ≤ rows·5·10⁴ ≈ 5·10¹³ at 100× — int64-safe. Reference analog:
    * none (extended surface beside kdb_ohlc's time bars /
    * kdb_renko_bars' price bars). */
  private val volumeBars = QueryDef(
    "kdb_volume_bars",
    (s, d) => {
      val base = ev(s, d)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      graft.operators.SeriesScan.scan(base, "event_type",
          Seq(col("ts_ns"), col("event_id")), col("cents"),
          exclName = "excl", totName = Some("tot"))
        .withColumn("v", greatest(expr("(tot - pmod(tot, 64)) div 64"), lit(1L)))
        .withColumn("bar", expr("(excl - pmod(excl, v)) div v"))
        .groupBy(col("event_type"), col("bar"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents")).as("vol_cents"),
          min(struct(col("ts_ns"), col("event_id"), col("cents"))).as("o"),
          max(struct(col("ts_ns"), col("event_id"), col("cents"))).as("c"),
          max(col("cents")).as("hi_cents"), min(col("cents")).as("lo_cents"),
          min(col("ts_ns")).as("t_open_ns"), max(col("ts_ns")).as("t_close_ns"))
        .select(col("event_type"), col("bar"), col("n_events"),
          col("vol_cents"), col("o.cents").as("open_cents"),
          col("c.cents").as("close_cents"), col("hi_cents"), col("lo_cents"),
          col("t_open_ns"), col("t_close_ns"))
        .orderBy(col("event_type"), col("bar"))
    },
    Some("""
      WITH b AS (
        SELECT event_type, epoch_ns(ts) AS tns, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events),
      c AS (
        SELECT *,
               sum(cents) OVER (PARTITION BY event_type
                 ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS cum,
               greatest(sum(cents) OVER (PARTITION BY event_type) // 64,
                        1) AS v
        FROM b),
      a AS (SELECT *, CAST((cum - cents) // v AS BIGINT) AS bar FROM c),
      r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bar
                 ORDER BY tns, event_id) AS ra,
               row_number() OVER (PARTITION BY event_type, bar
                 ORDER BY tns DESC, event_id DESC) AS rd
        FROM a)
      SELECT event_type, bar, count(*) AS n_events,
             CAST(sum(cents) AS BIGINT) AS vol_cents,
             CAST(max(CASE WHEN ra = 1 THEN cents END) AS BIGINT)
               AS open_cents,
             CAST(max(CASE WHEN rd = 1 THEN cents END) AS BIGINT)
               AS close_cents,
             max(cents) AS hi_cents, min(cents) AS lo_cents,
             min(tns) AS t_open_ns, max(tns) AS t_close_ns
      FROM r GROUP BY 1, 2
      ORDER BY event_type, bar"""))

  /** VPIN — volume-synchronized probability of informed trading
    * (Easley, López de Prado, O'Hara 2012): order-flow toxicity as
    * the trailing-10-bucket mean of |buy − sell| volume imbalance
    * over volume-clock buckets (V = total div 50). Trade direction
    * comes from the tick rule: sign of the cents change vs the
    * previous event in the series, zero-changes CARRYING the last
    * non-zero sign — path-dependent state expressed as
    * last(non-null, ignoreNulls) over a running frame (identical
    * IGNORE NULLS semantics in DuckDB), first trade defaulting to
    * buy. The toxicity ratio is the ONLY float: one IEEE division of
    * two exact int64 rolling sums, identical in both engines,
    * rounded to 4dp and never ordered on. Scale shape: the direction
    * carry AND the volume clock both come from ONE
    * [[graft.operators.SeriesScan]] pass — range-partition the
    * (type, ts, id) order, scan locally, driver-fold the tiny
    * per-(partition, type) boundary state (incoming last cents → the
    * partition-head delta sign; incoming carry; prefix offset) — so
    * parallelism is #partitions, never #series (the previous per-type
    * raw-event windows funneled each type through one task at 100×).
    * Bucket assignment is FLOOR division (pmod-adjusted div) to match
    * DuckDB `//` on negative prefixes. The trailing rollup window runs
    * on the ~50-buckets/series table — grid-bounded. Reference
    * analog: none (extended surface; composes with kdb_volume_bars'
    * sampling). */
  private val vpin = QueryDef(
    "kdb_vpin",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wb = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(-9, Window.currentRow)
      val base = ev(s, d)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      graft.operators.SeriesScan.scan(base, "event_type",
          Seq(col("ts_ns"), col("event_id")), col("cents"),
          exclName = "excl", totName = Some("tot"), dirName = Some("dir0"))
        .withColumn("dir", coalesce(col("dir0"), lit(1L)))
        .withColumn("v", greatest(expr("(tot - pmod(tot, 50)) div 50"), lit(1L)))
        .withColumn("bucket", expr("(excl - pmod(excl, v)) div v"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(sum(col("cents")).as("vol_cents"),
          abs(sum(col("cents") * col("dir"))).as("imb_cents"))
        .withColumn("vpin", round(
          sum(col("imb_cents")).over(wb) / sum(col("vol_cents")).over(wb), 4))
        .select(col("event_type"), col("bucket"), col("vol_cents"),
          col("imb_cents"), col("vpin"))
        .orderBy(col("event_type"), col("bucket"))
    },
    Some("""
      WITH b AS (
        SELECT event_type, epoch_ns(ts) AS tns, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events),
      s AS (
        SELECT *,
               cents - lag(cents) OVER (PARTITION BY event_type
                 ORDER BY tns, event_id) AS d
        FROM b),
      dir AS (
        SELECT *,
               coalesce(last_value(CASE WHEN d > 0 THEN CAST(1 AS BIGINT)
                                        WHEN d < 0 THEN CAST(-1 AS BIGINT)
                                   END IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY tns, event_id
                       ROWS UNBOUNDED PRECEDING),
                 CAST(1 AS BIGINT)) AS dir,
               sum(cents) OVER (PARTITION BY event_type
                 ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS cum,
               greatest(sum(cents) OVER (PARTITION BY event_type) // 50,
                        1) AS v
        FROM s),
      bk AS (
        SELECT event_type, CAST((cum - cents) // v AS BIGINT) AS bucket,
               CAST(sum(cents) AS BIGINT) AS vol_cents,
               CAST(abs(sum(cents * dir)) AS BIGINT) AS imb_cents
        FROM dir GROUP BY 1, 2)
      SELECT event_type, bucket, vol_cents, imb_cents,
             round(CAST(sum(imb_cents) OVER w AS BIGINT)
                   / CAST(sum(vol_cents) OVER w AS BIGINT), 4) AS vpin
      FROM bk
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
      ORDER BY event_type, bucket"""))

  /** Isotonic (monotone non-decreasing) regression of the daily
    * total-cents series — the shape-constrained trend fit (Barlow/
    * Robertson PAVA solution) a capacity planner runs to extract the
    * best monotone envelope from noisy growth data. Rather than the
    * sequential pool-adjacent-violators fold (whose struct-state
    * recursion DuckDB's list_reduce miscomputes), both engines
    * evaluate the CLOSED-FORM minimax characterization of the same
    * unique LSQ solution: ŷᵢ = max_{j≤i} min_{k≥i} avg(y[j..k]) —
    * fully relational, no recursion. Every pool average is ONE IEEE
    * division of exact int64 prefix-sum differences (division is
    * correctly rounded, not libm, so the doubles — and hence every
    * min/max selection — are bit-identical across engines); only the
    * REPORTED fit is rounded. Scale shape: one data-sized daily
    * rollup; the pool lattice (465 intervals × 30 days) is
    * grid-bounded broadcast non-equi joins, constant in data size. */
  private val isotonicTrend = QueryDef(
    "kdb_isotonic_trend",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nDays = ((T1 - T0) / Day).toInt
      val grid = s.range(nDays).select(col("id").as("day"))
      val daily = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("day", expr(s"(ts_ns - ${T0}L) div ${Day}L"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("day")).agg(sum(col("cents")).as("y"))
      // 30-row dense table read by both pool legs, the lattice join and
      // the final join: checkpoint so the daily rollup scans events
      // once, not four times
      val dense = grid.join(daily, Seq("day"), "left_outer")
        .withColumn("y", coalesce(col("y"), lit(0L)))
        .localCheckpoint(true)
      val sw = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = dense.withColumn("s", sum(col("y")).over(sw))
      val a = pre.select(col("day").as("j"), (col("s") - col("y")).as("sjm1"))
      val b = pre.select(col("day").as("k"), col("s").as("sk"))
      val pools = a.join(broadcast(b), col("j") <= col("k"))
        .select(col("j"), col("k"),
          ((col("sk") - col("sjm1")) / (col("k") - col("j") + 1)).as("avg"))
      val fit = pools
        .join(broadcast(grid.select(col("day").as("i"))),
          col("j") <= col("i") && col("k") >= col("i"))
        .groupBy(col("i"), col("j")).agg(min(col("avg")).as("mn"))
        .groupBy(col("i")).agg(max(col("mn")).as("f"))
      dense.join(fit, col("day") === col("i"))
        .select(col("day"), col("y").as("y_cents"),
          round(col("f"), 4).as("fit_4dp"))
        .orderBy(col("day"))
    },
    Some(s"""
      WITH daily AS (
        SELECT (epoch_ns(ts) - ${T0}) // ${Day} AS day,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      dense AS (
        SELECT g.day, coalesce(d.y, 0) AS y
        FROM range(0, ${(T1 - T0) / Day}) g(day) LEFT JOIN daily d USING (day)),
      pre AS (
        SELECT day, y,
               sum(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
        FROM dense),
      pools AS (
        SELECT a.day AS j, b.day AS k,
               CAST(b.s - a.s + a.y AS DOUBLE) / (b.day - a.day + 1) AS avg
        FROM pre a JOIN pre b ON a.day <= b.day),
      mns AS (
        SELECT i.day AS i, p.j, min(p.avg) AS mn
        FROM dense i JOIN pools p ON p.j <= i.day AND p.k >= i.day
        GROUP BY 1, 2),
      fit AS (SELECT i AS day, max(mn) AS f FROM mns GROUP BY 1)
      SELECT d.day, d.y AS y_cents, round(f.f, 4) AS fit_4dp
      FROM dense d JOIN fit f USING (day)
      ORDER BY d.day"""))

  /** q's `pj` (plus join) — additive merge of two keyed tables: left
    * keys are KEPT, matching right rows ADD their numeric cells,
    * unmatched rights are dropped (q reference semantics for pj).
    * Fixture: the (event_type, day-of-week) activity profile of the
    * month's first half plus-joined with the second half's — the
    * "accumulate a keyed aggregate across refresh batches" verb a q
    * user reaches for daily. One aggregation per half (map-side
    * combinable), one co-keyed left join; all int64 cents/counts. A
    * `matched` flag pins the kept-left/dropped-right asymmetry. */
  private val plusJoin = QueryDef(
    "kdb_plus_join",
    (s, d) => {
      def half(lo: Long, hi: Long) = ev(s, d)
        .filter(col("ts_ns") >= lo && col("ts_ns") < hi)
        .withColumn("dow", expr(s"((ts_ns - ${T0}L) div ${Day}L) % 7"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val l = half(T0, T0 + 15 * Day)
      val r = half(T0 + 15 * Day, T1)
        .withColumnRenamed("n", "n2").withColumnRenamed("cents", "cents2")
      l.join(r, Seq("event_type", "dow"), "left_outer")
        .select(col("event_type"), col("dow"),
          (col("n") + coalesce(col("n2"), lit(0L))).as("n"),
          (col("cents") + coalesce(col("cents2"), lit(0L))).as("cents"),
          when(col("n2").isNotNull, 1).otherwise(0).as("matched"))
        .orderBy(col("event_type"), col("dow"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type, ((epoch_ns(ts) - ${T0}) // ${Day}) % 7 AS dow,
               CAST(epoch_ns(ts) >= ${T0 + 15 * Day} AS INT) AS half,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      agg AS (
        SELECT event_type, dow, half, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM h GROUP BY 1, 2, 3),
      l AS (SELECT * FROM agg WHERE half = 0),
      r AS (SELECT * FROM agg WHERE half = 1)
      SELECT l.event_type, l.dow,
             l.n + coalesce(r.n, 0) AS n,
             l.cents + coalesce(r.cents, 0) AS cents,
             CASE WHEN r.n IS NOT NULL THEN 1 ELSE 0 END AS matched
      FROM l LEFT JOIN r ON r.event_type = l.event_type AND r.dow = l.dow
      ORDER BY l.event_type, l.dow"""))

  /** q's `uj` (union join) — vertical union of tables with DIFFERENT
    * schemas, aligning columns by NAME and null-filling the gaps (q
    * reference semantics; Spark's unionByName(allowMissingColumns),
    * DuckDB's UNION ALL BY NAME — both engines' native verb).
    * Fixture: a per-type weekly rollup (no user dimension) uj'd with
    * a per-(type, user-parity) rollup that adds a `users` column —
    * the "append a richer refresh onto a leaner history" shape.
    * Null-filled cells stay NULL (pinned by the gate's hash); the
    * src tag keeps provenance. */
  private val unionJoin = QueryDef(
    "kdb_union_join",
    (s, d) => {
      val base = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val lean = base.filter(col("ts_ns") < T0 + 7 * Day)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .withColumn("src", lit("week1"))
      val rich = base.filter(col("ts_ns") >= T0 + 7 * Day &&
          col("ts_ns") < T0 + 14 * Day)
        .withColumn("parity", col("user_id") % 2)
        .groupBy(col("event_type"), col("parity"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          countDistinct(col("user_id")).as("users"))
        .withColumn("src", lit("week2"))
      lean.unionByName(rich, allowMissingColumns = true)
        .orderBy(col("src"), col("event_type"), col("parity"))
    },
    Some(s"""
      WITH base AS (
        SELECT event_type, user_id, epoch_ns(ts) AS tns,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      lean AS (
        SELECT event_type, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
               'week1' AS src
        FROM base WHERE tns < ${T0 + 7 * Day}
        GROUP BY 1),
      rich AS (
        SELECT event_type, user_id % 2 AS parity, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS cents,
               count(DISTINCT user_id) AS users, 'week2' AS src
        FROM base WHERE tns >= ${T0 + 7 * Day} AND tns < ${T0 + 14 * Day}
        GROUP BY 1, 2)
      SELECT * FROM (
        SELECT * FROM lean UNION ALL BY NAME SELECT * FROM rich)
      ORDER BY src, event_type, parity NULLS FIRST"""))

  val defs: Seq[QueryDef] = Seq(
    matrixProfile, renkoBars, volumeBars, vpin, isotonicTrend,
    plusJoin, unionJoin, bitemporalTwin,
    bollinger, fbyFilter, spearman, survivalKm, pacf, periodogram,
    put, get, find, removeBefore, validate, tumbling, asof, asofWindowed,
    hopping, intervalJoin, saltedAgg, rollingAvg, pivotQ, approxDistinct, slidingHll,
    sessionize, downsample, interpFill, ewma, ewmaIrregular, ohlc, counterRate, latest,
    heavyHitters, zscore, madAnomaly, seriesCorr, corrMatrix, seasonality,
    seriesRatio, topMovers, latencyBands, calendarHeatmap, orderAudit, rollingMedian, audienceOverlap,
    funnel, retentionCohorts, twap, gapDetect, rollingWau,
    locfFill, histogramQuantile, holtTrend, cusumAlarm, leadLagCorr, asofNearest,
    theilSen, burnRate, forecastBacktest, stlDecompose, watermarkSizing,
    timeTravelTwin, snapshotDiffTwin, rollbackTwin, anovaF, maintenanceTwin, backupTwin,
    replicationTwin, resyncTwin, haarEnergy, markovStationary, associationRules,
    businessRollup, controlRules, garmanKlass,
    incidentIntervals, saxMotifs, olsTrend, m4Downsample, benford, acf,
    eventTransitions, holtWinters, kalman, kalmanSmoother, rollupMerge, compressionPlan,
    zorderPruning, did,
    anomalyEnsemble, drawdown, changepoint, rateLimitAudit, burstiness,
    quantileSketch, debounce, chisqIndependence, abTest, frequentPairs,
    rfm, attribution, sessionPaths, interarrival, rsi, peakDetect, lttb, eraseTwin, sqlViewTwin, reliability, cardinalityGrowth)
}
