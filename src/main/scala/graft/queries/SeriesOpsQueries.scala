package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.KdbQueries.{Day, Hour, T0, T1}

/** The q-verb family beyond the as-of joins: volume-weighted price
  * (vwap), window-join-aggregate (wj — ALL right rows in a window
  * per left row, not just the as-of row), rolling two-series
  * regression (beta), and banded dynamic-time-warping distance.
  *
  * Determinism stance: every money/volume figure goes through exact
  * integer cents before aggregation (double sums are accumulation-
  * order-fragile across engines); the DTW recurrence is a strict
  * left fold over exact-integer-valued doubles, expressed with the
  * identical association order in Spark `aggregate` and a DuckDB
  * recursive CTE — bit-identical pre-round (the kdb_holtwinters
  * precedent, generalized from a scalar to a DP-row accumulator).
  */
object SeriesOpsQueries extends QueryModule {

  private def ev(s: SparkSession, d: String): DataFrame = {
    val df = graft.sources.Tables.events(s, d)
    df.withColumn("ts_ns", graft.sources.Tables.tsNsCol(df.schema("ts").dataType))
  }

  /** VWAP per (event type, day): Σ(price·volume)/Σvolume with
    * events.value as price and the props.k JSON field as volume —
    * price in exact cents so the weighted sum is pure int64 (no
    * float accumulation), one map-side-combinable shuffle. TWAP
    * (kdb_twap) weights by holding TIME; this weights by traded
    * SIZE — both q verbs, different denominators. */
  private val vwap = QueryDef(
    "kdb_vwap",
    (s, d) => {
      ev(s, d)
        .withColumn("day_ns", col("ts_ns") - col("ts_ns") % Day)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"), col("day_ns"))
        .agg(sum(col("cents") * col("k")).as("pv"),
          sum(col("k")).as("volume"),
          count(lit(1)).as("n_trades"))
        .select(col("event_type"), col("day_ns"),
          round(col("pv") / (lit(100.0) * nullif(col("volume"), lit(0))), 4)
            .as("vwap"),
          col("volume"), col("n_trades"))
        .orderBy(col("event_type"), col("day_ns"))
    },
    Some(s"""
      SELECT event_type,
             epoch_ns(ts) - epoch_ns(ts) % ${Day} AS day_ns,
             round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
                 * CAST(props->>'k' AS BIGINT)) AS BIGINT)
               / (100.0 * nullif(CAST(sum(CAST(props->>'k' AS BIGINT))
                 AS BIGINT), 0)), 4) AS vwap,
             CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS volume,
             count(*) AS n_trades
      FROM events
      GROUP BY 1, 2
      ORDER BY event_type, day_ns"""))

  /** Window-join-aggregate (q's `wj`): for every purchase, aggregate
    * ALL of that user's clicks in the trailing 2 h window — count,
    * spend cents, max click — where the as-of family returns only
    * the latest row. Scale shape: the right side buckets by hour,
    * the left side explodes into the 3 hour buckets its window
    * spans, and the join is a hash EQUI-join on (user, bucket) with
    * the exact range predicate as a residual — never a non-equi
    * broadcast of raw events. Each click belongs to exactly one
    * bucket, so matches are never double-counted. Left semantics:
    * zero-click purchases survive with n_clicks = 0. */
  private val wjAgg = QueryDef(
    "kdb_wj_agg",
    (s, d) => {
      val W = 2 * Hour
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts_ns").as("cts"),
          round(col("value") * 100, 0).cast("long").as("c_cents"))
        .withColumn("bkt", col("cts") - col("cts") % Hour)
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ns"))
        .withColumn("bkt", explode(sequence(
          (col("ts_ns") - W) - (col("ts_ns") - W) % Hour,
          col("ts_ns") - col("ts_ns") % Hour, lit(Hour))))
      purch.join(clicks,
        purch("user_id") === clicks("c_user") && purch("bkt") === clicks("bkt") &&
          clicks("cts") >= purch("ts_ns") - W && clicks("cts") <= purch("ts_ns"),
        "left_outer")
        .groupBy(col("event_id"), col("user_id"), col("ts_ns"))
        .agg(count(col("cts")).as("n_clicks"),
          coalesce(sum(col("c_cents")), lit(0L)).as("click_cents"),
          max(col("c_cents")).as("max_click_cents"))
        .orderBy(col("event_id"))
    },
    Some(s"""
      SELECT p.event_id, p.user_id, epoch_ns(p.ts) AS ts_ns,
             count(c.ts) AS n_clicks,
             coalesce(CAST(sum(CAST(round(c.value * 100, 0) AS BIGINT))
               AS BIGINT), 0) AS click_cents,
             CAST(max(CAST(round(c.value * 100, 0) AS BIGINT)) AS BIGINT)
               AS max_click_cents
      FROM events p
      LEFT JOIN events c
        ON c.event_type = 'click' AND c.user_id = p.user_id
        AND epoch_ns(c.ts) >= epoch_ns(p.ts) - ${2 * Hour}
        AND epoch_ns(c.ts) <= epoch_ns(p.ts)
      WHERE p.event_type = 'purchase'
      GROUP BY 1, 2, 3
      ORDER BY p.event_id"""))

  /** Rolling 24 h regression slope (beta) of purchase cents on click
    * cents over the dense hourly grid: per slot, β = (nΣxy − ΣxΣy) /
    * (nΣx² − (Σx)²) from exact int64 window sums (the
    * kdb_lead_lag_corr integer-moment pattern, made rolling) — only
    * the final division is float. The window frame runs over the
    * 720-slot month grid, bounded by construction (the kdb_locf
    * slot-grid justification for a partition-less frame); the
    * data-sized work is the one hourly rollup shuffle. Slots with
    * zero click variance yield NULL (nullif), not a fake 0 β. */
  private val rollingBeta = QueryDef(
    "kdb_rolling_beta",
    (s, d) => {
      val nSlots = (T1 - T0) / Hour
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val sums = e.groupBy(col("slot_ns")).agg(
        sum(when(col("event_type") === "click", col("cents")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L)).as("y"))
      val grid = s.range(nSlots).select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val dense = grid.join(sums, Seq("slot_ns"), "left_outer")
        .withColumn("x", coalesce(col("x"), lit(0L)))
        .withColumn("y", coalesce(col("y"), lit(0L)))
      val w = Window.orderBy(col("slot_ns")).rowsBetween(-23, 0)
      val rn = Window.orderBy(col("slot_ns"))
      dense
        .withColumn("i", row_number().over(rn))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sy", sum(col("y")).over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("sxy", sum(col("x") * col("y")).over(w))
        .filter(col("i") >= 24)
        .select(col("slot_ns"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double"), lit(0.0)), 4).as("beta"))
        .orderBy(col("slot_ns"))
    },
    Some(s"""
      WITH e AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
          AND event_type IN ('click', 'purchase')),
      sums AS (
        SELECT slot_ns,
               CAST(sum(CASE WHEN event_type = 'click' THEN cents ELSE 0 END)
                 AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
                 AS BIGINT) AS y
        FROM e GROUP BY 1),
      dense AS (
        SELECT g.slot_ns, coalesce(s.x, 0) AS x, coalesce(s.y, 0) AS y
        FROM range(${T0}, ${T1}, ${Hour}) g(slot_ns)
        LEFT JOIN sums s USING (slot_ns)),
      roll AS (
        SELECT slot_ns,
               row_number() OVER (ORDER BY slot_ns) AS i,
               count(*) OVER w AS n,
               sum(x) OVER w AS sx, sum(y) OVER w AS sy,
               sum(x * x) OVER w AS sxx, sum(x * y) OVER w AS sxy
        FROM dense
        WINDOW w AS (ORDER BY slot_ns ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
      SELECT slot_ns,
             round((n * sxy - sx * sy) /
               nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0), 4) AS beta
      FROM roll WHERE i >= 24
      ORDER BY slot_ns"""))

  /** Banded dynamic-time-warping distance between the click and
    * purchase 6 h-slot cent series (120 points, Sakoe-Chiba band
    * w=8): the shape-similarity measure that tolerates phase shift,
    * where kdb_series_corr demands alignment. The DP is a strict
    * left fold: outer fold over rows i, inner fold building each row
    * left-to-right (accumulator = the padded DP row), identical
    * association order in Spark nested `aggregate` HOFs and the
    * DuckDB recursive CTE + list_reduce twin — inputs are exact
    * integer cents, so the folded doubles are bit-identical
    * pre-round. Scale: the data-sized work is one slot rollup; the
    * DP itself is grid-bounded (120×120 cells) and constant in data
    * size — the 100 TB cost does not grow. Out-of-band cells carry
    * the 1e18 sentinel; in-band cells always see a finite
    * neighbor, so the sentinel never contaminates a path. */
  private val dtw = QueryDef(
    "kdb_dtw",
    (s, d) => {
      val n = 120
      val wBand = 8
      val res = (T1 - T0) / n // 6h
      val inf = lit(1e18)
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("slot", ((col("ts_ns") - col("ts_ns") % res - T0) / res).cast("long"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val sums = e.groupBy(col("slot")).agg(
        sum(when(col("event_type") === "click", col("cents")).otherwise(0L))
          .cast("double").as("av"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L))
          .cast("double").as("bv"))
      val grid = s.range(n).select(col("id").as("slot"))
      val dense = grid.join(sums, Seq("slot"), "left_outer")
        .withColumn("av", coalesce(col("av"), lit(0.0)))
        .withColumn("bv", coalesce(col("bv"), lit(0.0)))
      val arrs = dense.groupBy().agg(
        transform(sort_array(collect_list(struct(col("slot"), col("av")))),
          x => x.getField("av")).as("a"),
        transform(sort_array(collect_list(struct(col("slot"), col("bv")))),
          x => x.getField("bv")).as("b"))
      val row0 = concat(array(lit(0.0)),
        transform(sequence(lit(1), lit(n)), _ => inf))
      val dp = aggregate(
        sequence(lit(1), lit(n)), row0,
        (prev, i) =>
          aggregate(
            sequence(lit(1), lit(n)), array(inf),
            (racc, j) => concat(racc, array(
              when(abs(i - j) <= wBand,
                abs(element_at(col("a"), i) - element_at(col("b"), j)) +
                  least(element_at(prev, j + 1), element_at(prev, j),
                    element_at(racc, j)))
                .otherwise(inf)))))
      arrs.select(
        lit(n).as("n_points"), lit(wBand).as("band"),
        round(element_at(dp, n + 1) / 100.0, 2).as("dtw_dollars"))
    },
    Some {
      val n = 120
      val res = (T1 - T0) / n
      s"""
      WITH RECURSIVE e AS (
        SELECT (epoch_ns(ts) - epoch_ns(ts) % ${res} - ${T0}) // ${res} AS slot,
               event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
          AND event_type IN ('click', 'purchase')),
      sums AS (
        SELECT slot,
               CAST(sum(CASE WHEN event_type = 'click' THEN cents ELSE 0 END)
                 AS DOUBLE) AS av,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
                 AS DOUBLE) AS bv
        FROM e GROUP BY 1),
      dense AS (
        SELECT g.slot, coalesce(s.av, 0.0) AS av, coalesce(s.bv, 0.0) AS bv
        FROM range(0, ${n}) g(slot) LEFT JOIN sums s USING (slot)),
      arrs AS (
        SELECT list(av ORDER BY slot) AS a, list(bv ORDER BY slot) AS b
        FROM dense),
      dp(i, row) AS (
        SELECT 0, [CAST(0.0 AS DOUBLE)]
                  || list_transform(generate_series(1, ${n}), z -> 1e18)
        UNION ALL
        SELECT d.i + 1,
          list_reduce(
            [[1e18]] || list_transform(generate_series(1, ${n}),
              j -> [CAST(j AS DOUBLE)]),
            (racc, xx) -> list_append(racc,
              CASE WHEN abs((d.i + 1) - CAST(xx[1] AS INT)) <= 8
                THEN abs(arrs.a[d.i + 1] - arrs.b[CAST(xx[1] AS INT)]) +
                  least(d.row[CAST(xx[1] AS INT) + 1],
                        d.row[CAST(xx[1] AS INT)],
                        racc[CAST(xx[1] AS INT)])
                ELSE 1e18 END))
        FROM dp d, arrs WHERE d.i < ${n})
      SELECT ${n} AS n_points, 8 AS band,
             round(row[${n} + 1] / 100.0, 2) AS dtw_dollars
      FROM dp WHERE i = ${n}"""
    })

  /** MACD (12/26/9): per-type EMA-12 and EMA-26 traces over the
    * hourly slot series, their difference (MACD line), the EMA-9
    * signal line, and the histogram. EMAs are inherently sequential,
    * so each is ONE strict left fold emitting the full trace as a
    * growing list (the kdb_dtw list-accumulator pattern; seeds with
    * the first value like a conventional MACD implementation) —
    * inputs are slot-bounded per type after the one rollup shuffle,
    * and both engines run the identical fold (Spark `aggregate`,
    * DuckDB natural-seed `list_reduce`), so pre-round doubles are
    * bit-identical. α constants are runtime IEEE divisions (2/13,
    * 2/27) — correctly rounded to the same double in both engines. */
  private val macd = QueryDef(
    "kdb_macd",
    (s, d) => {
      def emaArr(arr: org.apache.spark.sql.Column, alpha: Double) =
        aggregate(arr, array().cast("array<double>"),
          (acc, x) => when(size(acc) === 0, array(x.cast("double")))
            .otherwise(concat(acc, array(
              lit(alpha) * x + lit(1 - alpha) * element_at(acc, -1)))))
      val arrs = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(
          transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
            r => r.getField("slot_ns")).as("slots"),
          transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
            r => r.getField("v")).as("vs"))
      val withEmas = arrs
        .withColumn("e12", emaArr(col("vs"), 2.0 / 13.0))
        .withColumn("e26", emaArr(col("vs"), 2.0 / 27.0))
        .withColumn("m", zip_with(col("e12"), col("e26"), (a, b) => a - b))
        .withColumn("sig", emaArr(col("m"), 0.2))
      withEmas
        .select(col("event_type"),
          posexplode(arrays_zip(col("slots"), col("m"), col("sig")))
            .as(Seq("i", "z")))
        .select(col("event_type"), col("z.slots").as("slot_ns"),
          (round(col("z.m"), 4) + lit(0.0)).as("macd"),
          (round(col("z.sig"), 4) + lit(0.0)).as("signal"),
          (round(col("z.m") - col("z.sig"), 4) + lit(0.0)).as("histogram"))
        .orderBy(col("event_type"), col("slot_ns"))
    },
    Some(s"""
      WITH h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events GROUP BY 1, 2),
      arrs AS (
        SELECT event_type,
               list(slot_ns ORDER BY slot_ns) AS slots,
               list(v ORDER BY slot_ns) AS vs
        FROM h GROUP BY 1),
      emas AS (
        SELECT event_type, slots,
               list_reduce(list_transform(vs, z -> [CAST(z AS DOUBLE)]),
                 (acc, xx) -> list_append(acc,
                   (CAST(2.0 AS DOUBLE) / 13.0) * xx[1] +
                   (1 - CAST(2.0 AS DOUBLE) / 13.0) * acc[-1])) AS e12,
               list_reduce(list_transform(vs, z -> [CAST(z AS DOUBLE)]),
                 (acc, xx) -> list_append(acc,
                   (CAST(2.0 AS DOUBLE) / 27.0) * xx[1] +
                   (1 - CAST(2.0 AS DOUBLE) / 27.0) * acc[-1])) AS e26
        FROM arrs),
      mcd AS (
        SELECT event_type, slots,
               list_transform(generate_series(1, len(slots)),
                 i -> e12[i] - e26[i]) AS m
        FROM emas),
      sgn AS (
        SELECT event_type, slots, m,
               list_reduce(list_transform(m, z -> [CAST(z AS DOUBLE)]),
                 (acc, xx) -> list_append(acc,
                   CAST(0.2 AS DOUBLE) * xx[1] +
                   CAST(0.8 AS DOUBLE) * acc[-1])) AS sig
        FROM mcd),
      out AS (
        SELECT event_type, slots, m, sig,
               unnest(generate_series(1, len(slots))) AS i
        FROM sgn)
      SELECT event_type, slots[i] AS slot_ns,
             round(m[i], 4) + 0.0 AS macd,
             round(sig[i], 4) + 0.0 AS signal,
             round(m[i] - sig[i], 4) + 0.0 AS histogram
      FROM out
      ORDER BY event_type, slot_ns"""))

  /** Exact weighted median of payload per event type, weighted by
    * props.k — where kdb_winsorize trims and kdb_percentile ranks
    * unweighted. Skew-proof: the running weight comes from ONE
    * global [[DistributedRank.withPrefixSum]] over (type, value, id)
    * — never a per-type window that funnels a whole type through one
    * task — and each type's local cumulative weight is the global
    * one minus that type's broadcast offset (|types| rows). The
    * median is the smallest value whose inclusive cumulative weight
    * reaches half the type total (lower weighted median). */
  private val weightedMedian = QueryDef(
    "kdb_weighted_median",
    (s, d) => {
      val x = ev(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .select(col("event_type"), col("value"), col("event_id"), col("k"))
      val cum = graft.operators.DistributedRank.withPrefixSum(
        x, col("k"), "gcum", Seq(col("event_type"), col("value"), col("event_id")))
      val totals = x.groupBy(col("event_type")).agg(sum(col("k")).as("tot"))
      val wOff = Window.orderBy(col("event_type"))
        .rowsBetween(Window.unboundedPreceding, -1) // |types| rows: bounded
      val offsets = totals.withColumn("off",
        coalesce(sum(col("tot")).over(wOff), lit(0L)))
      cum.join(broadcast(offsets), Seq("event_type"))
        .withColumn("lcum", col("gcum") - col("off") + col("k"))
        .filter(col("lcum") * 2 >= col("tot"))
        .groupBy(col("event_type"))
        .agg(max(col("tot")).as("total_weight"),
          round(min(col("value")), 2).as("w_median"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH x AS (
        SELECT event_type, value, event_id,
               CAST(props->>'k' AS BIGINT) AS k
        FROM events),
      cum AS (
        SELECT event_type, value, k,
               sum(k) OVER (PARTITION BY event_type
                 ORDER BY value, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lcum,
               CAST(sum(k) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        FROM x)
      SELECT event_type, max(tot) AS total_weight,
             round(min(value), 2) AS w_median
      FROM cum
      WHERE lcum * 2 >= tot
      GROUP BY 1
      ORDER BY event_type"""))

  val defs: Seq[QueryDef] = Seq(vwap, wjAgg, rollingBeta, dtw, macd,
    weightedMedian)
}
