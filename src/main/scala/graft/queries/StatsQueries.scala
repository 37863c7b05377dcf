package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.DistributedRank
import graft.functions.TextFunctions.hash60
import graft.queries.KdbQueries.{Hour, T0, T1}

/** Statistical inference + distribution-shape operators over the
  * events stream — the hypothesis-testing / robust-stats layer a
  * metrics store grows once raw series exist (the reference stops at
  * storage+read, `dbase/dbase.go:24-38`; these are the analyses its
  * users run downstream, expressed in-engine).
  *
  * Scale stance shared by every def here:
  *  - no partition-less windows over data-sized inputs: global ranks
  *    come from [[graft.operators.DistributedRank]] (range-partition +
  *    partitioned window + offset add), the one exception being
  *    fixed-cardinality frames (10 deciles, 5 R/S sizes) documented
  *    per query;
  *  - rank orders never compare raw float aggregates: sums are
  *    rounded before entering an ORDER BY, with an integer tiebreak,
  *    so a last-bit summation-order difference cannot flip a rank;
  *  - resampling is hash-deterministic (Poisson bootstrap), never
  *    rand() — re-runs and both engines agree bit-for-bit on the
  *    resample weights.
  */
object StatsQueries extends QueryModule {

  private def ev(s: SparkSession, d: String): DataFrame = {
    val df = graft.sources.Tables.events(s, d)
    df.withColumn("ts_ns", graft.sources.Tables.tsNsCol(df.schema("ts").dataType))
  }

  /** Welch's unequal-variance t-test: click vs purchase payload
    * distributions. Pure two-group aggregation (count/avg/var_samp)
    * folded to one row — a single map-side-combinable shuffle, no
    * windows, no joins; the cheapest possible shape at any scale.
    * t and the Welch–Satterthwaite df are computed from the five
    * aggregates in closed form. */
  private val welch = QueryDef(
    "kdb_welch_ttest",
    (s, d) => {
      val g = ev(s, d).filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          avg(col("value")).as("m"), var_samp(col("value")).as("v"))
      val one = g.groupBy().agg(
        max(when(col("event_type") === "click", col("n"))).as("n1"),
        max(when(col("event_type") === "click", col("m"))).as("m1"),
        max(when(col("event_type") === "click", col("v"))).as("v1"),
        max(when(col("event_type") === "purchase", col("n"))).as("n2"),
        max(when(col("event_type") === "purchase", col("m"))).as("m2"),
        max(when(col("event_type") === "purchase", col("v"))).as("v2"))
      val se1 = col("v1") / col("n1")
      val se2 = col("v2") / col("n2")
      one.select(
        col("n1").cast("long").as("n_click"),
        col("n2").cast("long").as("n_purchase"),
        round(col("m1"), 4).as("mean_click"),
        round(col("m2"), 4).as("mean_purchase"),
        // + 0.0 after round: canonicalize IEEE -0.0 (kdb_zscore precedent)
        (round((col("m1") - col("m2")) / sqrt(se1 + se2), 4) + lit(0.0)).as("t_stat"),
        round(pow(se1 + se2, 2) /
          (pow(se1, 2) / (col("n1") - 1) + pow(se2, 2) / (col("n2") - 1)), 4)
          .as("df_welch"))
    },
    Some("""
      WITH g AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               avg(value) AS m, var_samp(value) AS v
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1),
      one AS (
        SELECT
          max(CASE WHEN event_type = 'click' THEN n END) AS n1,
          max(CASE WHEN event_type = 'click' THEN m END) AS m1,
          max(CASE WHEN event_type = 'click' THEN v END) AS v1,
          max(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
          max(CASE WHEN event_type = 'purchase' THEN m END) AS m2,
          max(CASE WHEN event_type = 'purchase' THEN v END) AS v2
        FROM g)
      SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
             round(m1, 4) AS mean_click, round(m2, 4) AS mean_purchase,
             round((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) + 0.0 AS t_stat,
             round(pow(v1/n1 + v2/n2, 2) /
               (pow(v1/n1, 2)/(n1-1) + pow(v2/n2, 2)/(n2-1)), 4) AS df_welch
      FROM one"""))

  /** Mann–Whitney U (rank-sum) test, tie-corrected: the distribution-
    * free complement to [[welch]] — detects a location shift without
    * normality. Skew-proof decomposition: rows fold to ONE row per
    * distinct value (tie count t_v + per-group count), the exclusive
    * prefix sum of t_v in value order comes from
    * [[DistributedRank.withPrefixSum]] (range shuffle — never a
    * single-partition running sum, and never a window PARTITIONED BY
    * value, which a heavily-tied column would collapse onto one
    * task), and each tie group's mid-rank is the closed form
    * cum_before + (t+1)/2. Mid-ranks are integer halves, so R₁ is
    * exact in doubles and U is engine-independent without rounding
    * tricks; only z divides by the tie-corrected σ (NULL when every
    * value ties — σ = 0 has no z). */
  private val mannWhitney = QueryDef(
    "kdb_mann_whitney",
    (s, d) => {
      val x = ev(s, d).filter(col("event_type").isin("click", "purchase"))
        .select(col("value"), col("event_type").as("grp"))
      val byVal = x.groupBy(col("value")).agg(
        count(lit(1)).as("t"),
        sum(when(col("grp") === "click", 1L).otherwise(0L)).as("n1v"))
      val cum = DistributedRank.withPrefixSum(
        byVal, col("t"), "cum_before", Seq(col("value")))
      val a = cum.groupBy().agg(
        sum(col("n1v") * (col("cum_before") + (col("t") + 1) / lit(2.0))).as("r1"),
        sum(col("n1v")).as("n1"),
        sum(col("t") - col("n1v")).as("n2"),
        sum(col("t") * col("t") * col("t") - col("t")).cast("double").as("tiesum"))
      val n = col("n1") + col("n2")
      val u1 = col("r1") - col("n1") * (col("n1") + 1) / lit(2.0)
      val mu = col("n1") * col("n2") / lit(2.0)
      val sig = sqrt(col("n1") * col("n2") / lit(12.0) *
        ((n + 1) - col("tiesum") / (n * (n - 1))))
      a.select(
        col("n1"), col("n2"),
        round(u1, 2).as("u1"),
        (round((u1 - mu) / nullif(sig, lit(0.0)), 4) + lit(0.0)).as("z_stat"))
    },
    Some("""
      WITH x AS (
        SELECT value, event_type AS grp, event_id
        FROM events WHERE event_type IN ('click', 'purchase')),
      ranked AS (
        SELECT value, grp,
               row_number() OVER (ORDER BY value, grp, event_id) AS rn
        FROM x),
      mid AS (
        SELECT grp, avg(rn) OVER (PARTITION BY value) AS midrank
        FROM ranked),
      a AS (
        SELECT sum(CASE WHEN grp = 'click' THEN midrank END) AS r1,
               sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS n2
        FROM mid),
      t AS (
        SELECT sum(tc * tc * tc - tc) AS tiesum FROM (
          SELECT CAST(count(*) AS DOUBLE) AS tc FROM ranked GROUP BY value))
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             round(r1 - n1 * (n1 + 1) / 2.0, 2) AS u1,
             round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0) /
               nullif(sqrt(n1 * n2 / 12.0 *
                 ((n1 + n2 + 1) - tiesum / ((n1 + n2) * (n1 + n2 - 1.0)))), 0.0), 4)
               + 0.0 AS z_stat
      FROM a CROSS JOIN t"""))

  /** Gini coefficient of per-user event volume — the standard
    * inequality audit (is traffic a long tail or a few whales?).
    * Everything is integer until the final division: x_u = count of
    * events for user u, ranks ascending from [[DistributedRank]]
    * (exact, distributed), G = 2·Σ r·x_r / (n·Σx) − (n+1)/n. At
    * 100 TB the per-user rollup is the only data-sized pass; the
    * ranked frame is |users| rows. */
  private val gini = QueryDef(
    "kdb_gini",
    (s, d) => {
      val counts = ev(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("x"))
      val ranked = DistributedRank.withGlobalRank(
        counts, "r", Seq(col("x"), col("user_id")))
      // r·x summed as double and n·Σx multiplied as double: at 1e9
      // users a long product overflows; at gate scale every term is
      // < 2^53 so the double sums are still exact and match DuckDB's
      // integer arithmetic bit-for-bit
      ranked.groupBy().agg(
        count(lit(1)).as("n_users"),
        sum(col("x")).as("total_events"),
        round((lit(2.0) * sum(col("r").cast("double") * col("x"))) /
          (count(lit(1)).cast("double") * sum(col("x")).cast("double")) -
          (count(lit(1)) + lit(1.0)) / count(lit(1)), 4).as("gini"))
    },
    Some("""
      WITH counts AS (
        SELECT user_id, count(*) AS x FROM events GROUP BY 1),
      ranked AS (
        SELECT x, row_number() OVER (ORDER BY x, user_id) AS r
        FROM counts)
      SELECT count(*) AS n_users, CAST(sum(x) AS BIGINT) AS total_events,
             round(2.0 * sum(r * x) / (count(*) * 1.0 * sum(x))
               - (count(*) + 1.0) / count(*), 4) AS gini
      FROM ranked"""))

  /** Pareto / concentration curve: users bucketed into value-deciles
    * (exact SQL ntile semantics via [[DistributedRank.withNtile]] —
    * range-shuffle, never one partition), each decile's revenue
    * share and cumulative share. Rank order is (rounded total DESC,
    * user_id) — rounded before ordering so float summation order
    * cannot flip a decile boundary. The final cumulative window runs
    * over exactly 10 rows (bounded by construction — the kdb_rfm
    * precedent for a justified partition-less frame). */
  private val pareto = QueryDef(
    "kdb_pareto",
    (s, d) => {
      val totals = ev(s, d).groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("tot"))
      val tiled = DistributedRank.withNtile(
        totals, "decile", 10, Seq(col("tot").desc, col("user_id")))
      val byDecile = tiled.groupBy(col("decile")).agg(
        count(lit(1)).as("n_users"), sum(col("tot")).as("dv"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDecile
        .withColumn("share", col("dv") / sum(col("dv")).over(
          Window.partitionBy()))
        .select(col("decile"), col("n_users"),
          round(col("dv"), 2).as("decile_value"),
          round(col("share"), 4).as("share"),
          round(sum(col("share")).over(w), 4).as("cum_share"))
        .orderBy(col("decile"))
    },
    Some("""
      WITH totals AS (
        SELECT user_id, round(sum(value), 2) AS tot
        FROM events GROUP BY 1),
      tiled AS (
        SELECT tot, ntile(10) OVER (ORDER BY tot DESC, user_id) AS decile
        FROM totals),
      by_decile AS (
        SELECT decile, count(*) AS n_users, sum(tot) AS dv
        FROM tiled GROUP BY 1),
      shares AS (
        SELECT decile, n_users, dv, dv / sum(dv) OVER () AS share
        FROM by_decile)
      SELECT decile, n_users, round(dv, 2) AS decile_value,
             round(share, 4) AS share,
             round(sum(share) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS cum_share
      FROM shares ORDER BY decile"""))

  /** Winsorized robust statistics per event type: exact p05/p95
    * (Spark `percentile` ≡ DuckDB `quantile_cont`, the q_percentile
    * parity), payloads clamped into [p05, p95], raw vs winsorized
    * mean/stddev side by side — the outlier-robust health view. Two
    * shuffles on the same 5-key group column (AQE coalesces); the
    * exact percentile buffers per group, bounded by |event types|
    * groups — the approx variant (q_approx_quantile precedent) is
    * the drop-in when group counts are data-sized. */
  private val winsorize = QueryDef(
    "kdb_winsorize",
    (s, d) => {
      val cuts = ev(s, d).groupBy(col("event_type"))
        .agg(percentile(col("value"), array(lit(0.05), lit(0.95))).as("pp"))
        .select(col("event_type"),
          element_at(col("pp"), 1).as("p05"), element_at(col("pp"), 2).as("p95"))
      val clamped = ev(s, d).join(cuts, Seq("event_type"))
        .withColumn("wv", greatest(col("p05"), least(col("p95"), col("value"))))
      clamped.groupBy(col("event_type")).agg(
        round(max(col("p05")), 4).as("p05"),
        round(max(col("p95")), 4).as("p95"),
        round(avg(col("value")), 4).as("mean_raw"),
        round(avg(col("wv")), 4).as("mean_wins"),
        round(stddev_samp(col("value")), 4).as("std_raw"),
        round(stddev_samp(col("wv")), 4).as("std_wins"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH cuts AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY 1),
      clamped AS (
        SELECT e.event_type, e.value, c.p05, c.p95,
               greatest(c.p05, least(c.p95, e.value)) AS wv
        FROM events e JOIN cuts c USING (event_type))
      SELECT event_type,
             round(max(p05), 4) AS p05, round(max(p95), 4) AS p95,
             round(avg(value), 4) AS mean_raw, round(avg(wv), 4) AS mean_wins,
             round(stddev_samp(value), 4) AS std_raw,
             round(stddev_samp(wv), 4) AS std_wins
      FROM clamped GROUP BY 1 ORDER BY event_type"""))

  /** Cross-series quantile normalization (the microarray classic,
    * here: make every event type's hourly-volume distribution
    * identical while preserving each type's ranking): dense hourly
    * grid per type (equal counts by construction — the Find-style
    * type × slot broadcast grid), rank within type (PARTITIONED
    * window), replace each value with the cross-type mean at its
    * rank. Ranks order by (rounded sum, slot) — no raw-float
    * ordering. Shape: one shuffle for the hourly rollup, one
    * partitioned rank, one |grid|-sized mean-by-rank join. */
  private val quantileNorm = QueryDef(
    "kdb_quantile_norm",
    (s, d) => {
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
      val nSlots = (T1 - T0) / Hour
      val types = e.select(col("event_type")).distinct()
      val grid = types.crossJoin(
        broadcast(s.range(nSlots).select((lit(T0) + col("id") * Hour).as("slot_ns"))))
      val sums = e
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(round(sum(col("value")), 2).as("v"))
      val dense = grid.join(sums, Seq("event_type", "slot_ns"), "left_outer")
        .withColumn("v", coalesce(col("v"), lit(0.0)))
      val ranked = dense.withColumn("rnk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("v"), col("slot_ns"))))
      val rankMeans = ranked.groupBy(col("rnk"))
        .agg(avg(col("v")).as("norm_v"))
      ranked.join(rankMeans, Seq("rnk"))
        .select(col("event_type"), col("slot_ns"), col("v"),
          round(col("norm_v"), 4).as("norm_v"))
        .orderBy(col("event_type"), col("slot_ns"))
    },
    Some(s"""
      WITH types AS (SELECT DISTINCT event_type FROM events
                     WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}),
      grid AS (
        SELECT event_type, g.slot_ns
        FROM types CROSS JOIN range(${T0}, ${T1}, ${Hour}) g(slot_ns)),
      sums AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               round(sum(value), 2) AS v
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1, 2),
      dense AS (
        SELECT g.event_type, g.slot_ns, coalesce(s.v, 0.0) AS v
        FROM grid g LEFT JOIN sums s USING (event_type, slot_ns)),
      ranked AS (
        SELECT event_type, slot_ns, v,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY v, slot_ns) AS rnk
        FROM dense),
      rank_means AS (
        SELECT rnk, avg(v) AS norm_v FROM ranked GROUP BY 1)
      SELECT r.event_type, r.slot_ns, r.v, round(m.norm_v, 4) AS norm_v
      FROM ranked r JOIN rank_means m USING (rnk)
      ORDER BY event_type, slot_ns"""))

  /** Hurst exponent via rescaled-range (R/S) analysis on the hourly
    * total-value series: for block sizes n ∈ {8,16,36,72,144} (each
    * divides the 720-slot month exactly — no partial blocks), split
    * the series into blocks, compute the range R of cumulative
    * deviations and the population σ S per block, average R/S per n,
    * and fit H as the OLS slope of ln(R/S) on ln(n). H≈0.5 random
    * walk, >0.5 trending, <0.5 mean-reverting. All windows are
    * PARTITIONED by (n, block); the OLS fold runs over exactly 5
    * rows. The series itself is the dense hourly rollup — one
    * shuffle, grid-bounded from there on. */
  private val hurst = QueryDef(
    "kdb_hurst",
    (s, d) => {
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
      val nSlots = (T1 - T0) / Hour
      val grid = s.range(nSlots).select(col("id").as("idx"))
      // slot - T0 is exactly divisible by Hour, so the double quotient
      // is exact and the cast is lossless (pure int semantics)
      val sums = e
        .withColumn("idx",
          ((col("ts_ns") - col("ts_ns") % Hour - T0) / Hour).cast("long"))
        .groupBy(col("idx")).agg(round(sum(col("value")), 2).as("x"))
      val series = grid.join(sums, Seq("idx"), "left_outer")
        .withColumn("x", coalesce(col("x"), lit(0.0)))
      val sized = series.crossJoin(
        broadcast(s.createDataFrame(Seq(Tuple1(8L), Tuple1(16L), Tuple1(36L),
          Tuple1(72L), Tuple1(144L))).toDF("n")))
        .withColumn("blk", floor(col("idx") / col("n")))
      val wCum = Window.partitionBy(col("n"), col("blk")).orderBy(col("idx"))
      val dev = sized
        .withColumn("mean_b", avg(col("x")).over(
          Window.partitionBy(col("n"), col("blk"))))
        .withColumn("cumdev", sum(col("x") - col("mean_b")).over(wCum))
      val rs = dev.groupBy(col("n"), col("blk")).agg(
        (max(col("cumdev")) - min(col("cumdev"))).as("r"),
        stddev_pop(col("x")).as("sd"))
        .filter(col("sd") > 0)
        .groupBy(col("n")).agg(avg(col("r") / col("sd")).as("avg_rs"))
      val ols = rs.groupBy().agg(
        ((count(lit(1)) * sum(log(col("n")) * log(col("avg_rs"))) -
          sum(log(col("n"))) * sum(log(col("avg_rs")))) /
          (count(lit(1)) * sum(log(col("n")) * log(col("n"))) -
            sum(log(col("n"))) * sum(log(col("n"))))).as("hurst"))
      rs.crossJoin(ols)
        .select(col("n"), round(col("avg_rs"), 4).as("avg_rs"),
          round(col("hurst"), 4).as("hurst"))
        .orderBy(col("n"))
    },
    Some(s"""
      WITH series AS (
        SELECT g.idx, coalesce(s.x, 0.0) AS x
        FROM range(0, ${(T1 - T0) / Hour}) g(idx)
        LEFT JOIN (
          SELECT (epoch_ns(ts) - ${T0}) // ${Hour} AS idx,
                 round(sum(value), 2) AS x
          FROM events
          WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
          GROUP BY 1) s USING (idx)),
      sized AS (
        SELECT n.n, series.idx, series.x, series.idx // n.n AS blk
        FROM series CROSS JOIN (VALUES (8), (16), (36), (72), (144)) n(n)),
      dev AS (
        SELECT n, blk, x,
               sum(x - mean_b) OVER (PARTITION BY n, blk ORDER BY idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumdev
        FROM (
          SELECT n, blk, idx, x,
                 avg(x) OVER (PARTITION BY n, blk) AS mean_b
          FROM sized)),
      rs AS (
        SELECT n, avg(r / sd) AS avg_rs FROM (
          SELECT n, blk, max(cumdev) - min(cumdev) AS r,
                 stddev_pop(x) AS sd
          FROM dev GROUP BY 1, 2)
        WHERE sd > 0 GROUP BY 1),
      ols AS (
        SELECT (count(*) * sum(ln(n) * ln(avg_rs)) -
                sum(ln(n)) * sum(ln(avg_rs))) /
               (count(*) * sum(ln(n) * ln(n)) -
                sum(ln(n)) * sum(ln(n))) AS hurst
        FROM rs)
      SELECT n, round(avg_rs, 4) AS avg_rs, round(hurst, 4) AS hurst
      FROM rs CROSS JOIN ols ORDER BY n"""))

  /** Lehmer/Park-Miller modulus and the g^b = 48271^b mod M table for
    * b = 0..199 — kdb_bootstrap_ci's replicate uniforms; the same 200
    * constants are injected verbatim into its DuckDB oracle. */
  private val LehmerM: Long = 2147483647L
  private val LehmerPow: Array[Long] = {
    val a = new Array[Long](200)
    a(0) = 1L
    for (b <- 1 until 200) a(b) = a(b - 1) * 48271L % LehmerM
    a
  }

  /** Poisson-bootstrap confidence interval for the mean purchase
    * value — the at-scale bootstrap: instead of resampling rows
    * (a B-fold shuffle of the data), each (row, replicate) pair
    * draws a deterministic Poisson(1) weight, so the whole thing is
    * one per-partition B-bounded fold (2·B doubles of task state)
    * + a 200-group aggregation over ≤200·|partitions| partial rows. No rand(): the weight of row r in replicate b is a
    * pure function of (r, b), identical in both engines and across
    * retries. CPU discipline (r8): ONE md5 seeds each row, then
    * replicate b's uniform is the Lehmer product u_b = h₀·gᵇ mod
    * 2³¹−1 with g = 48271 — the 200 per-row draws are integer
    * multiply-mods against a 200-entry gᵇ literal table (generated
    * below, injected into BOTH engines), not 200 md5 calls; products
    * stay < 2⁶² so BIGINT arithmetic is exact in both. The
    * inverse-CDF thresholds are the Poisson(1) CDF to k=6 (7+
    * truncated, P ≈ 8e-6). CI = exact 2.5/97.5 percentiles of the
    * 200 replicate means. */
  private val bootstrap = QueryDef(
    "kdb_bootstrap_ci",
    (s, d) => {
      import s.implicits._
      val x = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("value"))
      // B-bounded dense accumulator instead of a B-fold row explode
      // (the llm_pca_power shape): each task folds its rows into one
      // 2·B-double buffer — the honest-sink bench showed the 23M
      // exploded rows, not the hashing, were the cost (3.5 s → this).
      // Determinism contract unchanged: the md5-hex seed is hash60's
      // exact definition, the Lehmer draw is the same exact-int
      // arithmetic as the oracle's, and the Poisson thresholds are
      // literal-identical — replicate weights stay pure functions of
      // (row, b) shared with DuckDB.
      val repPartials = x.as[(Long, Double)].mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val sw = new Array[Double](200)
        val swv = new Array[Double](200)
        it.foreach { case (id, v) =>
          // 60-bit seed = first 15 hex digits of md5 = digest bytes 0-6
          // plus the high nibble of byte 7, packed with shifts (no
          // per-row hex-string formatting in this hottest loop)
          val dig = md.digest(id.toString.getBytes("UTF-8"))
          var h15 = 0L
          var k = 0
          while (k < 7) { h15 = (h15 << 8) | (dig(k) & 0xffL); k += 1 }
          h15 = (h15 << 4) | ((dig(7) & 0xf0L) >> 4)
          val h0 = h15 % (LehmerM - 1) + 1
          var b = 0
          while (b < 200) {
            val u = (h0 * LehmerPow(b) % LehmerM).toDouble / LehmerM
            val w =
              if (u < 0.36787944117144233) 0.0
              else if (u < 0.7357588823428847) 1.0
              else if (u < 0.9196986029286058) 2.0
              else if (u < 0.9810118431238463) 3.0
              else if (u < 0.9963401531726563) 4.0
              else if (u < 0.9994058151824183) 5.0
              else if (u < 0.999916758850712) 6.0
              else 7.0
            sw(b) += w
            swv(b) += w * v
            b += 1
          }
        }
        Iterator.tabulate(200)(b => (b, swv(b), sw(b)))
      }.toDF("b", "swv", "sw")
      val reps = repPartials
        .groupBy(col("b"))
        .agg((sum(col("swv")) / sum(col("sw"))).as("mb"))
      val ci = reps.groupBy().agg(
        percentile(col("mb"), array(lit(0.025), lit(0.975))).as("pp"),
        count(lit(1)).as("b_count"))
      val point = x.groupBy().agg(
        count(lit(1)).as("n_rows"), avg(col("value")).as("m"))
      point.crossJoin(ci).select(
        col("n_rows"), col("b_count"),
        round(col("m"), 4).as("point_est"),
        round(element_at(col("pp"), 1), 4).as("ci_lo"),
        round(element_at(col("pp"), 2), 4).as("ci_hi"))
    },
    Some(s"""
      WITH x AS (
        SELECT event_id, value FROM events WHERE event_type = 'purchase'),
      seeded AS (
        SELECT value,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                 % 2147483646 + 1 AS h0
        FROM x),
      reps AS (
        SELECT b.range AS b,
               sum(w * value) / sum(w) AS mb
        FROM seeded CROSS JOIN range(0, 200) b,
        LATERAL (SELECT CAST((h0 * ([${LehmerPow.mkString(", ")}])[b.range + 1])
                   % 2147483647 AS DOUBLE) / 2147483647.0 AS u) h,
        LATERAL (SELECT CASE
                   WHEN u < 0.36787944117144233 THEN 0.0
                   WHEN u < 0.7357588823428847 THEN 1.0
                   WHEN u < 0.9196986029286058 THEN 2.0
                   WHEN u < 0.9810118431238463 THEN 3.0
                   WHEN u < 0.9963401531726563 THEN 4.0
                   WHEN u < 0.9994058151824183 THEN 5.0
                   WHEN u < 0.999916758850712 THEN 6.0
                   ELSE 7.0 END AS w) p
        GROUP BY 1),
      ci AS (
        SELECT quantile_cont(mb, 0.025) AS lo,
               quantile_cont(mb, 0.975) AS hi,
               count(*) AS b_count
        FROM reps),
      pt AS (
        SELECT count(*) AS n_rows, avg(value) AS m FROM x)
      SELECT n_rows, b_count, round(m, 4) AS point_est,
             round(lo, 4) AS ci_lo, round(hi, 4) AS ci_hi
      FROM pt CROSS JOIN ci"""))

  /** Mann–Kendall trend test on the hourly total-cents series: S =
    * Σ_{i<j} sign(x_j − x_i) with the tie-corrected variance and
    * continuity-corrected z — the nonparametric "is there ANY
    * monotone trend?" complement to kdb_ols_trend's linear fit and
    * kdb_theilsen_slope's robust slope. Everything is exact int64
    * until z — and stays so at ANY data scale: cents magnitudes only
    * ever enter through sign(x_j − x_i) (no products), S is bounded
    * by the constant pair count (±259k) and the tie sum by
    * 720·719·1445 ≈ 7.5·10⁸, so there is no overflow horizon to
    * widen for (contrast the Σx² family — kdb_cointegration's note). The pair space is the 720-slot GRID self-joined with
    * itself (≤ 259k pairs, constant in data size — broadcast one
    * side, the kdb_acf grid-join shape); the data-sized work is one
    * hourly rollup. */
  private val mannKendall = QueryDef(
    "kdb_mann_kendall",
    (s, d) => {
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
      val nSlots = (T1 - T0) / Hour
      val grid = s.range(nSlots).select(col("id").as("idx"))
      val sums = e
        .withColumn("idx",
          ((col("ts_ns") - col("ts_ns") % Hour - T0) / Hour).cast("long"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("idx")).agg(sum(col("cents")).as("x"))
      val dense = grid.join(sums, Seq("idx"), "left_outer")
        .withColumn("x", coalesce(col("x"), lit(0L)))
      val a = dense.select(col("idx").as("i"), col("x").as("xi"))
      val b = dense.select(col("idx").as("j"), col("x").as("xj"))
      val sStat = a.join(broadcast(b), col("i") < col("j"))
        .groupBy().agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s_stat"))
      val ties = dense.groupBy(col("x")).agg(count(lit(1)).as("t"))
        .groupBy().agg(
          sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tiesum"),
          count(lit(1)).as("n_groups"))
      val n = lit(nSlots.toDouble)
      val variance = (n * (n - 1) * (lit(2.0) * n + 5) - col("tiesum")) / lit(18.0)
      val sD = col("s_stat").cast("double")
      val z = when(col("s_stat") > 0, (sD - 1) / sqrt(variance))
        .when(col("s_stat") < 0, (sD + 1) / sqrt(variance))
        .otherwise(lit(0.0))
      sStat.crossJoin(ties).select(
        lit(nSlots).as("n_slots"), col("s_stat"),
        (round(z, 4) + lit(0.0)).as("z_stat"),
        when(z > 1.96, "increasing").when(z < -1.96, "decreasing")
          .otherwise("no_trend").as("trend"))
    },
    Some(s"""
      WITH sums AS (
        SELECT (epoch_ns(ts) - epoch_ns(ts) % ${Hour} - ${T0}) // ${Hour} AS idx,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      dense AS (
        SELECT g.idx, coalesce(s.x, 0) AS x
        FROM range(0, ${(T1 - T0) / Hour}) g(idx) LEFT JOIN sums s USING (idx)),
      st AS (
        SELECT CAST(sum(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT) AS s_stat
        FROM dense a JOIN dense b ON a.idx < b.idx),
      ties AS (
        SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tiesum
        FROM (SELECT count(*) AS t FROM dense GROUP BY x)),
      z AS (
        SELECT s_stat, tiesum,
               CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1) /
                      sqrt((${(T1 - T0) / Hour}.0 * (${(T1 - T0) / Hour} - 1)
                        * (2.0 * ${(T1 - T0) / Hour} + 5) - tiesum) / 18.0)
                    WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1) /
                      sqrt((${(T1 - T0) / Hour}.0 * (${(T1 - T0) / Hour} - 1)
                        * (2.0 * ${(T1 - T0) / Hour} + 5) - tiesum) / 18.0)
                    ELSE 0.0 END AS zv
        FROM st CROSS JOIN ties)
      SELECT ${(T1 - T0) / Hour} AS n_slots, s_stat,
             round(zv, 4) + 0.0 AS z_stat,
             CASE WHEN zv > 1.96 THEN 'increasing'
                  WHEN zv < -1.96 THEN 'decreasing'
                  ELSE 'no_trend' END AS trend
      FROM z"""))

  /** Dickey–Fuller stationarity test (no-lag DF form) on the hourly
    * total-cents series: regress Δx_t on x_{t−1}; DF statistic =
    * β̂/SE(β̂) from the five exact int64 moment sums (Σx, Σy, Σxx,
    * Σxy, Σyy over the 719 (x_{t−1}, Δx_t) pairs — the
    * kdb_lead_lag_corr integer-moment discipline), so both engines
    * compute the identical doubles and even the stationary DECISION
    * (df < −2.86, the 5% critical value) is branch-safe. Pairs come
    * from the dense grid's own lag — one rollup shuffle, grid-bounded
    * after. The unit-root question is kdb_hurst's H≈0.5 asked the
    * econometric way. */
  private val dickeyFuller = QueryDef(
    "kdb_dickey_fuller",
    (s, d) => {
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
      val nSlots = (T1 - T0) / Hour
      val grid = s.range(nSlots).select(col("id").as("idx"))
      val sums = e
        .withColumn("idx",
          ((col("ts_ns") - col("ts_ns") % Hour - T0) / Hour).cast("long"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("idx")).agg(sum(col("cents")).as("v"))
      val dense = grid.join(sums, Seq("idx"), "left_outer")
        .withColumn("v", coalesce(col("v"), lit(0L)))
      val w = Window.orderBy(col("idx")) // 720-slot grid: bounded frame
      val pairs = dense
        .withColumn("xprev", lag(col("v"), 1).over(w))
        .filter(col("xprev").isNotNull)
        .select(col("xprev").as("x"), (col("v") - col("xprev")).as("y"))
      val m = pairs.groupBy().agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        // 128-bit product sums + engine-neutral conversion: x is the
        // hourly LEVEL (kdb_cointegration magnitudes — a single x^2 at
        // 100x volume grazes int64 max and the 719-term sum wraps)
        SharedExprs.hugeToDouble(
          sum(col("x").cast("decimal(38,0)") * col("x"))).as("sxx"),
        SharedExprs.hugeToDouble(
          sum(col("x").cast("decimal(38,0)") * col("y"))).as("sxy"),
        SharedExprs.hugeToDouble(
          sum(col("y").cast("decimal(38,0)") * col("y"))).as("syy"))
      val beta = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      val alpha = (col("sy") - beta * col("sx")) / col("n")
      val sse = col("syy") - alpha * col("sy") - beta * col("sxy")
      val s2 = sse / (col("n") - 2)
      val seb = sqrt(s2 / (col("sxx") - col("sx") * col("sx") / col("n")))
      val df = beta / seb
      m.select(
        col("n").cast("long").as("n_pairs"),
        (round(beta, 6) + lit(0.0)).as("beta"),
        (round(df, 4) + lit(0.0)).as("df_stat"),
        when(df < -2.86, 1).otherwise(0).as("stationary"))
    },
    Some(s"""
      WITH sums AS (
        SELECT (epoch_ns(ts) - epoch_ns(ts) % ${Hour} - ${T0}) // ${Hour} AS idx,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      dense AS (
        SELECT g.idx, coalesce(s.v, 0) AS v
        FROM range(0, ${(T1 - T0) / Hour}) g(idx) LEFT JOIN sums s USING (idx)),
      pairs AS (
        SELECT lag(v) OVER (ORDER BY idx) AS x,
               v - lag(v) OVER (ORDER BY idx) AS y
        FROM dense QUALIFY x IS NOT NULL),
      mdh AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxxh,
               sum(CAST(x AS HUGEINT) * y) AS sxyh,
               sum(CAST(y AS HUGEINT) * y) AS syyh
        FROM pairs),
      m AS (
        SELECT CAST(n AS DOUBLE) AS n,
               CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
               ${SharedExprs.hugeToDoubleDuck("sxxh")} AS sxx,
               ${SharedExprs.hugeToDoubleDuck("sxyh")} AS sxy,
               ${SharedExprs.hugeToDoubleDuck("syyh")} AS syy
        FROM mdh),
      fit AS (
        SELECT n, sx, sy, sxy, syy, sxx,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta
        FROM m),
      fit2 AS (
        SELECT n, beta, sxx, sx,
               syy - ((sy - beta * sx) / n) * sy - beta * sxy AS sse
        FROM fit),
      df AS (
        SELECT n, beta,
               beta / sqrt((sse / (n - 2)) / (sxx - sx * sx / n)) AS dfv
        FROM fit2)
      SELECT CAST(n AS BIGINT) AS n_pairs,
             round(beta, 6) + 0.0 AS beta,
             round(dfv, 4) + 0.0 AS df_stat,
             CASE WHEN dfv < -2.86 THEN 1 ELSE 0 END AS stationary
      FROM df"""))

  /** Engle–Granger cointegration test between the click and purchase
    * hourly cent series: step 1 fits y on x by OLS from exact
    * integer moments (product sums in decimal(38,0) ≡ HUGEINT —
    * ≥100× headroom; linear sums stay int64); step 2 runs the
    * Dickey–Fuller regression on the residuals, which are QUANTIZED
    * to integer dollars first (the verdict is insensitive to
    * sub-dollar residual detail), with the same 128-bit product sums
    * — so the second regression's moments are again exact integers
    * and both engines agree bit-for-bit all the way to the
    * cointegrated DECISION (df < −3.34, the 5% Engle–Granger
    * critical value for two variables with constant). The pair
    * series is the dense grid; everything after the one rollup
    * shuffle is grid-bounded. The two 1-row fit frames ride
    * broadcast cross joins. */
  private val cointegration = QueryDef(
    "kdb_cointegration",
    (s, d) => {
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val nSlots = (T1 - T0) / Hour
      val grid = s.range(nSlots).select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val sums = e.groupBy(col("slot_ns")).agg(
        sum(when(col("event_type") === "click", col("cents")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L)).as("y"))
      val dense = grid.join(sums, Seq("slot_ns"), "left_outer")
        .withColumn("x", coalesce(col("x"), lit(0L)))
        .withColumn("y", coalesce(col("y"), lit(0L)))
      val fit = dense.groupBy().agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        // product sums ride decimal(38,0) ≡ HUGEINT: a single x² at
        // 100× the sf0.1 hourly cents volume (~2.6e9 cents) is ~7e18,
        // a hair under int64 max, and the 720-term sum wraps — the
        // kdb_control_rules widening applied at the source
        SharedExprs.hugeToDouble(
          sum(col("x").cast("decimal(38,0)") * col("x"))).as("sxx"),
        SharedExprs.hugeToDouble(
          sum(col("x").cast("decimal(38,0)") * col("y"))).as("sxy"))
        .withColumn("beta", (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
        .withColumn("alpha", (col("sy") - col("beta") * col("sx")) / col("n"))
        .select(col("beta"), col("alpha"))
      val resid = dense.crossJoin(broadcast(fit))
        .withColumn("ri", round(
          (col("y").cast("double") - col("alpha") - col("beta") * col("x"))
            / 100.0, 0).cast("long"))
      val w = Window.orderBy(col("slot_ns")) // grid-bounded frame
      val pairs = resid
        .withColumn("rp", lag(col("ri"), 1).over(w))
        .filter(col("rp").isNotNull)
        .select(col("rp").as("rx"), (col("ri") - col("rp")).as("ry"),
          col("beta"), col("alpha"))
      val m = pairs.groupBy(col("beta"), col("alpha")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("rx")).cast("double").as("sx"),
        sum(col("ry")).cast("double").as("sy"),
        SharedExprs.hugeToDouble(
          sum(col("rx").cast("decimal(38,0)") * col("rx"))).as("sxx"),
        SharedExprs.hugeToDouble(
          sum(col("rx").cast("decimal(38,0)") * col("ry"))).as("sxy"),
        SharedExprs.hugeToDouble(
          sum(col("ry").cast("decimal(38,0)") * col("ry"))).as("syy"))
      val b2 = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      val a2 = (col("sy") - b2 * col("sx")) / col("n")
      val sse = col("syy") - a2 * col("sy") - b2 * col("sxy")
      val dfv = b2 / sqrt((sse / (col("n") - 2)) /
        (col("sxx") - col("sx") * col("sx") / col("n")))
      m.select(
        col("n").cast("long").as("n_pairs"),
        (round(col("beta"), 6) + lit(0.0)).as("beta"),
        (round(col("alpha"), 2) + lit(0.0)).as("alpha"),
        (round(dfv, 4) + lit(0.0)).as("df_resid"),
        when(dfv < -3.34, 1).otherwise(0).as("cointegrated"))
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
      m1h AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxxh,
               sum(CAST(x AS HUGEINT) * y) AS sxyh
        FROM dense),
      m1 AS (
        SELECT CAST(n AS DOUBLE) AS n,
               CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
               ${SharedExprs.hugeToDoubleDuck("sxxh")} AS sxx,
               ${SharedExprs.hugeToDoubleDuck("sxyh")} AS sxy
        FROM m1h),
      fit AS (
        SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
               (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                 AS alpha
        FROM m1),
      resid AS (
        SELECT d.slot_ns,
               CAST(round((CAST(d.y AS DOUBLE) - f.alpha - f.beta * d.x)
                 / 100.0, 0) AS BIGINT) AS ri,
               f.beta, f.alpha
        FROM dense d CROSS JOIN fit f),
      pairs AS (
        SELECT lag(ri) OVER (ORDER BY slot_ns) AS rx,
               ri - lag(ri) OVER (ORDER BY slot_ns) AS ry,
               beta, alpha
        FROM resid QUALIFY rx IS NOT NULL),
      mh AS (
        SELECT beta, alpha, count(*) AS n,
               sum(rx) AS sx, sum(ry) AS sy,
               sum(CAST(rx AS HUGEINT) * rx) AS sxxh,
               sum(CAST(rx AS HUGEINT) * ry) AS sxyh,
               sum(CAST(ry AS HUGEINT) * ry) AS syyh
        FROM pairs GROUP BY 1, 2),
      m AS (
        SELECT beta, alpha, CAST(n AS DOUBLE) AS n,
               CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
               ${SharedExprs.hugeToDoubleDuck("sxxh")} AS sxx,
               ${SharedExprs.hugeToDoubleDuck("sxyh")} AS sxy,
               ${SharedExprs.hugeToDoubleDuck("syyh")} AS syy
        FROM mh),
      f2 AS (
        SELECT beta, alpha, n, sx, sxx, sxy, sy, syy,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b2
        FROM m),
      f3 AS (
        SELECT beta, alpha, n, sx, sxx, b2,
               syy - ((sy - b2 * sx) / n) * sy - b2 * sxy AS sse
        FROM f2),
      df AS (
        SELECT beta, alpha, n, b2,
               b2 / sqrt((sse / (n - 2)) / (sxx - sx * sx / n)) AS dfv
        FROM f3)
      SELECT CAST(n AS BIGINT) AS n_pairs,
             round(beta, 6) + 0.0 AS beta,
             round(alpha, 2) + 0.0 AS alpha,
             round(dfv, 4) + 0.0 AS df_resid,
             CASE WHEN dfv < -3.34 THEN 1 ELSE 0 END AS cointegrated
      FROM df"""))

  /** Granger causality (lag-1): does the click series HELP PREDICT
    * the purchase series beyond purchase's own past? Unrestricted
    * y_t ~ a + b·y_{t−1} + c·x_{t−1} vs restricted y_t ~ a + b·y_{t−1},
    * F = (SSE_r − SSE_u)/(SSE_u/(n−3)). Both regressions solve in
    * closed form from the exact integer moment sums of the
    * (y, y_lag, x_lag) grid triples (product sums in
    * decimal(38,0) ≡ HUGEINT for ≥100× headroom) — centered normal equations via
    * Cramer's rule, every input integer-derived, identical doubles in
    * both engines; the CAUSES decision (F > 3.85, the 5% F(1,∞)
    * critical value) is therefore branch-safe. One rollup shuffle;
    * the lag window runs on the 720-slot grid (bounded). The
    * directional complement of kdb_lead_lag_corr's symmetric
    * cross-correlation. */
  private val granger = QueryDef(
    "kdb_granger",
    (s, d) => {
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val nSlots = (T1 - T0) / Hour
      val grid = s.range(nSlots).select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val sums = e.groupBy(col("slot_ns")).agg(
        sum(when(col("event_type") === "click", col("cents")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L)).as("y"))
      val dense = grid.join(sums, Seq("slot_ns"), "left_outer")
        .withColumn("x", coalesce(col("x"), lit(0L)))
        .withColumn("y", coalesce(col("y"), lit(0L)))
      val w = Window.orderBy(col("slot_ns")) // grid-bounded frame
      val trip = dense
        .withColumn("yl", lag(col("y"), 1).over(w))
        .withColumn("xl", lag(col("x"), 1).over(w))
        .filter(col("yl").isNotNull)
        .select(col("y"), col("yl"), col("xl"))
      val m = trip.groupBy().agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("yl")).cast("double").as("s1"),
        sum(col("xl")).cast("double").as("s2"),
        // decimal(38,0) ≡ HUGEINT product sums (≥100× headroom; a
        // single yl² at 100× volume grazes int64 max — see
        // kdb_cointegration's widening note)
        SharedExprs.hugeToDouble(
          sum(col("yl").cast("decimal(38,0)") * col("yl"))).as("s11"),
        SharedExprs.hugeToDouble(
          sum(col("xl").cast("decimal(38,0)") * col("xl"))).as("s22"),
        SharedExprs.hugeToDouble(
          sum(col("yl").cast("decimal(38,0)") * col("xl"))).as("s12"),
        SharedExprs.hugeToDouble(
          sum(col("y").cast("decimal(38,0)") * col("yl"))).as("sy1"),
        SharedExprs.hugeToDouble(
          sum(col("y").cast("decimal(38,0)") * col("xl"))).as("sy2"),
        SharedExprs.hugeToDouble(
          sum(col("y").cast("decimal(38,0)") * col("y"))).as("syy"))
      // centered co-moments (all one-op combinations of exact sums)
      val c11 = col("s11") - col("s1") * col("s1") / col("n")
      val c22 = col("s22") - col("s2") * col("s2") / col("n")
      val c12 = col("s12") - col("s1") * col("s2") / col("n")
      val cy1 = col("sy1") - col("sy") * col("s1") / col("n")
      val cy2 = col("sy2") - col("sy") * col("s2") / col("n")
      val cyy = col("syy") - col("sy") * col("sy") / col("n")
      val det = c11 * c22 - c12 * c12
      val b = (cy1 * c22 - cy2 * c12) / det
      val c = (cy2 * c11 - cy1 * c12) / det
      val sseU = cyy - b * cy1 - c * cy2
      val sseR = cyy - cy1 * cy1 / c11
      val f = (sseR - sseU) / (sseU / (col("n") - 3))
      m.select(
        col("n").cast("long").as("n_pairs"),
        (round(b, 6) + lit(0.0)).as("b_ylag"),
        (round(c, 6) + lit(0.0)).as("c_xlag"),
        (round(f, 4) + lit(0.0)).as("f_stat"),
        when(f > 3.85, 1).otherwise(0).as("x_causes_y"))
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
      trip AS (
        SELECT y, lag(y) OVER (ORDER BY slot_ns) AS yl,
               lag(x) OVER (ORDER BY slot_ns) AS xl
        FROM dense QUALIFY yl IS NOT NULL),
      mqh AS (
        SELECT count(*) AS n, sum(y) AS sy, sum(yl) AS s1, sum(xl) AS s2,
               sum(CAST(yl AS HUGEINT) * yl) AS s11h,
               sum(CAST(xl AS HUGEINT) * xl) AS s22h,
               sum(CAST(yl AS HUGEINT) * xl) AS s12h,
               sum(CAST(y AS HUGEINT) * yl) AS sy1h,
               sum(CAST(y AS HUGEINT) * xl) AS sy2h,
               sum(CAST(y AS HUGEINT) * y) AS syyh
        FROM trip),
      m AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(sy AS DOUBLE) AS sy,
               CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
               ${SharedExprs.hugeToDoubleDuck("s11h")} AS s11,
               ${SharedExprs.hugeToDoubleDuck("s22h")} AS s22,
               ${SharedExprs.hugeToDoubleDuck("s12h")} AS s12,
               ${SharedExprs.hugeToDoubleDuck("sy1h")} AS sy1,
               ${SharedExprs.hugeToDoubleDuck("sy2h")} AS sy2,
               ${SharedExprs.hugeToDoubleDuck("syyh")} AS syy
        FROM mqh),
      cm AS (
        SELECT n,
               s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12,
               sy1 - sy * s1 / n AS cy1, sy2 - sy * s2 / n AS cy2,
               syy - sy * sy / n AS cyy
        FROM m),
      fit AS (
        SELECT n, cy1, cy2, cyy, c11,
               (cy1 * c22 - cy2 * c12) / (c11 * c22 - c12 * c12) AS b,
               (cy2 * c11 - cy1 * c12) / (c11 * c22 - c12 * c12) AS c
        FROM cm),
      ff AS (
        SELECT n, b, c,
               ((cyy - cy1 * cy1 / c11) - (cyy - b * cy1 - c * cy2)) /
                 ((cyy - b * cy1 - c * cy2) / (n - 3)) AS f
        FROM fit)
      SELECT CAST(n AS BIGINT) AS n_pairs,
             round(b, 6) + 0.0 AS b_ylag,
             round(c, 6) + 0.0 AS c_xlag,
             round(f, 4) + 0.0 AS f_stat,
             CASE WHEN f > 3.85 THEN 1 ELSE 0 END AS x_causes_y
      FROM ff"""))

  /** Ljung–Box portmanteau test on the hourly total-cents series:
    * Q = n(n+2)·Σ_{k=1..6} ρ̂²_k/(n−k), the "is anything left in the
    * autocorrelations?" white-noise audit that closes the ACF family
    * (kdb_acf reports the ρ̂s; this one makes the joint decision).
    * Each ρ̂_k comes from exact integer lagged moments over the dense
    * grid (product sums in decimal(38,0) ≡ HUGEINT, ≥100× headroom) (6 lead() columns in one bounded window pass), expanded
    * around the full-series mean with the identical association
    * order in both engines; the six ρ² terms fold in EXPLICIT k
    * order (a sum() over rows would be order-nondeterministic even
    * at 6 rows), so the white-noise decision at the χ²(6) 5% value
    * 12.59 is branch-safe. One rollup shuffle; grid-bounded after. */
  private val ljungBox = QueryDef(
    "kdb_ljung_box",
    (s, d) => {
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
      val nSlots = (T1 - T0) / Hour
      val grid = s.range(nSlots).select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val sums = e
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("slot_ns")).agg(sum(col("cents")).as("x"))
      val dense = grid.join(sums, Seq("slot_ns"), "left_outer")
        .withColumn("x", coalesce(col("x"), lit(0L)))
      val w = Window.orderBy(col("slot_ns")) // grid-bounded frame
      val lagged = (1 to 6).foldLeft(dense) { (df, k) =>
        df.withColumn(s"x$k", lead(col("x"), k).over(w))
      }
      val aggs = Seq(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        // decimal(38,0) ≡ HUGEINT product sums — ≥100× headroom
        // (see kdb_cointegration's widening note)
        SharedExprs.hugeToDouble(
          sum(col("x").cast("decimal(38,0)") * col("x"))).as("sxx")) ++
        (1 to 6).flatMap { k => Seq(
          SharedExprs.hugeToDouble(
            sum(col("x").cast("decimal(38,0)") * col(s"x$k"))).as(s"sxy$k"),
          sum(when(col(s"x$k").isNotNull, col("x"))).cast("double").as(s"sa$k"),
          sum(col(s"x$k")).cast("double").as(s"sb$k"))
        }
      val m = lagged.groupBy().agg(aggs.head, aggs.tail: _*)
      val mean = col("sx") / col("n")
      val den = col("sxx") - col("sx") * col("sx") / col("n")
      def rho(k: Int) =
        (col(s"sxy$k") - mean * (col(s"sa$k") + col(s"sb$k")) +
          (col("n") - k) * mean * mean) / den
      // explicit k-order fold: r1²/(n−1) + … + r6²/(n−6)
      val qSum = (1 to 6).map(k => rho(k) * rho(k) / (col("n") - k))
        .reduceLeft(_ + _)
      val q = col("n") * (col("n") + 2) * qSum
      val sel = Seq(col("n").cast("long").as("n_slots")) ++
        (1 to 6).map(k => (round(rho(k), 4) + lit(0.0)).as(s"rho$k")) ++
        Seq((round(q, 4) + lit(0.0)).as("q_stat"),
          when(q <= 12.59, 1).otherwise(0).as("white_noise"))
      m.select(sel: _*)
    },
    Some {
      val leads = (1 to 6).map(k =>
        s"lead(x, $k) OVER (ORDER BY slot_ns) AS x$k").mkString(", ")
      val momentsH = (1 to 6).map(k => s"""
        sum(CAST(x AS HUGEINT) * x$k) AS sxy${k}h,
        sum(CASE WHEN x$k IS NOT NULL THEN x END) AS sa${k}h,
        sum(x$k) AS sb${k}h""").mkString(",")
      val moments = (1 to 6).map(k => s"""
        ${SharedExprs.hugeToDoubleDuck(s"sxy${k}h")} AS sxy$k,
        CAST(sa${k}h AS DOUBLE) AS sa$k,
        CAST(sb${k}h AS DOUBLE) AS sb$k""").mkString(",")
      def rho(k: Int) =
        s"(sxy$k - (sx / n) * (sa$k + sb$k) + (n - $k) * (sx / n) * (sx / n)) / (sxx - sx * sx / n)"
      val qSum = (1 to 6).map(k => s"(${rho(k)}) * (${rho(k)}) / (n - $k)")
        .mkString(" + ")
      val rhos = (1 to 6).map(k => s"round(${rho(k)}, 4) + 0.0 AS rho$k")
        .mkString(", ")
      s"""
      WITH sums AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      dense AS (
        SELECT g.slot_ns, coalesce(s.x, 0) AS x
        FROM range(${T0}, ${T1}, ${Hour}) g(slot_ns)
        LEFT JOIN sums s USING (slot_ns)),
      lagged AS (SELECT x, $leads FROM dense),
      mlh AS (
        SELECT count(*) AS nh, sum(x) AS sxh,
               sum(CAST(x AS HUGEINT) * x) AS sxxh, $momentsH
        FROM lagged),
      m AS (
        SELECT CAST(nh AS DOUBLE) AS n, CAST(sxh AS DOUBLE) AS sx,
               ${SharedExprs.hugeToDoubleDuck("sxxh")} AS sxx, $moments
        FROM mlh)
      SELECT CAST(n AS BIGINT) AS n_slots, $rhos,
             round(n * (n + 2) * ($qSum), 4) + 0.0 AS q_stat,
             CASE WHEN n * (n + 2) * ($qSum) <= 12.59 THEN 1 ELSE 0 END
               AS white_noise
      FROM m"""
    })

  /** Split-conformal prediction interval for the next-step Holt
    * forecast, per event type: replay Holt(α=0.5, β=0.25) over the
    * slot series keeping the whole (level, trend) TRACE, score every
    * one-step-ahead forecast's absolute residual (the
    * kdb_forecast_backtest walk-forward, with the residual SERIES
    * kept instead of folded to MAE), and take the conformal quantile
    * — the ⌈0.9·(m+1)⌉-th smallest residual, an ORDER STATISTIC, no
    * interpolation — as the ±band around the next forecast.
    * Distribution-free coverage is conformal's whole point: no
    * normality assumed anywhere. The trace is a list-accumulator
    * fold in Spark and the kdb_holt_trend recursive CTE in DuckDB
    * (struct-fold accumulators miscompute in DuckDB 1.0.0 —
    * documented gotcha); identical association order makes every
    * level/trend/residual double bit-identical pre-round, and the
    * order-statistic quantile is exact in both. Slot-bounded per
    * type after one rollup shuffle. */
  private val conformal = QueryDef(
    "kdb_conformal_forecast",
    (s, d) => {
      val arrs = ev(s, d)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("event_type"), col("slot_ns"))
        .agg(max(col("value")).as("v"))
        .groupBy(col("event_type"))
        .agg(transform(sort_array(collect_list(struct(col("slot_ns"), col("v")))),
          r => r.getField("v")).as("vs"))
      val zero = array().cast("array<struct<l:double,b:double>>")
      val fold = aggregate(col("vs"), zero, (acc, x) => {
        val last = element_at(acc, -1)
        val lNew = lit(0.5) * x + lit(0.5) *
          (last.getField("l") + last.getField("b"))
        val bNew = lit(0.25) * (lNew - last.getField("l")) +
          lit(0.75) * last.getField("b")
        when(size(acc) === 0,
          array(struct(x.cast("double").as("l"), lit(0.0).as("b"))))
          .otherwise(concat(acc, array(struct(lNew.as("l"), bNew.as("b")))))
      })
      val withTrace = arrs.withColumn("tr", fold)
        .withColumn("resids", array_sort(
          transform(sequence(lit(2), size(col("vs"))), i =>
            abs(element_at(col("vs"), i).cast("double") -
              (element_at(col("tr"), i - 1).getField("l") +
                element_at(col("tr"), i - 1).getField("b"))))))
        .withColumn("m", size(col("vs")) - 1)
        .withColumn("k", least(
          ceil(lit(0.9) * (col("m") + 1)).cast("int"), col("m")))
        .withColumn("fc", element_at(col("tr"), -1).getField("l") +
          element_at(col("tr"), -1).getField("b"))
        .withColumn("q", when(col("m") > 0,
          element_at(col("resids"), col("k"))))
      withTrace.select(col("event_type"), col("m").as("n_cal"),
        (round(col("fc"), 2) + lit(0.0)).as("forecast"),
        (round(col("q"), 2) + lit(0.0)).as("q90"),
        (round(col("fc") - col("q"), 2) + lit(0.0)).as("lo90"),
        (round(col("fc") + col("q"), 2) + lit(0.0)).as("hi90"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH RECURSIVE h AS (
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               max(value) AS v
        FROM events GROUP BY 1, 2),
      arrs AS (
        SELECT event_type AS et, list(v ORDER BY slot_ns) AS vs
        FROM h GROUP BY 1),
      dp(et, i, l, b) AS (
        SELECT et, 1, CAST(vs[1] AS DOUBLE), CAST(0.0 AS DOUBLE) FROM arrs
        UNION ALL
        SELECT d.et, d.i + 1,
               0.5 * a.vs[d.i + 1] + 0.5 * (d.l + d.b),
               0.25 * ((0.5 * a.vs[d.i + 1] + 0.5 * (d.l + d.b)) - d.l)
                 + 0.75 * d.b
        FROM dp d JOIN arrs a ON a.et = d.et
        WHERE d.i < len(a.vs)),
      resid AS (
        SELECT d.et, abs(a.vs[d.i + 1] - (d.l + d.b)) AS r
        FROM dp d JOIN arrs a ON a.et = d.et
        WHERE d.i < len(a.vs)),
      ragg AS (
        SELECT et, list_sort(list(r)) AS rs, count(*) AS m
        FROM resid GROUP BY 1),
      fc AS (
        SELECT d.et, d.l + d.b AS fc
        FROM dp d JOIN arrs a ON a.et = d.et
        WHERE d.i = len(a.vs)),
      out AS (
        SELECT r.et, r.m, f.fc,
               CASE WHEN r.m > 0 THEN r.rs[least(
                 CAST(ceil(0.9 * (r.m + 1)) AS BIGINT), r.m)] END AS q
        FROM ragg r JOIN fc f ON f.et = r.et)
      SELECT et AS event_type, CAST(m AS INTEGER) AS n_cal,
             round(fc, 2) + 0.0 AS forecast,
             round(q, 2) + 0.0 AS q90,
             round(fc - q, 2) + 0.0 AS lo90,
             round(fc + q, 2) + 0.0 AS hi90
      FROM out
      ORDER BY event_type"""))

  /** Sequential probability ratio test (Wald's SPRT) on the hourly
    * purchase stream: H0 p=0.30 vs H1 p=0.35 conversion (payload >
    * $50), α=β=0.05 barriers at ±ln 19 — the always-valid sequential
    * complement to kdb_ab_test's fixed-horizon z-test: it reports
    * the FIRST hour the evidence crossed a barrier, not just the
    * end-of-month verdict. Branch-safety (the llm_quality_classifier
    * rule, applied to a sequential decision): the per-outcome LLR
    * increments and the barriers are HARDCODED literal doubles
    * identical in both engines — never a runtime ln — and the
    * cumulative LLR at slot t is K_t·A + (N_t−K_t)·B from INTEGER
    * cumulative counts (window-summed longs, the kdb_stl rule; a
    * double cumsum would diverge between Spark's running frames and
    * DuckDB's segment trees). Grid-bounded after one rollup. */
  private val sprt = QueryDef(
    "kdb_sprt",
    (s, d) => {
      val A = 0.15415067982725836 // ln(0.35/0.30)
      val B = -0.07410797215372172 // ln(0.65/0.70)
      val Bar = 2.9444389791664403 // ln((1-0.05)/0.05)
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .filter(col("event_type") === "purchase")
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
      val perSlot = e.groupBy(col("slot_ns")).agg(
        count(lit(1)).as("n"),
        count(when(col("value") > 50.0, 1)).as("k"))
      val w = Window.orderBy(col("slot_ns"))
        .rowsBetween(Window.unboundedPreceding, 0) // slot grid: bounded
      val llr = perSlot
        .withColumn("kc", sum(col("k")).over(w))
        .withColumn("nc", sum(col("n")).over(w))
        .withColumn("llr",
          col("kc") * lit(A) + (col("nc") - col("kc")) * lit(B))
      llr.groupBy().agg(
        count(lit(1)).as("n_slots"),
        max(col("nc")).as("n_trials"),
        max(col("kc")).as("k_success"),
        min(when(col("llr") >= Bar, col("slot_ns"))).as("h1_cross_ns"),
        min(when(col("llr") <= -Bar, col("slot_ns"))).as("h0_cross_ns"),
        (round(max_by(col("llr"), col("slot_ns")), 4) + lit(0.0)).as("llr_final"))
        .select(col("n_slots"), col("n_trials"), col("k_success"),
          col("h1_cross_ns"), col("h0_cross_ns"), col("llr_final"),
          when(col("h1_cross_ns").isNotNull &&
            (col("h0_cross_ns").isNull || col("h1_cross_ns") <= col("h0_cross_ns")),
            "accept_h1")
            .when(col("h0_cross_ns").isNotNull, "accept_h0")
            .otherwise("continue").as("decision"))
    },
    Some(s"""
      WITH perslot AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               count(*) AS n,
               count(CASE WHEN value > 50.0 THEN 1 END) AS k
        FROM events
        WHERE event_type = 'purchase'
          AND epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      cum AS (
        SELECT slot_ns,
               CAST(sum(k) OVER (ORDER BY slot_ns
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kc,
               CAST(sum(n) OVER (ORDER BY slot_ns
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nc
        FROM perslot),
      llr AS (
        SELECT slot_ns, kc, nc,
               kc * CAST(0.15415067982725836 AS DOUBLE)
                 + (nc - kc) * CAST(-0.07410797215372172 AS DOUBLE) AS llr
        FROM cum),
      agg AS (
        SELECT count(*) AS n_slots,
               CAST(max(nc) AS BIGINT) AS n_trials,
               CAST(max(kc) AS BIGINT) AS k_success,
               min(CASE WHEN llr >= 2.9444389791664403 THEN slot_ns END)
                 AS h1_cross_ns,
               min(CASE WHEN llr <= -2.9444389791664403 THEN slot_ns END)
                 AS h0_cross_ns,
               round(arg_max(llr, slot_ns), 4) + 0.0 AS llr_final
        FROM llr)
      SELECT n_slots, n_trials, k_success, h1_cross_ns, h0_cross_ns,
             llr_final,
             CASE WHEN h1_cross_ns IS NOT NULL AND
                    (h0_cross_ns IS NULL OR h1_cross_ns <= h0_cross_ns)
                  THEN 'accept_h1'
                  WHEN h0_cross_ns IS NOT NULL THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM agg"""))

  /** Entropy rate of the event-type stream: the conditional entropy
    * H(next|current) in bits over the same per-user (ts_us,
    * event_id)-ordered transitions as kdb_event_transitions, beside
    * the marginal H(next) and their difference — the mutual
    * information, i.e. how many bits the current event type buys you
    * about the next one (the Markov matrix summarized to one
    * predictability number). Counts are exact int64; the ≤|types|²
    * entropy terms sum as doubles and feed only 4dp-rounded REPORTED
    * values (the lm_score precedent — never a branch). Transition
    * counts are one shuffle; everything after is |types|²-bounded
    * with 1-row totals on broadcast cross joins. */
  private val entropyRate = QueryDef(
    "kdb_entropy_rate",
    (s, d) => {
      val L = 0.6931471805599453 // ln 2
      val seqW = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      // |types|²-bounded transition table consumed by FOUR branches
      // (row/next/grand totals + the conditional term): checkpoint so
      // the data-sized sequence pass runs once, not per branch (probed:
      // exchange reuse does NOT collapse these at runtime)
      val c = ev(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("nxt", lead(col("event_type"), 1).over(seqW))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("nij"))
        .localCheckpoint(true)
      val rowTot = c.groupBy(col("cur")).agg(sum(col("nij")).as("ni"))
      val nTot = c.groupBy().agg(sum(col("nij")).as("nn"))
      val sc = c.join(broadcast(rowTot), Seq("cur"))
        .crossJoin(broadcast(nTot))
        .groupBy().agg(sum(
          (col("nij").cast("double") / col("nn")) *
            log(col("nij").cast("double") / col("ni"))).as("s_cond"))
      val sn = c.groupBy(col("nxt")).agg(sum(col("nij")).as("nj"))
        .crossJoin(broadcast(nTot))
        .groupBy().agg(sum(
          (col("nj").cast("double") / col("nn")) *
            log(col("nj").cast("double") / col("nn"))).as("s_next"))
      nTot.crossJoin(sc).crossJoin(sn).select(
        col("nn").as("n_transitions"),
        (round(-col("s_next") / L, 4) + lit(0.0)).as("h_next_bits"),
        (round(-col("s_cond") / L, 4) + lit(0.0)).as("h_cond_bits"),
        (round((col("s_cond") - col("s_next")) / L, 4) + lit(0.0))
          .as("info_gain_bits"))
    },
    Some("""
      WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
      c AS (
        SELECT event_type AS cur, nxt, count(*) AS nij
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY 1, 2),
      rowtot AS (SELECT cur, CAST(sum(nij) AS BIGINT) AS ni FROM c GROUP BY 1),
      ntot AS (SELECT CAST(sum(nij) AS BIGINT) AS nn FROM c),
      sc AS (
        SELECT sum((CAST(nij AS DOUBLE) / nn) *
                 ln(CAST(nij AS DOUBLE) / ni)) AS s_cond
        FROM c JOIN rowtot USING (cur) CROSS JOIN ntot),
      sn AS (
        SELECT sum((CAST(nj AS DOUBLE) / nn) *
                 ln(CAST(nj AS DOUBLE) / nn)) AS s_next
        FROM (SELECT nxt, CAST(sum(nij) AS BIGINT) AS nj FROM c GROUP BY 1)
        CROSS JOIN ntot)
      SELECT nn AS n_transitions,
             round(-s_next / 0.6931471805599453, 4) + 0.0 AS h_next_bits,
             round(-s_cond / 0.6931471805599453, 4) + 0.0 AS h_cond_bits,
             round((s_cond - s_next) / 0.6931471805599453, 4) + 0.0
               AS info_gain_bits
      FROM ntot CROSS JOIN sc CROSS JOIN sn"""))

  /** Two-sample Kolmogorov–Smirnov test: click vs purchase payload
    * distributions — the distribution-SHAPE complement to
    * [[welch]] (location) and [[mannWhitney]] (rank shift): D is the
    * sup-distance between the two empirical CDFs, sensitive to any
    * difference. Skew-proof decomposition: rows fold to ONE row per
    * distinct value carrying both groups' tie counts, then ONE range
    * shuffle ([[DistributedRank.withPrefixSums]] — the two running
    * ECDFs share the pass) yields both inclusive cumulative counts;
    * D = max over distinct values of |F₁−F₂| is a plain aggregation.
    * ECDF steps are exact rationals (int/int) so D differs between
    * engines only in the final double division. p is the standard
    * Kolmogorov series truncated at k=5 with Stephens' small-sample λ
    * correction — pure algebra on one row. */
  private val ksTest = QueryDef(
    "kdb_ks_test",
    (s, d) => {
      val x = ev(s, d).filter(col("event_type").isin("click", "purchase"))
        .select(col("value"), col("event_type").as("grp"))
      val byVal = x.groupBy(col("value")).agg(
        sum(when(col("grp") === "click", 1L).otherwise(0L)).as("t1"),
        sum(when(col("grp") === "purchase", 1L).otherwise(0L)).as("t2"))
      val cum = graft.operators.DistributedRank.withPrefixSums(
        byVal, Seq((col("t1"), "c1b"), (col("t2"), "c2b")), Seq(col("value")))
      // totals from the checkpointed prefix-sum frame — byVal itself
      // would re-scan events; cum is pinned inside withPrefixSums
      val tot = cum.groupBy().agg(
        sum(col("t1")).as("n1"), sum(col("t2")).as("n2"))
      val dRow = cum.crossJoin(broadcast(tot))
        .select(abs((col("c1b") + col("t1")).cast("double") / col("n1") -
          (col("c2b") + col("t2")).cast("double") / col("n2")).as("gap"),
          col("n1"), col("n2"))
        .groupBy(col("n1"), col("n2")).agg(max(col("gap")).as("d"))
      val en = col("n1").cast("double") * col("n2") / (col("n1") + col("n2"))
      val lam = (sqrt(en) + lit(0.12) + lit(0.11) / sqrt(en)) * col("d")
      val pRaw = (1 to 5).map { k =>
        lit(2.0 * (if (k % 2 == 1) 1 else -1)) * exp(lit(-2.0 * k * k) * lam * lam)
      }.reduce(_ + _)
      dRow.select(
        col("n1"), col("n2"),
        round(col("d"), 4).as("d_stat"),
        round(lam, 4).as("lambda"),
        round(greatest(least(pRaw, lit(1.0)), lit(0.0)), 4).as("p_value"))
    },
    Some("""
      WITH x AS (
        SELECT value, event_type AS grp
        FROM events WHERE event_type IN ('click', 'purchase')),
      byval AS (
        SELECT value,
               sum(CASE WHEN grp = 'click' THEN 1 ELSE 0 END) AS t1,
               sum(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS t2
        FROM x GROUP BY 1),
      cum AS (
        SELECT CAST(sum(t1) OVER (ORDER BY value) AS BIGINT) AS c1,
               CAST(sum(t2) OVER (ORDER BY value) AS BIGINT) AS c2
        FROM byval),
      tot AS (
        SELECT CAST(sum(t1) AS BIGINT) AS n1, CAST(sum(t2) AS BIGINT) AS n2
        FROM byval),
      dd AS (
        SELECT n1, n2,
               max(abs(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)) AS d
        FROM cum CROSS JOIN tot GROUP BY 1, 2),
      lamt AS (
        SELECT n1, n2, d,
               (sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) + 0.12 +
                0.11 / sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))) * d AS lam
        FROM dd)
      SELECT n1, n2, round(d, 4) AS d_stat, round(lam, 4) AS lambda,
             round(greatest(least(
               2.0 * exp(-2.0 * lam * lam) - 2.0 * exp(-8.0 * lam * lam)
               + 2.0 * exp(-18.0 * lam * lam) - 2.0 * exp(-32.0 * lam * lam)
               + 2.0 * exp(-50.0 * lam * lam), 1.0), 0.0), 4) AS p_value
      FROM lamt"""))

  /** Kruskal–Wallis H: does ANY event type's payload distribution
    * differ? — the k-group generalization of [[mannWhitney]], sharing
    * its skew-proof midrank decomposition: one row per distinct value
    * (total tie count t), one range shuffle for the exclusive prefix
    * sum, midrank = cum_before + (t+1)/2 in closed form, then per-
    * (value, group) counts join the |distinct values|-sized midrank
    * frame (an aggregate-sized shuffle join, never data² work). Rank
    * sums R_g are exact in doubles (midranks are integer halves);
    * H gets the standard tie correction. The only data-sized pass is
    * the first groupBy. */
  private val kruskal = QueryDef(
    "kdb_kruskal_wallis",
    (s, d) => {
      val x = ev(s, d).select(col("value"), col("event_type").as("grp"))
      // one data-sized agg, pinned: everything downstream reads this
      // aggregate-sized frame, never events again
      val byValGrp = x.groupBy(col("value"), col("grp"))
        .agg(count(lit(1)).as("ngv"))
        .localCheckpoint()
      val byVal = byValGrp.groupBy(col("value")).agg(sum(col("ngv")).as("t"))
      val mid = DistributedRank.withPrefixSum(
          byVal, col("t"), "cum_before", Seq(col("value")))
        .select(col("value"), col("t"),
          (col("cum_before") + (col("t") + 1) / lit(2.0)).as("midrank"))
      val rg = byValGrp.join(mid.drop("t"), Seq("value"))
        .groupBy(col("grp"))
        .agg(sum(col("ngv")).as("ng"),
          sum(col("ngv") * col("midrank")).as("rg"))
      val ties = mid.groupBy().agg(
        sum(col("t") * col("t") * col("t") - col("t")).cast("double").as("tiesum"))
      val one = rg.groupBy().agg(
        sum(col("ng")).as("n_total"),
        count(lit(1)).as("k_groups"),
        sum(col("rg") * col("rg") / col("ng")).as("sr2"))
      val n = col("n_total").cast("double")
      val h = lit(12.0) / (n * (n + 1)) * col("sr2") - lit(3.0) * (n + 1)
      val corr = lit(1.0) - col("tiesum") / (n * n * n - n)
      one.crossJoin(ties).select(
        col("n_total"), col("k_groups"),
        (col("k_groups") - 1).cast("int").as("df"),
        round(h, 4).as("h_stat"),
        round(h / corr, 4).as("h_corrected"))
    },
    Some("""
      WITH x AS (SELECT value, event_type AS grp, event_id FROM events),
      ranked AS (
        SELECT value, grp,
               row_number() OVER (ORDER BY value, grp, event_id) AS rn
        FROM x),
      mid AS (
        SELECT grp, avg(rn) OVER (PARTITION BY value) AS midrank
        FROM ranked),
      rg AS (
        SELECT grp, count(*) AS ng, sum(midrank) AS rg FROM mid GROUP BY 1),
      ties AS (
        SELECT sum(tc * tc * tc - tc) AS tiesum FROM (
          SELECT CAST(count(*) AS DOUBLE) AS tc FROM ranked GROUP BY value)),
      one AS (
        SELECT CAST(sum(ng) AS BIGINT) AS n_total,
               count(*) AS k_groups,
               sum(rg * rg / ng) AS sr2
        FROM rg)
      SELECT n_total, k_groups, CAST(k_groups - 1 AS INT) AS df,
             round(12.0 / (n_total * (n_total + 1.0)) * sr2
                   - 3.0 * (n_total + 1.0), 4) AS h_stat,
             round((12.0 / (n_total * (n_total + 1.0)) * sr2
                   - 3.0 * (n_total + 1.0)) /
                   (1.0 - tiesum / (CAST(n_total AS DOUBLE) * n_total * n_total
                    - n_total)), 4) AS h_corrected
      FROM one CROSS JOIN ties"""))

  /** Generalized-ESD outlier pass (Rosner) over the daily total-cents
    * series: three rounds of "flag the most extreme studentized
    * residual, then re-estimate without it" — the masking-proof
    * anomaly sweep (a single z-score pass hides a second outlier
    * behind the first's inflated σ; kdb_zscore_anomaly is that single
    * pass, this is the iterated fix). The data-sized work is ONE
    * daily rollup to exact integer cents; each round then runs on the
    * ≤30-row grid frame (agg → broadcast stats → arg-max row →
    * anti-join), so the iteration cost is constant in data size.
    * Tie-break on (|z| desc, day asc) makes the removal order total. */
  private val esd = QueryDef(
    "kdb_esd_outliers",
    (s, d) => {
      val daily = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("day_idx",
          ((col("ts_ns") - lit(T0)) / lit(24L * Hour)).cast("long"))
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("day_idx")).agg(sum(col("cents")).as("x"))
        .localCheckpoint() // 30-row frame; pin it so 3 rounds don't rescan
      var remaining = daily
      var removed: DataFrame = null
      for (r <- 1 to 3) {
        val stats = remaining.groupBy().agg(
          avg(col("x")).as("m"), stddev_samp(col("x")).as("sd"))
        // σ = 0 (constant remainder) ⇒ NULL z, not a divide error;
        // the deterministic (|z| DESC NULLS LAST, day) order then
        // removes the smallest remaining day — same rule both engines
        val top = remaining.crossJoin(broadcast(stats))
          .withColumn("z", (col("x") - col("m")) / nullif(col("sd"), lit(0.0)))
          .orderBy(abs(col("z")).desc, col("day_idx").asc)
          .limit(1)
          .select(lit(r).as("round_no"), col("day_idx"),
            round(col("x") / lit(100.0), 2).as("day_total"),
            (round(col("z"), 4) + lit(0.0)).as("esd_z"))
          .localCheckpoint()
        removed = if (removed == null) top else removed.unionAll(top)
        remaining = remaining.join(
          top.select(col("day_idx").as("rm")),
          col("day_idx") === col("rm"), "left_anti")
      }
      removed.orderBy(col("round_no"))
    },
    Some(s"""
      WITH s0 AS (
        SELECT (epoch_ns(ts) - ${T0}) // ${24L * Hour} AS day_idx,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      o1 AS (
        SELECT day_idx, x, (x - avg(x) OVER ())
                 / nullif(stddev_samp(x) OVER (), 0.0) AS z
        FROM s0 ORDER BY abs(z) DESC NULLS LAST, day_idx ASC LIMIT 1),
      s1 AS (SELECT * FROM s0 WHERE day_idx NOT IN (SELECT day_idx FROM o1)),
      o2 AS (
        SELECT day_idx, x, (x - avg(x) OVER ())
                 / nullif(stddev_samp(x) OVER (), 0.0) AS z
        FROM s1 ORDER BY abs(z) DESC NULLS LAST, day_idx ASC LIMIT 1),
      s2 AS (SELECT * FROM s1 WHERE day_idx NOT IN (SELECT day_idx FROM o2)),
      o3 AS (
        SELECT day_idx, x, (x - avg(x) OVER ())
                 / nullif(stddev_samp(x) OVER (), 0.0) AS z
        FROM s2 ORDER BY abs(z) DESC NULLS LAST, day_idx ASC LIMIT 1)
      SELECT 1 AS round_no, day_idx, round(x / 100.0, 2) AS day_total,
             round(z, 4) + 0.0 AS esd_z FROM o1
      UNION ALL
      SELECT 2, day_idx, round(x / 100.0, 2), round(z, 4) + 0.0 FROM o2
      UNION ALL
      SELECT 3, day_idx, round(x / 100.0, 2), round(z, 4) + 0.0 FROM o3
      ORDER BY round_no"""))

  /** Circular (directional) statistics of event time-of-day per type:
    * the mean hour and resultant length R̄ of the 24 h phase angle —
    * the correct way to average times of day (a linear mean calls
    * 23:00+01:00 "noon"; the circular mean says midnight, R̄ says how
    * concentrated). One map-side-combinable aggregation of (Σcos,
    * Σsin, n); everything downstream is one-row-per-type algebra.
    * Angles come from µs-of-day (exact integers) so both engines feed
    * cos/sin identical arguments in [0, 2π). */
  private val circular = QueryDef(
    "kdb_circular_stats",
    (s, d) => {
      val DayUs = 86400000000L
      val theta = col("us_day").cast("double") / lit(DayUs.toDouble) *
        lit(2.0 * math.Pi)
      val g = ev(s, d)
        .withColumn("us_day", expr("ts_ns div 1000") % DayUs)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cos(theta)).as("c"), sum(sin(theta)).as("ss"))
      val rbar = sqrt(col("c") * col("c") + col("ss") * col("ss")) / col("n")
      val ang = atan2(col("ss"), col("c"))
      val angPos = (ang + lit(2.0 * math.Pi)) % lit(2.0 * math.Pi)
      g.select(
        col("event_type"), col("n"),
        round(angPos / lit(2.0 * math.Pi) * 24, 4).as("mean_hour"),
        round(rbar, 4).as("resultant"),
        round(sqrt(lit(-2.0) * log(rbar)) / lit(2.0 * math.Pi) * 24, 4)
          .as("circ_std_hours"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH g AS (
        SELECT event_type, count(*) AS n,
               sum(cos((epoch_ns(ts) // 1000 % 86400000000)
                   / 86400000000.0 * 2 * pi())) AS c,
               sum(sin((epoch_ns(ts) // 1000 % 86400000000)
                   / 86400000000.0 * 2 * pi())) AS ss
        FROM events GROUP BY 1)
      SELECT event_type, n,
             round(((atan2(ss, c) + 2 * pi()) % (2 * pi()))
                   / (2 * pi()) * 24, 4) AS mean_hour,
             round(sqrt(c * c + ss * ss) / n, 4) AS resultant,
             round(sqrt(-2 * ln(sqrt(c * c + ss * ss) / n))
                   / (2 * pi()) * 24, 4) AS circ_std_hours
      FROM g ORDER BY event_type"""))

  /** Hill tail-index estimator for the purchase-value distribution:
    * α̂ = k / Σᵢ ln(xᵢ/x₍ₖ₊₁₎) over the k = 200 largest order
    * statistics — the standard "how heavy is the tail" number that
    * decides whether means/variances are even finite (α ≤ 2 ⇒
    * infinite variance ⇒ kdb_welch_ttest is the wrong tool). Scale
    * shape: the ONLY data-sized op is a k-bounded TakeOrdered (top
    * 201 rows by value); the estimator itself runs on that constant-
    * size frame. Boundary ties are harmless: tied values contribute
    * ln(1) = 0 regardless of which tied ROWS the limit keeps. */
  private val tailIndex = QueryDef(
    "kdb_tail_index",
    (s, d) => {
      val top = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("value"))
        .orderBy(col("value").desc)
        .limit(201)
        .localCheckpoint() // 201-row frame: branch for threshold + sum
      val thr = top.groupBy().agg(min(col("value")).as("xmin"))
      val hill = top.crossJoin(broadcast(thr))
        .filter(col("value") > col("xmin"))
        .groupBy(col("xmin"))
        .agg(count(lit(1)).as("k_used"),
          sum(log(col("value") / col("xmin"))).as("lsum"))
      hill.select(
        col("k_used"),
        round(col("xmin"), 4).as("x_threshold"),
        round(col("k_used") / col("lsum"), 4).as("alpha_hill"),
        round(col("lsum") / col("k_used"), 4).as("mean_excess_log"))
    },
    Some("""
      WITH top AS (
        SELECT value FROM events WHERE event_type = 'purchase'
        ORDER BY value DESC LIMIT 201),
      thr AS (SELECT min(value) AS xmin FROM top),
      hill AS (
        SELECT xmin, count(*) AS k_used,
               sum(ln(value / xmin)) AS lsum
        FROM top CROSS JOIN thr WHERE value > xmin GROUP BY 1)
      SELECT k_used, round(xmin, 4) AS x_threshold,
             round(k_used / lsum, 4) AS alpha_hill,
             round(lsum / k_used, 4) AS mean_excess_log
      FROM hill"""))

  /** Partial correlation r_xy·z of the hourly click (x) and purchase
    * (y) cent series CONTROLLING for view volume (z) — "do clicks and
    * purchases co-move beyond what overall traffic explains?", the
    * confounder-removal step kdb_series_corr and kdb_lead_lag_corr
    * skip. Exact-integer discipline end to end: all nine moment sums
    * (Σx, Σy, Σz, Σxy, Σxz, Σyz, Σx², Σy², Σz²) fold from int64
    * hourly cents over the fixed n = 720 grid (absent hours are
    * all-zero rows and vanish from every Σ, so no dense-grid join is
    * needed — the kdb_burstiness algebra), the three pairwise
    * Pearsons come from those exact ints, and the partial is the
    * closed form (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)). ONE
    * data-sized shuffle (the hourly pivot); everything after is
    * one-row algebra. */
  private val partialCorr = QueryDef(
    "kdb_partial_corr",
    (s, d) => {
      val n = lit(720.0) // fixed grid size: (T1-T0)/Hour
      val cents = round(col("value") * 100, 0).cast("long")
      val byHour = ev(s, d)
        .filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .groupBy(col("slot_ns"))
        .agg(
          sum(when(col("event_type") === "click", cents).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", cents).otherwise(0L)).as("y"),
          sum(when(col("event_type") === "view", cents).otherwise(0L)).as("z"))
      val m = byHour.groupBy().agg(
        sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
        // 128-bit product sums (hourly-LEVEL magnitudes — the
        // kdb_cointegration wrap class) + engine-neutral conversion
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("z")).as("sxz"),
        sum(col("y").cast("decimal(38,0)") * col("z")).as("syz"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
        sum(col("z").cast("decimal(38,0)") * col("z")).as("szz"))
      // centered moments stay EXACT int128 (720·Σab − Σa·Σb), then one
      // deterministic conversion each — n is the integer 720 here,
      // never a double in the exact part
      def cm(sab: Column, sa: Column, sb: Column) = SharedExprs.hugeToDouble(
        lit(720L) * sab - sa.cast("decimal(38,0)") * sb)
      def r(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column) =
        cm(sab, sa, sb) / sqrt(cm(saa, sa, sa) * cm(sbb, sb, sb))
      val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
      val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
      val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
      m.select(
        lit(720L).as("n_hours"),
        (round(rxy, 4) + lit(0.0)).as("r_xy"),
        (round(rxz, 4) + lit(0.0)).as("r_xz"),
        (round(ryz, 4) + lit(0.0)).as("r_yz"),
        (round((rxy - rxz * ryz) /
          sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)), 4) + lit(0.0))
          .as("r_xy_given_z"))
    },
    Some(s"""
      WITH byhour AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns,
               CAST(sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
               CAST(sum(CASE WHEN event_type = 'view'
                 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS z
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
        GROUP BY 1),
      m AS (
        SELECT CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(z) AS BIGINT) AS sz,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * z) AS sxz,
               sum(CAST(y AS HUGEINT) * z) AS syz,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy,
               sum(CAST(z AS HUGEINT) * z) AS szz
        FROM byhour),
      nd AS (
        SELECT 720 * sxy - CAST(sx AS HUGEINT) * sy AS nxy,
               720 * sxz - CAST(sx AS HUGEINT) * sz AS nxz,
               720 * syz - CAST(sy AS HUGEINT) * sz AS nyz,
               720 * sxx - CAST(sx AS HUGEINT) * sx AS dx,
               720 * syy - CAST(sy AS HUGEINT) * sy AS dy,
               720 * szz - CAST(sz AS HUGEINT) * sz AS dz
        FROM m),
      rr AS (
        SELECT
          ${SharedExprs.hugeToDoubleDuck("nxy")} /
            sqrt(${SharedExprs.hugeToDoubleDuck("dx")}
                 * ${SharedExprs.hugeToDoubleDuck("dy")}) AS rxy,
          ${SharedExprs.hugeToDoubleDuck("nxz")} /
            sqrt(${SharedExprs.hugeToDoubleDuck("dx")}
                 * ${SharedExprs.hugeToDoubleDuck("dz")}) AS rxz,
          ${SharedExprs.hugeToDoubleDuck("nyz")} /
            sqrt(${SharedExprs.hugeToDoubleDuck("dy")}
                 * ${SharedExprs.hugeToDoubleDuck("dz")}) AS ryz
        FROM nd)
      SELECT CAST(720 AS BIGINT) AS n_hours,
             round(rxy, 4) + 0.0 AS r_xy,
             round(rxz, 4) + 0.0 AS r_xz,
             round(ryz, 4) + 0.0 AS r_yz,
             round((rxy - rxz * ryz) /
                   sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 4) + 0.0
               AS r_xy_given_z
      FROM rr"""))

  /** Sample skewness g1 = m3/m2^1.5 and excess kurtosis g2 = m4/m2²−3
    * per event type — the distribution-shape moments beside
    * kdb_welch_ttest's mean/variance and kdb_tail_index's tail
    * exponent (is the payload distribution symmetric? heavier-tailed
    * than normal?). Exactness: raw power sums over integer cents are
    * order-independent; Σc³/Σc⁴ would wrap int64 (a single c⁴ at the
    * observed max cents ≈ 5.6e4 is ~9.8e18 > 2⁶³−1), so they
    * accumulate in Spark decimal(38,0) ≡ DuckDB HUGEINT — exact
    * 128-bit integers, the llm_grpo_advantage Σr² discipline — and
    * convert to double ONCE (same value → same nearest double in
    * both engines). Central moments are fixed-order IEEE algebra on
    * those exact-int doubles, so the 4dp rounds agree bit-for-bit.
    * Shape: ONE map-side-combinable aggregation, |types| output rows,
    * closed form — the cheapest possible plan at any scale. */
  private val skewKurtosis = QueryDef(
    "kdb_skew_kurtosis",
    (s, d) => {
      val c = round(col("value") * 100, 0).cast("long")
      val g = ev(s, d)
        .withColumn("cents", c)
        .withColumn("c2", col("cents") * col("cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("s1"),
          sum(col("c2")).as("s2"),
          sum(col("c2").cast("decimal(38,0)") * col("cents")).as("s3"),
          sum(col("c2").cast("decimal(38,0)") * col("c2")).as("s4"))
      val n = col("n").cast("double")
      val m = col("s1").cast("double") / n
      val r2 = col("s2").cast("double") / n
      val r3 = SharedExprs.hugeToDouble(col("s3")) / n
      val r4 = SharedExprs.hugeToDouble(col("s4")) / n
      val m2 = r2 - m * m
      val m3 = r3 - lit(3.0) * m * r2 + lit(2.0) * m * m * m
      val m4 = r4 - lit(4.0) * m * r3 + lit(6.0) * m * m * r2 -
        lit(3.0) * m * m * m * m
      g.select(col("event_type"), col("n"), col("s1").as("sum_cents"),
          (round(m3 / (m2 * sqrt(m2)), 4) + lit(0.0)).as("skewness"),
          (round(m4 / (m2 * m2) - lit(3.0), 4) + lit(0.0)).as("kurtosis_ex"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH g AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(c * c) AS BIGINT) AS s2,
               sum(CAST(c * c AS HUGEINT) * c) AS s3,
               sum(CAST(c * c AS HUGEINT) * (c * c)) AS s4
        FROM (SELECT event_type,
                     CAST(round(value * 100, 0) AS BIGINT) AS c
              FROM events)
        GROUP BY 1),
      r AS (
        SELECT event_type, n, s1,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
               (CAST((s3 - s3 % 4294967296) // 4294967296 AS DOUBLE)
                  * CAST(4294967296 AS DOUBLE)
                  + CAST(s3 % 4294967296 AS DOUBLE))
                 / CAST(n AS DOUBLE) AS r3,
               (CAST((s4 - s4 % 4294967296) // 4294967296 AS DOUBLE)
                  * CAST(4294967296 AS DOUBLE)
                  + CAST(s4 % 4294967296 AS DOUBLE))
                 / CAST(n AS DOUBLE) AS r4
        FROM g),
      cm AS (
        SELECT event_type, n, s1,
               r2 - m * m AS m2,
               r3 - 3.0 * m * r2 + 2.0 * m * m * m AS m3,
               r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m
                 AS m4
        FROM r)
      SELECT event_type, n, s1 AS sum_cents,
             round(m3 / (m2 * sqrt(m2)), 4) + 0.0 AS skewness,
             round(m4 / (m2 * m2) - 3.0, 4) + 0.0 AS kurtosis_ex
      FROM cm ORDER BY event_type"""))

  /** Historical VaR / Expected Shortfall at 95% per event type — the
    * tail-risk pair every risk desk reads off a metrics store
    * (kdb_percentile_bands draws the distribution body; this is the
    * regulatory tail): VaR = the exact k-th order statistic with
    * k = ⌈0.95·n⌉ computed as the integer (95n+99) div 100, ES = the
    * mean of the n−k+1 ranked-at-or-above-k values. Rank-based tail
    * membership (not value-based) makes boundary ties harmless: tied
    * cents at the cut contribute the same sum whichever side of the
    * total (cents, event_id) order they land. Scale shape: ONE global
    * DistributedRank range shuffle over (type, cents, id) — never a
    * per-type single-partition window — with per-type offsets
    * broadcast back (the kdb_weighted_median decomposition); VaR and
    * the tail sum fold in the same aggregation; ES's one IEEE op is
    * the final division of exact ints, 4dp-rounded. */
  private val varEs = QueryDef(
    "kdb_var_es",
    (s, d) => {
      val e = ev(s, d)
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          col("event_id"))
      val ranked = DistributedRank.withGlobalRank(e, "r",
        Seq(col("event_type"), col("cents"), col("event_id")))
      val offs = ranked.groupBy(col("event_type"))
        .agg(min(col("r")).as("r0"), count(lit(1)).as("n"))
      ranked.join(broadcast(offs), "event_type")
        .withColumn("rk", col("r") - col("r0") + 1)
        .withColumn("k", expr("(95 * n + 99) div 100"))
        .filter(col("rk") >= col("k"))
        .groupBy(col("event_type"), col("n"), col("k"))
        .agg(max(when(col("rk") === col("k"), col("cents"))).as("var_cents"),
          sum(col("cents")).as("tail_sum"), count(lit(1)).as("tail_n"))
        .select(col("event_type"), col("n"), col("k"), col("var_cents"),
          col("tail_n"),
          (round(col("tail_sum").cast("double") / col("tail_n") / 100.0, 4)
            + lit(0.0)).as("es_dollars"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
               event_id
        FROM events),
      ranked AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY cents, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM e),
      cut AS (
        SELECT event_type, cents, rk, n, (95 * n + 99) // 100 AS k
        FROM ranked)
      SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             CAST(max(CASE WHEN rk = k THEN cents END) AS BIGINT)
               AS var_cents,
             count(*) AS tail_n,
             round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 4) + 0.0
               AS es_dollars
      FROM cut WHERE rk >= k
      GROUP BY event_type, n, k
      ORDER BY event_type"""))

  /** Transfer entropy (Schreiber 2000), lag-1 binary-state — the
    * model-free directional-coupling measure beside kdb_granger's
    * linear F-test: TE(X→Y) = Σ p(y',y,x)·ln[p(y'|y,x)/p(y'|y)]
    * asks "does knowing X's state reduce uncertainty about Y's next
    * state beyond Y's own past?" without assuming linearity. Both
    * directions reported; TE(X→Y) > TE(Y→X) reads as net information
    * flow X→Y. States are above-average activity flags per hourly
    * slot decided by EXACT integer comparison (cents·720 > Σcents —
    * no float threshold), so state sequences are identical in both
    * engines. All probabilities reduce to ratios of exact transition
    * counts; each of the ≤8 state cells contributes
    * (c/N)·ln((c·c_y)/(c_xy·c_yy)) — one fixed-order double
    * expression on exact ints quantized to micros (the llm_psi_drift
    * ln() discipline), summed AFTER quantization so the total is an
    * order-independent BIGINT sum. Shape: one rollup shuffle to the
    * 720-slot grid, lead() on the bounded grid, then counts and
    * marginals on the ≤8-row state table; the 1-row activity-total
    * scalar rides a broadcast cross join (the llm_lm_score shape). */
  private val transferEntropy = QueryDef(
    "kdb_transfer_entropy",
    (s, d) => {
      val e = ev(s, d).filter(col("ts_ns") >= T0 && col("ts_ns") < T1)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("slot_ns", col("ts_ns") - col("ts_ns") % Hour)
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val nSlots = (T1 - T0) / Hour
      val nTrans = nSlots - 1
      val grid = s.range(nSlots).select((lit(T0) + col("id") * Hour).as("slot_ns"))
      val sums = e.groupBy(col("slot_ns")).agg(
        sum(when(col("event_type") === "click", col("cents")).otherwise(0L)).as("xc"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L)).as("yc"))
      // 720-row dense table read by the totals branch AND the state
      // projection: checkpoint so the data-sized rollup runs once
      val dense = grid.join(sums, Seq("slot_ns"), "left_outer")
        .select(col("slot_ns"),
          coalesce(col("xc"), lit(0L)).as("xc"),
          coalesce(col("yc"), lit(0L)).as("yc"))
        .localCheckpoint(true)
      val tot = dense.agg(sum(col("xc")).as("tx"), sum(col("yc")).as("ty"))
      val st = dense.crossJoin(broadcast(tot))
        .select(col("slot_ns"),
          (col("xc") * nSlots > col("tx")).cast("int").as("x"),
          (col("yc") * nSlots > col("ty")).cast("int").as("y"))
      // lead() on the constant 720-row grid — bounded, the granger shape
      val w = Window.orderBy(col("slot_ns"))
      val tr = st
        .withColumn("xn", lead(col("x"), 1).over(w))
        .withColumn("yn", lead(col("y"), 1).over(w))
        .filter(col("xn").isNotNull)
      val triples = tr.select(lit("x->y").as("direction"),
          col("x").as("src"), col("y").as("dst"), col("yn").as("nxt"))
        .unionAll(tr.select(lit("y->x").as("direction"),
          col("y").as("src"), col("x").as("dst"), col("xn").as("nxt")))
      // ≤2·2³-row joint-distribution table consumed by FOUR branches
      // (three marginals + the final join): without the checkpoint each
      // branch re-ran the whole pipeline — 16 static events scans
      val c3 = triples
        .groupBy(col("direction"), col("src"), col("dst"), col("nxt"))
        .agg(count(lit(1)).as("c3"))
        .localCheckpoint(true)
      val cSD = c3.groupBy(col("direction"), col("src"), col("dst"))
        .agg(sum(col("c3")).as("c_sd"))
      val cDN = c3.groupBy(col("direction"), col("dst"), col("nxt"))
        .agg(sum(col("c3")).as("c_dn"))
      val cD = c3.groupBy(col("direction"), col("dst"))
        .agg(sum(col("c3")).as("c_d"))
      c3.join(cSD, Seq("direction", "src", "dst"))
        .join(cDN, Seq("direction", "dst", "nxt"))
        .join(cD, Seq("direction", "dst"))
        .select(col("direction"),
          round((col("c3").cast("double") / lit(nTrans.toDouble)) *
            log((col("c3").cast("double") * col("c_d")) /
                (col("c_sd").cast("double") * col("c_dn"))) * 1000000, 0)
            .cast("long").as("contrib"))
        .groupBy(col("direction"))
        .agg(count(lit(1)).as("n_states"), sum(col("contrib")).as("te_micro"))
        .select(col("direction"), lit(nTrans).as("n_trans"),
          col("n_states"), col("te_micro"))
        .orderBy(col("direction"))
    },
    Some(s"""
      WITH e AS (
        SELECT epoch_ns(ts) - epoch_ns(ts) % ${Hour} AS slot_ns, event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
        WHERE epoch_ns(ts) >= ${T0} AND epoch_ns(ts) < ${T1}
          AND event_type IN ('click', 'purchase')),
      sums AS (
        SELECT slot_ns,
               CAST(sum(CASE WHEN event_type = 'click' THEN cents ELSE 0 END)
                 AS BIGINT) AS xc,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
                 AS BIGINT) AS yc
        FROM e GROUP BY 1),
      dense AS (
        SELECT g.slot_ns, coalesce(s.xc, 0) AS xc, coalesce(s.yc, 0) AS yc
        FROM range(${T0}, ${T1}, ${Hour}) g(slot_ns)
        LEFT JOIN sums s USING (slot_ns)),
      tot AS (
        SELECT CAST(sum(xc) AS BIGINT) AS tx, CAST(sum(yc) AS BIGINT) AS ty
        FROM dense),
      st AS (
        SELECT slot_ns,
               CASE WHEN xc * ${(T1 - T0) / Hour} > tx THEN 1 ELSE 0 END AS x,
               CASE WHEN yc * ${(T1 - T0) / Hour} > ty THEN 1 ELSE 0 END AS y
        FROM dense CROSS JOIN tot),
      tr AS (
        SELECT x, y, lead(x) OVER (ORDER BY slot_ns) AS xn,
               lead(y) OVER (ORDER BY slot_ns) AS yn
        FROM st QUALIFY xn IS NOT NULL),
      triples AS (
        SELECT 'x->y' AS direction, x AS src, y AS dst, yn AS nxt FROM tr
        UNION ALL SELECT 'y->x', y, x, xn FROM tr),
      c3 AS (
        SELECT direction, src, dst, nxt, count(*) AS c3
        FROM triples GROUP BY 1, 2, 3, 4),
      csd AS (
        SELECT direction, src, dst, CAST(sum(c3) AS BIGINT) AS c_sd
        FROM c3 GROUP BY 1, 2, 3),
      cdn AS (
        SELECT direction, dst, nxt, CAST(sum(c3) AS BIGINT) AS c_dn
        FROM c3 GROUP BY 1, 2, 3),
      cd AS (
        SELECT direction, dst, CAST(sum(c3) AS BIGINT) AS c_d
        FROM c3 GROUP BY 1, 2),
      contrib AS (
        SELECT c.direction,
               CAST(round((CAST(c.c3 AS DOUBLE) / ${(T1 - T0) / Hour - 1}.0) *
                 ln((CAST(c.c3 AS DOUBLE) * d.c_d) /
                    (CAST(s.c_sd AS DOUBLE) * n.c_dn)) * 1000000, 0)
                 AS BIGINT) AS contrib
        FROM c3 c
        JOIN csd s ON s.direction = c.direction AND s.src = c.src
          AND s.dst = c.dst
        JOIN cdn n ON n.direction = c.direction AND n.dst = c.dst
          AND n.nxt = c.nxt
        JOIN cd d ON d.direction = c.direction AND d.dst = c.dst)
      SELECT direction, CAST(${(T1 - T0) / Hour - 1} AS BIGINT) AS n_trans,
             count(*) AS n_states,
             CAST(sum(contrib) AS BIGINT) AS te_micro
      FROM contrib GROUP BY 1 ORDER BY 1"""))

  val defs: Seq[QueryDef] = Seq(
    welch, mannWhitney, gini, pareto, winsorize, quantileNorm, hurst,
    bootstrap, mannKendall, dickeyFuller, cointegration, granger,
    ljungBox, conformal, sprt, entropyRate,
    ksTest, kruskal, esd, circular, tailIndex, partialCorr,
    skewKurtosis, transferEntropy, varEs)
}
