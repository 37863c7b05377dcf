package graft

import java.nio.file.Files
import graft.queries.KdbQueries.{T0, T1}

/** Kernel correctness for the stats / series-ops / training batches,
  * against plain-Scala reference implementations and closed-form
  * invariants — the spec layer under the DuckDB oracle gate (which
  * proves cross-engine agreement, not algorithmic correctness).
  */
class StatsKernelSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Synthetic events dir (ts as int64 ns — the ns-long source shape
    * from DriverSessionCompatSpec). */
  private def eventsDir(
      rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val dir = Files.createTempDirectory("graft-statskernel").toString
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ---------------- Gini ----------------

  test("kdb_gini: closed forms — equal counts give 0, concentration approaches (n-1)/n") {
    // 4 users × 5 events each → perfect equality
    val equal = eventsDir((0 until 20).map(i =>
      (i.toLong, T0 + i * 1000L, (i % 4).toLong, "click", 1.0, "{}")))
    val g0 = SparkEntry.queries("kdb_gini")(spark, equal)
      .collect().head.getAs[Double]("gini")
    assert(g0 === 0.0)

    // counts 1,1,1,97: reference formula
    val rows = (0 until 3).map(i =>
      (i.toLong, T0 + i * 1000L, i.toLong, "click", 1.0, "{}")) ++
      (0 until 97).map(i =>
        (100L + i, T0 + (100 + i) * 1000L, 9L, "click", 1.0, "{}"))
    val skew = eventsDir(rows)
    val xs = Seq(1L, 1L, 1L, 97L) // ascending
    val n = xs.size
    val expected = 2.0 * xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum /
      (n.toDouble * xs.sum) - (n + 1.0) / n
    val g1 = SparkEntry.queries("kdb_gini")(spark, skew)
      .collect().head.getAs[Double]("gini")
    assert(g1 === math.rint(expected * 10000) / 10000)
  }

  // ---------------- Mann–Whitney ----------------

  /** Reference mid-rank U and tie-corrected z. */
  private def mwRef(click: Seq[Double], purch: Seq[Double]): (Double, Double) = {
    val all = click ++ purch
    val n = all.size
    def midrank(v: Double) =
      all.count(_ < v) + (all.count(_ == v) + 1) / 2.0
    val r1 = click.map(midrank).sum
    val n1 = click.size.toDouble
    val n2 = purch.size.toDouble
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val tiesum = all.groupBy(identity).values
      .map { g => val t = g.size.toDouble; t * t * t - t }.sum
    val sig = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tiesum / (n.toDouble * (n - 1))))
    (u1, (u1 - n1 * n2 / 2.0) / sig)
  }

  test("kdb_mann_whitney matches the reference U/z on tie-free and tied samples") {
    for ((click, purch) <- Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0, 1.0, 2.0, 7.5), Seq(2.0, 3.0, 3.0)))) {
      val rows =
        click.zipWithIndex.map { case (v, i) =>
          (i.toLong, T0 + i * 1000L, 1L, "click", v, "{}") } ++
        purch.zipWithIndex.map { case (v, i) =>
          (100L + i, T0 + (100 + i) * 1000L, 2L, "purchase", v, "{}") }
      val got = SparkEntry.queries("kdb_mann_whitney")(spark, eventsDir(rows))
        .collect().head
      val (u1, z) = mwRef(click, purch)
      assert(got.getAs[Double]("u1") === math.rint(u1 * 100) / 100)
      assert(got.getAs[Double]("z_stat") === math.rint(z * 10000) / 10000 + 0.0)
    }
  }

  test("kdb_mann_whitney: the all-tied degenerate case yields NULL z (skew-proof path)") {
    // one giant tie group — the shape that would collapse a
    // PARTITION BY value window onto one task; the closed-form
    // midrank path folds it to one row per distinct value instead
    val rows = (0 until 50).map(i =>
      (i.toLong, T0 + i * 1000L, 1L, "click", 1.0, "{}")) ++
      (0 until 50).map(i =>
        (100L + i, T0 + (100 + i) * 1000L, 2L, "purchase", 1.0, "{}"))
    val got = SparkEntry.queries("kdb_mann_whitney")(spark, eventsDir(rows))
      .collect().head
    assert(got.getAs[Double]("u1") === 1250.0) // 50·50.5 − 50·51/2
    assert(got.isNullAt(got.fieldIndex("z_stat")), "σ = 0 has no z")
  }

  // ---------------- Welch ----------------

  test("kdb_welch_ttest: identical samples give t = 0 with the Satterthwaite df") {
    val rows = Seq(1.0, 2.0, 3.0).zipWithIndex.flatMap { case (v, i) => Seq(
      (i.toLong, T0 + i * 1000L, 1L, "click", v, "{}"),
      (10L + i, T0 + i * 1000L, 2L, "purchase", v, "{}")) }
    val got = SparkEntry.queries("kdb_welch_ttest")(spark, eventsDir(rows))
      .collect().head
    assert(got.getAs[Double]("t_stat") === 0.0)
    assert(got.getAs[Double]("df_welch") === 4.0) // closed form for equal v/n
  }

  // ---------------- Poisson bootstrap ----------------

  test("kdb_bootstrap_ci: a constant sample has a degenerate CI at the constant") {
    // every replicate mean of a constant is the constant, whatever the
    // Poisson weights drew (P[all-zero weights] ~ e^-300)
    val rows = (0 until 300).map(i =>
      (i.toLong, T0 + i * 1000L, (i % 7).toLong, "purchase", 10.0, "{}"))
    val got = SparkEntry.queries("kdb_bootstrap_ci")(spark, eventsDir(rows))
      .collect().head
    assert(got.getAs[Double]("point_est") === 10.0)
    assert(got.getAs[Double]("ci_lo") === 10.0)
    assert(got.getAs[Double]("ci_hi") === 10.0)
    assert(got.getAs[Long]("b_count") === 200L)
  }

  test("kdb_bootstrap_ci on testdata: lo <= point <= hi, strict width") {
    val got = SparkEntry.queries("kdb_bootstrap_ci")(spark, sf).collect().head
    val (lo, pt, hi) = (got.getAs[Double]("ci_lo"),
      got.getAs[Double]("point_est"), got.getAs[Double]("ci_hi"))
    assert(lo <= pt && pt <= hi && lo < hi)
  }

  // ---------------- VWAP ----------------

  test("kdb_vwap: constant price is weight-invariant") {
    val rows = (0 until 10).map(i =>
      (i.toLong, T0 + i * 3600L * 1000000000L, 1L, "click", 3.5,
        s"""{"k": ${i % 5 + 1}}"""))
    val out = SparkEntry.queries("kdb_vwap")(spark, eventsDir(rows)).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Double]("vwap") === 3.5))
  }

  // ---------------- DTW ----------------

  /** Reference banded DP (full matrix, same recurrence). */
  private def dtwRef(a: Array[Double], b: Array[Double], w: Int): Double = {
    val n = a.length
    val inf = 1e18
    val dp = Array.fill(n + 1, n + 1)(inf)
    dp(0)(0) = 0.0
    for (i <- 1 to n; j <- 1 to n if math.abs(i - j) <= w)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i - 1)(j - 1), dp(i)(j - 1)))
    dp(n)(n)
  }

  test("kdb_dtw: identical series warp at zero cost") {
    val rows = (0 until 40).flatMap { i =>
      val ts = T0 + i.toLong * 6 * 3600L * 1000000000L / 2
      Seq((i.toLong * 2, ts, 1L, "click", (i % 7) * 1.25, "{}"),
        (i.toLong * 2 + 1, ts, 2L, "purchase", (i % 7) * 1.25, "{}"))
    }
    val got = SparkEntry.queries("kdb_dtw")(spark, eventsDir(rows)).collect().head
    assert(got.getAs[Double]("dtw_dollars") === 0.0)
  }

  test("kdb_dtw matches the reference banded DP on a shifted series") {
    val res = (T1 - T0) / 120
    // clicks: pulse at slots 10..20; purchases: same pulse shifted +3
    // slots (inside the w=8 band, so DTW should be far below the
    // aligned L1 distance)
    val rows = (10 to 20).flatMap { sl =>
      Seq((sl.toLong, T0 + sl * res, 1L, "click", sl * 2.0, "{}"),
        (100L + sl, T0 + (sl + 3) * res, 2L, "purchase", sl * 2.0, "{}"))
    }
    val a = Array.fill(120)(0.0)
    val b = Array.fill(120)(0.0)
    (10 to 20).foreach { sl =>
      a(sl) = math.rint(sl * 2.0 * 100) // cents
      b(sl + 3) = math.rint(sl * 2.0 * 100)
    }
    val expected = math.rint(dtwRef(a, b, 8) / 100.0 * 100) / 100
    val got = SparkEntry.queries("kdb_dtw")(spark, eventsDir(rows)).collect().head
    assert(got.getAs[Double]("dtw_dollars") === expected)
    // and the shape claim itself: warping beats aligned comparison
    val alignedL1 = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum / 100.0
    assert(expected < alignedL1)
  }

  // ---------------- MACD / weighted median ----------------

  test("kdb_macd: a constant series has zero MACD, signal, and histogram everywhere") {
    val rows = (0 until 30).map(i =>
      (i.toLong, T0 + i.toLong * 3600L * 1000000000L, 1L, "click", 5.0, "{}"))
    val out = SparkEntry.queries("kdb_macd")(spark, eventsDir(rows)).collect()
    assert(out.length === 30)
    out.foreach { r =>
      assert(r.getAs[Double]("macd") === 0.0)
      assert(r.getAs[Double]("signal") === 0.0)
      assert(r.getAs[Double]("histogram") === 0.0)
    }
  }

  test("kdb_macd matches a reference EMA recursion on a ramp") {
    val vals = (0 until 40).map(i => (i % 9) * 1.5 + 1)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, T0 + i.toLong * 3600L * 1000000000L, 1L, "click", v, "{}") }
    def ema(xs: Seq[Double], a: Double): Seq[Double] =
      xs.tail.scanLeft(xs.head)((acc, x) => a * x + (1 - a) * acc)
    val e12 = ema(vals, 2.0 / 13.0)
    val e26 = ema(vals, 2.0 / 27.0)
    val m = e12.zip(e26).map { case (x, y) => x - y }
    val sig = ema(m, 0.2)
    val out = SparkEntry.queries("kdb_macd")(spark, eventsDir(rows))
      .orderBy("slot_ns").collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("macd") === math.rint(m(i) * 10000) / 10000 + 0.0, s"i=$i")
      assert(r.getAs[Double]("signal") === math.rint(sig(i) * 10000) / 10000 + 0.0, s"i=$i")
    }
  }

  test("kdb_weighted_median: known small example (lower weighted median)") {
    // values 1..4 with weights 1,1,1,7 → total 10, half 5: the first
    // value whose inclusive cum weight reaches 5 is 4
    val rows = Seq((1.0, 1), (2.0, 1), (3.0, 1), (4.0, 7)).zipWithIndex.map {
      case ((v, k), i) =>
        (i.toLong, T0 + i * 1000L, 1L, "click", v, s"""{"k": $k}""")
    }
    val got = SparkEntry.queries("kdb_weighted_median")(spark, eventsDir(rows))
      .collect().head
    assert(got.getAs[Double]("w_median") === 4.0)
    assert(got.getAs[Long]("total_weight") === 10L)
    // and with uniform weights it degrades to the lower median
    val rows2 = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, T0 + i * 1000L, 1L, "click", v, """{"k": 1}""")
    }
    val got2 = SparkEntry.queries("kdb_weighted_median")(spark, eventsDir(rows2))
      .collect().head
    assert(got2.getAs[Double]("w_median") === 2.0)
  }

  test("kdb_conformal_forecast: a constant series has zero-width intervals at the constant") {
    // Holt on a constant holds level=c, trend=0 → every walk-forward
    // residual is 0 → conformal q90 = 0 and lo = hi = forecast = c
    val rows = (0 until 48).map(i =>
      (i.toLong, T0 + i.toLong * 3600L * 1000000000L, 1L, "click", 7.25, "{}"))
    val got = SparkEntry.queries("kdb_conformal_forecast")(spark, eventsDir(rows))
      .collect().head
    assert(got.getAs[Double]("forecast") === 7.25)
    assert(got.getAs[Double]("q90") === 0.0)
    assert(got.getAs[Double]("lo90") === 7.25)
    assert(got.getAs[Double]("hi90") === 7.25)
    assert(got.getAs[Int]("n_cal") === 47)
  }

  test("kdb_ljung_box: a strongly alternating series is decisively not white noise") {
    val out = SparkEntry.queries("kdb_ljung_box")(spark, sf).collect().head
    // sanity on real data first: Q is finite and rhos are in [-1, 1]
    (1 to 6).foreach { k =>
      val r = out.getAs[Double](s"rho$k")
      assert(r >= -1.0 && r <= 1.0, s"rho$k=$r")
    }
    // synthetic: hourly alternation ±100 around the mean → rho1 ≈ -1
    // → Q explodes → the white-noise hypothesis must be rejected
    val rows = (0 until 720).map(i =>
      (i.toLong, T0 + i.toLong * 3600L * 1000000000L, 1L, "click",
        if (i % 2 == 0) 2.0 else 0.01, "{}"))
    val alt = SparkEntry.queries("kdb_ljung_box")(spark, eventsDir(rows))
      .collect().head
    assert(alt.getAs[Double]("rho1") < -0.9)
    assert(alt.getAs[Double]("q_stat") > 100.0)
    assert(alt.getAs[Int]("white_noise") === 0)
  }

  test("kdb_sprt: decisive streams cross the right barrier, and early") {
    // 60%+ conversion (vs H1 p=0.35): H1 evidence accumulates at
    // ~+0.066/obs — with 40 obs/hour the +2.944 barrier falls inside
    // the first few hours
    def mk(highEvery: Int) = (0 until 2400).map { i =>
      val v = if (i % highEvery == 0) 80.0 else 10.0
      (i.toLong, T0 + (i / 40).toLong * 3600L * 1000000000L + i % 40,
        1L, "purchase", v, "{}")
    }
    val h1 = SparkEntry.queries("kdb_sprt")(spark, eventsDir(mk(2)))
      .collect().head // 50% > 0.35 → H1
    assert(h1.getAs[String]("decision") === "accept_h1")
    assert(h1.getAs[Long]("h1_cross_ns") < T0 + 10L * 3600L * 1000000000L,
      "decisive evidence must cross within the first hours, not at month end")

    val h0 = SparkEntry.queries("kdb_sprt")(spark, eventsDir(mk(10)))
      .collect().head // 10% < 0.30 → H0
    assert(h0.getAs[String]("decision") === "accept_h0")
  }

  // ---------------- invariants on the gate corpus ----------------

  test("kdb_pareto: deciles are balanced, shares sum to 1") {
    val out = SparkEntry.queries("kdb_pareto")(spark, sf).collect()
    assert(out.map(_.getAs[Int]("decile")).toSeq === (1 to 10))
    val counts = out.map(_.getAs[Long]("n_users"))
    assert(counts.max - counts.min <= 1, "exact ntile balance")
    assert(math.abs(out.last.getAs[Double]("cum_share") - 1.0) < 2e-3)
    // shares are non-increasing by construction (ordered by total desc)
    val shares = out.map(_.getAs[Double]("share")).toSeq
    assert(shares === shares.sorted.reverse)
  }

  test("kdb_quantile_norm: every type ends with the identical value distribution") {
    val out = SparkEntry.queries("kdb_quantile_norm")(spark, sf).collect()
    val byType = out.groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Double]("norm_v")).sorted.toSeq }
    assert(byType.values.toSet.size === 1,
      "quantile normalization must equalize the distributions exactly")
  }

  test("kdb_hurst: exponent is in (0,1) and R/S grows with block size") {
    val out = SparkEntry.queries("kdb_hurst")(spark, sf).collect()
    assert(out.length === 5)
    val h = out.head.getAs[Double]("hurst")
    assert(h > 0.0 && h < 1.0)
    val rs = out.map(_.getAs[Double]("avg_rs")).toSeq
    assert(rs === rs.sorted, "avg R/S should increase with n")
  }

  // ---------------- KS two-sample ----------------

  test("kdb_ks_test: disjoint samples give D = 1; identical samples give D = 0, p = 1") {
    val disjoint = eventsDir(Seq(
      (0L, T0 + 1000L, 1L, "click", 1.0, "{}"),
      (1L, T0 + 2000L, 2L, "click", 2.0, "{}"),
      (2L, T0 + 3000L, 3L, "purchase", 3.0, "{}"),
      (3L, T0 + 4000L, 4L, "purchase", 4.0, "{}")))
    val d1 = SparkEntry.queries("kdb_ks_test")(spark, disjoint).collect().head
    assert(d1.getAs[Double]("d_stat") === 1.0)

    val same = eventsDir(Seq(
      (0L, T0 + 1000L, 1L, "click", 1.0, "{}"),
      (1L, T0 + 2000L, 2L, "click", 2.0, "{}"),
      (2L, T0 + 3000L, 3L, "purchase", 1.0, "{}"),
      (3L, T0 + 4000L, 4L, "purchase", 2.0, "{}")))
    val d0 = SparkEntry.queries("kdb_ks_test")(spark, same).collect().head
    assert(d0.getAs[Double]("d_stat") === 0.0)
    assert(d0.getAs[Double]("p_value") === 1.0, "λ = 0 ⇒ the series clamps to p = 1")
  }

  // ---------------- Kruskal–Wallis ----------------

  /** Reference H with midranks and tie correction. */
  private def kwRef(groups: Seq[Seq[Double]]): Double = {
    val all = groups.flatten
    val nn = all.size
    def midrank(v: Double) = all.count(_ < v) + (all.count(_ == v) + 1) / 2.0
    val sr2 = groups.map { g =>
      val r = g.map(midrank).sum; r * r / g.size
    }.sum
    val h = 12.0 / (nn * (nn + 1.0)) * sr2 - 3 * (nn + 1)
    val ties = all.groupBy(identity).values
      .map(_.size.toDouble).map(t => t * t * t - t).sum
    h / (1 - ties / (nn.toDouble * nn * nn - nn))
  }

  test("kdb_kruskal_wallis matches the reference midrank H on three shifted groups") {
    val g1 = Seq(1.0, 2.0, 3.0)
    val g2 = Seq(2.0, 4.0, 5.0)
    val g3 = Seq(6.0, 7.0, 8.0)
    val rows =
      g1.zipWithIndex.map { case (v, i) => (i.toLong, T0 + i * 1000L, i.toLong, "click", v, "{}") } ++
      g2.zipWithIndex.map { case (v, i) => (10L + i, T0 + (10 + i) * 1000L, 10L + i, "purchase", v, "{}") } ++
      g3.zipWithIndex.map { case (v, i) => (20L + i, T0 + (20 + i) * 1000L, 20L + i, "view", v, "{}") }
    val out = SparkEntry.queries("kdb_kruskal_wallis")(spark, eventsDir(rows))
      .collect().head
    assert(out.getAs[Long]("n_total") === 9L)
    assert(out.getAs[Int]("df") === 2)
    assert(out.getAs[Double]("h_corrected") ===
      math.rint(kwRef(Seq(g1, g2, g3)) * 10000) / 10000)
  }

  // ---------------- One-way ANOVA ----------------

  test("kdb_anova_f matches the reference F and eta-squared on three shifted groups") {
    val g1 = Seq(1.0, 2.0, 3.0)
    val g2 = Seq(4.0, 5.0, 6.0)
    val g3 = Seq(8.0, 9.0, 10.0)
    val rows =
      g1.zipWithIndex.map { case (v, i) => (i.toLong, T0 + i * 1000L, i.toLong, "click", v, "{}") } ++
      g2.zipWithIndex.map { case (v, i) => (10L + i, T0 + (10 + i) * 1000L, 10L + i, "purchase", v, "{}") } ++
      g3.zipWithIndex.map { case (v, i) => (20L + i, T0 + (20 + i) * 1000L, 20L + i, "view", v, "{}") }
    val out = SparkEntry.queries("kdb_anova_f")(spark, eventsDir(rows))
      .collect().head
    val groups = Seq(g1, g2, g3)
    val all = groups.flatten
    val gm = all.sum / all.size
    val ssb = groups.map(g => g.size * math.pow(g.sum / g.size - gm, 2)).sum
    val sst = all.map(x => math.pow(x - gm, 2)).sum
    val ssw = sst - ssb
    val f = (ssb / (groups.size - 1)) / (ssw / (all.size - groups.size))
    def rd(x: Double) = math.rint(x * 10000) / 10000
    assert(out.getAs[Long]("n_total") === 9L)
    assert(out.getAs[Int]("k_groups") === 3)
    assert(out.getAs[Double]("f_stat") === rd(f))
    assert(out.getAs[Double]("eta_sq") === rd(ssb / sst))
  }

  // ---------------- Partial correlation ----------------

  test("kdb_partial_corr matches the reference closed form; confounder removal shows") {
    // x and y both driven by z (hours 0..5): marginally correlated,
    // much less so once z is controlled for
    val HourNs = 3600L * 1000000000L
    val z = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0)
    val x = z.zipWithIndex.map { case (v, i) => v * 2 + (if (i % 2 == 0) 3 else -3) }
    val y = z.zipWithIndex.map { case (v, i) => v * 3 + (if (i % 3 == 0) 5 else -2) }
    val rows =
      z.zipWithIndex.map { case (v, i) =>
        (100L + i, T0 + i * HourNs + 1000L, 1L, "view", v, "{}") } ++
      x.zipWithIndex.map { case (v, i) =>
        (200L + i, T0 + i * HourNs + 2000L, 2L, "click", v, "{}") } ++
      y.zipWithIndex.map { case (v, i) =>
        (300L + i, T0 + i * HourNs + 3000L, 3L, "purchase", v, "{}") }
    val out = SparkEntry.queries("kdb_partial_corr")(spark, eventsDir(rows))
      .collect().head

    // reference on the 720-hour grid (absent hours are zeros)
    val n = 720
    def series(vs: Seq[Double]) =
      (0 until n).map(i => if (i < vs.size) math.rint(vs(i) * 100) else 0.0)
    val (xs, ys, zs) = (series(x), series(y), series(z))
    def corr(a: Seq[Double], b: Seq[Double]) = {
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (p, q) => p * q }.sum
      val saa = a.map(p => p * p).sum
      val sbb = b.map(p => p * p).sum
      (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    }
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val part = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    def rd(v: Double) = math.rint(v * 10000) / 10000
    assert(out.getAs[Double]("r_xy") === rd(rxy))
    assert(out.getAs[Double]("r_xy_given_z") === rd(part))
    // the whole point: controlling for z collapses the raw correlation
    assert(math.abs(out.getAs[Double]("r_xy_given_z")) <
      math.abs(out.getAs[Double]("r_xy")))
  }

  // ---------------- Generalized ESD ----------------

  test("kdb_esd_outliers: the second spike is unmasked after the first is removed") {
    // 10 active days at $100/day except day 3 ($10k) and day 7 ($8k):
    // a single z pass would let the day-3 spike inflate σ and hide
    // day 7; the iterated sweep must find 3 then 7
    val rows = (0 until 10).map { day =>
      val v = day match { case 3 => 10000.0; case 7 => 8000.0; case _ => 100.0 + day }
      (day.toLong, T0 + day * 24L * 3600L * 1000000000L + 1000L, day.toLong, "click", v, "{}")
    }
    val out = SparkEntry.queries("kdb_esd_outliers")(spark, eventsDir(rows))
      .collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("day_idx") === 3L)
    assert(out(1).getAs[Long]("day_idx") === 7L)
    // both flagged rounds are decisive outliers (and note round 2's z
    // typically EXCEEDS round 1's: removing the first spike shrinks σ
    // — precisely the masking effect the iteration exists to undo)
    assert(math.abs(out(0).getAs[Double]("esd_z")) > 2.0)
    assert(math.abs(out(1).getAs[Double]("esd_z")) > 2.0)
  }

  test("kdb_esd_outliers: a constant remainder yields NULL z rounds, never a divide error") {
    // one spike over an otherwise constant series: round 1 removes the
    // spike, rounds 2–3 see σ = 0 and must emit NULL z + the smallest
    // remaining day (the deterministic degenerate rule, both engines)
    val rows = (0 until 6).map { day =>
      val v = if (day == 2) 5000.0 else 100.0
      (day.toLong, T0 + day * 24L * 3600L * 1000000000L + 1000L, day.toLong, "click", v, "{}")
    }
    val out = SparkEntry.queries("kdb_esd_outliers")(spark, eventsDir(rows))
      .collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("day_idx") === 2L)
    assert(!out(0).isNullAt(out(0).fieldIndex("esd_z")))
    assert(out(1).isNullAt(out(1).fieldIndex("esd_z")))
    assert(out(1).getAs[Long]("day_idx") === 0L)
    assert(out(2).getAs[Long]("day_idx") === 1L)
  }

  // ---------------- PACF ----------------

  test("kdb_pacf matches the reference Durbin–Levinson on a periodic grid") {
    // hourly counts c_t = 1 + 2·[t ≡ 0 mod 4]: strong lag-structure,
    // reference autocovariances computable exactly in plain Scala
    val nSlots = ((T1 - T0) / (3600L * 1000000000L)).toInt
    val counts = (0 until nSlots).map(t => if (t % 4 == 0) 3 else 1)
    val rows = for {
      t <- 0 until nSlots
      c <- 0 until counts(t)
    } yield ((t * 10 + c).toLong, T0 + t * 3600L * 1000000000L + c * 1000L,
      c.toLong, "click", 1.0, "{}")
    val out = SparkEntry.queries("kdb_pacf")(spark, eventsDir(rows))
      .collect().head

    val v = counts.map(_.toDouble)
    val m = v.sum / v.size
    def acov(k: Int) = (0 until v.size - k).map(t => (v(t) - m) * (v(t + k) - m)).sum
    val r1 = acov(1) / acov(0); val r2 = acov(2) / acov(0); val r3 = acov(3) / acov(0)
    val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    val p21 = r1 * (1 - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    def rd(x: Double) = math.rint(x * 10000) / 10000
    assert(out.getAs[Double]("rho1") === rd(r1))
    assert(out.getAs[Double]("pacf1") === rd(r1))
    assert(out.getAs[Double]("pacf2") === rd(p22))
    assert(out.getAs[Double]("pacf3") === rd(p33))
  }

  // ---------------- Periodogram ----------------

  test("kdb_periodogram: a 24 h sinusoid concentrates power at period 24") {
    val nSlots = ((T1 - T0) / (3600L * 1000000000L)).toInt
    val counts = (0 until nSlots).map(t =>
      2 + math.round(math.cos(2 * math.Pi * t / 24.0)).toInt)
    val rows = for {
      t <- 0 until nSlots
      c <- 0 until counts(t)
    } yield ((t * 10 + c).toLong, T0 + t * 3600L * 1000000000L + c * 1000L,
      c.toLong, "click", 1.0, "{}")
    val out = SparkEntry.queries("kdb_periodogram")(spark, eventsDir(rows))
      .collect().map(r => r.getAs[Int]("period_h") -> r.getAs[Double]("power")).toMap
    assert(out(24) > 10 * out(12), "fundamental must dominate the harmonics")
    assert(out(24) > 10 * out(168), "no weekly power in a daily sinusoid")
  }

  // ---------------- Weighted sampling ----------------

  test("llm_weighted_sample matches a plain-Scala Efraimidis–Spirakis draw") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val want = docs.map { case (id, w) =>
      val u = (h60(s"$id:ws") + 1).toDouble / 1152921504606846976.0
      (id, math.log(u) / w)
    }.sortBy { case (id, k) => (-k, id) }.take(20).map(_._1).toSeq
    val got = SparkEntry.queries("llm_weighted_sample")(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got.sorted === want.sorted,
      "the engine must draw exactly the reference sample")
  }

  // ---------------- PCA power iteration ----------------

  test("llm_pca_power: PC1 explains at least as much variance as any single axis") {
    val out = SparkEntry.queries("llm_pca_power")(spark, sf).collect()
    val lam = out.head.getAs[Double]("lambda_cov")
    val share = out.head.getAs[Double]("var_share")
    assert(lam > 0)
    assert(share >= 1.0 / 64 - 1e-9,
      "λ1/trace can never be below the 1/d average")
  }

  test("training batch invariants: label disjointness, partition of test split, bucket cap") {
    val neg = SparkEntry.queries("llm_hard_negatives")(spark, sf).collect()
    assert(neg.nonEmpty)
    neg.foreach(r => assert(r.get(r.fieldIndex("q_label")) != r.get(r.fieldIndex("n_label"))))
    assert(neg.groupBy(_.getAs[Long]("qid")).values.forall(_.length <= 3))

    val conf = SparkEntry.queries("llm_centroid_classify")(spark, sf).collect()
    val nTest = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter("vec_id % 5 = 0").count()
    assert(conf.map(_.getAs[Long]("n_vecs")).sum === nTest,
      "confusion matrix must partition the test split")

    val div = SparkEntry.queries("llm_diversified_topk")(spark, sf).collect()
    assert(div.length === 10)
    assert(div.map(_.getAs[Long]("bucket")).distinct.length === 10,
      "at most one result per LSH bucket")
  }
}
