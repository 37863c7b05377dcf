package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve harness: replicate the sf0.1 tables k× with
  * id-space shifts and time the heaviest queries at each factor, to
  * measure how wall-time GROWS with data — the 100 TB question the
  * flat per-SF bench can't answer. A query whose time grows ~O(n)
  * (exponent ≈ 1 on this fixed-core box) survives a scale-up;
  * super-linear growth names a shuffle/buffer that won't.
  *
  * Replication model: every column named *key / *_id shifts by
  * replica × 1e9, so referential integrity holds across tables
  * (orders ↔ lineitem, nation ↔ region) and group cardinality grows
  * k× while per-group size stays constant — "more users in the same
  * time window", the organic growth shape. Timestamps are untouched,
  * so the kdb time-range filters stay meaningful (ingest density
  * grows k×).
  *
  * Text growth model: document replicas get every token TAGGED with
  * the replica index (replica 0 keeps the original text), so replica
  * shingle spaces are disjoint. Without this, exact replication
  * saturates the corpus with duplicates and any LSH/pair query
  * measures the dedup WORST CASE (~k² bucket pairs), not growth;
  * with it, near-dup structure replicates k× — organic corpus
  * growth — which is what lets the pair-based queries (pagerank,
  * dedup_eval) sit on this curve at all. The duplicate-saturated
  * worst case stays pinned separately by ScaleSmokeSpec's 20×
  * replica test.
  *
  * Usage: SPARK_GRAFT_SF_DIR (base, default sf0.1),
  * SPARK_GRAFT_SCALE_FACTORS (default "1,5,20"),
  * SPARK_GRAFT_SCALE_QUERIES (default: the heavy set below),
  * SPARK_GRAFT_SCALE_OUT (default /root/repo/SCALE_CURVE.json).
  * Two timed passes per (query, factor); min is reported (robust to
  * one GC spike; exponents need monotone-comparable points, not
  * population medians).
  */
object ScaleBench {

  private val Shift = 1000000000L

  /** Heaviest relational/TSDB queries by warmed sf0.1 medians
    * (BENCH_FULL.json, r6): the top of the bench, excluding the
    * streaming twins (per-run streaming setup dominates). The r6-close
    * additions ride the curve too: kdb_acf / kdb_benford_audit (grid
    * self-joins), llm_bm25_search (postings growth), and — thanks to
    * the token-tagged text model — llm_pagerank_centrality (pair
    * graph grows k×, lineage-truncated iterations) and llm_dedup_eval
    * (doc_id < 400 pre-flight bound: its cost must stay FLAT as the
    * corpus grows — a ~0 exponent is that query's pass condition,
    * pinned by design, not a measurement artifact). */
  private val DefaultQueries = Seq(
    "kdb_heavy_hitters", "kdb_asof_join", "q_percentile",
    "q_distinct_agg", "kdb_percentile_bands", "q5_broadcast_star_join",
    "q_profile_table", "kdb_approx_distinct", "kdb_sessionize",
    "q3_shuffle_join_topk",
    "kdb_acf", "kdb_benford_audit", "llm_pagerank_centrality",
    "llm_dedup_eval", "llm_bm25_search",
    // r7 heavies: full-corpus connected components (bound removed) and
    // PQ (k-means training + ADC search + rerank)
    "llm_dedup_clusters", "llm_similarity_pq",
    // r7-cont: the two-fact-table join (lineitem↔orders both grow k×,
    // the shuffle-join growth probe) and the histogram-rank curriculum
    // (two doc scans + broadcast — must stay ~linear, no hidden sort)
    "q_nation_trade", "llm_curriculum_order",
    // r7-cont wave 2: the Q21 window-over-fact-join (per-order
    // collect_set sets must stay bounded as orders grow k×), the Q4
    // non-equi hash semi join, and the silhouette eval (corpus ×
    // broadcast centroids; centroid count is fixed, so growth is the
    // scoring scan)
    "q_waiting_suppliers", "q_priority_wait", "llm_cluster_quality",
    // r7-cont wave 3 (stats/training batch): the exact distributed
    // rank (range shuffle must scale ~linearly), the 200× Poisson
    // replicate explode (partial-agg must keep the shuffle at B rows
    // per task), the dense-grid normalization (rollup-dominated,
    // grid constant), and anchor-broadcast negative mining (one
    // corpus scan growth)
    "kdb_mann_whitney", "kdb_bootstrap_ci", "kdb_quantile_norm",
    "llm_hard_negatives",
    // r7-cont wave 4 (close): exact weighted median (global prefix
    // sum over raw events — the DistributedRank growth probe on the
    // biggest input), the grid-pair Mann-Kendall (must stay flat —
    // pairs are constant in data size), the wj bucket-explode join
    // (both sides grow k×), and KN scoring (bigram tables grow)
    "kdb_weighted_median", "kdb_mann_kendall", "kdb_wj_agg",
    "llm_lm_score_kn",
    // r8 wave 5: the k-sample rank statistics (one range shuffle over
    // distinct values — the multi-column prefix-sum growth probe), the
    // grid-bounded spectral pair (pacf/periodogram must stay ~flat
    // after their rollup), the d²-cell covariance + fixed driver
    // eigensolve (growth is the outer-product scan ONLY), the
    // TakeOrdered samplers (k-bounded cuts must stay ~scan-linear),
    // and the pure-aggregation ANOVA / daily-grid ESD
    "kdb_ks_test", "kdb_kruskal_wallis", "kdb_pacf", "kdb_periodogram",
    "llm_pca_power", "llm_weighted_sample", "kdb_tail_index",
    "kdb_anova_f", "kdb_esd_outliers",
    // r9 wave 6: the distinct (source, shingle) self-join (per-shingle
    // fan-out bounded by |sources|² — growth must be the shingle-table
    // build, not the pair space) and the first ENGINE twin on the
    // curve (ingest → erase → rollup: partition-parallel parquet
    // rewrites; the lifecycle must scale with data, not with file
    // count × job overhead)
    "llm_source_overlap", "kdb_erase_twin",
    // r9 wave 7: the remaining engine lifecycle twins (backup/restore
    // at an MVCC cut; compact+rebucket maintenance) and the round's
    // trainers — BPE (one corpus tokenize + 8 aggregate-sized steps),
    // stump (one corpus histogram pass, split search data-independent),
    // logreg (3 gradient passes — must be ~scan-linear), preference
    // pairs and DP release (single-shuffle aggregations)
    "kdb_backup_twin", "kdb_maintenance_twin", "llm_bpe_train",
    "llm_stump_train", "llm_logreg_train", "llm_preference_pairs",
    "llm_dp_release",
    // r9 wave 8: the hash-gated k-means (3 assignment passes, each a
    // narrow map + k·64-cell shuffle — must be ~scan-linear like
    // logreg) and naive Bayes (vocab grows with the token-tagged
    // text model, so BOTH the model build and the test-token join
    // grow k× — the token-level-join growth probe)
    "llm_kmeans_train", "llm_nb_train",
    // r9 wave 8b: the boosting loop (per round: one corpus residual
    // pass + a histogram-sized split search — must stay scan-linear
    // like the other driver-update trainers)
    "llm_gbdt_train",
    // r9 wave 9: the segment-frequency rewrite (explode + two
    // digest-keyed shuffles — the candidate for super-linear growth
    // is the (source, chunk-hash) table), the nb-shaped label audit
    // (token-join growth like nb_train), and the bin-bounded PSI
    // monitor (must be flat-bounded output, scan-linear input)
    "llm_boilerplate_scrub", "llm_label_noise", "llm_psi_drift",
    // r9 wave 10 (this session's additions): the probe-bounded NPMI
    // pair joins (growth must be the incidence build, never the pair
    // space), the vocab-sized PageRank iterations over a corpus-
    // growing edge build, the scan-linear lag()-pass watermark
    // z-test, the raw-events DistributedRank order statistic (the
    // VaR range-shuffle growth probe beside weighted_median), the
    // rollup-dominated Haar pyramid (flat after the hourly rollup),
    // and the delta-sync engine lifecycle (two exports + two imports
    // — partition-parallel rewrites like the other twins)
    "llm_topic_coherence", "llm_textrank_keywords",
    "llm_watermark_detect", "kdb_var_es", "kdb_haar_energy",
    "kdb_replication_twin",
    // r9 wave 11: the three heaviest non-twin queries by warmed
    // sf0.1 median — the doubling suffix ranks (log-round range
    // shuffles; the oracle's direct sort is what does NOT scale),
    // 4-round BFS frontier joins, and the blocked ROUGE pair scorer
    "llm_suffix_array", "q_graph_reachability", "llm_rouge_pairs")

  private val Tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def replicateDir(spark: SparkSession, baseDir: String,
      outDir: String, k: Int): Unit = {
    Tables.foreach { t =>
      val df = spark.read.parquet(s"$baseDir/$t.parquet")
      val idCols = df.columns.filter(c => c.endsWith("key") || c.endsWith("_id"))
      val rep = df.withColumn("__r", explode(sequence(lit(0L), lit(k - 1L))))
      val shifted = idCols.foldLeft(rep) { (d, c) =>
        d.withColumn(c, col(c).cast("long") + col("__r") * Shift)
      }
      // disjoint shingle spaces per replica (see text growth model)
      val perturbed =
        if (t == "documents")
          shifted.withColumn("text",
            when(col("__r") === 0, col("text"))
              .otherwise(array_join(
                transform(split(col("text"), " "),
                  x => concat(x, lit("_"), col("__r"))), " ")))
        else shifted
      perturbed.drop("__r").write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** Probe-only latency of the STORED vector index as the index grows:
    * build once per factor over the replicated embeddings (untimed —
    * the build twins already sit on the curve), then time ONLY
    * annSearch / annSearchAdc against a FIXED 16-query set drawn from
    * the base replica. This isolates the claim the probe plans make
    * structurally (static cid partition pruning reads nprobe/k of the
    * index; ADC reads only the code column): if pruning ever broke,
    * probe time would grow with the FULL index and these exponents
    * would shoot toward the build twins' instead of staying flat-ish
    * (job overhead + k×-bigger probed cells only). */
  private def annProbeTimes(spark: SparkSession, dir: String,
      baseDir: String): Seq[(String, Double)] = {
    import graft.core._
    import spark.implicits._
    val T0 = 1600000000L * 1000000000L
    val opts = EngineOptions("scann", Scratch.dir("graft-scale-ann"),
      indexDepth = 1, payloadSize = 256,
      bucketDuration = 86400L * 1000000000L, resolution = 1000000000L,
      maxHotBuckets = 40)
    val engine = new Engine(spark, opts, new TestClock(T0 + 86000L * 1000000000L))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    engine.put(emb.as[(Long, Seq[Float])].map { case (id, v) =>
      Point(T0 + (id % 80000L) * 1000000000L, Seq(id.toString),
        graft.plans.FloatsFromPayload.encode(v), id)
    }.toDF())
    engine.buildVectorIndex(k = 16, iters = 2, pq = Some(PqParams(8, 16, 2)))
    // fixed query set from the base replica — identical across factors
    val qdf = spark.read.parquet(s"$baseDir/embeddings.parquet")
      .filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .persist()
    qdf.count() // materialize outside the timed region
    def probe(f: () => org.apache.spark.sql.DataFrame): Double = {
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      samples.min
    }
    try Seq(
      "ann_probe_exact" -> probe(() => engine.annSearch(qdf, nprobe = 2, topk = 10)),
      "ann_probe_adc" -> probe(() => engine.annSearchAdc(qdf, nprobe = 2, topk = 10)))
    finally { qdf.unpersist(); spark.sharedState.cacheManager.clearCache() }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,5,20")
      .split(",").map(_.trim.toInt).toSeq
    val queries = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(DefaultQueries)
    val annProbe = sys.env.getOrElse("SPARK_GRAFT_SCALE_ANN", "1") == "1"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/root/repo/SCALE_CURVE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.EngineSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // writer/codegen warmup (same rationale as graft.Bench)
    spark.range(1000L).selectExpr("id % 5 AS k", "id AS v")
      .groupBy("k").agg(sum("v"))
      .write.mode("overwrite").format("noop").save()

    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // same discipline as graft.Bench.runOnce: per-query persist()
      // blocks must neither accumulate across replicas nor let a
      // second sample reuse the first's cache (untimed teardown)
      spark.sharedState.cacheManager.clearCache()
      dt
    }

    val results = factors.map { k =>
      val dir =
        if (k == 1) baseDir
        else {
          val d = Files.createTempDirectory(s"graft-scale-x$k").toString
          replicateDir(spark, baseDir, d, k)
          d
        }
      val times = queries.map { q =>
        val samples = (1 to 2).map { _ =>
          try timeOnce(q, dir)
          catch { case e: Throwable =>
            System.err.println(s"[scale] $q x$k FAILED: ${e.getMessage}")
            -1.0
          }
        }
        q -> (if (samples.forall(_ >= 0)) samples.min else -1.0)
      } ++ (if (annProbe)
        try annProbeTimes(spark, dir, baseDir)
        catch { case e: Throwable =>
          System.err.println(s"[scale] ann probe x$k FAILED: ${e.getMessage}")
          Seq("ann_probe_exact" -> -1.0, "ann_probe_adc" -> -1.0)
        }
      else Nil)
      k -> times
    }
    val allNames = queries ++
      (if (annProbe) Seq("ann_probe_exact", "ann_probe_adc") else Nil)

    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    val json = results.map { case (k, times) =>
      "\"x" + k + "\":" + times.map { case (q, t) => s"\"" + q + "\":" + r3(t) }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    // per-query growth exponent between the smallest and largest factor
    val lo = results.head._2.toMap
    val hi = results.last._2.toMap
    val ratio = results.last._1.toDouble / results.head._1
    val exps = allNames.map { q =>
      val e =
        if (lo(q) > 0 && hi(q) > 0) math.log(hi(q) / lo(q)) / math.log(ratio)
        else Double.NaN
      s"\"" + q + "\":" + (if (e.isNaN) "null" else r3(e).toString)
    }.mkString("{", ",", "}")
    val out = s"""{"base":"$baseDir","factors":[${factors.mkString(",")}],"times":$json,"exponents":$exps}"""
    Files.writeString(Paths.get(outPath), out)
    println(out)
    spark.stop()
  }
}
