package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.{hash60, tokens}
import graft.functions.VectorFunctions._
import graft.sources.Tables.{documents, embeddings}

/** Training-set curation over the labeled embedding corpus — the ops
  * between "deduped corpus" and "training batch": contrastive
  * hard-negative mining, a nearest-centroid label audit, and
  * diversity-constrained retrieval. All pairwise work is broadcast-
  * bounded (a fixed anchor/centroid set against the corpus) or
  * LSH-bucket-local — never an all-pairs self-join.
  */
object TrainingQueries extends QueryModule {

  /** DuckDB twin of the strict left-fold dot product (identical
    * association order to graft.plans.DotProduct — bit-identical
    * doubles, the llm_dedup_semantic precedent). */
  private def dkDot(a: String, b: String): String =
    s"""list_reduce([0.0] || list_transform(generate_series(1, len($a)),
       i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""

  private def dkCos(a: String, b: String): String =
    s"${dkDot(a, b)} / (sqrt(${dkDot(a, a)}) * sqrt(${dkDot(b, b)}))"

  /** Contrastive hard-negative mining: for each of 32 anchor vectors,
    * the top-3 most-similar vectors carrying a DIFFERENT label — the
    * negatives that actually move a contrastive loss. The anchor set
    * broadcasts (fixed, small); the corpus streams past it once, so
    * the cost is |corpus| × |anchors| codegen'd cosine folds. Top-3
    * selection uses the k-bounded TopKAgg (the llm_knn_classify
    * rewrite): map-side buffers carry at most 3 candidates per
    * anchor per partition, so the shuffle is k·|anchors| rows — a
    * per-anchor row_number window would instead sort |corpus| rows
    * per anchor through one task. Labels rejoin via a broadcast of
    * the 96-row winner set against a column-pruned corpus scan. At
    * 100 TB the same query runs against the IVF/LSH-bucketed index
    * (llm_similarity_ivf) to cut the candidate set; brute force is
    * the exactness baseline. */
  private val hardNegatives = QueryDef(
    "llm_hard_negatives",
    (s, d) => {
      import s.implicits._
      val e = embeddings(s, d)
      val anchors = e.filter(col("vec_id") < 32)
        .select(col("vec_id").as("qid"), col("label").as("q_label"),
          col("embedding").as("qv"))
      val corpus = e.select(col("vec_id").as("nid"),
        col("label").as("n_label"), col("embedding").as("nv"))
      val top3 = broadcast(anchors)
        .join(corpus, col("q_label") =!= col("n_label"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .select(col("qid"), col("nid"), col("cos"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, nid, cos) => graft.functions.TopK.Scored(nid, cos) }
        .agg(graft.functions.TopK.topK(3))
        .toDF("qid", "top")
        .select(col("qid"), posexplode(col("top")).as(Seq("pos", "sc")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rk"),
          col("sc.id").as("nid"), col("sc.score").as("cosr"))
      e.select(col("vec_id").as("nid"), col("label").as("n_label"))
        .join(broadcast(top3), "nid")
        .join(broadcast(anchors.select(col("qid"), col("q_label"))), "qid")
        .select(col("qid"), col("rk"), col("nid"), col("q_label"),
          col("n_label"), round(col("cosr"), 4).as("cos"))
        .orderBy(col("qid"), col("rk"))
    },
    Some(s"""
      WITH anchors AS (
        SELECT vec_id AS qid, label AS q_label, embedding AS qv
        FROM embeddings WHERE vec_id < 32),
      scored AS (
        SELECT a.qid, a.q_label, c.vec_id AS nid, c.label AS n_label,
               ${dkCos("a.qv", "c.embedding")} AS cos
        FROM anchors a JOIN embeddings c ON a.q_label <> c.label),
      rk AS (
        SELECT qid, q_label, nid, n_label, cos,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, nid) AS rk
        FROM scored)
      SELECT qid, rk, nid, q_label, n_label, round(cos, 4) AS cos
      FROM rk WHERE rk <= 3
      ORDER BY qid, rk"""))

  /** Nearest-centroid label audit: hash-split train/test (vec_id%5=0
    * is test), per-label centroids from train, every test vector
    * classified to its nearest centroid by cosine, output the
    * confusion matrix. The cross-engine float-mean trap
    * (llm_similarity_ivf_trained scaladoc) is solved EXACTLY here:
    * each component is quantized to integer micros and the centroid
    * is the micro-SUM — integer, order-independent, identical in
    * both engines — and since cosine is scale-invariant the sum IS
    * the mean for classification purposes (no division, no float
    * mean). Scale shape: one posexplode pass for 10×64 integer
    * cells, centroids broadcast, one corpus pass to classify. */
  private val centroidClassify = QueryDef(
    "llm_centroid_classify",
    (s, d) => {
      val e = embeddings(s, d)
      val cells = e.filter(col("vec_id") % 5 =!= 0)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(sum(round(col("v").cast("double") * 1000000, 0).cast("long")).as("sm"))
      val cents = cells.groupBy(col("label"))
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("sm")))),
          x => x.getField("sm").cast("double")).as("cv"))
        .select(col("label").as("c_label"), col("cv"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("c_label"))
      e.filter(col("vec_id") % 5 === 0)
        .crossJoin(broadcast(cents))
        .withColumn("cos", cosine(col("embedding"), col("cv")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .groupBy(col("label"), col("c_label").as("pred_label"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("label"), col("pred_label"))
    },
    Some(s"""
      WITH cells AS (
        SELECT label, t.dim AS dim,
               CAST(sum(CAST(round(CAST(embedding[t.dim] AS DOUBLE) * 1000000, 0)
                 AS BIGINT)) AS BIGINT) AS sm
        FROM embeddings CROSS JOIN range(1, 65) t(dim)
        WHERE vec_id % 5 <> 0
        GROUP BY 1, 2),
      cents AS (
        SELECT label AS c_label,
               list(CAST(sm AS DOUBLE) ORDER BY dim) AS cv
        FROM cells GROUP BY 1),
      scored AS (
        SELECT e.vec_id, e.label, c.c_label,
               ${dkCos("e.embedding", "c.cv")} AS cos
        FROM embeddings e CROSS JOIN cents c
        WHERE e.vec_id % 5 = 0),
      best AS (
        SELECT vec_id, label, c_label,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, c_label) AS rk
        FROM scored)
      SELECT label, c_label AS pred_label, count(*) AS n_vecs
      FROM best WHERE rk = 1
      GROUP BY 1, 2
      ORDER BY label, pred_label"""))

  /** Diversity-constrained retrieval: cosine top-10 for a query
    * vector, but at most ONE result per 8-bit sign-LSH bucket — the
    * cheap deterministic stand-in for MMR re-ranking (greedy MMR is
    * inherently sequential; bucket-capping gets the "don't return 10
    * near-duplicates" effect in two partitioned window passes).
    * Bucket-best is a map-side-combinable argmax — max(struct(cos,
    * −nid, nid)) folds lexicographically to (best cos, lowest nid)
    * with at most one buffered row per bucket per partition, so the
    * shuffle carries ≤256 rows per task (a per-bucket row_number
    * window would sort each bucket's full membership instead); the
    * final top-10 is a TakeOrderedAndProject over ≤256 bucket
    * winners. Safe to compare raw cosines: the fold is bit-identical
    * in both engines (llm_dedup_semantic precedent). */
  private val diversifiedTopk = QueryDef(
    "llm_diversified_topk",
    (s, d) => {
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      e.filter(col("vec_id") > 0)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"))
        .crossJoin(broadcast(q))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("bucket", signBucket(col("nv"), 8))
        .groupBy(col("bucket"))
        .agg(max(struct(col("cos"), (-col("nid")).as("neg_nid"),
          col("nid").as("nid"))).as("m"))
        .select(col("bucket"), col("m.nid").as("nid"),
          round(col("m.cos"), 4).as("cos"))
        .orderBy(col("cos").desc, col("nid")).limit(10)
        .orderBy(col("cos").desc, col("nid"))
    },
    Some {
      val bucket = (0 until 8).map(i =>
        s"CASE WHEN nv[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
      s"""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id AS nid, e.embedding AS nv,
               ${dkCos("q.qv", "e.embedding")} AS cos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id > 0),
      bucketed AS (
        SELECT nid, cos, $bucket AS bucket,
               row_number() OVER (PARTITION BY ($bucket)
                 ORDER BY cos DESC, nid) AS rk
        FROM scored)
      SELECT bucket, nid, round(cos, 4) AS cos
      FROM bucketed WHERE rk = 1
      ORDER BY cos DESC, nid LIMIT 10"""
    })

  /** Leading principal component of the embedding corpus by power
    * iteration — the spectral audit behind whitening, anisotropy
    * checks ("is the corpus collapsing onto one direction?"), and
    * Matryoshka-style dimension triage. Scale decomposition: the
    * DATA-SIZED work is one pass building the d×d covariance — a
    * dense per-partition (d + d²)-long accumulator (mapPartitions:
    * the one shape where imperative per-partition folding beats any
    * row encoding — a posexplode² expansion materializes n·d² rows
    * where this touches n·d² multiplications but emits ≤|partitions|
    * fixed-size buffers, ~5× faster at bench scale).
    * The d×d eigensolve is then FIXED-SIZE driver math (the
    * Ivf.train centroid precedent): 12 power-method iterations from
    * v₀ = 1/8·𝟙 on a 64×64 matrix. Cross-engine float discipline:
    * components quantize to integer micros (llm_centroid_classify
    * precedent) so ΣQ and ΣQQ are exact BIGINTs and the covariance
    * C = ΣQQ/n − (ΣQᵢ/n)(ΣQⱼ/n) is derived from identical operands
    * in both engines; power iteration is contractive, so the
    * engines' sum-order ulp differences decay into the same fixed
    * point instead of accumulating. Sign is canonicalized (largest-
    * |component| entry made positive). The DuckDB oracle runs the
    * SAME 12 iterations as an unrolled (non-recursive) CTE chain,
    * generated below. */
  private val pcaPower = QueryDef(
    "llm_pca_power",
    (s, d) => {
      import s.implicits._
      val Dim = 64
      val e = embeddings(s, d)
      // One dense per-partition accumulator instead of a posexplode²
      // row blowup: each task folds its rows into a FIXED (d + d²)-
      // long buffer (the per-partition imperative case mapPartitions
      // exists for — 8M exploded rows become ≤|partitions| partials),
      // then ≤32 partials fold on the driver. Exact-int contract
      // unchanged: halfUp mirrors both engines' round() (HALF_UP,
      // away from zero), so ΣQ/ΣQQ are the same BIGINTs the SQL
      // aggregation produces.
      def halfUp(x: Double): Long =
        (math.signum(x) * math.floor(math.abs(x) + 0.5)).toLong
      // row count rides the same buffer (no separate count() job, and
      // an empty table fails fast instead of dividing NaN covariances)
      val partials = e.select(col("embedding")).as[Array[Float]]
        .mapPartitions { it =>
          var cnt = 0L
          val sums = new Array[Long](Dim)
          val qq = new Array[Long](Dim * Dim)
          it.foreach { arr =>
            cnt += 1
            val q = new Array[Long](Dim)
            var i = 0
            while (i < Dim) { q(i) = halfUp(arr(i).toDouble * 1000000); i += 1 }
            i = 0
            while (i < Dim) {
              sums(i) += q(i)
              val base = i * Dim
              var j = 0
              while (j < Dim) { qq(base + j) += q(i) * q(j); j += 1 }
              i += 1
            }
          }
          Iterator.single((cnt, sums, qq))
        }.collect() // ≤ one (d + d²) buffer per partition, data-independent
      val sums = new Array[Long](Dim)
      val qqTot = new Array[Long](Dim * Dim)
      var n = 0L
      partials.foreach { case (c2, s2, q2) =>
        n += c2
        var i = 0
        while (i < Dim) { sums(i) += s2(i); i += 1 }
        i = 0
        while (i < Dim * Dim) { qqTot(i) += q2(i); i += 1 }
      }
      require(n > 0, "llm_pca_power: empty embeddings table")
      val cov = Array.ofDim[Double](Dim, Dim)
      for (i <- 0 until Dim; j <- 0 until Dim)
        cov(i)(j) = qqTot(i * Dim + j).toDouble / n -
          (sums(i).toDouble / n) * (sums(j).toDouble / n)
      var v = Array.fill(Dim)(0.125)
      var lam = 0.0
      for (_ <- 1 to 12) {
        val w = Array.tabulate(Dim) { i =>
          var acc = 0.0
          var j = 0
          while (j < Dim) { acc += cov(i)(j) * v(j); j += 1 }
          acc
        }
        lam = math.sqrt(w.map(x => x * x).sum)
        v = w.map(_ / lam)
      }
      val imax = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val flip = if (v(imax) < 0) -1.0 else 1.0
      val trace = (0 until Dim).map(i => cov(i)(i)).sum
      (0 until Dim)
        .map(i => (i + 1, v(i) * flip, lam / 1e12, lam / trace))
        .toDF("dim", "loading_raw", "lambda_raw", "share_raw")
        .select(col("dim"),
          (round(col("loading_raw"), 4) + lit(0.0)).as("loading"),
          round(col("lambda_raw"), 6).as("lambda_cov"),
          round(col("share_raw"), 4).as("var_share"))
        .orderBy(col("dim"))
    },
    Some {
      val iters = (1 to 12).map { k =>
        val prev = if (k == 1) "v0" else s"v${k - 1}"
        // wK MATERIALIZED: nK and vK both read wK — without it the
        // inliner doubles the evaluation tree per level (2^12 blowup)
        s"""w$k AS MATERIALIZED (
        SELECT c.i AS dim, sum(c.c * v.x) AS x
        FROM cov c JOIN $prev v ON v.dim = c.j GROUP BY 1),
      n$k AS (SELECT sqrt(sum(x * x)) AS s FROM w$k),
      v$k AS (SELECT dim, x / s AS x FROM w$k CROSS JOIN n$k)"""
      }.mkString(",\n      ")
      s"""
      WITH q AS MATERIALIZED (
        -- MATERIALIZED: the 12-iteration CTE chain references cov 12×;
        -- without it DuckDB inlines q (and its parquet scan) into every
        -- iteration and exhausts file handles
        SELECT vec_id, t.dim AS dim,
               CAST(round(CAST(embedding[t.dim] AS DOUBLE) * 1000000, 0)
                 AS BIGINT) AS qv
        FROM embeddings CROSS JOIN range(1, 65) t(dim)),
      nn AS (SELECT count(*) AS n FROM embeddings),
      sums AS (SELECT dim, CAST(sum(qv) AS BIGINT) AS sq FROM q GROUP BY 1),
      sqq AS (
        SELECT a.dim AS i, b.dim AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS sqq
        FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      cov AS MATERIALIZED (
        SELECT i, j,
               CAST(sqq AS DOUBLE) / nn.n
                 - (CAST(sa.sq AS DOUBLE) / nn.n) * (CAST(sb.sq AS DOUBLE) / nn.n) AS c
        FROM sqq JOIN sums sa ON sa.dim = sqq.i
                 JOIN sums sb ON sb.dim = sqq.j
        CROSS JOIN nn),
      v0 AS (SELECT dim, 0.125 AS x FROM range(1, 65) t(dim)),
      $iters,
      flip AS (
        SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS f
        FROM v12 ORDER BY abs(x) DESC, dim LIMIT 1),
      tr AS (SELECT sum(c) AS trace FROM cov WHERE i = j)
      SELECT CAST(v.dim AS INT) AS dim,
             round(v.x * flip.f, 4) + 0.0 AS loading,
             round(n12.s / 1e12, 6) AS lambda_cov,
             round(n12.s / tr.trace, 4) AS var_share
      FROM v12 v CROSS JOIN flip CROSS JOIN n12 CROSS JOIN tr
      ORDER BY dim"""
    })

  /** Decision-stump training by distributed histogram split search —
    * the inner loop of gradient-boosted-tree learners (XGBoost/
    * LightGBM grow trees exactly this way): ONE corpus pass builds
    * the aggregate-sized (feature, bucket, label) histogram, then
    * every candidate split of every feature is scored from window
    * cumulative sums over that histogram — never a per-split data
    * scan. Label: lang = 'en'; features are exact-integer
    * bucketizations (token count, char count, avg/max token length)
    * so the histogram is exact in both engines. Split score is the
    * weighted Gini sum-of-squares Σc_L²/n_L + Σc_R²/n_R — each term
    * ONE correctly-rounded IEEE division of exact BIGINTs and one
    * addition in fixed order, so the doubles are bit-identical
    * across engines and the argmax (score DESC, then integer
    * (feature, threshold)) is branch-safe without rounding. Output:
    * best split per feature + its exact child counts (which pin the
    * cumsum arithmetic) + 4dp impurity reports + the overall winner
    * flag. At 100 TB the corpus pass is the only data-sized work —
    * the split search runs on a histogram whose size is features ×
    * buckets, independent of row count. */
  private val stumpTrain = QueryDef(
    "llm_stump_train",
    (s, d) => {
      val docs = documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("nt", size(col("toks")))
        .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L))
      val feats = docs.select(col("y"),
        explode(array(
          struct(lit(1).as("feature"), (col("nt") / 8).cast("long").as("bucket")),
          struct(lit(2).as("feature"), (col("n_chars") / 64).cast("long").as("bucket")),
          struct(lit(3).as("feature"),
            expr("(10 * length(replace(text, ' ', ''))) div nt").as("bucket")),
          struct(lit(4).as("feature"),
            expr("aggregate(toks, 0L, (m, w) -> greatest(m, length(w))) div 2")
              .as("bucket")))).as("fb"))
        .select(col("fb.feature"), col("fb.bucket"), col("y"))
      // nt div 8: Spark integer `/` on longs is double division — use
      // explicit div via cast after floor-free int math
      val hist = feats.groupBy(col("feature"), col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n1"))
      val wCum = Window.partitionBy(col("feature")).orderBy(col("bucket"))
      val wTot = Window.partitionBy(col("feature"))
      val scored = hist
        .withColumn("nl", sum(col("n")).over(wCum))
        .withColumn("nl1", sum(col("n1")).over(wCum))
        .withColumn("nt_all", sum(col("n")).over(wTot))
        .withColumn("nt1", sum(col("n1")).over(wTot))
        .withColumn("nr", col("nt_all") - col("nl"))
        .withColumn("nr1", col("nt1") - col("nl1"))
        .filter(col("nr") > 0) // a split must leave both children non-empty
        .withColumn("score",
          (col("nl1") * col("nl1") + (col("nl") - col("nl1")) * (col("nl") - col("nl1")))
            .cast("double") / col("nl") +
            (col("nr1") * col("nr1") + (col("nr") - col("nr1")) * (col("nr") - col("nr1")))
              .cast("double") / col("nr"))
      val best = scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("feature"))
            .orderBy(col("score").desc, col("bucket"))))
        .filter(col("rk") === 1)
      best
        .withColumn("overall", row_number().over(
          Window.partitionBy(lit(1)) // 4 rows total: trivially bounded
            .orderBy(col("score").desc, col("feature"), col("bucket"))))
        .select(col("feature"), col("bucket").as("threshold"),
          col("nl"), col("nl1"), col("nr"), col("nr1"),
          (round(col("score"), 4) + lit(0.0)).as("split_score"),
          (round(lit(1.0) - col("score") / col("nt_all"), 4) + lit(0.0))
            .as("child_gini"),
          when(col("overall") === 1, 1).otherwise(0).as("is_best"))
        .orderBy(col("feature"))
    },
    Some("""
      WITH docs AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               string_split(text, ' ') AS toks, n_chars, text
        FROM documents),
      feats AS (
        SELECT y, 1 AS feature, len(toks) // 8 AS bucket FROM docs
        UNION ALL
        SELECT y, 2, n_chars // 64 FROM docs
        UNION ALL
        SELECT y, 3, (10 * length(replace(text, ' ', ''))) // len(toks) FROM docs
        UNION ALL
        SELECT y, 4, list_max(list_transform(toks, w -> length(w))) // 2 FROM docs),
      hist AS (
        SELECT feature, bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS n1
        FROM feats GROUP BY 1, 2),
      scored AS (
        SELECT feature, bucket,
               sum(n) OVER wc AS nl, sum(n1) OVER wc AS nl1,
               sum(n) OVER wt AS nt_all, sum(n1) OVER wt AS nt1
        FROM hist
        WINDOW wc AS (PARTITION BY feature ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wt AS (PARTITION BY feature)),
      sc2 AS (
        SELECT feature, bucket, nl, nl1, nt_all,
               nt_all - nl AS nr, nt1 - nl1 AS nr1,
               CAST(nl1 * nl1 + (nl - nl1) * (nl - nl1) AS DOUBLE) / nl
                 + CAST((nt1 - nl1) * (nt1 - nl1)
                        + ((nt_all - nl) - (nt1 - nl1)) * ((nt_all - nl) - (nt1 - nl1))
                        AS DOUBLE) / (nt_all - nl) AS score
        FROM scored WHERE nt_all - nl > 0),
      best AS (
        SELECT *, row_number() OVER (PARTITION BY feature
                    ORDER BY score DESC, bucket) AS rk
        FROM sc2),
      flagged AS (
        SELECT *, row_number() OVER (ORDER BY score DESC, feature, bucket) AS overall
        FROM best WHERE rk = 1)
      SELECT feature, bucket AS threshold,
             CAST(nl AS BIGINT) AS nl, CAST(nl1 AS BIGINT) AS nl1,
             CAST(nr AS BIGINT) AS nr, CAST(nr1 AS BIGINT) AS nr1,
             round(score, 4) + 0.0 AS split_score,
             round(1.0 - score / nt_all, 4) + 0.0 AS child_gini,
             CASE WHEN overall = 1 THEN 1 ELSE 0 END AS is_best
      FROM flagged
      ORDER BY feature"""))

  /** Hard-sigmoid logistic-regression training by distributed
    * gradient descent — the canonical "compute the gradient in
    * parallel, update on the driver" loop every distributed ML
    * library runs (3 iterations; one corpus-pass aggregation each,
    * collecting FOUR BIGINTs — the IVF-train plan-reset discipline).
    * Cross-engine exactness by construction, not tolerance: features
    * scale by powers of two (a/512, b/128, c/16 — EXACT IEEE
    * doubles), the margin folds left-to-right from driver weights
    * whose update arithmetic is the identical expression in both
    * engines, the hard sigmoid clamp(0.5 + z/4) is branch +
    * exact-arithmetic only (no libm exp whose ulps could flip an
    * equality-sensitive decision — the llm_quality_classifier
    * lesson), and per-row residuals quantize to exact 2²⁰ integer
    * units BEFORE summing so the gradient is an order-independent
    * BIGINT sum. Each output row pins the full iteration: exact
    * gradient ints, post-update weights, and the pre-update decision
    * accuracy (sign of the bit-identical margin). The oracle replays
    * the same 3 iterations as chained CTEs carrying weights as
    * columns. */
  private val logregTrain = QueryDef(
    "llm_logreg_train",
    (s, d) => {
      import s.implicits._
      val base = documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("n_chars").as("a"),
          size(col("toks")).cast("long").as("b"),
          expr("aggregate(toks, 0L, (m, w) -> greatest(m, length(w)))").as("c"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .localCheckpoint() // 3 gradient passes + final reread the same rows
      var (w0, wa, wb, wc) = (0.0, 0.0, 0.0, 0.0)
      val lr = 0.5
      val iters = Seq.newBuilder[(Int, Long, Long, Long, Long, Long,
        Double, Double, Double, Double)]
      for (it <- 1 to 3) {
        val z = lit(w0) + lit(wa) * (col("a").cast("double") / 512.0) +
          lit(wb) * (col("b").cast("double") / 128.0) +
          lit(wc) * (col("c").cast("double") / 16.0)
        val sRaw = lit(0.5) + z * 0.25
        val p = when(sRaw < 0.0, 0.0).when(sRaw > 1.0, 1.0).otherwise(sRaw)
        val rq = round((p - col("y")) * 1048576.0, 0).cast("long")
        val row = base.agg(
          count(lit(1)).as("n"),
          sum(rq).as("g0"),
          sum(rq * col("a")).as("ga"),
          sum(rq * col("b")).as("gb"),
          sum(rq * col("c")).as("gc"),
          sum(when((z > 0.0) === (col("y") === 1L), 1L).otherwise(0L))
            .as("ncorr")).collect()(0) // bounded: six scalars per iteration
        val n = row.getLong(0)
        val (g0, ga, gb, gc2, nc) = (row.getLong(1), row.getLong(2),
          row.getLong(3), row.getLong(4), row.getLong(5))
        w0 = w0 - lr * g0 / (n * 1048576.0)
        wa = wa - lr * ga / (n * 1048576.0 * 512.0)
        wb = wb - lr * gb / (n * 1048576.0 * 128.0)
        wc = wc - lr * gc2 / (n * 1048576.0 * 16.0)
        iters += ((it, g0, ga, gb, gc2, nc, w0, wa, wb, wc))
      }
      iters.result()
        .toDF("iter", "g0", "ga", "gb", "gc", "n_correct_before",
          "w0", "wa", "wb", "wc")
        .select(col("iter"), col("g0"), col("ga"), col("gb"), col("gc"),
          col("n_correct_before"),
          (round(col("w0"), 6) + lit(0.0)).as("w0"),
          (round(col("wa"), 6) + lit(0.0)).as("wa"),
          (round(col("wb"), 6) + lit(0.0)).as("wb"),
          (round(col("wc"), 6) + lit(0.0)).as("wc"))
        .orderBy(col("iter"))
    },
    Some {
      def zExpr(w: String): String =
        s"($w.w0 + $w.wa * (CAST(a AS DOUBLE) / 512.0)" +
          s" + $w.wb * (CAST(b AS DOUBLE) / 128.0)" +
          s" + $w.wc * (CAST(c AS DOUBLE) / 16.0))"
      def gradCte(k: Int): String = {
        val w = s"wt${k - 1}"
        s"""g$k AS (
        SELECT count(*) AS n,
               CAST(sum(rq) AS BIGINT) AS g0,
               CAST(sum(rq * a) AS BIGINT) AS ga,
               CAST(sum(rq * b) AS BIGINT) AS gb,
               CAST(sum(rq * c) AS BIGINT) AS gc,
               CAST(sum(CASE WHEN (z > 0.0) = (y = 1) THEN 1 ELSE 0 END)
                    AS BIGINT) AS ncorr
        FROM (
          SELECT y, a, b, c, z,
                 CAST(round((CASE WHEN s < 0.0 THEN 0.0
                                  WHEN s > 1.0 THEN 1.0
                                  ELSE s END - y) * 1048576.0) AS BIGINT) AS rq
          FROM (SELECT *, 0.5 + z * 0.25 AS s
                FROM (SELECT f.*, ${zExpr(w)} AS z FROM f CROSS JOIN $w)))),
      wt$k AS (
        SELECT w0 - 0.5 * g0 / (n * 1048576.0) AS w0,
               wa - 0.5 * ga / (n * 1048576.0 * 512.0) AS wa,
               wb - 0.5 * gb / (n * 1048576.0 * 128.0) AS wb,
               wc - 0.5 * gc / (n * 1048576.0 * 16.0) AS wc
        FROM wt${k - 1} CROSS JOIN g$k)"""
      }
      val rows = (1 to 3).map(k =>
        s"""SELECT $k AS iter, g0, ga, gb, gc, ncorr AS n_correct_before,
               round((SELECT w0 FROM wt$k), 6) + 0.0 AS w0,
               round((SELECT wa FROM wt$k), 6) + 0.0 AS wa,
               round((SELECT wb FROM wt$k), 6) + 0.0 AS wb,
               round((SELECT wc FROM wt$k), 6) + 0.0 AS wc
        FROM g$k""").mkString("\n        UNION ALL ")
      s"""
      WITH f AS (
        SELECT n_chars AS a,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS b,
               CAST(list_max(list_transform(string_split(text, ' '),
                 w -> length(w))) AS BIGINT) AS c,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents),
      wt0 AS (SELECT 0.0 AS w0, 0.0 AS wa, 0.0 AS wb, 0.0 AS wc),
      ${(1 to 3).map(gradCte).mkString(",\n      ")}
      SELECT * FROM ($rows)
      ORDER BY iter"""
    })

  /** HASH-GATED k-means training — 3 Lloyd iterations, k = 4, over the
    * embedding corpus. llm_similarity_ivf_trained's scaladoc explains
    * why a float-mean k-means can only be property-gated: centroid
    * means are order-of-summation floating point. This trainer removes
    * that nondeterminism BY CONSTRUCTION so the full training
    * trajectory sits under the driver's hash gate: every embedding
    * component quantizes to exact integer micros BEFORE summing
    * (order-independent BIGINT cell sums, the llm_centroid_classify
    * discipline), and the working centroid is (microsum / count) /
    * 1e6 — two IEEE divisions of exact integers, bit-identical in
    * both engines. Distances then ride the strict left-fold L2Sq
    * kernel (bit-identical to DuckDB's list_reduce rendering), so
    * assignment argmin with a cid tie-break can never diverge.
    *
    * Spark shape, per iteration: assignment is a NARROW codegen'd map
    * — k l2sq folds per row feeding one array_min over (dist, cid)
    * structs, no crossJoin, no per-row window, no shuffle — and the
    * ONLY shuffle is the (cid, dim) cell aggregate, map-side-combined
    * down to k·64 rows that also carry the iteration stats (member
    * counts on the cell counts, micro-quantized inertia on the dim-0
    * group). The driver holds k·64 doubles of state and collects
    * k·64 rows per iteration — the same driver-update loop as
    * llm_logreg_train, and exactly how a 1000-executor k-means wants
    * to run: corpus passes stay narrow, reduced state is tiny.
    * Empty-cluster rule (both engines): keep the previous centroid.
    * Output pins the trajectory: per (iter, cid) the member count,
    * total inertia in micros, and the centroid's micro-cell checksum.
    */
  private val kmeansTrain = QueryDef(
    "llm_kmeans_train",
    (s, d) => {
      import s.implicits._
      val k = 4
      val micros = (c: Column) => round(c.cast("double") * 1000000, 0).cast("long")
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
        .localCheckpoint() // 3 assignment passes reread the same rows
      // init: micro-quantized seed vectors (cnt = 1), quantized by the
      // SAME Spark-SQL round as every later update — the driver never
      // rounds (JVM Math.round is half-up, not half-away-from-zero,
      // and embedding components go negative)
      val init = e.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cid"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("cid"), col("dim"), micros(col("v")).as("sm"),
          lit(1L).as("cnt"))
        .collect()
      def centroidsOf(cells: Array[org.apache.spark.sql.Row]): Map[Int, Array[Double]] =
        cells.groupBy(_.getAs[Int]("cid")).map { case (cid, rs) =>
          cid -> rs.sortBy(_.getAs[Int]("dim"))
            .map(r => r.getAs[Long]("sm").toDouble / r.getAs[Long]("cnt") / 1000000.0)
        }
      var cents: Seq[(Int, Array[Double])] =
        centroidsOf(init).toSeq.sortBy(_._1)
      val out = Seq.newBuilder[(Int, Int, Long, Long, Long)]
      for (it <- 1 to 3) {
        val best = array_min(array(cents.map { case (cid, cv) =>
          struct(l2sq(col("embedding"), typedLit(cv)).as("d"),
            lit(cid).as("c"))
        }: _*))
        val cells = e.withColumn("best", best)
          .select(col("best.c").as("cid"),
            round(col("best.d") * 1000000, 0).cast("long").as("dmic"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy(col("cid"), col("dim"))
          .agg(sum(micros(col("v"))).as("sm"), count(lit(1)).as("cnt"),
            sum(col("dmic")).as("dsum")) // = cid's inertia (each member once per dim)
          .collect() // k·64 rows — bounded, independent of corpus size
        cells.filter(_.getAs[Int]("dim") == 0)
          .sortBy(_.getAs[Int]("cid"))
          .foreach { r =>
            val cid = r.getAs[Int]("cid")
            val centSum = cells.filter(_.getAs[Int]("cid") == cid)
              .map(_.getAs[Long]("sm")).sum
            out += ((it, cid, r.getAs[Long]("cnt"), r.getAs[Long]("dsum"), centSum))
          }
        val updated = centroidsOf(cells)
        cents = cents.map { case (cid, old) =>
          cid -> updated.getOrElse(cid, old)
        }
      }
      out.result()
        .toDF("iter", "cid", "n_members", "inertia", "cent_sum")
        .orderBy(col("iter"), col("cid"))
    },
    Some {
      def dkL2(a: String, b: String): String =
        s"""list_reduce([0.0] || list_transform(generate_series(1, len($a)),
           i -> (CAST($a[i] AS DOUBLE) - $b[i]) * (CAST($a[i] AS DOUBLE) - $b[i])),
           (x, y) -> x + y)"""
      def iterCtes(k: Int): String = s"""
      a$k AS (
        SELECT vec_id, embedding, cid, dist FROM (
          SELECT e.vec_id, e.embedding, c.cid,
                 ${dkL2("e.embedding", "c.cv")} AS dist,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dkL2("e.embedding", "c.cv")}, c.cid) AS rn
          FROM embeddings e CROSS JOIN c${k - 1} c)
        WHERE rn = 1),
      cells$k AS (
        SELECT cid, t.dim,
               CAST(sum(CAST(round(CAST(embedding[t.dim] AS DOUBLE) * 1000000, 0)
                 AS BIGINT)) AS BIGINT) AS sm,
               count(*) AS cnt
        FROM a$k CROSS JOIN range(1, 65) t(dim)
        GROUP BY 1, 2),
      s$k AS (
        SELECT cid, count(*) AS n_members,
               CAST(sum(CAST(round(dist * 1000000, 0) AS BIGINT)) AS BIGINT) AS inertia
        FROM a$k GROUP BY 1),
      cs$k AS (
        SELECT cid, CAST(sum(sm) AS BIGINT) AS cent_sum FROM cells$k GROUP BY 1),
      c$k AS (
        SELECT p.cid, COALESCE(u.cv, p.cv) AS cv
        FROM c${k - 1} p LEFT JOIN (
          SELECT cid, list(CAST(sm AS DOUBLE) / cnt / 1000000.0 ORDER BY dim) AS cv
          FROM cells$k GROUP BY 1) u ON p.cid = u.cid)"""
      val rows = (1 to 3).map(k =>
        s"""SELECT $k AS iter, s$k.cid, n_members, inertia, cent_sum
        FROM s$k JOIN cs$k USING (cid)""").mkString("\n        UNION ALL ")
      s"""
      WITH cells0 AS (
        SELECT CAST(vec_id AS INT) AS cid, t.dim,
               CAST(round(CAST(embedding[t.dim] AS DOUBLE) * 1000000, 0) AS BIGINT) AS sm,
               CAST(1 AS BIGINT) AS cnt
        FROM embeddings CROSS JOIN range(1, 65) t(dim)
        WHERE vec_id < 4),
      c0 AS (
        SELECT cid, list(CAST(sm AS DOUBLE) / cnt / 1000000.0 ORDER BY dim) AS cv
        FROM cells0 GROUP BY 1),
      ${(1 to 3).map(iterCtes).mkString(",")}
      SELECT * FROM ($rows)
      ORDER BY iter, cid"""
    })

  /** Multinomial naive-Bayes training + held-out evaluation — the
    * classic trained lang/quality classifier pipeline step (the
    * fastText-style counterpart to llm_quality_classifier's FIXED
    * weights and llm_lang_id's marker heuristic: here the weights are
    * LEARNED from the corpus split). Train = doc_id %% 5 ≠ 0, test =
    * the rest; classes are languages; features are whitespace tokens
    * with add-one smoothing over the train vocabulary. Determinism:
    * each (token, class) log-likelihood ln((cnt+1)/(tot_c+V)) is one
    * libm call on an exact-integer ratio, quantized to integer micros
    * BEFORE any summation — so a document's score is an
    * order-independent BIGINT sum (token order and aggregation order
    * can't move it), and the argmax margin between classes is
    * thousands of micros while a worst-case 1-ulp ln() wobble moves a
    * score by ±1 micro: the decision is branch-safe in practice (and
    * the score itself is gated exactly). Spark shape: two token-level
    * aggregations on (class, token) build the model (map-side
    * combinable); scoring is one shuffle hash join of test tokens
    * against the model on (class, token); the class table, vocab
    * size, and priors broadcast. */
  /** Per-(test-doc, class) naive-Bayes log-score table — the shared
    * scoring core of llm_nb_train (argmax consumer) and
    * llm_label_noise (margin consumer): ONE definition so the model
    * and the audit of its labels cannot drift apart. Columns:
    * doc_id, true_lang, c, score (prior + Σ micro-quantized token
    * log-likelihoods — an order-independent BIGINT per class). */
  private def nbClassScores(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test = docs.filter(col("doc_id") % 5 === 0)
    val trTok = train.select(col("lang").as("c"), explode(col("toks")).as("w"))
    // vocab-sized count table read by tot, vv AND the scoring join:
    // checkpoint so the training-token pass runs once (probed: runtime
    // exchange reuse does not collapse the branches)
    val wc = trTok.groupBy(col("c"), col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val tot = wc.groupBy(col("c")).agg(sum(col("cnt")).as("tot"))
    val vv = wc.select(col("w")).distinct().agg(count(lit(1)).as("v"))
    // |classes|-row doc-count table: priors AND the train total derive
    // from it, replacing two further train scans
    val clsCounts = train.groupBy(col("lang").as("c"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(true)
    val nTr = clsCounts.agg(sum(col("n_docs")).as("n_train"))
    val pri = clsCounts
      .crossJoin(broadcast(nTr))
      .select(col("c"),
        round(log(col("n_docs").cast("double") / col("n_train")) * 1000000, 0)
          .cast("long").as("prior"))
    val clsx = broadcast(pri.join(tot, Seq("c")).crossJoin(vv))
    val teTok = test.select(col("doc_id"), col("lang").as("true_lang"),
      explode(col("toks")).as("w"))
    val lp = round(log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double")
      / (col("tot") + col("v"))) * 1000000, 0).cast("long")
    teTok.crossJoin(clsx)
      .join(wc, Seq("c", "w"), "left_outer")
      .groupBy(col("doc_id"), col("true_lang"), col("c"), col("prior"))
      .agg(sum(lp).as("lpsum"))
      .select(col("doc_id"), col("true_lang"), col("c"),
        (col("prior") + col("lpsum")).as("score"))
      // every consumer (nb_train eval, label_noise best+gold,
      // margin_calibration, uncertainty_sample) reads this table at
      // least once and several read it twice — one materialization of
      // the narrow (doc, class, score) table beats re-running the
      // corpus-token scoring join per branch at any scale
      .localCheckpoint(true)
  }

  /** DuckDB rendering of [[nbClassScores]] — the CTE prefix both NB
    * oracles share verbatim (ends at `sc`: per-(doc, class) scores). */
  private val nbSqlPrefix = """
      WITH docs AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      tr AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
      te AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
      trtok AS (SELECT lang AS c, unnest(toks) AS w FROM tr),
      wc AS (SELECT c, w, count(*) AS cnt FROM trtok GROUP BY 1, 2),
      tot AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS tot FROM wc GROUP BY 1),
      vv AS (SELECT count(DISTINCT w) AS v FROM trtok),
      ntr AS (SELECT count(*) AS n_train FROM tr),
      pri AS (
        SELECT lang AS c,
               CAST(round(ln(CAST(count(*) AS DOUBLE)
                 / (SELECT n_train FROM ntr)) * 1000000, 0) AS BIGINT) AS prior
        FROM tr GROUP BY 1),
      clsx AS (SELECT pri.c, prior, tot, v FROM pri JOIN tot USING (c) CROSS JOIN vv),
      tetok AS (SELECT doc_id, lang AS true_lang, unnest(toks) AS w FROM te),
      sc AS (
        SELECT t.doc_id, t.true_lang, x.c,
               x.prior + CAST(sum(CAST(round(ln(
                   CAST(COALESCE(wc.cnt, 0) + 1 AS DOUBLE) / (x.tot + x.v)
                 ) * 1000000, 0) AS BIGINT)) AS BIGINT) AS score
        FROM tetok t CROSS JOIN clsx x
        LEFT JOIN wc ON wc.c = x.c AND wc.w = t.w
        GROUP BY t.doc_id, t.true_lang, x.c, x.prior)"""

  private val nbTrain = QueryDef(
    "llm_nb_train",
    (s, d) => {
      nbClassScores(s, d)
        .select(col("doc_id"), col("true_lang"),
          struct(col("score"), col("c")).as("sc"))
        .groupBy(col("doc_id"), col("true_lang"))
        .agg(max(col("sc")).as("m")) // argmax: (score, class) lexicographic
        .select(col("doc_id"), col("true_lang"), col("m.c").as("pred_lang"),
          col("m.score").as("score"))
        .orderBy(col("doc_id"))
    },
    Some(s"""$nbSqlPrefix,
      best AS (
        SELECT doc_id, true_lang, c, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, c DESC) AS rk
        FROM sc)
      SELECT doc_id, true_lang, c AS pred_lang, score
      FROM best WHERE rk = 1
      ORDER BY doc_id"""))

  /** Confident-learning label-noise detection (the Cleanlab shape):
    * a held-out doc whose LEARNED-model argmax disagrees with its
    * gold label by a wide margin is a probable labeling error — the
    * audit run before anyone trains on "gold" data. Consumes
    * [[nbClassScores]] (the SAME per-(doc, class) score table
    * llm_nb_train argmaxes — one scoring definition, no drift);
    * margin = best score − gold-class score in integer micros, both
    * order-independent BIGINTs, so the ≥ 1000-micro confidence
    * threshold is an exact integer predicate (no float branch). Docs
    * whose gold class never appears in training are EXCLUDED by the
    * inner join — they are out-of-distribution, a different queue
    * than mislabeled. Scale shape: two aggregations of the same
    * score table (argmax struct-max + a gold-row filter), one equi
    * join on doc_id. */
  private val labelNoise = QueryDef(
    "llm_label_noise",
    (s, d) => {
      val scores = nbClassScores(s, d)
      val best = scores
        .select(col("doc_id"), col("true_lang"),
          struct(col("score"), col("c")).as("sc"))
        .groupBy(col("doc_id"), col("true_lang"))
        .agg(max(col("sc")).as("m"))
      val gold = scores.filter(col("c") === col("true_lang"))
        .select(col("doc_id"), col("score").as("gold_score"))
      best.join(gold, Seq("doc_id"))
        .filter(col("m.c") =!= col("true_lang") &&
          col("m.score") - col("gold_score") >= 1000L)
        .select(col("doc_id"), col("true_lang"),
          col("m.c").as("pred_lang"),
          (col("m.score") - col("gold_score")).as("margin_micros"))
        .orderBy(col("margin_micros").desc, col("doc_id"))
    },
    Some(s"""$nbSqlPrefix,
      best AS (
        SELECT doc_id, true_lang, c, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, c DESC) AS rk
        FROM sc),
      top AS (SELECT doc_id, true_lang, c AS pred_lang, score FROM best
              WHERE rk = 1),
      gold AS (SELECT doc_id, score AS gold_score FROM sc
               WHERE c = true_lang)
      SELECT t.doc_id, t.true_lang, t.pred_lang,
             t.score - g.gold_score AS margin_micros
      FROM top t JOIN gold g ON g.doc_id = t.doc_id
      WHERE t.pred_lang <> t.true_lang AND t.score - g.gold_score >= 1000
      ORDER BY margin_micros DESC, t.doc_id"""))

  /** GRPO-style group-relative advantage — the RLHF/GRPO batch step
    * downstream of llm_preference_pairs: within each (lang, source)
    * "prompt group" every document is a scored rollout, and its
    * advantage is (reward − group mean) / group std. Rewards reuse
    * the preference-pair EXACT-integer quality score (the SHARED
    * SharedExprs snippet — one definition, two operators, no drift),
    * so the group moments are order-independent integer sums; mean
    * and population variance are then fixed-order IEEE arithmetic on
    * those exact integers (bit-identical cross-engine). The sum of
    * squares accumulates in 128 bits (Spark decimal(38,0), DuckDB
    * HUGEINT) — a reward² is ~2³⁴, so a BIGINT Σr² would wrap at
    * ~2²⁹ ≈ 5·10⁸ docs per group, a size a 100 TB corpus reaches —
    * and the degenerate-group guard is the EXACT integer predicate
    * min < max (never a float variance-vs-zero test). Spark shape: one
    * map-side-combinable aggregation to group moments (count + two
    * sums + min/max), moments broadcast back over a second narrow
    * corpus pass — no window sort of the corpus, one shuffle at
    * (lang, source) granularity. */
  private val grpoAdvantage = QueryDef(
    "llm_grpo_advantage",
    (s, d) => {
      val score = expr(SharedExprs.qualityScoreSpark)
      val scored = documents(s, d).select(col("lang"), col("source"),
        col("doc_id"), score.cast("long").as("reward"))
      val stats = scored.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("reward")).as("sr"),
          sum(col("reward").cast("decimal(19,0)") * col("reward")).as("srq"),
          min(col("reward")).as("mn"), max(col("reward")).as("mx"))
        .filter(col("n") >= 2 && col("mn") < col("mx"))
      val mean = col("sr").cast("double") / col("n")
      val varPop = SharedExprs.hugeToDouble(col("srq")) / col("n") - mean * mean
      scored.join(broadcast(stats), Seq("lang", "source"))
        .select(col("lang"), col("source"), col("doc_id"), col("reward"),
          (round((col("reward").cast("double") - mean) / sqrt(varPop), 4)
            + lit(0.0)).as("advantage"))
        .orderBy(col("lang"), col("source"), col("doc_id"))
    },
    Some(s"""
      WITH scored AS (
        SELECT lang, source, doc_id,
               ${SharedExprs.qualityScoreDuck} AS reward
        FROM documents),
      st AS (
        SELECT lang, source, count(*) AS n,
               CAST(sum(reward) AS BIGINT) AS sr,
               sum(CAST(reward AS HUGEINT) * reward) AS srq,
               min(reward) AS mn, max(reward) AS mx
        FROM scored GROUP BY 1, 2),
      g AS (SELECT * FROM st WHERE n >= 2 AND mn < mx)
      SELECT s.lang, s.source, s.doc_id, CAST(s.reward AS BIGINT) AS reward,
             round((CAST(s.reward AS DOUBLE) - CAST(sr AS DOUBLE) / n)
               / sqrt(${SharedExprs.hugeToDoubleDuck("srq")} / n
                      - (CAST(sr AS DOUBLE) / n) * (CAST(sr AS DOUBLE) / n)),
               4) + 0.0 AS advantage
      FROM scored s JOIN g USING (lang, source)
      ORDER BY s.lang, s.source, s.doc_id"""))

  /** Gradient-boosting training, 2 rounds of depth-1 trees on squared
    * loss with shrinkage ν = 0.5 — the boosting LOOP llm_stump_train
    * deliberately stops short of: each round re-fits a stump to the
    * current residuals and folds its shrunken leaf predictions into
    * the model, which is what XGBoost/LightGBM actually iterate.
    * Determinism by construction, assembled from the suite's proven
    * pieces: residuals quantize to integer micros BEFORE summing
    * (order-independent BIGINT histogram sums — the logreg gradient
    * discipline), split scores are SL²/nL + SR²/nR as fixed-order
    * IEEE ops on exact integers (the stump scoring discipline, so
    * argmax needs no rounding), leaf values are two divisions of
    * exact integers, ν = 0.5 is binary-exact, and the reported MSE
    * accumulates Σrmic² in 128 bits (Spark decimal / DuckDB HUGEINT —
    * the llm_grpo_advantage overflow lesson). Spark shape, per round:
    * ONE corpus pass builds the 4-feature residual histogram
    * (map-side combined to histogram size), split search runs window
    * cumsums over that aggregate-sized table, the driver collects one
    * best-split row + one ssq scalar and extends the model
    * expression — at 100 TB each round costs one scan, like every
    * trainer here. The oracle replays both rounds as chained CTEs
    * carrying the model value per row. */
  private val gbdtTrain = QueryDef(
    "llm_gbdt_train",
    (s, d) => {
      import s.implicits._
      val nu = 0.5 // binary-exact shrinkage
      val base = documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("nt", size(col("toks")))
        .select(
          when(col("lang") === "en", 1L).otherwise(0L).as("y"),
          (col("nt") / 8).cast("long").as("b1"),
          (col("n_chars") / 64).cast("long").as("b2"),
          expr("(10 * length(replace(text, ' ', ''))) div nt").as("b3"),
          expr("aggregate(toks, 0L, (m, w) -> greatest(m, length(w))) div 2")
            .as("b4"))
        .localCheckpoint() // 2 residual passes reread the same rows
      val h0 = base.agg(count(lit(1)).as("n"), sum(col("y")).as("n1")).collect()(0)
      val n = h0.getLong(0)
      var fCol: Column = lit(h0.getLong(1).toDouble / n) // F0 = mean(y)
      val out = Seq.newBuilder[(Int, Int, Long, Long, Long, Long, Long,
        Double, Double, Double)]
      for (m <- 1 to 2) {
        val rmic = round((col("y").cast("double") - fCol) * 1000000, 0).cast("long")
        val hist = base.withColumn("rmic", rmic)
          .select(col("rmic"), explode(array(
            struct(lit(1).as("feature"), col("b1").as("bucket")),
            struct(lit(2).as("feature"), col("b2").as("bucket")),
            struct(lit(3).as("feature"), col("b3").as("bucket")),
            struct(lit(4).as("feature"), col("b4").as("bucket")))).as("fb"))
          .select(col("fb.feature"), col("fb.bucket"), col("rmic"))
          .groupBy(col("feature"), col("bucket"))
          .agg(count(lit(1)).as("cn"), sum(col("rmic")).as("sm"),
            sum(col("rmic").cast("decimal(19,0)") * col("rmic")).as("ssq"))
          .localCheckpoint() // aggregate-sized; feeds two driver actions
        val wCum = Window.partitionBy(col("feature")).orderBy(col("bucket"))
        val wTot = Window.partitionBy(col("feature"))
        val best = hist
          .withColumn("nl", sum(col("cn")).over(wCum))
          .withColumn("sl", sum(col("sm")).over(wCum))
          .withColumn("ntA", sum(col("cn")).over(wTot))
          .withColumn("st", sum(col("sm")).over(wTot))
          .withColumn("nr", col("ntA") - col("nl"))
          .withColumn("sr", col("st") - col("sl"))
          .filter(col("nr") > 0) // both children non-empty
          .withColumn("score",
            col("sl").cast("double") * col("sl").cast("double") / col("nl") +
              col("sr").cast("double") * col("sr").cast("double") / col("nr"))
          .orderBy(col("score").desc, col("feature"), col("bucket"))
          .select(col("feature"), col("bucket"), col("nl"), col("nr"),
            col("sl"), col("sr"))
          .limit(1).collect()(0)
        val ssqT = hist.filter(col("feature") === 1)
          .agg(sum(col("ssq"))).collect()(0).getDecimal(0)
        val mse = ssqT.doubleValue() / n / 1.0e12 // micros² → raw units
        val (bf, thr) = (best.getInt(0), best.getLong(1))
        val (nl, nr, sl, sr) = (best.getLong(2), best.getLong(3),
          best.getLong(4), best.getLong(5))
        val wl = sl.toDouble / nl / 1000000.0
        val wr = sr.toDouble / nr / 1000000.0
        out += ((m, bf, thr, nl, nr, sl, sr, wl, wr, mse))
        fCol = fCol + when(col(s"b$bf") <= thr, lit(wl * nu)).otherwise(lit(wr * nu))
      }
      out.result()
        .toDF("iter", "feature", "threshold", "nl", "nr", "sl", "sr",
          "wl", "wr", "mse_before")
        .select(col("iter"), col("feature"), col("threshold"), col("nl"),
          col("nr"), col("sl"), col("sr"),
          (round(col("wl"), 6) + lit(0.0)).as("wl"),
          (round(col("wr"), 6) + lit(0.0)).as("wr"),
          (round(col("mse_before"), 6) + lit(0.0)).as("mse_before"))
        .orderBy(col("iter"))
    },
    Some {
      def roundCtes(k: Int): String = s"""
      r$k AS (SELECT *, CAST(round((y - fv) * 1000000, 0) AS BIGINT) AS rmic
              FROM rows$k),
      h$k AS (
        SELECT feature, bucket, count(*) AS cn, CAST(sum(rmic) AS BIGINT) AS sm,
               sum(CAST(rmic AS HUGEINT) * rmic) AS ssq
        FROM (SELECT 1 AS feature, b1 AS bucket, rmic FROM r$k
              UNION ALL SELECT 2, b2, rmic FROM r$k
              UNION ALL SELECT 3, b3, rmic FROM r$k
              UNION ALL SELECT 4, b4, rmic FROM r$k)
        GROUP BY 1, 2),
      sc$k AS (
        SELECT feature, bucket,
               sum(cn) OVER wc AS nl, CAST(sum(sm) OVER wc AS BIGINT) AS sl,
               sum(cn) OVER wt AS ntA, CAST(sum(sm) OVER wt AS BIGINT) AS st
        FROM h$k
        WINDOW wc AS (PARTITION BY feature ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wt AS (PARTITION BY feature)),
      bx$k AS (
        SELECT feature, bucket, CAST(nl AS BIGINT) AS nl,
               CAST(ntA - nl AS BIGINT) AS nr, sl, st - sl AS sr,
               row_number() OVER (ORDER BY
                 CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl
                   + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
                     / (ntA - nl) DESC,
                 feature, bucket) AS rk
        FROM sc$k WHERE ntA - nl > 0),
      best$k AS (
        SELECT feature, bucket AS thr, nl, nr, sl, sr,
               CAST(sl AS DOUBLE) / nl / 1000000.0 AS wl,
               CAST(sr AS DOUBLE) / nr / 1000000.0 AS wr
        FROM bx$k WHERE rk = 1),
      m$k AS (SELECT CAST(sum(ssq) AS DOUBLE) AS ssqd FROM h$k WHERE feature = 1),
      rows${k + 1} AS (
        SELECT y, b1, b2, b3, b4,
               fv + 0.5 * (CASE WHEN (CASE b.feature WHEN 1 THEN b1
                 WHEN 2 THEN b2 WHEN 3 THEN b3 ELSE b4 END) <= b.thr
                 THEN b.wl ELSE b.wr END) AS fv
        FROM r$k CROSS JOIN best$k b)"""
      val rows = (1 to 2).map(k =>
        s"""SELECT $k AS iter, feature, thr AS threshold, nl, nr, sl, sr,
               round(wl, 6) + 0.0 AS wl, round(wr, 6) + 0.0 AS wr,
               round(m$k.ssqd / f0.n / 1000000000000.0, 6) + 0.0 AS mse_before
        FROM best$k CROSS JOIN m$k CROSS JOIN f0""").mkString("\n        UNION ALL ")
      s"""
      WITH f AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               len(string_split(text, ' ')) // 8 AS b1,
               n_chars // 64 AS b2,
               (10 * length(replace(text, ' ', '')))
                 // len(string_split(text, ' ')) AS b3,
               list_max(list_transform(string_split(text, ' '),
                 w -> length(w))) // 2 AS b4
        FROM documents),
      f0 AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS fv0,
                    count(*) AS n FROM f),
      rows1 AS (SELECT f.*, f0.fv0 AS fv FROM f CROSS JOIN f0),
      ${(1 to 2).map(roundCtes).mkString(",")}
      SELECT * FROM ($rows)
      ORDER BY iter"""
    })

  /** Margin-calibration audit of the learned classifier — the
    * reliability-diagram question ("when the model is confident, is
    * it right?") asked in a determinism-safe way: libm softmax would
    * make probabilities engine-dependent, so confidence is the EXACT
    * integer top-1 − top-2 score margin (micros), binned at 2000
    * micros (capped at bin 9), with per-bin accuracy from exact
    * counts. A well-calibrated model shows accuracy rising with the
    * margin bin; a flat curve means the margins are noise. Third
    * consumer of [[nbClassScores]] — per doc the class list is
    * collected (|classes| ≤ langs, bounded) and sorted desc by
    * (score, class), the same total order as the oracle's
    * row_number. Scale: one aggregation to per-doc top-2, one to the
    * 10-bin table. */
  private val marginCalibration = QueryDef(
    "llm_margin_calibration",
    (s, d) => {
      val perDoc = nbClassScores(s, d)
        .groupBy(col("doc_id"), col("true_lang"))
        .agg(reverse(array_sort(collect_list(struct(col("score"), col("c")))))
          .as("arr"))
        .filter(size(col("arr")) >= 2)
        .select(col("true_lang"), col("arr").getItem(0).getField("c").as("pred"),
          (col("arr").getItem(0).getField("score") -
            col("arr").getItem(1).getField("score")).as("margin"))
      perDoc
        .groupBy(least(expr("margin div 2000"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"),
          sum((col("pred") === col("true_lang")).cast("long")).as("hits"),
          sum(col("margin")).as("sm"))
        .select(col("bin"), col("n"), col("hits"),
          (round(col("hits").cast("double") / col("n"), 4) + lit(0.0)).as("acc"),
          expr("sm div n").as("avg_margin_micros"))
        .orderBy(col("bin"))
    },
    Some(s"""$nbSqlPrefix,
      rk AS (
        SELECT doc_id, true_lang, c, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, c DESC) AS rk
        FROM sc),
      top2 AS (
        SELECT a.doc_id, a.true_lang, a.c AS pred,
               a.score - b.score AS margin
        FROM rk a JOIN rk b ON b.doc_id = a.doc_id
        WHERE a.rk = 1 AND b.rk = 2),
      binned AS (
        SELECT least(margin // 2000, 9) AS bin, true_lang, pred, margin
        FROM top2)
      SELECT bin, count(*) AS n,
             count(CASE WHEN pred = true_lang THEN 1 END) AS hits,
             round(CAST(count(CASE WHEN pred = true_lang THEN 1 END) AS DOUBLE)
               / count(*), 4) + 0.0 AS acc,
             CAST(sum(margin) AS BIGINT) // count(*) AS avg_margin_micros
      FROM binned
      GROUP BY bin
      ORDER BY bin"""))

  /** One EM iteration of PLSA topic modeling (K = 3) — the
    * unsupervised corpus-structure trainer next to the supervised
    * family: deterministic hash init (a(d,z), b(w,z) ∈ [1,100] —
    * asymmetric, so EM breaks symmetry), E-step responsibilities,
    * M-step word-topic masses, top-5 words per topic. The EM
    * division is where float PLSA diverges across engines, so it is
    * engineered EXACT: r(z) ∝ p(w|z)p(z|d) = [b_z/D_z]·[a_z/A_d],
    * and A_d cancels in the normalization while multiplying through
    * by ΠD makes each term t_z = a_z·b_z·(ΠD/D_z) an exact BIGINT
    * (ΠD/D_z is exact — D_z divides ΠD); r_z = t_z·10⁶ div Σt is
    * then one integer division, with t_z·10⁶ computed in
    * decimal(38,0)/HUGEINT (the llm_grpo_advantage pattern — int64
    * holds t itself but not the micro-scaling past V ≈ 300, which
    * the ×20 scale replica actually hit; the widening holds to
    * V ≈ 4·10⁴ where ΠD itself would need the same treatment).
    * M-step masses are Σ cnt·r — order-
    * independent BIGINT sums. Spark shape: one (doc, word) count
    * shuffle, the vocab×3 factor table pivots to per-word columns
    * and broadcasts, the E-step is a NARROW map (three integer
    * expressions per row), the M-step map-side combines to vocab×3
    * cells, and the top-5 window runs on that constant-bounded
    * table. The ΠD scalar rides a 1-row broadcast cross join (the
    * llm_lm_score shape). */
  private val plsaEm = QueryDef(
    "llm_plsa_em",
    (s, d) => {
      val cnts = documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      val bz = cnts.select(col("w")).distinct()
        .select(col("w"), explode(sequence(lit(1), lit(3))).as("z"))
        .withColumn("b",
          hash60(concat(col("w"), lit(":pw"), col("z").cast("string"))) % 100 + 1)
      val dz = bz.groupBy(col("z")).agg(sum(col("b")).as("dsum"))
      val dp = dz.agg(
        (max(when(col("z") === 1, col("dsum"))) *
          max(when(col("z") === 2, col("dsum"))) *
          max(when(col("z") === 3, col("dsum")))).as("dp"))
      val fw = bz.join(broadcast(dz), Seq("z"))
        .crossJoin(broadcast(dp))
        .withColumn("f", col("b") * expr("dp div dsum"))
      val fp = fw.groupBy(col("w")).agg(
        max(when(col("z") === 1, col("f"))).as("f1"),
        max(when(col("z") === 2, col("f"))).as("f2"),
        max(when(col("z") === 3, col("f"))).as("f3"))
      def a(z: Int) =
        hash60(concat(col("doc_id").cast("string"), lit(s":pd$z"))) % 100 + 1
      val e = cnts.join(broadcast(fp), Seq("w"))
        .withColumn("t1", a(1) * col("f1"))
        .withColumn("t2", a(2) * col("f2"))
        .withColumn("t3", a(3) * col("f3"))
        .withColumn("ts", col("t1") + col("t2") + col("t3"))
      // t·10⁶ through decimal(38,0)/HUGEINT: t ≤ 10¹³ fits int64 but
      // the micro-scaling does not once vocab > ~300 (the x20 scale
      // replica hit exactly this wall — ARITHMETIC_OVERFLOW). The
      // widening holds to V ≈ 4·10⁴, where dp = ΠD itself outgrows
      // int64 and would need the same treatment. r ≤ 10⁶ casts back.
      def rMicro(t: String) =
        expr(s"CAST(CAST($t AS DECIMAL(38,0)) * 1000000 div ts AS BIGINT)")
      val rz = e.select(col("w"), col("cnt"),
        explode(array(
          struct(lit(1).as("z"), rMicro("t1").as("r")),
          struct(lit(2).as("z"), rMicro("t2").as("r")),
          struct(lit(3).as("z"), rMicro("t3").as("r")))).as("x"))
        .select(col("w"), col("cnt"), col("x.z").as("topic"), col("x.r").as("r"))
      val nwz = rz.groupBy(col("topic"), col("w"))
        .agg(sum(col("cnt") * col("r")).as("weight"))
      nwz
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("topic"))
            .orderBy(col("weight").desc, col("w"))))
        .filter(col("rnk") <= 5)
        .select(col("topic"), col("rnk"), col("w"), col("weight"))
        .orderBy(col("topic"), col("rnk"))
    },
    Some("""
      WITH cnts AS (
        SELECT doc_id, tok AS w, count(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY 1, 2),
      topics AS (SELECT unnest(generate_series(1, 3)) AS z),
      bz AS (
        SELECT w, z,
               ('0x' || substr(md5(w || ':pw' || z), 1, 15))::BIGINT % 100 + 1
                 AS b
        FROM (SELECT DISTINCT w FROM cnts) CROSS JOIN topics),
      dz AS (SELECT z, CAST(sum(b) AS BIGINT) AS dsum FROM bz GROUP BY 1),
      dp AS (
        SELECT (SELECT dsum FROM dz WHERE z = 1)
             * (SELECT dsum FROM dz WHERE z = 2)
             * (SELECT dsum FROM dz WHERE z = 3) AS dp),
      fp AS (
        SELECT w,
               max(CASE WHEN z = 1 THEN f END) AS f1,
               max(CASE WHEN z = 2 THEN f END) AS f2,
               max(CASE WHEN z = 3 THEN f END) AS f3
        FROM (SELECT b.w, b.z, b.b * (dp.dp // d.dsum) AS f
              FROM bz b JOIN dz d USING (z) CROSS JOIN dp)
        GROUP BY 1),
      e AS (
        SELECT c.doc_id, c.w, c.cnt,
               (('0x' || substr(md5(CAST(c.doc_id AS VARCHAR) || ':pd1'),
                 1, 15))::BIGINT % 100 + 1) * f1 AS t1,
               (('0x' || substr(md5(CAST(c.doc_id AS VARCHAR) || ':pd2'),
                 1, 15))::BIGINT % 100 + 1) * f2 AS t2,
               (('0x' || substr(md5(CAST(c.doc_id AS VARCHAR) || ':pd3'),
                 1, 15))::BIGINT % 100 + 1) * f3 AS t3
        FROM cnts c JOIN fp USING (w)),
      rz AS (
        SELECT w, cnt, 1 AS topic,
               CAST(CAST(t1 AS HUGEINT) * 1000000 // (t1 + t2 + t3) AS BIGINT) AS r
        FROM e
        UNION ALL
        SELECT w, cnt, 2,
               CAST(CAST(t2 AS HUGEINT) * 1000000 // (t1 + t2 + t3) AS BIGINT)
        FROM e
        UNION ALL
        SELECT w, cnt, 3,
               CAST(CAST(t3 AS HUGEINT) * 1000000 // (t1 + t2 + t3) AS BIGINT)
        FROM e),
      nwz AS (
        SELECT topic, w, CAST(sum(cnt * r) AS BIGINT) AS weight
        FROM rz GROUP BY 1, 2),
      top AS (
        SELECT topic, w, weight,
               row_number() OVER (PARTITION BY topic
                 ORDER BY weight DESC, w) AS rnk
        FROM nwz)
      SELECT topic, CAST(rnk AS INTEGER) AS rnk, w, weight
      FROM top WHERE rnk <= 5
      ORDER BY topic, rnk"""))

  /** Bradley–Terry strength fitting (Hunter 2004 MM iterations) —
    * the reward-model step that turns pairwise preference outcomes
    * into per-source strengths (RLHF reward modeling's statistical
    * core, and the model behind chat-arena leaderboards). Pairwise
    * outcomes are built deterministically: within each (lang,
    * n_chars-div-100) cohort, the quality-score champion's source
    * beats every other source present — |sources|-bounded matches
    * per cohort, never doc-pairs. The MM update
    * s_i' = W_i / Σ_j n_ij/(s_i+s_j) is run 3 rounds ENTIRELY in
    * scaled integers: strengths live in micros, each denominator
    * term is n_ij·10¹² div (s_i+s_j) (exact BIGINT, magnitudes
    * proven < 2⁶³ given the ≤10⁶ normalized strength invariant),
    * wins are Laplace-smoothed (+1) so strengths stay positive, and
    * each round renormalizes by the max with a floor of 1 — zero
    * IEEE ops anywhere, so Spark `div` ≡ DuckDB `//` bit-exactly.
    * Scale shape: one corpus pass scores docs; cohort champions are
    * one map-side-combinable max(struct); every MM table (games,
    * strengths) is |sources|²-bounded — aggregate-sized joins, the
    * corpus is never touched again. */
  private val bradleyTerry = QueryDef(
    "llm_bradley_terry",
    (s, d) => {
      val score = expr(SharedExprs.qualityScoreSpark)
      val scored = documents(s, d)
        .select(col("lang"), col("source"), col("doc_id"),
          score.cast("long").as("score"), expr("n_chars div 100").as("bin"))
      val champ = scored.groupBy(col("lang"), col("bin"))
        .agg(max(struct(col("score"), col("doc_id"), col("source"))).as("c"))
        .select(col("lang"), col("bin"), col("c.source").as("winner"))
      val members = scored.select(col("lang"), col("bin"), col("source")).distinct()
      val wins = members.join(champ, Seq("lang", "bin"))
        .filter(col("source") =!= col("winner"))
        .groupBy(col("winner"), col("source").as("loser"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val games = wins.select(col("winner").as("i"), col("loser").as("j"), col("n"))
        .union(wins.select(col("loser").as("i"), col("winner").as("j"), col("n")))
        .groupBy(col("i"), col("j")).agg(sum(col("n")).as("n"))
      val winTot = games.select(col("i")).distinct()
        .join(wins.groupBy(col("winner").as("i"))
          .agg(sum(col("n")).as("w0")), Seq("i"), "left_outer")
        .select(col("i"), coalesce(col("w0"), lit(0L)).as("wins"),
          (coalesce(col("w0"), lit(0L)) + 1L).as("w"))
        .localCheckpoint(true)
      val gamesTot = games.groupBy(col("i")).agg(sum(col("n")).as("games_played"))
      var str = winTot.select(col("i").as("source"), lit(1000000L).as("s"))
      for (_ <- 1 to 3) {
        val den = games
          .join(str.select(col("source").as("i"), col("s").as("si")), Seq("i"))
          .join(str.select(col("source").as("j"), col("s").as("sj")), Seq("j"))
          .groupBy(col("i"))
          .agg(sum(expr("n * 1000000000000L div (si + sj)")).as("den"))
        val sRaw = winTot.join(den, Seq("i"))
          .select(col("i").as("source"), expr("w * 1000000000000L div den").as("sr"))
        val sMax = sRaw.agg(max(col("sr")).as("m"))
        str = sRaw.crossJoin(broadcast(sMax))
          .select(col("source"), greatest(expr("sr * 1000000L div m"), lit(1L)).as("s"))
          .localCheckpoint(true)
      }
      str.join(winTot.select(col("i").as("source"), col("wins")), Seq("source"))
        .join(gamesTot.select(col("i").as("source"), col("games_played")), Seq("source"))
        .select(col("source"), col("wins"), col("games_played"),
          col("s").as("strength_micro"))
        .orderBy(col("strength_micro").desc, col("source"))
    },
    Some {
      val iter = (1 to 3).map { k =>
        s"""den$k AS (
        SELECT g.i, sum((g.n * 1000000000000) // (si.s + sj.s)) AS den
        FROM games g
        JOIN s${k - 1} si ON si.source = g.i
        JOIN s${k - 1} sj ON sj.source = g.j
        GROUP BY g.i),
      sraw$k AS MATERIALIZED (
        -- MATERIALIZED: read twice (projection + max subquery), and
        -- each round reads the previous one twice (si, sj) — pinning
        -- stops DuckDB re-inlining the corpus pipeline 2^k times
        SELECT w.i AS source, (w.w * 1000000000000) // t.den AS sr
        FROM wintot w JOIN den$k t ON t.i = w.i),
      s$k AS MATERIALIZED (
        SELECT source, greatest((sr * 1000000) // (SELECT max(sr) FROM sraw$k), 1) AS s
        FROM sraw$k)"""
      }.mkString(",\n      ")
      s"""
      WITH scored AS (
        SELECT lang, source, doc_id,
               ${SharedExprs.qualityScoreDuck} AS score,
               n_chars // 100 AS bin
        FROM documents),
      champ AS (
        SELECT lang, bin, source AS winner FROM (
          SELECT lang, bin, source,
                 row_number() OVER (PARTITION BY lang, bin
                   ORDER BY score DESC, doc_id DESC) AS rk
          FROM scored) WHERE rk = 1),
      members AS (SELECT DISTINCT lang, bin, source FROM scored),
      wins AS (
        SELECT c.winner, m.source AS loser, count(*) AS n
        FROM members m JOIN champ c USING (lang, bin)
        WHERE m.source <> c.winner
        GROUP BY c.winner, m.source),
      games AS (
        SELECT i, j, CAST(sum(n) AS BIGINT) AS n FROM (
          SELECT winner AS i, loser AS j, n FROM wins
          UNION ALL SELECT loser AS i, winner AS j, n FROM wins)
        GROUP BY i, j),
      wintot AS (
        SELECT p.i, CAST(coalesce(w.w0, 0) AS BIGINT) AS wins,
               CAST(coalesce(w.w0, 0) + 1 AS BIGINT) AS w
        FROM (SELECT DISTINCT i FROM games) p
        LEFT JOIN (SELECT winner AS i, sum(n) AS w0 FROM wins GROUP BY winner) w
          USING (i)),
      gamestot AS (
        SELECT i, CAST(sum(n) AS BIGINT) AS games_played FROM games GROUP BY i),
      s0 AS (SELECT i AS source, 1000000 AS s FROM wintot),
      $iter
      SELECT s.source, w.wins, g.games_played, CAST(s.s AS BIGINT) AS strength_micro
      FROM s3 s
      JOIN wintot w ON w.i = s.source
      JOIN gamestot g ON g.i = s.source
      ORDER BY strength_micro DESC, s.source"""
    })

  /** Greedy k-Center coreset selection (Sener & Savarese 2018) — the
    * data-pruning step BEYOND near-dup removal: pick the 8 vectors
    * that best COVER the embedding space (each round adds the point
    * farthest from the current set, the classic 2-approximation of
    * the k-center objective), with the final covering radius as the
    * quality receipt. SemDeDup removes redundancy; this selects for
    * coverage — the two ends of the coreset literature. Determinism:
    * distances ride the strict-fold L2Sq kernel (bit-identical across
    * engines — kmeans/IVF precedent), the per-round argmax orders on
    * (raw min-distance DESC, vec_id) — a total order — and each round
    * collects exactly ONE driver row (the Ivf.train k-row-collect
    * discipline; 8 rounds, 8 rows). Scale shape: every round is one
    * corpus scan × the ≤8-row broadcast selected set folded to a
    * per-vector min, then a 1-row TakeOrdered — no window over the
    * cross product, no corpus self-join; the checkpointed source is
    * scanned 9× total (8 rounds + the radius audit), the price of an
    * inherently sequential greedy loop. */
  private val coresetKcenter = QueryDef(
    "llm_coreset_kcenter",
    (s, d) => {
      import s.implicits._
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
        .localCheckpoint(true)
      def selDf(sel: Seq[Long]) = broadcast(
        e.filter(col("vec_id").isin(sel: _*))
          .select(col("vec_id").as("sid"), col("embedding").as("sv")))
      var sel = Seq(0L)
      val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]()
      picked += ((1, 0L, 0.0))
      for (r <- 2 to 8) {
        val row = e.filter(!col("vec_id").isin(sel: _*))
          .crossJoin(selDf(sel))
          .withColumn("dsq", l2sq(col("embedding"), col("sv")))
          .groupBy(col("vec_id")).agg(min(col("dsq")).as("mind"))
          .orderBy(col("mind").desc, col("vec_id")).limit(1)
          .head() // ONE bounded driver row per greedy round
        picked += ((r, row.getLong(0), row.getDouble(1)))
        sel = sel :+ row.getLong(0)
      }
      val radius = e.crossJoin(selDf(sel))
        .withColumn("dsq", l2sq(col("embedding"), col("sv")))
        .groupBy(col("vec_id")).agg(min(col("dsq")).as("mind"))
        .agg(max(col("mind")).as("rad")).head().getDouble(0)
      picked.toSeq.toDF("sel_order", "vec_id", "dsq")
        .select(col("sel_order"), col("vec_id"),
          (round(col("dsq"), 4) + lit(0.0)).as("dist_sq"),
          (round(lit(radius), 4) + lit(0.0)).as("final_radius_sq"))
        .orderBy(col("sel_order"))
    },
    Some {
      def dkL2(a: String, b: String): String =
        s"""list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(generate_series(1, len($a)),
           i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))),
           (x, y) -> x + y)"""
      def step(r: Int): String = s"""
      m$r AS (
        SELECT c.vec_id, min(${dkL2("c.embedding", "s.embedding")}) AS mind
        FROM e c CROSS JOIN (
          SELECT e2.embedding FROM e e2
          JOIN sel${r - 1} t ON t.vec_id = e2.vec_id) s
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
        GROUP BY 1),
      p$r AS (SELECT vec_id, mind FROM m$r ORDER BY mind DESC, vec_id LIMIT 1),
      sel$r AS (SELECT vec_id FROM sel${r - 1}
                UNION ALL SELECT vec_id FROM p$r)"""
      val rows = (2 to 8).map(r =>
        s"SELECT $r AS sel_order, vec_id, mind AS dsq FROM p$r")
        .mkString("\n        UNION ALL ")
      s"""
      WITH e AS (SELECT vec_id, embedding FROM embeddings),
      sel1 AS (SELECT CAST(0 AS BIGINT) AS vec_id),
      ${(2 to 8).map(step).mkString(",")},
      rad AS (
        SELECT max(mind) AS rad FROM (
          SELECT c.vec_id, min(${dkL2("c.embedding", "s.embedding")}) AS mind
          FROM e c CROSS JOIN (
            SELECT e2.embedding FROM e e2
            JOIN sel8 t ON t.vec_id = e2.vec_id) s
          GROUP BY 1))
      SELECT sel_order, vec_id,
             round(dsq, 4) + 0.0 AS dist_sq,
             round(rad, 4) + 0.0 AS final_radius_sq
      FROM (SELECT 1 AS sel_order, CAST(0 AS BIGINT) AS vec_id,
                   CAST(0.0 AS DOUBLE) AS dsq
            UNION ALL $rows)
      CROSS JOIN rad
      ORDER BY sel_order"""
    })

  /** Uncertainty sampling (active learning) — the annotation-triage
    * step after training: rank held-out docs by the naive-Bayes
    * top-1 − top-2 margin and surface the 20 MOST UNCERTAIN as the
    * next labeling batch (the margin-based query strategy; the
    * smallest-margin docs are where a label buys the most model).
    * Fourth consumer of [[nbClassScores]] — train, audit, calibrate,
    * and now SELECT all score through the one definition, so the
    * annotation queue cannot drift from the model it serves. The
    * margin is a difference of order-independent BIGINT micro scores
    * (llm_margin_calibration's exact-integer confidence), so the
    * bottom-20 cut is a TakeOrdered on exact ints with a doc_id
    * tiebreak — no float compare anywhere. Shape: the |langs|-bounded
    * per-doc window + one k-bounded TakeOrdered. */
  private val uncertaintySample = QueryDef(
    "llm_uncertainty_sample",
    (s, d) => {
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("c").desc)
      nbClassScores(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .groupBy(col("doc_id"), col("true_lang"))
        .agg(max(when(col("rk") === 1, struct(col("score"), col("c")))).as("t1"),
          max(when(col("rk") === 2, col("score"))).as("s2"))
        .select(col("doc_id"), col("true_lang"), col("t1.c").as("pred_lang"),
          (col("t1.score") - col("s2")).as("margin_micro"))
        .orderBy(col("margin_micro").asc, col("doc_id")).limit(20)
        .orderBy(col("margin_micro").asc, col("doc_id"))
    },
    Some(s"""$nbSqlPrefix,
      rk AS (
        SELECT doc_id, true_lang, c, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, c DESC) AS rk
        FROM sc),
      agg AS (
        SELECT doc_id, true_lang,
               max(CASE WHEN rk = 1 THEN c END) AS pred_lang,
               max(CASE WHEN rk = 1 THEN score END) -
                 max(CASE WHEN rk = 2 THEN score END) AS margin_micro
        FROM rk WHERE rk <= 2 GROUP BY 1, 2)
      SELECT doc_id, true_lang, pred_lang,
             CAST(margin_micro AS BIGINT) AS margin_micro
      FROM agg ORDER BY margin_micro, doc_id LIMIT 20"""))

  val defs: Seq[QueryDef] =
    Seq(hardNegatives, centroidClassify, diversifiedTopk, pcaPower,
      stumpTrain, logregTrain, kmeansTrain, nbTrain, grpoAdvantage,
      gbdtTrain, labelNoise, marginCalibration, plsaEm, bradleyTerry,
      coresetKcenter, uncertaintySample)
}
