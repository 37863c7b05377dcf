package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** LLM-data-pipeline operators (north star, beyond the reference):
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  * search over embeddings (brute-force + sign-LSH bucketed), text
  * analysis (lang-id, quality, tokens, fingerprint), multimodal binary
  * plumbing.
  *
  * Scale notes (100 TB): every pairwise op is candidate-bounded —
  * Jaccard pairs come from an inverted shingle join (never a cross
  * join), MinHash pairs from LSH band buckets, embedding near-dup from
  * sign buckets. Brute-force cosine is only ever (small query set) ×
  * (corpus), a broadcast nested-loop with the small side broadcast.
  */
object LlmQueries extends QueryModule {

  /** DuckDB rendering of the shared 60-bit md5-prefix hash, reduced
    * mod `mod` (default P — the minhash/permutation modulus; callers
    * with a different range pass their own instead of string-patching
    * this rendering). */
  private def dkHashP(x: String, mod: Long = P): String =
    s"(('0x' || substr(md5($x), 1, 15))::BIGINT % $mod)"

  /** CMS geometry + per-row hash constants — ONE definition spliced
    * into both the Spark plan and the DuckDB oracle (llm_cms_sketch). */
  private val CmsW = 512
  private val CmsRows: Seq[(Long, Long)] =
    Seq((31L, 7L), (37L, 11L), (41L, 13L), (43L, 17L))

  /** DuckDB left fold with explicit init (matches Spark `aggregate`). */
  private def dkFold(init: String, list: String, lambda: String): String =
    s"list_reduce([$init] || $list, $lambda)"

  /** DuckDB rendering of VectorFunctions.signBucket over `embedding` —
    * the ONE definition every sign-bucket oracle shares (drifting one
    * of several copies is the hardest oracle bug to localize). */
  private def dkSignBucket(nBits: Int): String =
    (0 until nBits).map(i =>
      s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")

  /** DuckDB rendering of TextFunctions.simhashN over a `hashes` list. */
  private def dkSimhash(n: Int): String =
    (0 until n).map { j =>
      val lo = 1L << j
      val hi = 1L << (j + 1)
      s"CASE WHEN ${dkFold("0", s"list_transform(hashes, h -> CASE WHEN (h % $hi) >= $lo THEN 1 ELSE -1 END)", "(acc, v) -> acc + v")} > 0 THEN $lo ELSE 0 END"
    }.mkString(" + ")

  // ---------------------------------------------------------------
  // Dedup
  // ---------------------------------------------------------------

  /** Exact dedup: hash-groupBy on content. One shuffle on md5(text);
    * at 100 TB the 32-byte digest, not the document, is the shuffle key. */
  private val dedupExact = QueryDef(
    "llm_dedup_exact",
    (s, d) => {
      documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .select(col("keeper_id"), col("n_copies"), col("content_hash"))
        .orderBy(col("keeper_id"))
    },
    Some("""
      SELECT min(doc_id) AS keeper_id, count(*) AS n_copies,
             md5(text) AS content_hash
      FROM documents
      GROUP BY md5(text)
      ORDER BY keeper_id"""))

  /** (doc_id, shingle) rows for word-3-gram shingles, built the scale
    * way: tokenize ONCE per doc, posexplode to (doc, pos, tok) rows,
    * then assemble each shingle with lead() over (doc, pos) — one
    * shuffle on doc_id, one split per document. (Building shingles as
    * a nested array lambda instead re-evaluates split(text) for every
    * element_at inside the lambda — ~3 splits per shingle — which
    * profiled 10× slower.) Downstream doc_id aggregations reuse the
    * window's hash partitioning, so no second shuffle. */
  private def shingleRows(s: SparkSession, d: String, pred: Column): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    documents(s, d).filter(pred)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        concat_ws(" ", col("tok"),
          lead(col("tok"), 1).over(w), lead(col("tok"), 2).over(w)).as("shingle"),
        lead(col("tok"), 2).over(w).isNotNull.as("full3"))
      .filter(col("full3"))
      .select(col("doc_id"), col("shingle"))
  }

  /** MinHash signatures (8 perms over word-3-gram shingles) for docs
    * that HAVE shingles (≥3 tokens): shingle rows → ONE md5 per
    * shingle → 8 min-aggregates grouped by doc. Partial-agg friendly
    * (map-side combine); the md5 is evaluated exactly once per
    * shingle — a giant win over nesting the hash inside 8 array_min
    * expression trees, which recomputes it per permutation. */
  private def minhashSigCore(s: SparkSession, d: String,
      pred: Column = lit(true)): DataFrame = {
    val ex = shingleRows(s, d, pred)
      .select(col("doc_id"), hashP(col("shingle")).as("h"))
    val aggs = MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"sig$i")
    }
    ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Signature table total over docs: <3-token docs get NULL sigs via
    * the left join (oracle's list_min-of-empty parity). */
  private def minhashSigDf(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"))
      .join(minhashSigCore(s, d), Seq("doc_id"), "left_outer")

  private def dkMinhashCte: String = dkMinhashCteWhere("")

  /** As dkMinhashCte, with an optional WHERE on documents (used by the
    * cluster query to bound the pair graph). */
  private def dkMinhashCteWhere(where: String): String = {
    // tokens / shingles / shingle hashes, mirrored expression by expression
    val shingleList =
      "list_transform(generate_series(0, len(toks) - 3), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])"
    val sigCols = MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(hashes, h -> ($a * h + $b) % $P)) AS sig$i"
    }.mkString(",\n             ")
    s"""
      toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents $where),
      sh AS (SELECT doc_id, $shingleList AS shingle_list FROM toks),
      hs AS (SELECT doc_id, list_transform(shingle_list, x -> ${dkHashP("x")}) AS hashes FROM sh),
      sig AS (SELECT doc_id,
             $sigCols
             FROM hs)"""
  }

  private val minhashSignature = QueryDef(
    "llm_minhash_signature",
    (s, d) => minhashSigDf(s, d).orderBy(col("doc_id")),
    Some(s"""
      WITH ${dkMinhashCte}
      SELECT * FROM sig ORDER BY doc_id"""))

  /** MinHash-LSH near-dup candidates: 4 bands × 2 rows; pairs sharing
    * any band bucket. Banding is one posexplode (no 4-way union
    * recompute), then ONE shuffle groups docs per (band, bucket) and
    * pairs are generated inside each bucket — at scale buckets are
    * tiny, so pair generation is local and never all-pairs. Docs with
    * NULL signatures (<3 tokens) are excluded before banding (inner
    * sig aggregate). Band keys are packed int64s (sig_lo + sig_hi·P <
    * P² < 2^63), not strings — an 8-byte shuffle key instead of a
    * ~20-byte text one, the "hash, not payload, on the wire"
    * principle. */
  private def lshPairs(s: SparkSession, d: String,
      pred: Column = lit(true)): DataFrame = {
      val sig = minhashSigCore(s, d, pred) // short docs have no sigs: excluded
      val bandCols = (0 until 4).map(b =>
        col(s"sig${2 * b}") * P + col(s"sig${2 * b + 1}"))
      val bands = sig.select(col("doc_id"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
      // NOTE: the hybrid pair generation below consumes buckets from
      // two branches (local pairing + the big-bucket self-join), which
      // recomputes the pipeline per branch. persist() here showed no
      // measured win at sf0.1 (the cache boundary also limits AQE's
      // runtime re-planning), so the plan stays cache-free; revisit
      // with a cheap reliable checkpoint if the pipeline above this
      // aggregation ever becomes the dominant cost.
      val buckets = bands.groupBy(col("band"), col("bkey"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      // Hybrid pair generation. Local in-bucket pairing is quadratic
      // in bucket size INSIDE ONE TASK — fine for normal buckets, an
      // OOM for the degenerate mega-cluster a real dedup corpus
      // contains (100k near-identical docs sharing a band key). Big
      // buckets route through a distributed self-join on the bucket
      // key instead: same candidate set, quadratic work spread across
      // tasks. No pairs are dropped either way.
      val maxLocal = 64
      val localPairs = buckets.filter(size(col("ids")) <= maxLocal)
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
            struct(x.as("d1"), y.as("d2")))))).as("p"))
        .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      // big-bucket members re-derive from `buckets` itself (explode of
      // the collected array), NOT from `bands` — every branch then
      // consumes the same post-aggregation exchange and Spark's
      // ReuseExchange computes the signature pipeline once
      val bigMembers = buckets.filter(size(col("ids")) > maxLocal)
        .select(col("band"), col("bkey"), explode(col("ids")).as("doc_id"))
      val bigPairs = bigMembers.as("a").join(bigMembers.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      localPairs.union(bigPairs)
        .distinct()
  }

  private val minhashLsh = QueryDef(
    "llm_dedup_minhash_lsh",
    (s, d) => lshPairs(s, d).orderBy(col("d1"), col("d2")),
    Some(s"""
      WITH ${dkMinhashCte},
      ${dkLshPairsCtes}
      SELECT d1, d2 FROM lsh_pairs
      ORDER BY d1, d2"""))

  /** DuckDB CTEs deriving the LSH candidate pairs from `sig` — shared
    * between the pairs oracle and the cluster oracle. */
  private def dkLshPairsCtes: String = s"""
      sigf AS (SELECT * FROM sig WHERE sig0 IS NOT NULL),
      bands AS (
        SELECT doc_id, 0 AS band, sig0 * ${P} + sig1 AS bkey FROM sigf
        UNION ALL SELECT doc_id, 1, sig2 * ${P} + sig3 FROM sigf
        UNION ALL SELECT doc_id, 2, sig4 * ${P} + sig5 FROM sigf
        UNION ALL SELECT doc_id, 3, sig6 * ${P} + sig7 FROM sigf),
      lsh_pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)"""

  /** SimHash (16-bit) per document over token hashes. */
  /** (doc_id, sh) n-bit simhash rows, built the scale way: explode to
    * one row per token, ONE md5 per token, then n codegen'd ±1 vote
    * sums grouped by doc (map-side combine). The array-lambda form
    * (simhashN over transform(tokens, hashP)) is semantically
    * identical but CollapseProject inlines the hash list into each of
    * the n interpreted aggregate trees — n× the md5 work plus an
    * interpreted lambda per element; it benched 30× slower. The vote
    * sum is order-insensitive, so both shapes give the same bits. */
  private def simhashRows(s: SparkSession, d: String, pred: Column, n: Int): DataFrame = {
    val votes = (0 until n).map { j =>
      val lo = 1L << j
      val hi = 1L << (j + 1)
      sum(when((col("h") % hi) >= lo, 1L).otherwise(-1L)).as(s"v$j")
    }
    val bits = (0 until n).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }
    documents(s, d).filter(pred)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), hashP(col("tok")).as("h"))
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("sh"))
  }

  private val simhashQ = QueryDef(
    "llm_simhash",
    (s, d) => {
      simhashRows(s, d, lit(true), 16)
        .select(col("doc_id"), col("sh").as("simhash"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH hs AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '), t -> ${dkHashP("t")}) AS hashes
        FROM documents)
      SELECT doc_id, ${dkSimhash(16)} AS simhash
      FROM hs ORDER BY doc_id"""))

  /** SimHash near-dup pairs: candidates share either 15-bit half of a
    * 30-bit simhash (the block-split candidate trick: a pair at
    * hamming distance ≤ 1 is always caught — 2 blocks, pigeonhole —
    * and a d ≤ 2 pair is caught whenever its differing bits fall in
    * one block; recall-for-throughput, like any LSH). Exact hamming
    * ≤ 2 then filters candidates. Bucket-local pair generation, one
    * shuffle — same scale shape as the MinHash banding. */
  private val simhashPairs = QueryDef(
    "llm_dedup_simhash",
    (s, d) => {
      val sim = simhashRows(s, d, col("doc_id") < 200, 30)
      val bands = sim.select(col("doc_id"), col("sh"),
        posexplode(array(col("sh") % 32768, expr("sh div 32768")))
          .as(Seq("band", "bkey")))
      val buckets = bands.groupBy(col("band"), col("bkey"))
        .agg(sort_array(collect_set(struct(col("doc_id"), col("sh")))).as("ids"))
        .filter(size(col("ids")) > 1)
      val pairs = buckets
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
            struct(x.getField("doc_id").as("d1"), y.getField("doc_id").as("d2"),
              bit_count(x.getField("sh").bitwiseXOR(y.getField("sh"))).as("hd")))))).as("p"))
        .select(col("p.d1").as("d1"), col("p.d2").as("d2"), col("p.hd").as("hamming"))
        .distinct()
      pairs.filter(col("hamming") <= 2)
        .orderBy(col("hamming"), col("d1"), col("d2"))
    },
    Some {
      val simExpr = dkSimhash(30)
      s"""
      WITH hs AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '), t -> ${dkHashP("t")}) AS hashes
        FROM documents WHERE doc_id < 200),
      sim AS (SELECT doc_id, ($simExpr) AS sh FROM hs),
      bands AS (
        SELECT doc_id, sh, 0 AS band, sh % 32768 AS bkey FROM sim
        UNION ALL SELECT doc_id, sh, 1, sh // 32768 FROM sim),
      pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
               bit_count(xor(a.sh, b.sh)) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
      SELECT d1, d2, hamming
      FROM pairs WHERE hamming <= 2
      ORDER BY hamming, d1, d2"""
    })

  /** n-gram Jaccard near-dup: top-20 most similar pairs among
    * doc_id < 150, candidates generated by an inverted shingle join
    * (only pairs with ≥1 shared shingle exist — the scale path). */
  private val ngramJaccard = QueryDef(
    "llm_dedup_ngram_jaccard",
    (s, d) => {
      val ex = shingleRows(s, d, col("doc_id") < 150).distinct()
      val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("nsh", "n1")), "d1")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("nsh", "n2")), "d2")
        .select(col("d1"), col("d2"),
          round(col("n_inter").cast("double") /
            (col("n1") + col("n2") - col("n_inter")), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("d1"), col("d2"))
        .limit(20)
    },
    Some("""
      WITH docs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(0, len(string_split(text, ' ')) - 3),
                 i -> string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2] || ' ' ||
                      string_split(text, ' ')[i+3])) AS sh
        FROM documents WHERE doc_id < 150),
      sizes AS (SELECT doc_id, len(sh) AS nsh FROM docs),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
      inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT d1, d2,
             round(CAST(n_inter AS DOUBLE) / (s1.nsh + s2.nsh - n_inter), 4) AS jaccard
      FROM inter
      JOIN sizes s1 ON s1.doc_id = d1
      JOIN sizes s2 ON s2.doc_id = d2
      ORDER BY jaccard DESC, d1, d2
      LIMIT 20"""))

  /** Edit-distance near-dup: Levenshtein distance between 150-char
    * document prefixes, the character-level complement to the
    * token-level Jaccard above. Pairwise edit distance is O(n·m) per
    * pair and O(N²) pairs naively — both get bounded: candidates come
    * from the inverted shingle join (only pairs sharing ≥1 word
    * 3-gram exist, never a cross join) and the comparison runs on a
    * fixed 150-char prefix, so per-pair cost is a constant. At 100 TB
    * the shingle join shuffles on shingle (skew-bounded: stopword-ish
    * shingles could be salted), and the tiny prefix table broadcasts
    * back onto the candidate pairs. */
  private val editDistance = QueryDef(
    "llm_dedup_editdist",
    (s, d) => {
      val pre = documents(s, d).filter(col("doc_id") < 120)
        .select(col("doc_id"), substring(col("text"), 1, 150).as("pfx"))
      val ex = shingleRows(s, d, col("doc_id") < 120).distinct()
      val cand = ex.as("a").join(ex.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_shared"))
      cand
        .join(broadcast(pre.select(col("doc_id").as("d1"), col("pfx").as("p1"))), "d1")
        .join(broadcast(pre.select(col("doc_id").as("d2"), col("pfx").as("p2"))), "d2")
        .select(col("d1"), col("d2"), col("n_shared"),
          levenshtein(col("p1"), col("p2")).as("edit_dist"))
        .orderBy(col("edit_dist"), col("d1"), col("d2"))
        .limit(30)
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, substr(text, 1, 150) AS pfx,
               list_distinct(list_transform(
                 generate_series(0, len(string_split(text, ' ')) - 3),
                 i -> string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2] || ' ' ||
                      string_split(text, ' ')[i+3])) AS sh
        FROM documents WHERE doc_id < 120),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
      cand AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT d1, d2, n_shared,
             CAST(levenshtein(p1.pfx, p2.pfx) AS INTEGER) AS edit_dist
      FROM cand
      JOIN docs p1 ON p1.doc_id = d1
      JOIN docs p2 ON p2.doc_id = d2
      ORDER BY edit_dist, d1, d2
      LIMIT 30"""))

  /** Bigram language-model scoring: train add-one-smoothed bigram
    * stats on one corpus slice, score a held-out slice by mean token
    * log-likelihood — the classic statistical-quality filter (a doc
    * whose bigrams never occur in the reference corpus scores low:
    * boilerplate, lorem-ipsum, other-language text). Shapes: the two
    * count tables shuffle on token keys (bigram vocab is NOT
    * broadcastable at 100 TB — plain shuffle joins, AQE may still
    * broadcast at small SF); the scalar vocab size rides a 1-row
    * broadcast cross join; the per-doc rollup shuffles once on
    * doc_id. Mean log-prob is rounded to 4dp — sum-order noise over
    * ~200 terms is ~1e-12, far under the rounding grain. */
  private val lmScore = QueryDef(
    "llm_lm_score",
    (s, d) => {
      def toks(df: DataFrame) = df
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w1")))
      def bigrams(df: DataFrame) = {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        toks(df).withColumn("w2", lead(col("w1"), 1).over(w))
          .filter(col("w2").isNotNull)
      }
      val train = documents(s, d).filter(col("doc_id") >= 100 && col("doc_id") < 400)
      val eval_ = documents(s, d).filter(col("doc_id") < 100)
      // bigram-TYPE table consumed by pref/cont/tot and the scoring
      // join: checkpoint so the training-bigram pass runs once (probed:
      // runtime exchange reuse does not collapse the branches)
      val c2 = bigrams(train).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        .localCheckpoint(true)
      // vocab-sized unigram table read by the V scalar AND the scoring
      // join — one training-token pass, not two
      val c1 = toks(train).groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        .localCheckpoint(true)
      // vocab size = |c1|: one row-count over the already-reduced
      // unigram table, not a second distinct pass over train tokens.
      val v = c1.agg(count(lit(1)).as("v"))
      bigrams(eval_)
        .join(c2, Seq("w1", "w2"), "left_outer")
        .join(c1, Seq("w1"), "left_outer")
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)) + col("v"))).as("logp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), round(avg(col("logp")), 4).as("avg_logp"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tr AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        WHERE doc_id >= 100 AND doc_id < 400),
      trtok AS (SELECT unnest(ws) AS w FROM tr),
      c1 AS (SELECT w AS w1, count(*) AS c1 FROM trtok GROUP BY 1),
      vv AS (SELECT count(DISTINCT w) AS v FROM trtok),
      trpos AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS g FROM tr),
      c2 AS (SELECT ws[g] AS w1, ws[g+1] AS w2, count(*) AS c2 FROM trpos GROUP BY 1, 2),
      ev AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 100),
      evpos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS g FROM ev),
      evbg AS (SELECT doc_id, ws[g] AS w1, ws[g+1] AS w2 FROM evpos),
      j AS (
        SELECT doc_id,
               ln((coalesce(c2.c2, 0) + 1.0) /
                  (coalesce(c1.c1, 0) + (SELECT v FROM vv))) AS logp
        FROM evbg
        LEFT JOIN c2 ON c2.w1 = evbg.w1 AND c2.w2 = evbg.w2
        LEFT JOIN c1 ON c1.w1 = evbg.w1)
      SELECT doc_id, count(*) AS n_bigrams, round(avg(logp), 4) AS avg_logp
      FROM j GROUP BY 1 ORDER BY doc_id"""))

  /** Interpolated Kneser–Ney bigram scoring (D = 0.75, smoothed
    * continuation) — the standard LM-smoothing ladder step above
    * [[lmScore]]'s add-one: P(w2|w1) = max(c−D,0)/c(w1·) +
    * D·N1+(w1,·)/c(w1·) · Pcont(w2), with Pcont = (N1+(·,w2)+1) /
    * (B+V) (+1 keeps unseen words defined; normalization drift is
    * documented, determinism is what's gated). Every quantity
    * derives from the ONE bigram count table: prefix totals and
    * fan-out by w1, continuation fan-in by w2, B and V as 1-row
    * aggregates of the already-reduced tables — no extra corpus
    * passes over [[lmScore]]'s shapes, same shuffle keys, scalar
    * totals ride broadcast cross joins. All inputs to P are exact
    * integers and the D=0.75 literal is binary-exact, so both
    * engines compute identical doubles; ln/exp are 1-ulp libm and
    * only feed 4dp/2dp-rounded REPORTED values (the
    * llm_quality_classifier rule). */
  private val lmScoreKn = QueryDef(
    "llm_lm_score_kn",
    (s, d) => {
      def toks(df: DataFrame) = df
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w1")))
      def bigrams(df: DataFrame) = {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        toks(df).withColumn("w2", lead(col("w1"), 1).over(w))
          .filter(col("w2").isNotNull)
      }
      val train = documents(s, d).filter(col("doc_id") >= 100 && col("doc_id") < 400)
      val eval_ = documents(s, d).filter(col("doc_id") < 100)
      // bigram-TYPE table consumed by pref/cont/tot and the scoring
      // join: checkpoint so the training-bigram pass runs once (probed:
      // runtime exchange reuse does not collapse the branches)
      val c2 = bigrams(train).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        .localCheckpoint(true)
      val pref = c2.groupBy(col("w1")).agg(
        sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
      val cont = c2.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
      val tot = c2.agg(count(lit(1)).as("btypes"))
      val cv = cont.agg(count(lit(1)).as("cv"))
      bigrams(eval_)
        .join(c2, Seq("w1", "w2"), "left_outer")
        .join(pref, Seq("w1"), "left_outer")
        .join(cont, Seq("w2"), "left_outer")
        .crossJoin(broadcast(tot)).crossJoin(broadcast(cv))
        .withColumn("pcont",
          (coalesce(col("n1b"), lit(0L)) + lit(1.0)) / (col("btypes") + col("cv")))
        .withColumn("p", when(col("c1").isNotNull,
            (greatest(coalesce(col("c2"), lit(0L)) - lit(0.75), lit(0.0)) +
              lit(0.75) * col("n1f") * col("pcont")) / col("c1"))
          .otherwise(col("pcont")))
        .select(col("doc_id"), log(col("p")).as("logp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(col("logp")), 4).as("avg_logp"),
          round(exp(-avg(col("logp"))), 2).as("ppl"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tr AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        WHERE doc_id >= 100 AND doc_id < 400),
      trpos AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS g FROM tr),
      c2 AS (SELECT ws[g] AS w1, ws[g+1] AS w2, count(*) AS c2 FROM trpos GROUP BY 1, 2),
      pref AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1, count(*) AS n1f
               FROM c2 GROUP BY 1),
      cont AS (SELECT w2, count(*) AS n1b FROM c2 GROUP BY 1),
      tot AS (SELECT count(*) AS btypes FROM c2),
      cv AS (SELECT count(*) AS cv FROM cont),
      ev AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             WHERE doc_id < 100),
      evpos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS g FROM ev),
      evbg AS (SELECT doc_id, ws[g] AS w1, ws[g+1] AS w2 FROM evpos),
      j AS (
        SELECT doc_id,
               ln(CASE WHEN pref.c1 IS NOT NULL THEN
                    (greatest(coalesce(c2.c2, 0) - CAST(0.75 AS DOUBLE),
                       CAST(0.0 AS DOUBLE)) +
                     CAST(0.75 AS DOUBLE) * pref.n1f *
                       ((coalesce(cont.n1b, 0) + 1.0) / (tot.btypes + cv.cv)))
                    / pref.c1
                  ELSE (coalesce(cont.n1b, 0) + 1.0) / (tot.btypes + cv.cv)
                  END) AS logp
        FROM evbg
        LEFT JOIN c2 ON c2.w1 = evbg.w1 AND c2.w2 = evbg.w2
        LEFT JOIN pref ON pref.w1 = evbg.w1
        LEFT JOIN cont ON cont.w2 = evbg.w2
        CROSS JOIN tot CROSS JOIN cv)
      SELECT doc_id, count(*) AS n_bigrams,
             round(avg(logp), 4) AS avg_logp,
             round(exp(-avg(logp)), 2) AS ppl
      FROM j GROUP BY 1 ORDER BY doc_id"""))

  /** Filter-overlap matrix: [[filterChain]] applies rules first-
    * failure-wins, which HIDES how redundant the rules are — this is
    * the introspection pass that evaluates every rule INDEPENDENTLY
    * and reports the pairwise overlap (Jaccard of flagged-doc sets)
    * for all 6 rule pairs. A pair with Jaccard ≈ 1 means one rule is
    * dead weight; ≈ 0 means they prune disjoint slices — the data a
    * pipeline owner needs before reordering or dropping stages. One
    * narrow scan, ten conditional counts folded to ONE row, six
    * literal-struct rows exploded from it — no second pass, no
    * shuffle beyond the global aggregate. All counts exact ints;
    * the only division is the final reported ratio. */
  private val filterOverlap = QueryDef(
    "llm_filter_overlap",
    (s, d) => {
      val t = tokens(col("text"))
      val nTok = size(t)
      val meanLen = (col("n_chars") - nTok + 1).cast("double") / nTok
      val diversity = size(array_distinct(t)).cast("double") / nTok
      def i(c: Column) = when(c, 1L).otherwise(0L)
      val flagged = documents(s, d)
        .withColumn("fs", i(col("n_chars") < 120))
        .withColumn("fl", i(col("n_chars") > 450))
        .withColumn("fw", i(meanLen > 5.0))
        .withColumn("fr", i(diversity < 0.35))
      val a = flagged.groupBy().agg(
        sum(col("fs")).as("ss"), sum(col("fl")).as("sl"),
        sum(col("fw")).as("sw"), sum(col("fr")).as("sr"),
        sum(col("fs") * col("fl")).as("b_sl"),
        sum(col("fs") * col("fw")).as("b_sw"),
        sum(col("fs") * col("fr")).as("b_sr"),
        sum(col("fl") * col("fw")).as("b_lw"),
        sum(col("fl") * col("fr")).as("b_lr"),
        sum(col("fw") * col("fr")).as("b_wr"))
      def row(f1: String, f2: String, n1: String, n2: String, b: String) =
        struct(lit(f1).as("f1"), lit(f2).as("f2"), col(n1).as("n_f1"),
          col(n2).as("n_f2"), col(b).as("n_both"))
      a.select(explode(array(
          row("repetitive", "too_long", "sr", "sl", "b_lr"),
          row("repetitive", "weird_tokens", "sr", "sw", "b_wr"),
          row("too_long", "weird_tokens", "sl", "sw", "b_lw"),
          row("too_short", "repetitive", "ss", "sr", "b_sr"),
          row("too_short", "too_long", "ss", "sl", "b_sl"),
          row("too_short", "weird_tokens", "ss", "sw", "b_sw"))).as("p"))
        .select(col("p.f1"), col("p.f2"), col("p.n_f1"), col("p.n_f2"),
          col("p.n_both"),
          (col("p.n_f1") + col("p.n_f2") - col("p.n_both")).as("n_either"),
          round(col("p.n_both").cast("double") /
            nullif(col("p.n_f1") + col("p.n_f2") - col("p.n_both"), lit(0L)), 4)
            .as("jaccard"))
        .orderBy(col("f1"), col("f2"))
    },
    Some("""
      WITH t AS (
        SELECT n_chars,
               len(string_split(text, ' ')) AS nt,
               len(list_distinct(string_split(text, ' '))) AS nd
        FROM documents),
      f AS (
        SELECT CASE WHEN n_chars < 120 THEN 1 ELSE 0 END AS fs,
               CASE WHEN n_chars > 450 THEN 1 ELSE 0 END AS fl,
               CASE WHEN CAST(n_chars - nt + 1 AS DOUBLE) / nt > 5.0
                    THEN 1 ELSE 0 END AS fw,
               CASE WHEN CAST(nd AS DOUBLE) / nt < 0.35
                    THEN 1 ELSE 0 END AS fr
        FROM t),
      a AS (
        SELECT count(CASE WHEN fs = 1 THEN 1 END) AS ss,
               count(CASE WHEN fl = 1 THEN 1 END) AS sl,
               count(CASE WHEN fw = 1 THEN 1 END) AS sw,
               count(CASE WHEN fr = 1 THEN 1 END) AS sr,
               count(CASE WHEN fs = 1 AND fl = 1 THEN 1 END) AS b_sl,
               count(CASE WHEN fs = 1 AND fw = 1 THEN 1 END) AS b_sw,
               count(CASE WHEN fs = 1 AND fr = 1 THEN 1 END) AS b_sr,
               count(CASE WHEN fl = 1 AND fw = 1 THEN 1 END) AS b_lw,
               count(CASE WHEN fl = 1 AND fr = 1 THEN 1 END) AS b_lr,
               count(CASE WHEN fw = 1 AND fr = 1 THEN 1 END) AS b_wr
        FROM f),
      pairs AS (
        SELECT 'repetitive' AS f1, 'too_long' AS f2, sr AS n_f1, sl AS n_f2, b_lr AS n_both FROM a
        UNION ALL SELECT 'repetitive', 'weird_tokens', sr, sw, b_wr FROM a
        UNION ALL SELECT 'too_long', 'weird_tokens', sl, sw, b_lw FROM a
        UNION ALL SELECT 'too_short', 'repetitive', ss, sr, b_sr FROM a
        UNION ALL SELECT 'too_short', 'too_long', ss, sl, b_sl FROM a
        UNION ALL SELECT 'too_short', 'weird_tokens', ss, sw, b_sw FROM a)
      SELECT f1, f2, n_f1, n_f2, n_both,
             n_f1 + n_f2 - n_both AS n_either,
             round(CAST(n_both AS DOUBLE) /
               nullif(n_f1 + n_f2 - n_both, 0), 4) AS jaccard
      FROM pairs
      ORDER BY f1, f2"""))

  /** Training-mixture weights: temperature-smoothed (α=0.5) domain
    * sampling — w_i = n_i^α / Σ n_j^α over per-source token counts,
    * then each source's expected token draw under a 1M budget and the
    * epoch count that draw implies (how many passes over a small
    * domain the mixture demands). The only full-data pass is the
    * per-source token count (partial-agg friendly); everything after
    * runs on one row per source. sqrt (not pow) so both engines hit
    * the IEEE correctly-rounded path. */
  private val mixtureWeights = QueryDef(
    "llm_mixture_weights",
    (s, d) => {
      val budget = 1000000L
      val t = documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens(col("text")))).as("n_tokens"))
      val sq = sqrt(col("n_tokens").cast("double"))
      val w = Window.partitionBy()
      t.withColumn("sh", sq)
        .withColumn("tot", sum(col("sh")).over(w))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("sh") / col("tot"), 6).as("weight"),
          round(col("sh") / col("tot") * budget).cast("long").as("exp_tokens"),
          round(col("sh") / col("tot") * budget / col("n_tokens"), 4).as("epochs"))
        .orderBy(col("source"))
    },
    Some("""
      WITH t AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1),
      w AS (
        SELECT *, sqrt(CAST(n_tokens AS DOUBLE)) AS sh,
               sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS tot
        FROM t)
      SELECT source, n_docs, n_tokens,
             round(sh / tot, 6) AS weight,
             CAST(round(sh / tot * 1000000) AS BIGINT) AS exp_tokens,
             round(sh / tot * 1000000 / n_tokens, 4) AS epochs
      FROM w ORDER BY source"""))

  /** TF-IDF top terms per document (classic text-pipeline scoring):
    * tf from one tokenize+explode pass, df from a distinct-doc count
    * per term, idf = ln(N/df) — top-3 terms per doc ranked by the
    * ROUNDED score (both engines round before ordering so 1-ulp ln()
    * differences can't flip the cutoff), term as tiebreak. Two
    * shuffles: (doc, term) count and term df; the df table is tiny →
    * broadcast back. */
  private val tfidf = QueryDef(
    "llm_tfidf_top_terms",
    (s, d) => {
      val docs = documents(s, d).filter(col("doc_id") < 100)
      val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // N as a lazy 1-row aggregate (a driver-side .count() here would
      // run an eager job on every query-construction call)
      val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      tf.join(broadcast(df), "term")
        .crossJoin(broadcast(nDf))
        .withColumn("score",
          round(col("tf") * log(col("n_docs") / col("df")), 4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("score"))
        .orderBy(col("doc_id"), col("rk"))
    },
    Some("""
      WITH docs AS (SELECT * FROM documents WHERE doc_id < 100),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n FROM docs),
      scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n),
      rk AS (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rk
        FROM scored)
      SELECT doc_id, rk, term, score
      FROM rk WHERE rk <= 3
      ORDER BY doc_id, rk"""))

  /** Topic coherence (NPMI, Bouma 2009 / Röder 2015 C_v family) —
    * "are a topic's top terms actually about one thing?", the
    * standard automatic quality score for topic models, run with
    * topic = source: top-5 source-distinctive terms by source-level
    * tf·idf (idf over SOURCES, so shared stopwords score 0; the rank
    * key is cnt × micro-quantized-idf — an exact BIGINT, so the probe
    * set cannot drift on 1-ulp ln() skew between engines), then
    * for each of the ≤C(5,2) term pairs per source the normalized
    * PMI from document co-occurrence: npmi = ln(c12·D/(c1·c2)) /
    * ln(D/c12), quantized to micros (the lm_score ln() discipline;
    * ORDER never touches the float). Degenerate pairs pin to the
    * limits: never-co-occurring → −1e6, co-occurring-everywhere →
    * +1e6. Scale shape: one corpus pass builds (source, term)
    * counts; top-5 windows run per source on the aggregate-sized
    * count table; doc-term incidence is semi-joined down to the
    * broadcast probe-term set BEFORE any pair work, so the c12
    * self-join is probe-bounded — never a corpus self-join; D rides
    * a 1-row broadcast cross join (the llm_lm_score scalar shape). */
  private val topicCoherence = QueryDef(
    "llm_topic_coherence",
    (s, d) => {
      val docs = documents(s, d)
      val toks = docs.select(col("source"), col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      val stf = toks.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val sdf = stf.groupBy(col("term")).agg(count(lit(1)).as("sdf"))
      val nS = stf.select(col("source")).distinct()
        .agg(count(lit(1)).cast("double").as("n_sources"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("term"))
      // tf·idf rank rides an exact integer: the per-term idf is
      // micro-quantized ONCE (1-ulp ln() skew flips a micro only
      // within ~1e-10 of a boundary) and multiplied by integer cnt,
      // so ORDER never touches a float (psi/nb discipline)
      val topT = stf.join(broadcast(sdf), "term")
        .crossJoin(broadcast(nS))
        .withColumn("idf_micro",
          round(log(col("n_sources") / col("sdf")) * 1000000, 0).cast("long"))
        .withColumn("score", col("cnt") * col("idf_micro"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("term"))
        .localCheckpoint(true)
      val probe = topT.select(col("term")).distinct()
      val inc = toks.select(col("doc_id"), col("term")).distinct()
        .join(broadcast(probe), Seq("term"), "left_semi")
        .localCheckpoint(true)
      val df = inc.groupBy(col("term")).agg(count(lit(1)).as("c"))
      val nD = docs.agg(count(lit(1)).as("n_docs"))
      val pairs = topT.as("a")
        .join(topT.as("b"),
          col("a.source") === col("b.source") && col("a.term") < col("b.term"))
        .select(col("a.source").as("source"),
          col("a.term").as("t1"), col("b.term").as("t2"))
      val codf = pairs
        .join(inc.select(col("term").as("t1"), col("doc_id")), Seq("t1"))
        .join(inc.select(col("term").as("t2"), col("doc_id")), Seq("t2", "doc_id"))
        .groupBy(col("source"), col("t1"), col("t2"))
        .agg(count(lit(1)).as("c12"))
      val npmi = log((col("c12").cast("double") * col("n_docs")) /
          (col("c1").cast("double") * col("c2"))) /
        log(col("n_docs").cast("double") / col("c12"))
      pairs
        .join(df.select(col("term").as("t1"), col("c").as("c1")), Seq("t1"))
        .join(df.select(col("term").as("t2"), col("c").as("c2")), Seq("t2"))
        .join(codf, Seq("source", "t1", "t2"), "left_outer")
        .withColumn("c12", coalesce(col("c12"), lit(0L)))
        .crossJoin(broadcast(nD))
        .select(col("source"), col("t1"), col("t2"),
          col("c1"), col("c2"), col("c12"),
          when(col("c12") === 0L, lit(-1000000L))
            .when(col("c12") === col("n_docs"), lit(1000000L))
            .otherwise(round(npmi * 1000000, 0).cast("long"))
            .as("npmi_micro"))
        .orderBy(col("source"), col("t1"), col("t2"))
    },
    Some("""
      WITH toks AS (
        SELECT source, doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      stf AS MATERIALIZED (
        SELECT source, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
      sdf AS (SELECT term, count(*) AS sdf FROM stf GROUP BY 1),
      ns AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) AS n_sources FROM stf),
      topt AS MATERIALIZED (
        SELECT source, term FROM (
          SELECT s.source, s.term,
                 row_number() OVER (PARTITION BY s.source
                   ORDER BY s.cnt * CAST(round(ln(ns.n_sources / d.sdf)
                                               * 1000000, 0) AS BIGINT) DESC,
                            s.term) AS rk
          FROM stf s JOIN sdf d USING (term) CROSS JOIN ns)
        WHERE rk <= 5),
      inc AS MATERIALIZED (
        SELECT DISTINCT doc_id, term
        FROM toks WHERE term IN (SELECT term FROM topt)),
      df AS (SELECT term, count(*) AS c FROM inc GROUP BY 1),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      pairs AS MATERIALIZED (
        SELECT a.source, a.term AS t1, b.term AS t2
        FROM topt a JOIN topt b
          ON a.source = b.source AND a.term < b.term),
      codf AS (
        SELECT p.source, p.t1, p.t2, count(*) AS c12
        FROM pairs p
        JOIN inc i1 ON i1.term = p.t1
        JOIN inc i2 ON i2.term = p.t2 AND i2.doc_id = i1.doc_id
        GROUP BY 1, 2, 3)
      SELECT p.source, p.t1, p.t2,
             d1.c AS c1, d2.c AS c2, coalesce(cd.c12, 0) AS c12,
             CASE WHEN coalesce(cd.c12, 0) = 0 THEN -1000000
                  WHEN cd.c12 = nd.n_docs THEN 1000000
                  ELSE CAST(round(
                    ln((CAST(cd.c12 AS DOUBLE) * nd.n_docs) /
                       (CAST(d1.c AS DOUBLE) * d2.c)) /
                    ln(CAST(nd.n_docs AS DOUBLE) / cd.c12) * 1000000, 0)
                    AS BIGINT) END AS npmi_micro
      FROM pairs p
      JOIN df d1 ON d1.term = p.t1
      JOIN df d2 ON d2.term = p.t2
      LEFT JOIN codf cd ON cd.source = p.source AND cd.t1 = p.t1 AND cd.t2 = p.t2
      CROSS JOIN nd
      ORDER BY p.source, p.t1, p.t2"""))

  // ---------------------------------------------------------------
  // Text analysis
  // ---------------------------------------------------------------

  private val textTokens = QueryDef(
    "llm_text_tokens",
    (s, d) => {
      val t = tokens(col("text"))
      documents(s, d)
        .select(col("doc_id"),
          size(t).as("n_tokens"),
          size(array_distinct(t)).as("n_distinct"),
          length(col("text")).as("n_chars_text"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             length(text) AS n_chars_text
      FROM documents ORDER BY doc_id"""))

  /** BPE-ish subword tokenization: greedy ≤4-char alphanumeric chunks
    * via regexp_extract_all — the regex-driven token count next to the
    * whitespace one (llm_text_tokens). Same pattern, same greedy
    * semantics in both engines. */
  private val bpeTokens = QueryDef(
    "llm_bpe_tokens",
    (s, d) => {
      val sub = regexp_extract_all(col("text"), lit("[a-zA-Z0-9]{1,4}"), lit(0))
      val ws = tokens(col("text"))
      documents(s, d)
        .select(col("doc_id"),
          size(sub).as("n_subtokens"),
          size(array_distinct(sub)).as("n_distinct_sub"),
          round(size(sub).cast("double") / size(ws), 4).as("subtok_per_word"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             len(regexp_extract_all(text, '[a-zA-Z0-9]{1,4}')) AS n_subtokens,
             len(list_distinct(regexp_extract_all(text, '[a-zA-Z0-9]{1,4}'))) AS n_distinct_sub,
             round(CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]{1,4}')) AS DOUBLE) /
                   len(string_split(text, ' ')), 4) AS subtok_per_word
      FROM documents ORDER BY doc_id"""))

  /** Rolling-hash document fingerprint + collision groups. */
  private val fingerprintQ = QueryDef(
    "llm_fingerprint",
    (s, d) => {
      val hashes = transform(tokens(col("text")), t => hashP(t))
      documents(s, d)
        .select(col("doc_id"), fingerprint(hashes).as("fp"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id,
             ${dkFold("0", s"list_transform(string_split(text, ' '), t -> ${dkHashP("t")})", s"(h, x) -> (h * 31 + x) % $P")} AS fp
      FROM documents ORDER BY doc_id"""))

  /** Marker-token language-ID heuristic (deterministic argmax with
    * fixed priority; the corpus shares one vocab so the *mechanism*
    * is what's exercised). */
  private val langId = QueryDef(
    "llm_lang_id",
    (s, d) => {
      val t = tokens(col("text"))
      val c1 = tokenCountOf(t, "the")
      val c2 = tokenCountOf(t, "a")
      val c3 = tokenCountOf(t, "data")
      val c4 = tokenCountOf(t, "scan")
      val c5 = tokenCountOf(t, "hash")
      val g = greatest(c1, c2, c3, c4, c5)
      documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(c1 === g, "en").when(c2 === g, "zh").when(c3 === g, "fr")
            .when(c4 === g, "es").otherwise("de").as("pred_lang"))
        .withColumn("hit", (col("pred_lang") === col("lang")).cast("int"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '), t -> t = 'the'))  AS c1,
               len(list_filter(string_split(text, ' '), t -> t = 'a'))    AS c2,
               len(list_filter(string_split(text, ' '), t -> t = 'data')) AS c3,
               len(list_filter(string_split(text, ' '), t -> t = 'scan')) AS c4,
               len(list_filter(string_split(text, ' '), t -> t = 'hash')) AS c5
        FROM documents)
      SELECT doc_id, lang,
             CASE WHEN c1 = greatest(c1,c2,c3,c4,c5) THEN 'en'
                  WHEN c2 = greatest(c1,c2,c3,c4,c5) THEN 'zh'
                  WHEN c3 = greatest(c1,c2,c3,c4,c5) THEN 'fr'
                  WHEN c4 = greatest(c1,c2,c3,c4,c5) THEN 'es'
                  ELSE 'de' END AS pred_lang,
             CASE WHEN (CASE WHEN c1 = greatest(c1,c2,c3,c4,c5) THEN 'en'
                  WHEN c2 = greatest(c1,c2,c3,c4,c5) THEN 'zh'
                  WHEN c3 = greatest(c1,c2,c3,c4,c5) THEN 'fr'
                  WHEN c4 = greatest(c1,c2,c3,c4,c5) THEN 'es'
                  ELSE 'de' END) = lang THEN 1 ELSE 0 END AS hit
      FROM c ORDER BY doc_id"""))

  /** Quality scoring: token stats + stopword ratio → class buckets. */
  private val quality = QueryDef(
    "llm_quality_score",
    (s, d) => {
      val t = tokens(col("text"))
      val nTok = size(t)
      val nStop = tokenCountOf(t, "the") + tokenCountOf(t, "a")
      documents(s, d)
        .select(col("doc_id"), nTok.as("n_tokens"),
          round(length(regexp_replace(col("text"), " ", "")).cast("double") / nTok, 4)
            .as("avg_tok_len"),
          round(nStop.cast("double") / nTok, 4).as("stop_ratio"),
          when(nTok < 20, "short").when(nTok > 70, "long").otherwise("ok")
            .as("len_class"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(replace(text, ' ', '')) AS n_nonspace,
               len(list_filter(string_split(text, ' '), t -> t = 'the')) +
               len(list_filter(string_split(text, ' '), t -> t = 'a')) AS n_stop
        FROM documents)
      SELECT doc_id, n_tokens,
             round(CAST(n_nonspace AS DOUBLE) / n_tokens, 4) AS avg_tok_len,
             round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
             CASE WHEN n_tokens < 20 THEN 'short'
                  WHEN n_tokens > 70 THEN 'long'
                  ELSE 'ok' END AS len_class
      FROM c ORDER BY doc_id"""))

  // ---------------------------------------------------------------
  // Similarity search
  // ---------------------------------------------------------------

  private def dkDot(a: String, b: String): String =
    dkFold("0.0",
      s"list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))",
      "(x, y) -> x + y")

  /** Brute-force cosine top-k: 5 query vectors × corpus, broadcast
    * nested-loop on the tiny side; the exact-scan baseline ANN. */
  private val embTopk = QueryDef(
    "llm_similarity_topk",
    (s, d) => {
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      broadcast(q).join(c, col("qid") =!= col("nid"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("nid"), round(col("cos"), 4).as("cos"))
        .orderBy(col("qid"), col("rk"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id <= 4),
      c AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
      sc AS (
        SELECT qid, nid,
               ${dkDot("qv", "nv")} /
               (sqrt(${dkDot("qv", "qv")}) * sqrt(${dkDot("nv", "nv")})) AS cos
        FROM q, c WHERE qid <> nid),
      rk AS (
        SELECT qid, nid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
        FROM sc)
      SELECT qid, rk, nid, round(cos, 4) AS cos
      FROM rk WHERE rk <= 5
      ORDER BY qid, rk"""))

  /** k-NN label propagation: each unlabeled-treated query vector takes
    * the majority label of its 5 nearest labeled neighbors by cosine —
    * the embedding-space classifier bootstrap (label a corpus from a
    * small labeled seed set). Ordering uses the raw cosine (the
    * strict-fold kernel is bit-identical across engines — embTopk
    * precedent) with id tiebreaks, and the vote uses integer counts
    * with label tiebreak, so the prediction is fully deterministic.
    * Same broadcast-the-queries nested loop as the top-k baseline to
    * SCORE, but the top-5 selection is the k-bounded TopKAgg (map-side
    * combine keeps ≤5 rows per qid per partition), NOT a row_number
    * window — a window over the cross product would shuffle
    * |q|×|corpus| rows into one partition per qid, a straggler at
    * 100× corpus. Neighbor labels come from a second corpus scan
    * joined against the broadcast ≤|q|×5-row winner set; the vote
    * windows run over that k-bounded set only. */
  private val knnClassify = QueryDef(
    "llm_knn_classify",
    (s, d) => {
      import s.implicits._
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") < 25)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val t = e.filter(col("vec_id") >= 25)
        .select(col("vec_id").as("tid"), col("embedding").as("tv"), col("label"))
      val top5 = broadcast(q).crossJoin(t)
        .withColumn("cos", cosine(col("qv"), col("tv")))
        .select(col("qid"), col("tid"), col("cos"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, tid, cos) => graft.functions.TopK.Scored(tid, cos) }
        .agg(graft.functions.TopK.topK(5))
        .toDF("qid", "top")
        .select(col("qid"), explode(col("top.id")).as("tid"))
      val wV = Window.partitionBy(col("qid")).orderBy(col("votes").desc, col("label"))
      t.select(col("tid"), col("label"))
        .join(broadcast(top5), "tid")
        .groupBy(col("qid"), col("label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("vrk", row_number().over(wV))
        .filter(col("vrk") === 1)
        .select(col("qid"), col("label").as("pred_label"), col("votes"))
        .orderBy(col("qid"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 25),
      t AS (SELECT vec_id AS tid, embedding AS tv, label FROM embeddings WHERE vec_id >= 25),
      sc AS (
        SELECT qid, tid, label,
               ${dkDot("qv", "tv")} /
               (sqrt(${dkDot("qv", "qv")}) * sqrt(${dkDot("tv", "tv")})) AS cos
        FROM q, t),
      top5 AS (
        SELECT qid, label,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, tid) AS rk
        FROM sc),
      votes AS (
        SELECT qid, label, count(*) AS votes
        FROM top5 WHERE rk <= 5 GROUP BY 1, 2),
      best AS (
        SELECT qid, label, votes,
               row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS vrk
        FROM votes)
      SELECT qid, label AS pred_label, votes
      FROM best WHERE vrk = 1
      ORDER BY qid"""))

  /** Filtered vector search — the production ANN shape every vector
    * store must answer ("top-k neighbors WHERE label = X") and the
    * classic pre-vs-post-filter tradeoff: PRE-filtering restricts the
    * scan to predicate survivors and always returns k exact results;
    * POST-filtering takes the global (unfiltered) top-20 and keeps
    * matches, which at 10% selectivity usually returns FEWER than k —
    * the recall hole this query measures (`in_post20` = would
    * post-filtering have found this true neighbor?). Each of the 8
    * probes searches its own label's partition (qid excluded).
    * Determinism: ordering is raw cosine from the strict-fold kernel
    * (bit-identical across engines — embTopk precedent) with id
    * tiebreaks. Scale shape: the PRE side is a broadcast-probes HASH
    * join on label (the predicate reaches the scan as an equi key —
    * no nested loop over non-matching labels); both sides select via
    * the k-bounded TopKAgg (map-side combine, ≤k rows per partition
    * per qid — the llm_knn_classify discipline), never a window over
    * the cross product. */
  private val filteredAnn = QueryDef(
    "llm_filtered_ann",
    (s, d) => {
      import s.implicits._
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"),
        col("label").as("nlabel"))
      def top(pairs: DataFrame, k: Int): DataFrame = pairs
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .select(col("qid"), col("nid"), col("cos"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, nid, cos) => graft.functions.TopK.Scored(nid, cos) }
        .agg(graft.functions.TopK.topK(k))
        .toDF("qid", "top")
      val pre = top(broadcast(q).join(c,
          col("qlabel") === col("nlabel") && col("qid") =!= col("nid")), 5)
        .select(col("qid"), posexplode(col("top")).as(Seq("p", "sc")))
        .select(col("qid"), (col("p") + 1).as("rk"),
          col("sc.id").as("nid"), col("sc.score").as("cos"))
      val post20 = top(broadcast(q).join(c, col("qid") =!= col("nid")), 20)
        .select(col("qid"), explode(col("top.id")).as("nid"))
        .join(broadcast(q.select(col("qid"), col("qlabel"))), "qid")
        .join(c.select(col("nid"), col("nlabel")), "nid")
        .filter(col("qlabel") === col("nlabel"))
        .select(col("qid"), col("nid"), lit(1).as("in_post20"))
      pre.join(post20, Seq("qid", "nid"), "left_outer")
        .select(col("qid"), col("rk"), col("nid"),
          round(col("cos"), 4).as("cos"),
          coalesce(col("in_post20"), lit(0)).as("in_post20"))
        .orderBy(col("qid"), col("rk"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, label AS qlabel
        FROM embeddings WHERE vec_id < 8),
      c AS (
        SELECT vec_id AS nid, embedding AS nv, label AS nlabel
        FROM embeddings),
      pre AS (
        SELECT qid, nid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
                 AS rk
        FROM (
          SELECT qid, nid,
                 ${dkDot("qv", "nv")} /
                 (sqrt(${dkDot("qv", "qv")}) * sqrt(${dkDot("nv", "nv")}))
                   AS cos
          FROM q JOIN c ON qlabel = nlabel AND qid <> nid)),
      post20 AS (
        SELECT qid, nid, nlabel,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
                 AS rk
        FROM (
          SELECT qid, nid, nlabel, qlabel,
                 ${dkDot("qv", "nv")} /
                 (sqrt(${dkDot("qv", "qv")}) * sqrt(${dkDot("nv", "nv")}))
                   AS cos
          FROM q JOIN c ON qid <> nid)),
      postok AS (
        SELECT p.qid, p.nid
        FROM post20 p JOIN q ON q.qid = p.qid
        WHERE p.rk <= 20 AND p.nlabel = q.qlabel)
      SELECT pre.qid, pre.rk, pre.nid, round(pre.cos, 4) AS cos,
             CASE WHEN po.nid IS NOT NULL THEN 1 ELSE 0 END AS in_post20
      FROM pre LEFT JOIN postok po ON po.qid = pre.qid AND po.nid = pre.nid
      WHERE pre.rk <= 5
      ORDER BY pre.qid, pre.rk"""))

  /** Sign-LSH bucketing — the ANN scale path: 8 axis-aligned
    * hyperplane bits shard the corpus; pairwise work then happens only
    * within buckets. Output: bucket histogram. */
  private val embLshBuckets = QueryDef(
    "llm_similarity_lsh_buckets",
    (s, d) => {
      embeddings(s, d)
        .withColumn("bucket", signBucket(col("embedding"), 8))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("vec_id")).as("min_vec"),
          round(avg(col("label")), 4).as("avg_label"))
        .orderBy(col("bucket"))
    },
    Some {
      s"""
      SELECT (${dkSignBucket(8)}) AS bucket,
             count(*) AS n_vecs,
             min(vec_id) AS min_vec,
             round(avg(label), 4) AS avg_label
      FROM embeddings
      GROUP BY 1
      ORDER BY bucket"""
    })

  /** Embedding-cosine near-dup (the dedup flavor of ANN): candidate
    * pairs come ONLY from shared sign-LSH buckets (8 hyperplane bits
    * shard the corpus; the in-bucket self-join is tiny and local), the
    * 20 most-similar candidate pairs are reported. At 100 TB the
    * bucket count scales with the corpus (more bits) and the join
    * stays bucket-local — never all-pairs. */
  private val embNearDup = QueryDef(
    "llm_dedup_embedding",
    (s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), signBucket(col("embedding"), 8).as("bucket"))
      e.as("a").join(e.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", cosine(col("a.embedding"), col("b.embedding")))
        .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
          round(col("cos"), 4).as("cos"))
        .orderBy(col("cos").desc, col("d1"), col("d2"))
        .limit(20)
    },
    Some {
      s"""
      WITH e AS (SELECT vec_id, embedding, (${dkSignBucket(8)}) AS bucket FROM embeddings)
      SELECT a.vec_id AS d1, b.vec_id AS d2,
             round(${dkDot("a.embedding", "b.embedding")} /
               (sqrt(${dkDot("a.embedding", "a.embedding")}) *
                sqrt(${dkDot("b.embedding", "b.embedding")})), 4) AS cos
      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      ORDER BY cos DESC, d1, d2
      LIMIT 20"""
    })

  /** Incremental (cross-snapshot) exact dedup: the arriving batch is
    * checked against the EXISTING corpus, not against itself — the
    * shape every continuously-ingesting pipeline actually runs
    * (full-corpus re-dedup per batch would be quadratic in snapshots).
    * Arrivals = doc_id % 5 == 0 here; membership is by the 10-token
    * PREFIX fingerprint (the corpus has no byte-identical texts, but
    * shared openings exist — prefix keys are the standard cheap
    * incremental near-dup screen; full-content md5 is the degenerate
    * strict case). Scale shape: only 16-byte md5 keys shuffle, one
    * hash join of (arrivals × distinct corpus fingerprints); the
    * corpus side is the big one, so this stays a shuffle hash join
    * keyed by the digest — no broadcast of the corpus, no pairwise
    * work. */
  private val incrementalDedup = QueryDef(
    "llm_dedup_incremental",
    (s, d) => {
      def fp(c: Column) = md5(concat_ws(" ", slice(split(c, " "), 1, 10)))
      val docs = documents(s, d)
      val existing = docs.filter(col("doc_id") % 5 =!= 0)
        .select(fp(col("text")).as("content_hash")).distinct()
      val arrivals = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), fp(col("text")).as("content_hash"))
      arrivals.join(existing.withColumn("hit", lit(1)), Seq("content_hash"), "left_outer")
        .select(col("doc_id"),
          when(col("hit").isNull, lit(1)).otherwise(lit(0)).as("is_new"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH existing AS (
        SELECT DISTINCT md5(array_to_string(string_split(text, ' ')[1:10], ' ')) AS content_hash
        FROM documents WHERE doc_id % 5 <> 0),
      arrivals AS (
        SELECT doc_id, md5(array_to_string(string_split(text, ' ')[1:10], ' ')) AS content_hash
        FROM documents WHERE doc_id % 5 = 0)
      SELECT a.doc_id,
             CASE WHEN e.content_hash IS NULL THEN 1 ELSE 0 END AS is_new
      FROM arrivals a LEFT JOIN existing e USING (content_hash)
      ORDER BY a.doc_id"""))

  /** SemDeDup-style semantic corpus pruning (Abbas et al. 2023,
    * arXiv:2303.09540 — cluster the embedding space, then drop all
    * but one of each within-cluster near-duplicate group): every
    * vector gets a KEEP/DROP decision, the corpus-pruning output that
    * distinguishes this from llm_dedup_embedding's pair report. The
    * cluster here is the deterministic sign-LSH bucket (the k-means
    * flavor lives in llm_similarity_ivf_trained, whose centroids are
    * float-order-dependent and property-gated; the LSH quantizer
    * makes THIS decision set exactly reproducible in DuckDB, so the
    * whole keep/drop column hash-gates). Greedy smallest-id-wins
    * rule: a vector drops iff a smaller-id vector in its bucket has
    * cosine ≥ τ. τ = 0.35 sits below the in-bucket max (0.43 at the
    * sf0.01 gate scale) so both
    * branches execute. Pairs are bucket-local — never all-pairs. */
  private val semanticDedup = QueryDef(
    "llm_dedup_semantic",
    (s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), signBucket(col("embedding"), 8).as("bucket"))
      val dropped = e.as("a").join(e.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .filter(cosine(col("a.embedding"), col("b.embedding")) >= 0.35)
        .select(col("b.vec_id").as("vec_id")).distinct()
      e.select(col("vec_id"), col("bucket"))
        .join(dropped.withColumn("hit", lit(1)), Seq("vec_id"), "left_outer")
        .select(col("vec_id"), col("bucket"),
          when(col("hit").isNull, lit(1)).otherwise(lit(0)).as("kept"))
        .orderBy(col("vec_id"))
    },
    Some {
      s"""
      WITH e AS (SELECT vec_id, embedding, (${dkSignBucket(8)}) AS bucket FROM embeddings),
      drp AS (
        SELECT DISTINCT b.vec_id
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ${dkDot("a.embedding", "b.embedding")} /
              (sqrt(${dkDot("a.embedding", "a.embedding")}) *
               sqrt(${dkDot("b.embedding", "b.embedding")})) >= 0.35)
      SELECT e.vec_id, e.bucket,
             CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
      FROM e LEFT JOIN drp d ON e.vec_id = d.vec_id
      ORDER BY e.vec_id"""
    })

  /** Bucket-probe ANN (the LSH/IVF-style scale path to similarity
    * search): each query vector probes ONLY its own sign bucket —
    * candidates are the bucket's members, scored exactly, top-3 kept.
    * vs llm_similarity_topk (brute force over the corpus): this is
    * the same answer shape at a fraction of the scan, the classic
    * recall-for-throughput ANN trade. Queries broadcast; candidate
    * scan shuffles once on bucket id. */
  private val embAnnProbe = QueryDef(
    "llm_similarity_ann_probe",
    (s, d) => {
      val e = embeddings(s, d)
        .withColumn("bucket", signBucket(col("embedding"), 8))
      val q = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"), col("bucket"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      broadcast(q).join(c, Seq("bucket")).filter(col("qid") =!= col("nid"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"), round(col("cos"), 4).as("cos"))
        .orderBy(col("qid"), col("rk"))
    },
    Some {
      s"""
      WITH e AS (SELECT vec_id, embedding, (${dkSignBucket(8)}) AS bucket FROM embeddings),
      q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM e WHERE vec_id <= 4),
      c AS (SELECT vec_id AS nid, embedding AS nv, bucket FROM e),
      sc AS (
        SELECT qid, nid,
               ${dkDot("qv", "nv")} /
               (sqrt(${dkDot("qv", "qv")}) * sqrt(${dkDot("nv", "nv")})) AS cos
        FROM q JOIN c USING (bucket) WHERE qid <> nid),
      rk AS (
        SELECT qid, nid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
        FROM sc)
      SELECT qid, rk, nid, round(cos, 4) AS cos
      FROM rk WHERE rk <= 3
      ORDER BY qid, rk"""
    })

  /** IVF-style ANN: an inverted file over coarse cells. Every vector
    * is assigned to its nearest of 8 coarse centroids (here the first
    * 8 corpus vectors — a static quantizer; k-means training is a
    * pluggable upstream step that only changes the centroid table);
    * each query probes its nprobe=2 nearest cells and scores ONLY
    * their members exactly. At 100 TB the assignment is one broadcast
    * pass, cells are the partitioning key, and a probe touches
    * nprobe/k of the corpus — the IVF trade, next to the sign-LSH
    * variant (llm_similarity_ann_probe). All distances are strict
    * left-fold doubles so cell assignment ties can't diverge between
    * engines. */
  private val embIvf = QueryDef(
    "llm_similarity_ivf",
    (s, d) => {
      val e = embeddings(s, d)
      val cent = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      val assign = e.crossJoin(broadcast(cent))
        .withColumn("dist", l2sq(col("embedding"), col("cv")))
        .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
        .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("cid"))
      val wProbe = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
      val probes = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .crossJoin(broadcast(cent))
        .withColumn("dist", l2sq(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= 2)
        .select(col("qid"), col("qv"), col("cid"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      probes.join(assign, Seq("cid")).filter(col("qid") =!= col("nid"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"), round(col("cos"), 4).as("cos"))
        .orderBy(col("qid"), col("rk"))
    },
    Some {
      def dkL2(a: String, b: String): String =
        dkFold("0.0",
          s"list_transform(generate_series(1, len($a)), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))",
          "(x, y) -> x + y")
      s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
      assign AS (
        SELECT vec_id AS nid, embedding AS nv, cid FROM (
          SELECT e.vec_id, e.embedding, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dkL2("e.embedding", "c.cv")}, c.cid) AS rn
          FROM embeddings e CROSS JOIN cent c)
        WHERE rn = 1),
      probes AS (
        SELECT qid, qv, cid FROM (
          SELECT e.vec_id AS qid, e.embedding AS qv, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dkL2("e.embedding", "c.cv")}, c.cid) AS rn
          FROM embeddings e CROSS JOIN cent c
          WHERE e.vec_id <= 4)
        WHERE rn <= 2),
      sc AS (
        SELECT p.qid, a.nid,
               ${dkDot("p.qv", "a.nv")} /
               (sqrt(${dkDot("p.qv", "p.qv")}) * sqrt(${dkDot("a.nv", "a.nv")})) AS cos
        FROM probes p JOIN assign a USING (cid)
        WHERE p.qid <> a.nid),
      rk AS (
        SELECT qid, nid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
        FROM sc)
      SELECT qid, rk, nid, round(cos, 4) AS cos
      FROM rk WHERE rk <= 3
      ORDER BY qid, rk"""
    })

  /** End-to-end TRAINED IVF (graft.operators.Ivf: deterministic
    * k-means train → inverted-file assign → nprobe cell probe), gated
    * as a property oracle. Centroid means are order-of-summation
    * floating point, so a bit-identical cross-engine k-means is not a
    * sound gate (the sketch-query precedent, kdb_approx_distinct);
    * what IS deterministic is the operator's contract, and that's
    * what the oracle pins per query: the probe returns a FULL top-5
    * result set from its nprobe=2 cells, and the trained index's
    * recall against the exact brute-force top-5 clears threshold
    * (observed 3-5/5 across sf0.001/0.01/0.1; gated at ≥2 to keep one
    * hit of ulp slack below the observed minimum). Exactness of the
    * probe math itself is pinned separately:
    * IvfSpec proves probe-all ≡ brute force, and llm_similarity_ivf
    * hash-gates the same probe pipeline under a static quantizer. */
  private val embIvfTrained = QueryDef(
    "llm_similarity_ivf_trained",
    (s, d) => {
      import graft.operators.Ivf
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cent = Ivf.train(e, k = 4, iters = 2)
      val inv = Ivf.assign(e, cent)
      val q = e.filter(col("vec_id") <= 4)
      val ivfTop = Ivf.probe(inv, cent, q, nprobe = 2, topk = 5)
      val qq = q.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val corpus = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val wEx = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      val exact = broadcast(qq).join(corpus, col("qid") =!= col("nid"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(wEx)).filter(col("rk") <= 5)
        .select(col("qid"), col("nid"))
      val hits = ivfTop.select(col("qid"), col("nid"))
        .join(exact, Seq("qid", "nid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
      ivfTop.groupBy(col("qid")).agg(count(lit(1)).as("n_results"))
        .join(hits, Seq("qid"), "left_outer")
        .select(col("qid"), col("n_results"),
          when(coalesce(col("n_hits"), lit(0L)) >= 2, lit(1)).otherwise(lit(0))
            .as("recall2_ok"))
        .orderBy(col("qid"))
    },
    Some("""
      SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, 1 AS recall2_ok
      FROM embeddings WHERE vec_id <= 4
      ORDER BY qid"""))

  /** Persisted-index lifecycle twin (Engine.buildVectorIndex /
    * annSearch — the verb set behind a build-once/probe-many 100 TB
    * ANN deployment): ingest the embeddings table as vector payloads
    * (64 float32s = 256-byte payloads through the ordinary Put path),
    * BUILD the stored IVF index, REOPEN the engine from disk, and
    * probe the STORED index — then prove the storage lifecycle is
    * result-invariant by recomputing the same probe from the stored
    * centroids with the in-memory operators (Ivf.assign + a probe
    * with annSearch's exact tie rule: cos desc, key-string asc) and
    * comparing (neighbor, cosine) pairs EXACTLY per rank. Parquet
    * round-trips float32/float64 bit-exactly and every distance is a
    * strict-fold kernel, so any mismatch is a real lifecycle bug
    * (wrong cell directory read, stale delta, tombstone misapplied),
    * never float noise. self_top1 pins the retrieval sanity property
    * (a corpus member's nearest neighbor is itself). k-means centroid
    * VALUES are order-of-summation floats and are deliberately not
    * gated (the llm_similarity_ivf_trained property-oracle
    * precedent) — both probe paths consume the SAME stored centroids,
    * which is what makes this gate exact. */
  /** Shared ingest for the persisted-index twins: the embeddings
    * table written into a scratch engine as 256-byte float32 payloads
    * (dim 64) through the ordinary Put path — tag0 = vec_id string,
    * seq = vec_id, slot = id mod 80000 s (series identity is the TAG;
    * bounding the slot keeps arbitrarily large ids — scale-curve
    * replicas shift them by ~10^12 — inside the hot window instead of
    * silently rejecting as future writes). Returns (engine, opts,
    * clock) so a twin can REOPEN from disk. */
  private def vectorEngine(s: SparkSession, d: String, db: String,
      corpusMod: Long = 1L)
      : (graft.core.Engine, graft.core.EngineOptions, graft.core.TestClock) = {
    import s.implicits._
    val T0v = 1600000000L * 1000000000L
    val dir = graft.core.Scratch.dir(s"graft-$db")
    val opts = graft.core.EngineOptions(db, dir, indexDepth = 1,
      payloadSize = 256, bucketDuration = 86400L * 1000000000L,
      resolution = 1000000000L, maxHotBuckets = 40)
    val clock = new graft.core.TestClock(T0v + 86000L * 1000000000L)
    val engine = new graft.core.Engine(s, opts, clock)
    // corpusMod > 1 ingests every corpusMod-th vector: gates whose
    // strength is setting-structural (recall invariants, tuner order,
    // serve≡batch) don't need the full corpus paying the k-means/PQ
    // build per bench pass — the SUBSET is still thousands of rows
    val pts = embeddings(s, d).select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") % corpusMod === 0)
      .as[(Long, Seq[Float])]
      .map { case (id, v) =>
        graft.core.Point(T0v + (id % 80000L) * 1000000000L, Seq(id.toString),
          graft.plans.FloatsFromPayload.encode(v), id)
      }
    engine.put(pts.toDF())
    (engine, opts, clock)
  }

  private val annIndexTwin = QueryDef(
    "llm_ann_index_twin",
    (s, d) => {
      import graft.operators.Ivf
      val (engine, opts, clock) = vectorEngine(s, d, "anntwin")
      engine.buildVectorIndex(k = 4, iters = 2)
      val reopened = new graft.core.Engine(s, opts, clock)
      val q = embeddings(s, d).filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val stored = reopened.annSearch(q, nprobe = 2, topk = 5)
        .select(col("qid"), col("rk"), col("tag0").as("s_nid"),
          col("cos").as("s_cos"))
      val cent = reopened.vectorIndexCentroids()
      val corpus = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val inv = Ivf.assign(corpus, cent)
        .select(col("vec_id").cast("string").as("f_nid"),
          col("embedding").as("nv"), col("cid"))
      val wProbe = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
      val probed = q.crossJoin(broadcast(cent))
        .withColumn("dist", l2sq(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= 2)
        .select(col("qid"), col("qv"), col("cid"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("f_cos").desc, col("f_nid"))
      val fresh = probed.join(inv, Seq("cid"))
        .withColumn("f_cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("f_nid"), col("f_cos"))
      stored.join(fresh, Seq("qid", "rk"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_results"),
          count(when(col("s_nid") === col("f_nid") &&
            col("s_cos") === col("f_cos"), 1)).as("n_eq"),
          count(when(col("rk") === 1 &&
            col("s_nid") === col("qid").cast("string"), 1)).as("n_self"))
        .select(col("qid"), col("n_results"),
          when(col("n_eq") === col("n_results"), lit(1)).otherwise(lit(0)).as("eq_ok"),
          when(col("n_self") === 1, lit(1)).otherwise(lit(0)).as("self_top1"))
        .orderBy(col("qid"))
    },
    Some("""
      SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results,
             1 AS eq_ok, 1 AS self_top1
      FROM embeddings WHERE vec_id <= 4
      ORDER BY qid"""))

  /** PQ (ADC) tier of the persisted index, lifecycle-gated like
    * [[annIndexTwin]]: build with PqParams(8, 16, 2) (dim 64 → 8
    * subspaces of 8), REOPEN from disk, probe via annSearchAdc —
    * which reads ONLY the stored m-code column — and prove the
    * storage lifecycle is result-invariant against an in-memory
    * comparator built from the SAME stored codebooks: (a) every
    * stored code row equals an independent operators/Pq.encode of the
    * raw embeddings (codes_ok), and (b) the per-rank (neighbor, adc)
    * pairs match EXACTLY (eq_ok) — both paths decode codes to their
    * codebook reconstruction and rank by the strict-fold
    * l2_sq(query, reconstruction) with the same (adc, key-string)
    * tie rule, so every float op happens in the same IEEE order on
    * bit-identical inputs. Codebook VALUES are order-of-summation
    * k-means floats and are not gated (ivf_trained precedent); both
    * sides consume the stored ones, which makes the gate exact. */
  private val annPqTwin = QueryDef(
    "llm_ann_pq_twin",
    (s, d) => {
      import graft.operators.{Ivf, Pq}
      val (engine, opts, clock) = vectorEngine(s, d, "annpqtwin")
      engine.buildVectorIndex(k = 4, iters = 2,
        pq = Some(graft.core.PqParams(m = 8, k = 16, iters = 1)))
      val reopened = new graft.core.Engine(s, opts, clock)
      val q = embeddings(s, d).filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val stored = reopened.annSearchAdc(q, nprobe = 2, topk = 5)
        .select(col("qid"), col("rk"), col("tag0").as("s_nid"),
          col("adc").as("s_adc"))
      val cent = reopened.vectorIndexCentroids()
      val books = reopened.vectorIndexPqBooks()
      val corpus = embeddings(s, d).select(col("vec_id"), col("embedding"))
      // independent re-encode from raw vectors + stored books
      val freshCodes = Pq.encode(corpus, books, m = 8, dim = 64)
      val storedCodes = reopened.vectorIndexInverted()
        .select(col("tag0"), col("codes").as("s_codes"))
      val codeMismatch = freshCodes
        .select(col("vec_id").cast("string").as("tag0"), col("codes"))
        .join(storedCodes, Seq("tag0"), "full_outer")
        .agg(count(when(col("codes").isNull || col("s_codes").isNull ||
          col("codes") =!= col("s_codes"), 1)).as("n_code_mismatch"))
      // fresh probe: same stored centroids/books, annSearchAdc's exact
      // decode + tie rule, over the fresh codes
      val recon = freshCodes
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
        .join(broadcast(books.select(col("sub"), col("cid").as("code"), col("cv"))),
          Seq("sub", "code"))
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("sub"), col("cv")))).as("parts"))
        .select(col("vec_id"),
          flatten(transform(col("parts"), p => p.getField("cv"))).as("recon"))
      val cells = Ivf.assign(corpus, cent).select(col("vec_id"), col("cid"))
      val wProbe = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
      val probed = q.crossJoin(broadcast(cent))
        .withColumn("dist", l2sq(col("qv"), col("cv")))
        .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= 2)
        .select(col("qid"), col("qv"), col("cid"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("f_adc"), col("f_nid"))
      val fresh = probed.join(cells.join(recon, "vec_id"), Seq("cid"))
        .withColumn("f_nid", col("vec_id").cast("string"))
        .withColumn("f_adc", l2sq(col("qv"), col("recon")))
        .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("f_nid"), col("f_adc"))
      stored.join(fresh, Seq("qid", "rk"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_results"),
          count(when(col("s_nid") === col("f_nid") &&
            col("s_adc") === col("f_adc"), 1)).as("n_eq"))
        .crossJoin(broadcast(codeMismatch))
        .select(col("qid"), col("n_results"),
          when(col("n_eq") === col("n_results"), lit(1)).otherwise(lit(0)).as("eq_ok"),
          when(col("n_code_mismatch") === 0, lit(1)).otherwise(lit(0)).as("codes_ok"))
        .orderBy(col("qid"))
    },
    Some("""
      SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results,
             1 AS eq_ok, 1 AS codes_ok
      FROM embeddings WHERE vec_id <= 4
      ORDER BY qid"""))

  /** Index-health report (Engine.vectorIndexStats — per-cell live
    * population + integer-microunit quantization error, the re-train
    * monitor). Gate: the report computed from the STORED index equals
    * an independent in-memory recomputation (Ivf.assign of the raw
    * corpus against the stored centroids, the same strict-fold l2 and
    * the same round-to-micro integerization) cell for cell — the
    * stored (vec, cid) pairs and the integer error sums must both be
    * exactly reproducible, or the report would drift from what the
    * probes actually serve. */
  private val annStatsTwin = QueryDef(
    "llm_ann_stats_twin",
    (s, d) => {
      import graft.operators.Ivf
      val (engine, opts, clock) = vectorEngine(s, d, "annstats")
      engine.buildVectorIndex(k = 4, iters = 2)
      val reopened = new graft.core.Engine(s, opts, clock)
      val stored = reopened.vectorIndexStats()
        .select(col("cid"), col("n_rows").as("s_n"), col("qerr_sum_1e6").as("s_qe"))
      val cent = reopened.vectorIndexCentroids()
      val corpus = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val fresh = Ivf.assign(corpus, cent)
        .join(broadcast(cent), "cid") // re-attach cv (assign drops it)
        .withColumn("__qe", round(l2sq(col("embedding"), col("cv")) * 1e6).cast("long"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("f_n"), sum(col("__qe")).as("f_qe"))
      stored.join(fresh, Seq("cid"), "full_outer")
        .agg(
          count(lit(1)).as("n_cells"),
          count(when(col("s_n") === col("f_n"), 1)).as("n_cells_match"),
          coalesce(sum(col("s_n")), lit(0L)).as("total_rows"),
          count(when(col("s_qe").isNull || col("f_qe").isNull ||
            col("s_qe") =!= col("f_qe"), 1)).as("qerr_mismatch"))
    },
    Some("""
      SELECT CAST(4 AS BIGINT) AS n_cells, CAST(4 AS BIGINT) AS n_cells_match,
             (SELECT count(*) FROM embeddings) AS total_rows,
             CAST(0 AS BIGINT) AS qerr_mismatch"""))

  /** Two-stage retrieval (Engine.annSearchRerank — IVFADC with exact
    * re-ranking): stage 1 reads ONLY the stored m-code column to
    * shortlist candidates by ADC distance, stage 2 fetches exact
    * vectors for shortlisted keys alone (static cid + slot_ns IN
    * pruning) and re-ranks by true cosine. Gate: with a shortlist
    * covering the probed cells the rerank must equal [[annIndexTwin]]'s
    * exact probe BIT-FOR-BIT per rank (same stored floats, same
    * cosine kernel, same tie rule), and a topk-sized shortlist must
    * still return exactly topk rows per query. */
  private val annRerankTwin = QueryDef(
    "llm_ann_rerank_twin",
    (s, d) => {
      val (engine, opts, clock) = vectorEngine(s, d, "annrr")
      engine.buildVectorIndex(k = 4, iters = 2,
        pq = Some(graft.core.PqParams(m = 8, k = 16, iters = 1)))
      val reopened = new graft.core.Engine(s, opts, clock)
      val q = embeddings(s, d).filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val rr = reopened.annSearchRerank(q, nprobe = 2, topk = 5, shortlist = 1 << 20)
        .select(col("qid"), col("rk"), col("tag0").as("r_nid"),
          col("cos").as("r_cos"))
      val ex = reopened.annSearch(q, nprobe = 2, topk = 5)
        .select(col("qid"), col("rk"), col("tag0").as("e_nid"),
          col("cos").as("e_cos"))
      val small = reopened.annSearchRerank(q, nprobe = 2, topk = 5, shortlist = 5)
        .groupBy(col("qid")).agg(count(lit(1)).as("n_small"))
      ex.join(rr, Seq("qid", "rk"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_results"),
          count(when(col("r_nid") === col("e_nid") &&
            col("r_cos") === col("e_cos"), 1)).as("n_eq"))
        .join(small, Seq("qid"))
        .select(col("qid"), col("n_results"),
          when(col("n_eq") === col("n_results"), lit(1)).otherwise(lit(0)).as("eq_ok"),
          col("n_small"))
        .orderBy(col("qid"))
    },
    Some("""
      SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, 1 AS eq_ok,
             CAST(5 AS BIGINT) AS n_small
      FROM embeddings WHERE vec_id <= 4
      ORDER BY qid"""))

  /** SQL doorway of the stored index (Engine.annSqlView — the sqlView
    * analog): probes registered as a temp view, index content as
    * `<name>_vectors`, both reachable from plain spark.sql. Gated as
    * stored-probe-via-SQL ≡ annSearch DataFrame: both paths run the
    * identical probe plan on the identical stored bytes, so (neighbor,
    * cos) pairs must match BIT-EXACTLY per rank (eq_ok), and the
    * registered index view must expose exactly the corpus
    * (n_indexed). */
  private val annSqlTwin = QueryDef(
    "llm_ann_sql_twin",
    (s, d) => {
      val (engine, opts, clock) = vectorEngine(s, d, "annsql")
      engine.buildVectorIndex(k = 4, iters = 2)
      val reopened = new graft.core.Engine(s, opts, clock)
      val q = embeddings(s, d).filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      reopened.annSqlView("graft_ann_sql_twin", q, nprobe = 2, topk = 5)
      val viaSql = s.sql(
        "SELECT qid, rk, tag0 AS v_nid, cos AS v_cos FROM graft_ann_sql_twin")
      val direct = reopened.annSearch(q, nprobe = 2, topk = 5)
        .select(col("qid"), col("rk"), col("tag0").as("d_nid"),
          col("cos").as("d_cos"))
      val nIndexed = s.sql(
        "SELECT count(*) AS n_indexed FROM graft_ann_sql_twin_vectors")
      direct.join(viaSql, Seq("qid", "rk"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_results"),
          count(when(col("v_nid") === col("d_nid") &&
            col("v_cos") === col("d_cos"), 1)).as("n_eq"))
        .crossJoin(broadcast(nIndexed))
        .select(col("qid"), col("n_results"),
          when(col("n_eq") === col("n_results"), lit(1)).otherwise(lit(0)).as("eq_ok"),
          col("n_indexed"))
        .orderBy(col("qid"))
    },
    Some("""
      SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, 1 AS eq_ok,
             (SELECT count(*) FROM embeddings) AS n_indexed
      FROM embeddings WHERE vec_id <= 4
      ORDER BY qid"""))

  /** Recall@k harness (Engine.annRecallReport) at PRODUCTION
    * approximation settings — nprobe below the cell count, shortlist
    * near topk — where the bit-exact twins above (which pin exhaustive
    * settings) say nothing about retrieval quality. The recall values
    * themselves are data-dependent statistics the user reads from the
    * report; the GATE pins the harness's invariants, which are exact
    * by construction: hits bounded by possible, recall monotone
    * non-decreasing in nprobe (a superset of probed cells can only
    * add candidates ranking below a surviving true top-k member), and
    * an all-cells probe — exact-vector or full-shortlist rerank —
    * recovering the brute-force top-k EXACTLY (hits == possible, the
    * strong internal-consistency check that the harness's ground
    * truth and the serving path rank with the identical cosine fold
    * and tie rule). */
  private val annRecallTwin = QueryDef(
    "llm_ann_recall_twin",
    (s, d) => {
      val (engine, opts, clock) = vectorEngine(s, d, "annrec", corpusMod = 4)
      engine.buildVectorIndex(k = 4, iters = 2,
        pq = Some(graft.core.PqParams(m = 8, k = 16, iters = 1)))
      val reopened = new graft.core.Engine(s, opts, clock)
      val q = embeddings(s, d).filter(col("vec_id") <= 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val settings = Seq((1, 0), (2, 0), (4, 0), (2, 12), (4, 1 << 20))
      val rep = reopened.annRecallReport(q, topk = 5, settings = settings)
        .collect()
        .map(r => (r.getInt(1), r.getInt(2)) ->
          (r.getString(0), r.getLong(3), r.getInt(4), r.getLong(5), r.getLong(6)))
        .toMap
      val ivfHits = Seq(1, 2, 4).map(np => rep((np, 0))._4)
      val monoOk = if (ivfHits == ivfHits.sorted) 1 else 0
      val out = settings.zipWithIndex.map { case ((np, sl), ix) =>
        val (tier, nq, tk, hits, poss) = rep((np, sl))
        val probesAll = np == 4 && (sl == 0 || sl >= poss)
        (ix, tier, np, sl, nq, tk, poss,
          if (hits >= 0L && hits <= poss) 1 else 0,
          monoOk,
          if (!probesAll || hits == poss) 1 else 0)
      }
      s.createDataFrame(out).toDF("setting_ix", "tier", "nprobe",
        "shortlist", "n_queries", "topk", "possible", "bounds_ok",
        "mono_ok", "full_ok").orderBy(col("setting_ix"))
    },
    Some("""
      SELECT setting_ix, tier, nprobe, shortlist,
             CAST(8 AS BIGINT) AS n_queries, 5 AS topk,
             CAST(40 AS BIGINT) AS possible,
             1 AS bounds_ok, 1 AS mono_ok, 1 AS full_ok
      FROM (VALUES (0,'ivf',1,0), (1,'ivf',2,0), (2,'ivf',4,0),
                   (3,'rerank',2,12), (4,'rerank',4,1048576))
        AS t(setting_ix, tier, nprobe, shortlist)
      ORDER BY setting_ix"""))

  /** nprobe auto-tuner (Engine.annTuneNprobe — the operational face
    * of the recall harness: state a recall target, get the cheapest
    * probe width meeting it). The chosen widths are data-dependent;
    * the GATE pins what is exact by construction: chosen widths lie
    * in [1, cells], a lower target never needs a wider probe than a
    * higher one, and the width chosen for a 100% target really
    * recovers the brute-force top-k in full (hits == possible when
    * re-measured at exactly that width). */
  private val annTuneTwin = QueryDef(
    "llm_ann_tune_twin",
    (s, d) => {
      val (engine, opts, clock) = vectorEngine(s, d, "anntune", corpusMod = 4)
      engine.buildVectorIndex(k = 4, iters = 2)
      val reopened = new graft.core.Engine(s, opts, clock)
      val q = embeddings(s, d).filter(col("vec_id") <= 7)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val lo = reopened.annTuneNprobe(q, topk = 5, targetRecallPct = 50.0)
      val hi = reopened.annTuneNprobe(q, topk = 5, targetRecallPct = 100.0)
      val at = reopened.annRecallReport(q, topk = 5, settings = Seq((hi, 0)))
        .select(col("hits"), col("possible")).collect().head
      s.createDataFrame(Seq((
        if (lo >= 1 && lo <= 4) 1 else 0,
        if (hi >= 1 && hi <= 4) 1 else 0,
        if (lo <= hi) 1 else 0,
        if (at.getLong(0) == at.getLong(1)) 1 else 0)))
        .toDF("lo_in_range", "hi_in_range", "order_ok", "target_met")
    },
    Some("SELECT 1 AS lo_in_range, 1 AS hi_in_range, 1 AS order_ok, 1 AS target_met"))

  // ---------------------------------------------------------------
  // Multimodal binary plumbing
  // ---------------------------------------------------------------

  /** Multimodal columns: opaque binary payloads + typed metadata. The
    * decode step is a deterministic stub (no image/audio libs in this
    * container — see graft.multimodal.Multimodal for the real
    * mapPartitions plumbing); the Spark-side schema, binary handling
    * and metadata derivation are real. */
  private val multimodalMeta = QueryDef(
    "llm_multimodal_meta",
    (s, d) => {
      val bin = col("text").cast("binary")
      documents(s, d)
        .select(col("doc_id"),
          octet_length(bin).as("n_bytes"),
          md5(bin).as("content_md5"),
          (hash60(col("text")) % 640).as("fake_width"),
          (hash60(col("text")) % 480).as("fake_height"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS content_md5,
             ('0x' || substr(md5(text), 1, 15))::BIGINT % 640 AS fake_width,
             ('0x' || substr(md5(text), 1, 15))::BIGINT % 480 AS fake_height
      FROM documents ORDER BY doc_id"""))

  /** Frame sampling, declarative twin of Multimodal.sampleFrames
    * (which carries the mapPartitions/codec-stub shape; spec-verified
    * in MultimodalSpec): every 5th frame of each fake video as
    * (doc_id, frame_no, byte_offset) — the 1→k flatMap a real frame
    * extractor does, here as explode(sequence(...)) so Catalyst sees
    * through it. Frame count is pseudo-metadata from the md5-derived
    * hash60 (the SQL-renderable stand-in for a codec probe; the
    * Dataset twin uses fnv64). Row fan-out ∝ frames sampled, offsets
    * are positional (frame stride 4096), nothing shuffles until the
    * final order for the gate. */
  private val multimodalFrames = QueryDef(
    "llm_multimodal_frames",
    (s, d) => {
      val nFrames = (hash60(col("text")) % 300 + 1).cast("int")
      documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"), nFrames.as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_no"))
        .select(col("doc_id"), col("n_frames"), col("frame_no"),
          (col("frame_no").cast("long") * 4096L).as("byte_offset"))
        .orderBy(col("doc_id"), col("frame_no"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 300 + 1 AS INTEGER) AS n_frames
        FROM documents WHERE doc_id < 100)
      SELECT doc_id, n_frames,
             CAST(unnest(generate_series(0, n_frames - 1, 5)) AS INTEGER) AS frame_no,
             CAST(unnest(generate_series(0, n_frames - 1, 5)) AS BIGINT) * 4096 AS byte_offset
      FROM m
      ORDER BY doc_id, frame_no"""))

  /** Product-quantization ANN, the memory-scale path: 8 subspaces ×
    * 16-entry k-means codebooks compress each 64-float embedding to 8
    * codes (32× smaller — what makes a 100 TB embedding corpus
    * scannable), ADC top-50 shortlists per query from code lookups
    * alone, and an exact cosine re-rank of the shortlist yields the
    * final top-5 — the standard shortlist+rerank production shape.
    * Property oracle (the ivf_trained precedent: k-means means are
    * float-order sensitive, so hashes can't cross engines): each
    * query must recover ≥2 of its exact brute-force top-5 (measured
    * ≥3 at both gate SFs — margin 1). Scale shape: training collects
    * only m·k centroid rows per iteration; search never touches a
    * corpus vector — the |q|·m·k distance table broadcasts and ADC
    * sums partial-aggregate map-side; only the 50-row-per-query
    * shortlist joins back to real vectors for the re-rank. */
  private val similarityPq = QueryDef(
    "llm_similarity_pq",
    (s, d) => {
      val emb = embeddings(s, d)
      val books = graft.operators.Pq.train(emb, 8, 64, 16, 2)
      val enc = graft.operators.Pq.encode(emb, books, 8, 64)
      val qs = emb.filter(col("vec_id") <= 4)
      val short = graft.operators.Pq.search(enc, books, qs, 8, 64, 50)
      val wRe = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      val reranked = short.select(col("qid"), col("nid"))
        .join(broadcast(qs.select(col("vec_id").as("qid"), col("embedding").as("qv"))), Seq("qid"))
        .join(emb.select(col("vec_id").as("nid"), col("embedding").as("nv")), Seq("nid"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(wRe)).filter(col("rk") <= 5)
      val wEx = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      val exact = broadcast(qs.select(col("vec_id").as("qid"), col("embedding").as("qv")))
        .crossJoin(emb.select(col("vec_id").as("nid"), col("embedding").as("nv")))
        .filter(col("qid") =!= col("nid"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(wEx)).filter(col("rk") <= 5)
        .select(col("qid"), col("nid"))
      val hits = reranked.select(col("qid"), col("nid"))
        .join(exact, Seq("qid", "nid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
      reranked.groupBy(col("qid")).agg(count(lit(1)).as("n_results"))
        .join(hits, Seq("qid"), "left_outer")
        .select(col("qid"), col("n_results"),
          when(coalesce(col("n_hits"), lit(0L)) >= 2, lit(1)).otherwise(lit(0))
            .as("recall2_ok"))
        .orderBy(col("qid"))
    },
    Some("""
      SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, 1 AS recall2_ok
      FROM embeddings WHERE vec_id <= 4
      ORDER BY qid"""))

  /** Multimodal feature extraction, oracle-gated end to end: runs the
    * REAL byte-statistics kernel (Multimodal.featureKernel via the
    * typed mapPartitions path — 4-bin byte histogram + mean/std/
    * entropy/log-length, dim 8) over document payload bytes, and
    * gates it two ways: (1) a declarative double-precision twin of
    * the same statistics built from exact integer Σ/Σ²/bin-count
    * folds (the kdb_lead_lag_corr precedent — int sums then one
    * double expression, identical across engines), hash-gated at
    * 6dp; (2) a kernel_close property flag asserting the float32
    * kernel agrees with the double twin within 1e-4 on every
    * component. Scale shape: both branches are per-row lambdas over
    * one scan each, joined on doc_id (broadcast-sized at gate scale;
    * co-partitioned by the scan at 100 TB); nothing shuffles until
    * the final order. Texts are ASCII (driver corpus), so DuckDB's
    * per-char unicode() equals the UTF-8 byte the kernel sees. */
  private val multimodalFeatures = QueryDef(
    "llm_multimodal_features",
    (s, d) => {
      // exclude payloads that parse as REAL media (a text beginning
      // "P6 ..." IS a valid PPM): the kernel correctly featurizes
      // those over decoded pixels, which the byte-statistics twin
      // deliberately does not model — same predicate in the oracle
      val docs = documents(s, d)
        .filter(length(col("text")) > 0 && !col("text").startsWith("P6"))
      val kern = graft.multimodal.Multimodal
        .extractFeatures(graft.multimodal.Multimodal.fromDocuments(s, docs), 8)
        .toDF().select(col("media_id").as("doc_id"), col("feature"))
      val twin = docs
        .withColumn("bs", expr("transform(split(text, ''), c -> ascii(c))"))
        .withColumn("n", size(col("bs")))
        .withColumn("c0", expr("size(filter(bs, x -> x div 64 = 0))"))
        .withColumn("c1", expr("size(filter(bs, x -> x div 64 = 1))"))
        .withColumn("c2", expr("size(filter(bs, x -> x div 64 = 2))"))
        .withColumn("c3", expr("size(filter(bs, x -> x div 64 = 3))"))
        .withColumn("sb", expr("aggregate(bs, 0L, (a, x) -> a + x)"))
        .withColumn("sb2", expr("aggregate(bs, 0L, (a, x) -> a + x * x)"))
        .withColumn("f0", col("c0").cast("double") / col("n"))
        .withColumn("f1", col("c1").cast("double") / col("n"))
        .withColumn("f2", col("c2").cast("double") / col("n"))
        .withColumn("f3", col("c3").cast("double") / col("n"))
        .withColumn("mean_b", col("sb").cast("double") / col("n"))
        .withColumn("f4", col("mean_b") / 255.0)
        .withColumn("f5",
          sqrt(greatest(col("sb2").cast("double") / col("n") -
            col("mean_b") * col("mean_b"), lit(0.0))) / 255.0)
        .withColumn("f6",
          -(Seq("f0", "f1", "f2", "f3").map(f =>
            when(col(f) > 0, col(f) * log(col(f))).otherwise(lit(0.0)))
            .reduce(_ + _)) / math.log(4.0))
        .withColumn("f7", log(col("n").cast("double") + 1.0) / 32.0)
      val diffs = (0 until 8).map(i =>
        abs(element_at(col("feature"), i + 1).cast("double") - col(s"f$i")))
      twin.join(kern, "doc_id")
        .select(col("doc_id") +: col("n").as("n_bytes") +:
          (0 until 8).map(i => (round(col(s"f$i"), 6) + lit(0.0)).as(s"feat$i")) :+
          when(diffs.reduce(greatest(_, _)) < 1e-4, 1).otherwise(0)
            .as("kernel_close"): _*)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH b AS (
        SELECT doc_id,
               list_transform(string_split(text, ''), c -> unicode(c)) AS bs,
               length(text) AS n
        FROM documents
        WHERE length(text) > 0 AND text NOT LIKE 'P6%'),
      f AS (
        SELECT doc_id, n,
               len(list_filter(bs, x -> x // 64 = 0)) AS c0,
               len(list_filter(bs, x -> x // 64 = 1)) AS c1,
               len(list_filter(bs, x -> x // 64 = 2)) AS c2,
               len(list_filter(bs, x -> x // 64 = 3)) AS c3,
               CAST(list_aggregate(bs, 'sum') AS BIGINT) AS sb,
               CAST(list_aggregate(list_transform(bs, x -> x * x), 'sum') AS BIGINT) AS sb2
        FROM b),
      g AS (
        SELECT doc_id, n,
               CAST(c0 AS DOUBLE) / n AS f0, CAST(c1 AS DOUBLE) / n AS f1,
               CAST(c2 AS DOUBLE) / n AS f2, CAST(c3 AS DOUBLE) / n AS f3,
               CAST(sb AS DOUBLE) / n AS mean_b,
               CAST(sb2 AS DOUBLE) / n AS m2
        FROM f)
      SELECT doc_id, CAST(n AS INTEGER) AS n_bytes,
             round(f0, 6) + 0.0 AS feat0, round(f1, 6) + 0.0 AS feat1,
             round(f2, 6) + 0.0 AS feat2, round(f3, 6) + 0.0 AS feat3,
             round(mean_b / 255.0, 6) + 0.0 AS feat4,
             round(sqrt(greatest(m2 - mean_b * mean_b, 0.0)) / 255.0, 6) + 0.0 AS feat5,
             round(-(CASE WHEN f0 > 0 THEN f0 * ln(f0) ELSE 0.0 END +
                     CASE WHEN f1 > 0 THEN f1 * ln(f1) ELSE 0.0 END +
                     CASE WHEN f2 > 0 THEN f2 * ln(f2) ELSE 0.0 END +
                     CASE WHEN f3 > 0 THEN f3 * ln(f3) ELSE 0.0 END) / ln(4.0), 6)
               + 0.0 AS feat6,
             round(ln(CAST(n AS DOUBLE) + 1.0) / 32.0, 6) + 0.0 AS feat7,
             1 AS kernel_close
      FROM g ORDER BY doc_id"""))

  /** Embedding-quality audit: per-label L2-norm distribution (min /
    * max / mean) and the count of unit-norm rows — the data-quality
    * pass that catches an unnormalized or zero-vector batch BEFORE it
    * poisons cosine similarity downstream. One narrow scan (norms per
    * row via the same strict left-fold both engines share), one
    * partial-agg shuffle on the label key; min/max are order-free,
    * and the mean is rounded well above fold-order ulps. */
  private val embNormAudit = QueryDef(
    "llm_embedding_norm_audit",
    (s, d) => {
      val nrm = sqrt(normSq(col("embedding")))
      embeddings(s, d)
        .select(col("label"), nrm.as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(min(col("nrm")), 4).as("min_norm"),
          round(max(col("nrm")), 4).as("max_norm"),
          round(avg(col("nrm")), 4).as("avg_norm"),
          count(when(abs(col("nrm") - 1.0) < 0.01, 1)).as("n_unit"))
        .orderBy(col("label"))
    },
    Some(s"""
      WITH n AS (
        SELECT label, sqrt(${dkDot("embedding", "embedding")}) AS nrm
        FROM embeddings)
      SELECT label, count(*) AS n,
             round(min(nrm), 4) AS min_norm,
             round(max(nrm), 4) AS max_norm,
             round(avg(nrm), 4) AS avg_norm,
             count(CASE WHEN abs(nrm - 1.0) < 0.01 THEN 1 END) AS n_unit
      FROM n GROUP BY 1 ORDER BY label"""))

  /** Corpus length distribution: exact token-count percentiles per
    * language — the truncation-budget read (what max_seq_len keeps
    * 99% of docs intact per lang) every tokenization pipeline runs
    * before packing. Token counts are ints, so the only float is the
    * interpolated quantile, rounded. Per-group exact-percentile state
    * is one lang's counts — bounded, the same feasibility argument as
    * the daily bands. */
  private val lengthBands = QueryDef(
    "llm_length_percentiles",
    (s, d) => {
      documents(s, d)
        .select(col("lang"), size(tokens(col("text"))).as("n_tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(percentile(col("n_tok"), lit(0.5)), 2).as("p50_tok"),
          round(percentile(col("n_tok"), lit(0.9)), 2).as("p90_tok"),
          round(percentile(col("n_tok"), lit(0.99)), 2).as("p99_tok"),
          max(col("n_tok")).as("max_tok"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH t AS (
        SELECT lang, len(string_split(text, ' ')) AS n_tok FROM documents)
      SELECT lang, count(*) AS n_docs,
             round(quantile_cont(n_tok, 0.5), 2) AS p50_tok,
             round(quantile_cont(n_tok, 0.9), 2) AS p90_tok,
             round(quantile_cont(n_tok, 0.99), 2) AS p99_tok,
             CAST(max(n_tok) AS INTEGER) AS max_tok
      FROM t GROUP BY 1 ORDER BY lang"""))

  /** Dedup audit report: per-source exact-duplicate statistics —
    * distinct content count, duplicated rows, the biggest copy
    * cluster, and the dup rate — the dashboard read that tells you
    * WHERE duplication lives before running the expensive near-dup
    * passes. Content identity is the md5 of the text (computed below
    * the first exchange, so only 16-byte hashes shuffle); the second
    * rollup to per-source rides the same hash partitioning prefix. */
  private val dedupReport = QueryDef(
    "llm_dedup_report",
    (s, d) => {
      documents(s, d)
        .groupBy(col("source"), md5(col("text").cast("binary")).as("h"))
        .agg(count(lit(1)).as("copies"))
        .groupBy(col("source"))
        .agg(sum(col("copies")).as("n_docs"),
          count(lit(1)).as("n_unique"),
          (sum(col("copies")) - count(lit(1))).as("n_dup_rows"),
          max(col("copies")).as("max_copies"))
        .withColumn("dup_rate",
          round(col("n_dup_rows").cast("double") / col("n_docs"), 4))
        .orderBy(col("source"))
    },
    Some("""
      WITH h AS (
        SELECT source, md5(text) AS h, count(*) AS copies
        FROM documents GROUP BY 1, 2)
      SELECT source,
             CAST(sum(copies) AS BIGINT) AS n_docs,
             count(*) AS n_unique,
             CAST(sum(copies) - count(*) AS BIGINT) AS n_dup_rows,
             max(copies) AS max_copies,
             round(CAST(sum(copies) - count(*) AS DOUBLE) / sum(copies), 4) AS dup_rate
      FROM h GROUP BY 1 ORDER BY source"""))

  /** Corpus-cleaning filter chain: ordered reject rules, first failure
    * wins (too_short → too_long → weird_tokens → repetitive → keep) —
    * the shape of a pre-training quality pass. Pure per-row predicates
    * over one narrow scan; the only shuffle is the per-(lang, verdict)
    * rollup at the end. sum_chars cast to BIGINT in DuckDB (its
    * integer sum() widens to HUGEINT, which hash-mismatches). */
  private val filterChain = QueryDef(
    "llm_filter_chain",
    (s, d) => {
      val t = tokens(col("text"))
      val nTok = size(t)
      val meanLen = (col("n_chars") - nTok + 1).cast("double") / nTok
      val diversity = size(array_distinct(t)).cast("double") / nTok
      documents(s, d)
        .withColumn("verdict",
          when(col("n_chars") < 120, "too_short")
            .when(col("n_chars") > 450, "too_long")
            .when(meanLen > 5.0, "weird_tokens")
            .when(diversity < 0.35, "repetitive")
            .otherwise("keep"))
        .groupBy(col("lang"), col("verdict"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"), col("verdict"))
    },
    Some("""
      WITH t AS (
        SELECT lang, n_chars,
               len(string_split(text, ' ')) AS nt,
               len(list_distinct(string_split(text, ' '))) AS nd
        FROM documents),
      v AS (
        SELECT lang, n_chars,
               CASE WHEN n_chars < 120 THEN 'too_short'
                    WHEN n_chars > 450 THEN 'too_long'
                    WHEN CAST(n_chars - nt + 1 AS DOUBLE) / nt > 5.0 THEN 'weird_tokens'
                    WHEN CAST(nd AS DOUBLE) / nt < 0.35 THEN 'repetitive'
                    ELSE 'keep' END AS verdict
        FROM t)
      SELECT lang, verdict, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM v
      GROUP BY lang, verdict
      ORDER BY lang, verdict"""))

  /** Sequence packing for training: concatenate the token stream in
    * doc_id order and cut fixed 2048-token blocks; each doc occupies
    * [tok_offset, tok_offset + n_tokens) and may straddle a block
    * boundary. The offsets come from
    * [[graft.operators.DistributedRank.withPrefixSum]] — range-
    * partition the doc_id order, partition-local cumulative sums, add
    * back driver-folded per-partition bases — i.e. exactly the
    * per-shard packing a 100 TB run needs, instead of the global
    * ordered window (one task for the whole corpus) this query
    * previously planned. */
  private val packSeq = QueryDef(
    "llm_pack_sequences",
    (s, d) => {
      val base = documents(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.DistributedRank.withPrefixSum(
          base, col("n_tokens"), "tok_offset", Seq(col("doc_id")))
        .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
          expr("tok_offset div 2048").as("first_block"),
          expr("(tok_offset + n_tokens - 1) div 2048").as("last_block"))
        .withColumn("n_blocks", col("last_block") - col("first_block") + 1L)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      o AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS tok_offset
        FROM t)
      SELECT doc_id, n_tokens, tok_offset,
             tok_offset // 2048 AS first_block,
             (tok_offset + n_tokens - 1) // 2048 AS last_block,
             ((tok_offset + n_tokens - 1) // 2048) - (tok_offset // 2048) + 1 AS n_blocks
      FROM o
      ORDER BY doc_id"""))

  /** Stratified deterministic sample: a fixed-size draw per language,
    * ordered by a content-free hash of the key — reproducible across
    * engines and reruns (a seeded rand() is not, across engines). One
    * shuffle on the stratum key; rank-within-stratum is a window, so
    * no global sort and no driver collect. */
  private val stratSample = QueryDef(
    "llm_stratified_sample",
    (s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      documents(s, d)
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    },
    Some("""
      SELECT lang, rk, doc_id
      FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
      WHERE rk <= 20
      ORDER BY lang, rk"""))

  /** The dedup FINISHING step, oracle-checked end to end: MinHash-LSH
    * candidate pairs → connected components (iterative min-label
    * propagation, graft.operators.Dedup) → one keeper per cluster.
    * The DuckDB oracle computes the same components with a recursive
    * CTE (transitive closure + min reachable id) — a rare case where
    * an iterative Spark operator has an exact SQL twin, upgrading the
    * component operator from spec-only to hash-gated. */
  private val dedupClusters = QueryDef(
    "llm_dedup_clusters",
    (s, d) => {
      // Unbounded (r7; was doc_id < 500): the LSH pair graph is
      // candidate-bounded by construction (band buckets, big-bucket
      // distributed path), so the full corpus clusters fine at bench
      // scale — llm_pagerank_centrality already rides the same
      // unbounded pairs. At gate scale (sf0.01) the corpus is exactly
      // doc_ids 0-499, so the oracle's transitive closure is
      // unchanged by the bound's removal.
      val pairs = lshPairs(s, d, lit(true))
      // comps stays persisted (Dedup's contract): the keeper output is
      // a view over it and unpersisting here would force the whole
      // iteration to recompute at consumption time. The cached labels
      // are one tiny row per clustered doc.
      val comps = graft.operators.Dedup.connectedComponents(pairs)
      graft.operators.Dedup.keepers(comps)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${dkMinhashCte},
      ${dkLshPairsCtes},
      edges AS (
        SELECT d1 AS src, d2 AS dst FROM lsh_pairs
        UNION ALL SELECT d2, d1 FROM lsh_pairs),
      reach(id, r) AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT e.src AS id, reach.r
        FROM edges e JOIN reach ON e.dst = reach.id)
      SELECT id AS doc_id, min(r) AS keeper_id,
             CASE WHEN id = min(r) THEN 1 ELSE 0 END AS is_keeper
      FROM reach
      GROUP BY id
      ORDER BY doc_id"""))

  /** Corpus n-gram statistics: top word-3-gram shingles by frequency —
    * the corpus-profiling twin of the dedup shingle pipeline (same
    * shingleRows scan shape, one shuffle on the shingle, top-k via
    * TakeOrdered). Ties broken by shingle text for a total order. */
  private val ngramCounts = QueryDef(
    "llm_ngram_counts",
    (s, d) => {
      shingleRows(s, d, lit(true))
        .groupBy(col("shingle"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("shingle"))
        .limit(20)
    },
    Some(s"""
      WITH ${dkMinhashCte},
      u AS (SELECT unnest(shingle_list) AS shingle FROM sh)
      SELECT shingle, count(*) AS n
      FROM u
      GROUP BY shingle
      ORDER BY n DESC, shingle
      LIMIT 20"""))

  /** Greedy LM decoding — text GENERATION as a relational program,
    * completing the LM triangle (llm_lm_score scores, llm_lm_score_kn
    * smooths, this one decodes): from each of the 3 most frequent
    * corpus tokens, walk 8 greedy steps of next = argmax_b
    * count(cur, b) over the corpus bigram table (ties → lexicographic
    * min, the total order both engines share), emitting the decoded
    * path. Greedy argmax needs no randomness and no float — every
    * decision is an integer-count comparison — so the generated text
    * is bit-reproducible, which is exactly what a data-pipeline
    * consumer wants from LM-based synthetic augmentation smoke tests.
    * Scale shape: ONE doc-partitioned lead() pass builds the
    * aggregate-sized bigram table (checkpointed once, read by all 8
    * steps); each step broadcasts the 3-row decoder state against it
    * (hash join on the current token) and takes rank-1 per seed over
    * the out-degree-bounded candidates; the unioned path is 27 rows.
    * Dead ends (a token with no successor) simply end their path —
    * identical inner-join semantics in both engines. */
  private val ngramGenerate = QueryDef(
    "llm_ngram_generate",
    (s, d) => {
      val w1 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      val big = toks.withColumn("b", lead(col("w"), 1).over(w1))
        .filter(col("b").isNotNull)
        .groupBy(col("w").as("a"), col("b")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val seeds = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(3)
        .select(col("w").as("seed"))
        .localCheckpoint(true)
      var cur = seeds.select(col("seed"), col("seed").as("token"),
        lit(0).as("step"))
      var path = cur
      for (i <- 1 to 8) {
        val rkW = Window.partitionBy(col("seed"))
          .orderBy(col("cnt").desc, col("b"))
        cur = big.join(broadcast(cur), col("a") === col("token"))
          .withColumn("rk", row_number().over(rkW))
          .filter(col("rk") === 1)
          .select(col("seed"), col("b").as("token"), lit(i).as("step"))
          .localCheckpoint(true)
        path = path.unionAll(cur)
      }
      path.orderBy(col("seed"), col("step"))
    },
    Some {
      val steps = (1 to 8).map { i =>
        s"""s$i AS (
        SELECT seed, token, $i AS step FROM (
          SELECT s.seed, g.b AS token,
                 row_number() OVER (PARTITION BY s.seed
                   ORDER BY g.cnt DESC, g.b) AS rk
          FROM s${i - 1} s JOIN big g ON g.a = s.token)
        WHERE rk = 1)"""
      }.mkString(",\n      ")
      s"""
      WITH toks AS (
        SELECT doc_id, g AS pos, ws[g] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             unnest(generate_series(1, len(ws))) t(g)),
      big AS (
        SELECT a, b, count(*) AS cnt FROM (
          SELECT w AS a,
                 lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b
          FROM toks)
        WHERE b IS NOT NULL GROUP BY 1, 2),
      seeds AS (
        SELECT w AS seed FROM (
          SELECT w, count(*) AS c FROM toks GROUP BY 1)
        ORDER BY c DESC, w LIMIT 3),
      s0 AS (SELECT seed, seed AS token, 0 AS step FROM seeds),
      $steps
      SELECT seed, token, step FROM (
        SELECT * FROM s0
        ${(1 to 8).map(i => s"UNION ALL SELECT * FROM s$i").mkString("\n        ")})
      ORDER BY seed, step"""
    })

  /** Beam-search LM decoding — the width-B companion of
    * llm_ngram_generate's greedy walk (greedy IS beam with B = 1):
    * from each of the 3 most frequent corpus tokens, 6 steps of
    * width-3 beam search over the corpus bigram LM, scoring
    * hypotheses by Σ log P(b|a) with P = cnt(a,b)/outdeg(a). Because
    * a bigram LM's future depends only on the LAST token, hypothesis
    * recombination is exact (Viterbi beam): states collapse to
    * (seed, last token) keeping the max score, so the beam table —
    * (seed, step, rank, token, score) — is the complete decode
    * state. The score is the established micro-quantized integer
    * (round(ln(cnt/outdeg)·1e6) per edge, summed as BIGINT — the
    * llm_topic_coherence/psi discipline), so ranking and ORDER never
    * touch a float. Scale shape: the bigram+outdeg table is
    * aggregate-sized and checkpointed once; each step broadcasts the
    * ≤9-row beam against it (hash join on the current token),
    * recombines on (seed, token) and ranks per seed — all
    * k-bounded. Dead ends shrink the beam in both engines alike.
    * Reference analog: none (extended LLM-serving surface). */
  private val beamDecode = QueryDef(
    "llm_beam_decode",
    (s, d) => {
      val w1 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      val big = toks.withColumn("b", lead(col("w"), 1).over(w1))
        .filter(col("b").isNotNull)
        .groupBy(col("w").as("a"), col("b")).agg(count(lit(1)).as("cnt"))
      val deg = big.groupBy(col("a")).agg(sum(col("cnt")).as("outdeg"))
      val lp = big.join(deg, "a")
        .withColumn("lp",
          round(log(col("cnt").cast("double") / col("outdeg")) * 1e6, 0)
            .cast("long"))
        .select(col("a"), col("b"), col("lp"))
        .localCheckpoint(true)
      val seeds = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(3)
        .select(col("w").as("seed"))
        .localCheckpoint(true)
      var beam = seeds.select(col("seed"), lit(0).as("step"),
        lit(1).as("rank"), col("seed").as("token"), lit(0L).as("score_micro"))
      var out = beam
      for (i <- 1 to 6) {
        val rkW = Window.partitionBy(col("seed"))
          .orderBy(col("score_micro").desc, col("token"))
        beam = lp.join(broadcast(beam.select(col("seed"), col("token"),
            col("score_micro"))), col("a") === col("token"))
          .select(col("seed"), col("b").as("tok2"),
            (col("score_micro") + col("lp")).as("sc"))
          .groupBy(col("seed"), col("tok2"))
          .agg(max(col("sc")).as("score_micro"))
          .withColumnRenamed("tok2", "token")
          .withColumn("rank", row_number().over(rkW))
          .filter(col("rank") <= 3)
          .select(col("seed"), lit(i).as("step"), col("rank"), col("token"),
            col("score_micro"))
          .localCheckpoint(true)
        out = out.unionAll(beam)
      }
      out.orderBy(col("seed"), col("step"), col("rank"))
    },
    Some {
      val steps = (1 to 6).map { i =>
        s"""b$i AS (
        SELECT seed, $i AS step, CAST(rank AS INT) AS rank, token,
               score_micro
        FROM (
          SELECT seed, token, score_micro,
                 row_number() OVER (PARTITION BY seed
                   ORDER BY score_micro DESC, token) AS rank
          FROM (
            SELECT s.seed, g.b AS token,
                   max(s.score_micro + g.lp) AS score_micro
            FROM b${i - 1} s JOIN lp g ON g.a = s.token
            GROUP BY 1, 2))
        WHERE rank <= 3)"""
      }.mkString(",\n      ")
      s"""
      WITH toks AS (
        SELECT doc_id, g AS pos, ws[g] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             unnest(generate_series(1, len(ws))) t(g)),
      big AS (
        SELECT a, b, count(*) AS cnt FROM (
          SELECT w AS a,
                 lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b
          FROM toks)
        WHERE b IS NOT NULL GROUP BY 1, 2),
      deg AS (SELECT a, CAST(sum(cnt) AS BIGINT) AS outdeg
              FROM big GROUP BY 1),
      lp AS (
        SELECT big.a, big.b,
               CAST(round(ln(CAST(cnt AS DOUBLE) / outdeg) * 1e6, 0)
                    AS BIGINT) AS lp
        FROM big JOIN deg ON deg.a = big.a),
      seeds AS (
        SELECT w AS seed FROM (
          SELECT w, count(*) AS c FROM toks GROUP BY 1)
        ORDER BY c DESC, w LIMIT 3),
      b0 AS (SELECT seed, 0 AS step, 1 AS rank, seed AS token,
                    CAST(0 AS BIGINT) AS score_micro FROM seeds),
      $steps
      SELECT seed, step, rank, token, score_micro FROM (
        SELECT * FROM b0
        ${(1 to 6).map(i => s"UNION ALL SELECT * FROM b$i").mkString("\n        ")})
      ORDER BY seed, step, rank"""
    })

  /** Speculative-decoding acceptance audit (Leviathan et al. 2023) —
    * the capacity-planning question behind draft-model serving: if a
    * cheap DRAFT model (here the corpus unigram LM) proposes tokens
    * and the TARGET model (the corpus bigram LM) verifies them, what
    * share gets accepted? Per in-context position (p, w):
    * accept = min(1, p_target/p_draft) with p_t = cnt(p,w)/outdeg(p)
    * and p_d = cnt(w)/total. The ratio chain is libm-free — three
    * correctly-rounded IEEE divisions of exact int64 counts, then a
    * micro-quantization to int (the summation-order-proof
    * discipline) — so the per-source acceptance statistics are
    * bit-identical across engines. Reported per source: positions,
    * the full-acceptance share (ratio capped at 1, i.e. the target
    * is at least as confident as the draft) and the mean acceptance.
    * Scale shape: one doc-partitioned lag() pass; positions join the
    * aggregate-sized bigram/outdeg/unigram tables on their keys; the
    * corpus-total scalar rides a 1-row broadcast cross join. */
  private val speculativeAccept = QueryDef(
    "llm_speculative_accept",
    (s, d) => {
      val w1 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      val pos = toks.withColumn("p", lag(col("w"), 1).over(w1))
        .filter(col("p").isNotNull)
      val big = pos.groupBy(col("p").as("a"), col("w").as("b"))
        .agg(count(lit(1)).as("cnt_big"))
      val deg = big.groupBy(col("a")).agg(sum(col("cnt_big")).as("outdeg"))
      val uni = toks.groupBy(col("w").as("t")).agg(count(lit(1)).as("cnt_uni"))
      val tot = toks.agg(count(lit(1)).as("total"))
      val accepted = pos
        .join(big, col("p") === col("a") && col("w") === col("b"))
        .join(deg, "a")
        .join(uni, col("w") === col("t"))
        .crossJoin(broadcast(tot))
        .withColumn("r",
          (col("cnt_big").cast("double") / col("outdeg")) /
            (col("cnt_uni").cast("double") / col("total")))
        .withColumn("accept_micro",
          least(lit(1000000L), round(col("r") * 1e6, 0).cast("long")))
      documents(s, d).select(col("doc_id"), col("source"))
        .join(accepted, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pos"),
          sum(col("accept_micro")).as("sum_micro"),
          count(when(col("accept_micro") === 1000000L, 1)).as("n_full"))
        .select(col("source"), col("n_pos"),
          round(col("n_full") / col("n_pos"), 4).as("full_share"),
          round(col("sum_micro") / (col("n_pos") * lit(1e6)), 4)
            .as("mean_accept"))
        .orderBy(col("source"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, g AS pos, ws[g] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             unnest(generate_series(1, len(ws))) t(g)),
      pos AS (
        SELECT doc_id, w,
               lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS p
        FROM toks
        QUALIFY p IS NOT NULL),
      big AS (SELECT p AS a, w AS b, count(*) AS cnt_big
              FROM pos GROUP BY 1, 2),
      deg AS (SELECT a, CAST(sum(cnt_big) AS BIGINT) AS outdeg
              FROM big GROUP BY 1),
      uni AS (SELECT w AS t, count(*) AS cnt_uni FROM toks GROUP BY 1),
      tot AS (SELECT count(*) AS total FROM toks),
      acc AS (
        SELECT pos.doc_id,
               least(1000000,
                 CAST(round(((CAST(cnt_big AS DOUBLE) / outdeg) /
                             (CAST(cnt_uni AS DOUBLE) / total)) * 1e6, 0)
                      AS BIGINT)) AS accept_micro
        FROM pos
        JOIN big ON big.a = pos.p AND big.b = pos.w
        JOIN deg ON deg.a = pos.p
        JOIN uni ON uni.t = pos.w
        CROSS JOIN tot)
      SELECT d.source, count(*) AS n_pos,
             round(count(CASE WHEN accept_micro = 1000000 THEN 1 END)
                   / count(*), 4) AS full_share,
             round(CAST(sum(accept_micro) AS BIGINT)
                   / (count(*) * 1e6), 4) AS mean_accept
      FROM documents d JOIN acc USING (doc_id)
      GROUP BY d.source
      ORDER BY d.source"""))

  /** LLM-watermark detection (Kirchenbauer et al. 2023) — the
    * synthetic-text screen a training pipeline runs before ingesting
    * scraped corpora: a watermarking decoder biases generation toward
    * a "green list" (half the vocabulary, re-seeded from the previous
    * token's hash), so watermarked text shows a green-token excess a
    * one-proportion z-test exposes. Per doc: T scored positions,
    * G green (token w after p is green iff the shared 60-bit
    * md5 hash of "p:w" is even — bit-identical in both engines, the
    * llm_weighted_sample hash idiom), z = (2G−T)/√T for γ = ½. The
    * DETECTION decision is never a float compare: z > 4 ⇔
    * 2G−T > 0 ∧ (2G−T)² > 16T, exact integer cross-multiplication
    * (the kdb_association_rules discipline); only the REPORTED z is
    * a 4dp-rounded double of exact ints. Natural text scores |z| ~ 1,
    * so flags on this corpus are honest negatives. Shape: one
    * doc-partitioned lag() pass + one per-doc aggregation — two
    * narrow shuffles at any scale. */
  private val watermarkDetect = QueryDef(
    "llm_watermark_detect",
    (s, d) => {
      val w1 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val scored = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
        .withColumn("p", lag(col("w"), 1).over(w1))
        .filter(col("p").isNotNull)
        .withColumn("green",
          (hash60(concat(col("p"), lit(":"), col("w"))) % 2 === 0).cast("long"))
      scored.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("t"), sum(col("green")).as("g"))
        .select(col("doc_id"), col("t"), col("g"),
          (round((lit(2) * col("g") - col("t")).cast("double") /
            sqrt(col("t").cast("double")), 4) + lit(0.0)).as("z"),
          (lit(2) * col("g") - col("t") > 0 &&
            (lit(2) * col("g") - col("t")) * (lit(2) * col("g") - col("t")) >
              lit(16) * col("t")).cast("int").as("watermarked"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, g AS pos, ws[g] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             unnest(generate_series(1, len(ws))) t(g)),
      scored AS (
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5(p || ':' || w), 1, 15))::BIGINT
                 % 2 = 0 THEN 1 ELSE 0 END AS green
        FROM (SELECT doc_id, w,
                     lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS p
              FROM toks)
        WHERE p IS NOT NULL),
      agg AS (
        SELECT doc_id, count(*) AS t, CAST(sum(green) AS BIGINT) AS g
        FROM scored GROUP BY 1)
      SELECT doc_id, t, g,
             round(CAST(2 * g - t AS DOUBLE) / sqrt(CAST(t AS DOUBLE)), 4)
               + 0.0 AS z,
             CASE WHEN 2 * g - t > 0
                   AND (2 * g - t) * (2 * g - t) > 16 * t
                  THEN 1 ELSE 0 END AS watermarked
      FROM agg ORDER BY doc_id"""))

  /** Top-p (nucleus) cutoff audit — the LM-serving sampling op
    * (Holtzman 2020) computed exactly from corpus bigram statistics:
    * for each of the 20 most frequent context tokens, the NUCLEUS is
    * the smallest successor set (by descending probability) whose
    * mass reaches p = 0.9; report its size, its exact mass, and the
    * vocabulary fraction it discards — the "how peaked is the
    * next-token distribution here" audit that decides sampling
    * hyperparameters. Everything is exact integers: successors order
    * by (count DESC, token), the cutoff test is cross-multiplied
    * 10·cumsum ≥ 9·total (never a float threshold), the member
    * selection keeps rows up to the FIRST crossing (cumsum − own
    * count ≤ threshold-crossing point), and mass_ppm is an integer
    * division. Shape: one lead() pass builds the bigram table, the
    * top-20 contexts are a k-bounded TakeOrdered, successor windows
    * partition per context over out-degree-bounded rows. */
  private val nucleusSets = QueryDef(
    "llm_nucleus_sets",
    (s, d) => {
      val w1 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      val big = toks.withColumn("b", lead(col("w"), 1).over(w1))
        .filter(col("b").isNotNull)
        .groupBy(col("w").as("ctx"), col("b")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val top20 = big.groupBy(col("ctx")).agg(sum(col("cnt")).as("tot"),
          count(lit(1)).as("n_succ"))
        .orderBy(col("tot").desc, col("ctx")).limit(20)
      val wS = Window.partitionBy(col("ctx"))
        .orderBy(col("cnt").desc, col("b"))
      big.join(broadcast(top20), "ctx")
        .withColumn("csum", sum(col("cnt")).over(
          wS.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // keep every successor up to and including the first row where
        // 10·cumsum ≥ 9·total: rows BEFORE it have 10·(csum−cnt) < 9·tot
        .filter(lit(10L) * (col("csum") - col("cnt")) < lit(9L) * col("tot"))
        .groupBy(col("ctx"), col("tot"), col("n_succ"))
        .agg(count(lit(1)).as("nucleus_k"), sum(col("cnt")).as("nucleus_mass"))
        .select(col("ctx"), col("tot"), col("n_succ"), col("nucleus_k"),
          expr("(nucleus_mass * 1000000L) div tot").as("mass_ppm"),
          expr("((n_succ - nucleus_k) * 1000000L) div n_succ").as("discard_ppm"))
        .orderBy(col("tot").desc, col("ctx"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, g AS pos, ws[g] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             unnest(generate_series(1, len(ws))) t(g)),
      big AS (
        SELECT ctx, b, count(*) AS cnt FROM (
          SELECT w AS ctx,
                 lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b
          FROM toks)
        WHERE b IS NOT NULL GROUP BY 1, 2),
      top20 AS (
        SELECT ctx, CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS n_succ
        FROM big GROUP BY 1
        ORDER BY tot DESC, ctx LIMIT 20),
      cum AS (
        SELECT g.ctx, t.tot, t.n_succ, g.cnt,
               CAST(sum(g.cnt) OVER (PARTITION BY g.ctx
                 ORDER BY g.cnt DESC, g.b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS csum
        FROM big g JOIN top20 t USING (ctx)),
      kept AS (
        SELECT * FROM cum WHERE 10 * (csum - cnt) < 9 * tot)
      SELECT ctx, tot, n_succ,
             count(*) AS nucleus_k,
             (CAST(sum(cnt) AS BIGINT) * 1000000) // tot AS mass_ppm,
             ((n_succ - count(*)) * 1000000) // n_succ AS discard_ppm
      FROM kept GROUP BY ctx, tot, n_succ
      ORDER BY tot DESC, ctx"""))

  /** Train/eval contamination check (decontamination): flag training
    * docs sharing ≥3 rare word-3-gram shingles with any eval doc
    * (eval set = every 97th doc, a deterministic benchmark stand-in).
    * Scale shape: inverted shingle-index join — candidates exist only
    * where a shingle matches, never an all-pairs scan — with a
    * document-frequency cap (df ≤ 50) dropping stopword-like shingles
    * exactly as production decontamination does; join keys are 60-bit
    * shingle hashes, not strings (identical hash both engines, so any
    * collision affects both sides equally). */
  /** The contamination pair set — (train_doc, eval_doc, n_shared ≥ 3)
    * — extracted so llm_decontaminate and llm_pipeline_e2e consume
    * the IDENTICAL definition (the llm_rerank_stage whole-query-reuse
    * doctrine: a pipeline stage is the production query, never a
    * re-definition that can drift). */
  private def contaminationPairs(s: SparkSession, d: String): DataFrame = {
      val u = shingleRows(s, d, lit(true))
        .select(col("doc_id"), hash60(col("shingle")).as("h"))
        .distinct()
      // One pass over the inverted index: group by shingle hash,
      // splitting each posting list into its train and eval sides in
      // the same aggregation that computes df. The df ≤ 50 cap bounds
      // every SURVIVING list, so the explode below is candidate-local
      // (≤ 50×50 pairs per rare shingle) — never an all-pairs join.
      // This shape scans the shingle pipeline ONCE; the equivalent
      // rare-join + train×eval self-join re-executed it per branch.
      // The aggregation buffer is BOUNDED (graft.functions.Postings):
      // exact df alongside posting lists capped at dfCap+1, so a
      // stopword-like shingle costs O(dfCap) memory instead of
      // materializing its full posting list before the filter drops
      // it — at 100 TB that difference is an OOM. Lists are exact
      // whenever df ≤ 50 (the only rows that survive), so the output
      // is identical to an unbounded collect_list.
      val bounded = udaf(graft.functions.Postings.BoundedPostings(50))
      val byShingle = u
        .groupBy(col("h"))
        .agg(bounded(col("doc_id"), col("doc_id") % 97 === 0).as("p"))
        .select(col("h"), col("p.df").as("df"),
          col("p.trains").as("trains"), col("p.evals").as("evals"))
      byShingle
        .filter(col("df") <= 50 && size(col("trains")) > 0 && size(col("evals")) > 0)
        .select(explode(col("trains")).as("train_doc"), col("evals"))
        .select(col("train_doc"), explode(col("evals")).as("eval_doc"))
        .groupBy(col("train_doc"), col("eval_doc"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
  }

  private val decontaminate = QueryDef(
    "llm_decontaminate",
    (s, d) => contaminationPairs(s, d).orderBy(col("train_doc"), col("eval_doc")),
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sh AS (SELECT doc_id,
             list_transform(generate_series(0, len(toks) - 3),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS shingle_list
             FROM toks),
      u AS (SELECT DISTINCT doc_id,
             ('0x' || substr(md5(unnest(shingle_list)), 1, 15))::BIGINT AS h
            FROM sh),
      rare AS (SELECT h FROM u GROUP BY h HAVING count(*) <= 50),
      uf AS (SELECT u.doc_id, u.h FROM u JOIN rare USING (h))
      SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, count(*) AS n_shared
      FROM uf t JOIN uf e ON t.h = e.h
      WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
      GROUP BY 1, 2
      HAVING count(*) >= 3
      ORDER BY train_doc, eval_doc"""))

  /** PII-style scrubbing: find id-like tokens (letters+digits) and
    * redact them. One narrow scan, pure per-row regex work — trivially
    * parallel at 100 TB. The oracle hashes the REDACTED text: md5
    * equality proves the rewrite is byte-identical across engines,
    * not just that counts agree. (DuckDB regexp_replace needs the 'g'
    * flag; Spark's is global by default — a classic silent-drift
    * trap.) */
  private val piiScrub = QueryDef(
    "llm_pii_scrub",
    (s, d) => {
      val pat = "[a-z]+[0-9]{2,}"
      documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_idlike"),
          md5(regexp_replace(col("text"), pat, "<ID>")).as("scrub_hash"),
          (length(col("text")) -
            length(regexp_replace(col("text"), pat, ""))).as("chars_redacted"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             len(regexp_extract_all(text, '[a-z]+[0-9]{2,}')) AS n_idlike,
             md5(regexp_replace(text, '[a-z]+[0-9]{2,}', '<ID>', 'g')) AS scrub_hash,
             length(text) - length(regexp_replace(text, '[a-z]+[0-9]{2,}', '', 'g'))
               AS chars_redacted
      FROM documents
      ORDER BY doc_id"""))

  /** Repetition filter (Gopher-style): flag docs whose token stream is
    * dominated by repeats — duplicate-token fraction and top-token
    * fraction per doc. One explode + one groupBy(doc, tok) + one
    * groupBy(doc): the (doc, tok) count table is partial-agg friendly
    * and the per-doc rollup reuses its doc_id hash partitioning.
    * Ratios at 4dp, flags as int (driver hash rules). */
  private val repetitionFilter = QueryDef(
    "llm_repetition_filter",
    (s, d) => {
      documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).cast("long").as("top_tok_n"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round(lit(1.0) - col("n_distinct") / col("n_tokens").cast("double"), 4)
            .as("dup_frac"),
          round(col("top_tok_n") / col("n_tokens").cast("double"), 4)
            .as("top_tok_frac"),
          ((lit(1.0) - col("n_distinct") / col("n_tokens").cast("double")) > 0.5 ||
            col("top_tok_n") / col("n_tokens").cast("double") > 0.2)
            .cast("int").as("repetitive"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      c AS (
        SELECT doc_id, tok, count(*) AS c FROM tc GROUP BY 1, 2),
      a AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_tok_n
        FROM c GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_distinct,
             round(1.0 - n_distinct / CAST(n_tokens AS DOUBLE), 4) AS dup_frac,
             round(top_tok_n / CAST(n_tokens AS DOUBLE), 4) AS top_tok_frac,
             CASE WHEN (1.0 - n_distinct / CAST(n_tokens AS DOUBLE)) > 0.5
                    OR top_tok_n / CAST(n_tokens AS DOUBLE) > 0.2
                  THEN 1 ELSE 0 END AS repetitive
      FROM a
      ORDER BY doc_id"""))

  /** Document chunking: split each token stream into 128-token chunks
    * with a 96-token stride (32-token overlap) — the context-window
    * prep step between cleaning and packing. Chunk COUNT is computed
    * from n_tokens, then chunks materialize via explode(sequence) +
    * slice — the token array is built once per doc and sliced per
    * chunk, all inside one narrow projection (no shuffle until the
    * final sort). The md5 of each chunk proves byte-identical
    * assembly across engines. */
  private val chunkDocuments = QueryDef(
    "llm_chunk_documents",
    (s, d) => {
      val chunkLen = 128
      val stride = 96
      documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n_tokens", size(col("toks")))
        // chunks start at 0, stride, 2·stride … while start < n_tokens
        .withColumn("chunk_id",
          explode(sequence(lit(0), floor((col("n_tokens") - 1) / lit(stride)).cast("int"))))
        .select(col("doc_id"), col("chunk_id"),
          array_join(slice(col("toks"), col("chunk_id") * stride + 1, lit(chunkLen)), " ")
            .as("chunk_text"))
        .select(col("doc_id"), col("chunk_id"),
          size(tokens(col("chunk_text"))).as("chunk_tokens"),
          md5(col("chunk_text")).as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, (len(toks) - 1) // 96)) AS chunk_id
        FROM t),
      x AS (
        SELECT doc_id, chunk_id,
               array_to_string(list_slice(toks, chunk_id * 96 + 1,
                 chunk_id * 96 + 128), ' ') AS chunk_text
        FROM c)
      SELECT doc_id, chunk_id,
             len(string_split(chunk_text, ' ')) AS chunk_tokens,
             md5(chunk_text) AS chunk_hash
      FROM x
      ORDER BY doc_id, chunk_id"""))

  /** Tokenizer vocabulary build: rank tokens by corpus frequency and
    * assign contiguous ids — the counting pass under any BPE/WordPiece
    * trainer. One explode + one shuffle on the token; the ranking
    * window runs over the already-aggregated (tiny) vocab table, and
    * ties break on the token text for a total order. */
  private val vocabBuild = QueryDef(
    "llm_vocab_build",
    (s, d) => {
      val w = Window.orderBy(col("n").desc, col("tok"))
      documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"))
        // top-1000 FIRST via TakeOrderedAndProject (distributed),
        // THEN rank the bounded table — a global row_number over the
        // full vocabulary would single-partition |vocab| rows; same
        // result, the limit and the window share one total order
        .orderBy(col("n").desc, col("tok")).limit(1000)
        .withColumn("token_id", row_number().over(w).cast("long") - 1)
        .select(col("token_id"), col("tok"), col("n"))
        .orderBy(col("token_id"))
    },
    Some("""
      WITH c AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      v AS (
        SELECT tok, count(*) AS n FROM c GROUP BY tok)
      SELECT row_number() OVER (ORDER BY n DESC, tok) - 1 AS token_id, tok, n
      FROM v
      QUALIFY token_id < 1000
      ORDER BY token_id"""))

  /** Deterministic train/val/test split: an md5 bucket of the doc id
    * assigns each doc stably (80/10/10) — reshuffling the corpus or
    * adding docs never moves an existing doc across splits, which is
    * what keeps eval sets honest across pipeline re-runs. Pure
    * per-row work plus one tiny rollup for the summary counts. */
  private val trainValSplit = QueryDef(
    "llm_train_val_split",
    (s, d) => {
      val bucket = pmod(hash60(concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
      documents(s, d)
        .select(col("doc_id"), bucket.as("bucket"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id,
               (('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 + 100) % 100 AS bucket
        FROM documents)
      SELECT doc_id, bucket,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
      ORDER BY doc_id"""))

  /** Deterministic global shuffle + sharding: every doc gets a stable
    * pseudo-random sort key (md5 of its id), a shard by key-hash, and
    * a position within its shard — the "shuffle the corpus, write N
    * shards" step before training. Reproducible end to end (same
    * corpus → same shard files, byte for byte), unlike rand()-based
    * shuffles. One shuffle on the shard key; positions come from a
    * window over the already-shard-partitioned rows. */
  private val shuffleShard = QueryDef(
    "llm_shuffle_shard",
    (s, d) => {
      val key = md5(concat(lit("shuf:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), key.as("skey"),
          pmod(hash60(concat(lit("shard:"), col("doc_id").cast("string"))), lit(8L))
            .as("shard"))
        .withColumn("pos_in_shard", row_number().over(w).cast("long") - 1)
        .select(col("doc_id"), col("shard"), col("pos_in_shard"), col("skey"))
        .orderBy(col("shard"), col("pos_in_shard"))
    },
    Some("""
      WITH b AS (
        SELECT doc_id,
               md5('shuf:' || CAST(doc_id AS VARCHAR)) AS skey,
               (('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 + 8) % 8 AS shard
        FROM documents)
      SELECT doc_id, shard,
             row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) - 1 AS pos_in_shard,
             skey
      FROM b
      ORDER BY shard, pos_in_shard"""))

  /** Exact substring duplication: 10-token spans appearing in ≥2
    * docs — the span-level dedup signal (C4-style boilerplate/quote
    * detection) between whole-doc hashing and fuzzy MinHash. Every
    * span position hashes once (the token array never crosses a
    * shuffle — slicing is per-row work before the first Exchange);
    * two-stage aggregation keeps both counts partial-agg-friendly
    * with no Expand. Top spans by occurrence, hash tiebreak. */
  private val dedupSubstring = QueryDef(
    "llm_dedup_substring",
    (s, d) => {
      val L = 10
      documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= L) // sequence() would run descending on negatives
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - L)).as("pos"))
        .select(col("doc_id"),
          md5(array_join(slice(col("toks"), col("pos") + 1, lit(L)), " ")).as("span_hash"))
        .groupBy(col("span_hash"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("span_hash"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("c")).cast("long").as("n_occ"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_occ").desc, col("span_hash"))
        .limit(50)
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      p AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 10)) AS pos
        FROM t WHERE len(toks) >= 10),
      h AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(toks, pos + 1, pos + 10), ' ')) AS span_hash
        FROM p),
      g AS (
        SELECT span_hash, doc_id, count(*) AS c FROM h GROUP BY 1, 2),
      a AS (
        SELECT span_hash, count(*) AS n_docs,
               CAST(sum(c) AS BIGINT) AS n_occ,
               min(doc_id) AS first_doc
        FROM g GROUP BY 1)
      SELECT span_hash, n_docs, n_occ, first_doc
      FROM a
      WHERE n_docs >= 2
      ORDER BY n_occ DESC, span_hash
      LIMIT 50"""))

  /** Vocabulary encode: text → token-id sequences against the ranked
    * vocab (llm_vocab_build's table), OOV → −1 — the final text→ids
    * step before packing. The vocab is a BROADCAST dictionary (tiny by
    * construction: top-k entries), so encoding is a map-side join —
    * per-row work, no shuffle of the token stream; the only exchange
    * is the per-doc reassembly. The md5 over the position-ordered id
    * string proves the whole encoded sequence matches byte for byte. */
  private val encodeIds = QueryDef(
    "llm_encode_ids",
    (s, d) => {
      val wv = Window.orderBy(col("n").desc, col("tok"))
      val vocab = documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        // top-1000 first, rank the bounded table (vocab_build pattern)
        .orderBy(col("n").desc, col("tok")).limit(1000)
        .withColumn("token_id", row_number().over(wv).cast("long") - 1)
        .select(col("tok"), col("token_id"))
      documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .join(broadcast(vocab), Seq("tok"), "left_outer")
        .withColumn("id", coalesce(col("token_id"), lit(-1L)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("id") === -1L, 1)).as("n_oov"),
          md5(array_join(
            transform(sort_array(collect_list(struct(col("pos"), col("id")))),
              r => r.getField("id").cast("string")), ",")).as("ids_hash"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH c AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      v AS (SELECT tok, count(*) AS n FROM c GROUP BY tok),
      vocab AS (
        SELECT tok, row_number() OVER (ORDER BY n DESC, tok) - 1 AS token_id
        FROM v QUALIFY token_id < 1000),
      tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      t AS (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 1)) AS pos
            FROM tk),
      tp AS (SELECT doc_id, pos, toks[pos + 1] AS tok FROM t),
      j AS (SELECT doc_id, pos, coalesce(vocab.token_id, -1) AS id
            FROM tp LEFT JOIN vocab USING (tok))
      SELECT doc_id, count(*) AS n_tokens,
             count(CASE WHEN id = -1 THEN 1 END) AS n_oov,
             md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)) AS ids_hash
      FROM j
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Per-document unigram entropy — the information-density quality
    * signal (spam, keyword stuffing, and boilerplate all have LOW
    * entropy for their length; it complements the Gopher repetition
    * fractions which only look at the top token). Uses the identity
    * H = log2(n) − (Σ c·log2 c)/n so ONE aggregation pass over the
    * per-doc term counts suffices — no total-count self-join. Shapes:
    * one shuffle on (doc_id, token), one on doc_id; both partial-agg
    * friendly. The flag compares the ROUNDED entropy so both engines
    * branch on the identical value; + 0.0 canonicalizes IEEE −0.0 on
    * single-token docs. */
  private val tokenEntropy = QueryDef(
    "llm_token_entropy",
    (s, d) => {
      val ent = round(
        log2(col("n_tokens").cast("double")) - col("sclogc") / col("n_tokens"), 4) + 0.0
      documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("c").cast("double") * log2(col("c").cast("double"))).as("sclogc"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          ent.as("entropy"),
          (ent < 4.0).cast("int").as("repetitive"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tf AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      cnt AS (SELECT doc_id, tok, count(*) AS c FROM tf GROUP BY 1, 2),
      agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
               sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS sclogc
        FROM cnt GROUP BY 1)
      SELECT doc_id, n_tokens, n_distinct,
             round(log2(CAST(n_tokens AS DOUBLE)) - sclogc / n_tokens, 4) + 0.0 AS entropy,
             CASE WHEN round(log2(CAST(n_tokens AS DOUBLE)) - sclogc / n_tokens, 4) + 0.0 < 4.0
                  THEN 1 ELSE 0 END AS repetitive
      FROM agg
      ORDER BY doc_id"""))

  /** DSIR-style importance resampling (Xie et al. 2023): score each
    * out-of-target document by how target-like its hashed-unigram bag
    * is — Σ_b n_b·(log p̂_target(b) − log p̂_raw(b)) with add-one
    * smoothing over 1024 md5 feature buckets — and keep the top 30.
    * This is the data-selection op that upgrades "train on everything"
    * to "train on what looks like the target domain". Scale shapes:
    * the two bucket-count tables are ≤1024 rows each (bounded by the
    * feature space, NOT the corpus) so the log-ratio table broadcasts;
    * candidate docs pre-aggregate to (doc, bucket) before the join, so
    * the explode never re-shuffles raw tokens twice; the top-30 rides
    * TakeOrderedAndProject (k-bounded per partition), never a global
    * row_number funnel. Ranking compares the ROUNDED score with
    * doc_id tiebreak, so the cut is identical in both engines. */
  private val dsirSample = QueryDef(
    "llm_dsir_sample",
    (s, d) => {
      val B = 1024L
      def bucketed(df: DataFrame) = df
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
        .withColumn("b", hash60(col("tok")) % B)
      val docs = documents(s, d)
      val target = bucketed(docs.filter(col("lang") === "en"))
      val cand = bucketed(docs.filter(col("lang") =!= "en"))
      // one pass per corpus side: the per-doc bucket rollup is the
      // single candidate-side scan (bucket marginals derive from it),
      // and the 1024-row bucket tables feed totals + ratio without
      // re-running their token pipelines (probed: no runtime reuse)
      val perDoc = cand.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("n")).localCheckpoint(true)
      val tc = target.groupBy(col("b")).agg(count(lit(1)).as("tc"))
        .localCheckpoint(true)
      val rc = perDoc.groupBy(col("b")).agg(sum(col("n")).as("rc"))
      val tTot = tc.agg(sum(col("tc")).as("tt"))
      val rTot = rc.agg(sum(col("rc")).as("tr"))
      val ratio = rc.join(tc, Seq("b"), "left_outer")
        .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
        .select(col("b"),
          (log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("tt") + lit(1024.0))) -
            log((col("rc") + lit(1.0)) / (col("tr") + lit(1024.0)))).as("w"))
      perDoc
        .join(broadcast(ratio), Seq("b"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(col("n").cast("double") * col("w")).as("raw_score"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          (round(col("raw_score"), 4) + 0.0).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(30)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        // explicit final sort: the hash gate is row-order-sensitive and
        // must not depend on WindowExec's internal sort surviving
        .orderBy(col("rnk"))
    },
    Some("""
      WITH tgt AS (
        SELECT (('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15))::BIGINT % 1024) AS b
        FROM documents WHERE lang = 'en'),
      cand AS (
        SELECT doc_id, lang,
               (('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15))::BIGINT % 1024) AS b
        FROM documents WHERE lang <> 'en'),
      tc AS (SELECT b, count(*) AS tc FROM tgt GROUP BY 1),
      rc AS (SELECT b, count(*) AS rc FROM cand GROUP BY 1),
      tot AS (SELECT (SELECT CAST(sum(tc) AS BIGINT) FROM tc) AS tt,
                     (SELECT CAST(sum(rc) AS BIGINT) FROM rc) AS tr),
      ratio AS (
        SELECT rc.b,
               ln((coalesce(tc.tc, 0) + 1.0) / (tot.tt + 1024.0)) -
               ln((rc.rc + 1.0) / (tot.tr + 1024.0)) AS w
        FROM rc LEFT JOIN tc USING (b), tot),
      per_bucket AS (
        SELECT doc_id, lang, b, count(*) AS n FROM cand GROUP BY 1, 2, 3),
      scored AS (
        SELECT doc_id, lang,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               round(sum(CAST(n AS DOUBLE) * w), 4) + 0.0 AS score
        FROM per_bucket JOIN ratio USING (b)
        GROUP BY 1, 2)
      SELECT doc_id, lang, n_tokens, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
      FROM scored
      ORDER BY score DESC, doc_id
      LIMIT 30"""))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score the
    * WHOLE corpus with the reference bigram LM (same add-one-smoothed
    * model as llm_lm_score, trained on docs 100..400), then split each
    * language into head / middle / tail at its own score terciles —
    * the standard "keep the head, maybe the middle, drop the tail"
    * curation gate, per-language so high-resource languages don't set
    * the bar for low-resource ones. Shapes: LM count tables shuffle on
    * token keys; the per-doc rollup shuffles once on doc_id; the
    * 5-row tercile table broadcasts back. Determinism: per-doc scores
    * are rounded to 4dp FIRST, terciles are exact interpolated
    * percentiles over those rounded scores (identical inputs +
    * identical interpolation formula in both engines) rounded to 6dp,
    * and the bucket compare is >= on those canonical values, so the
    * cut is reproducible. Docs under 2 tokens have no bigrams and drop
    * out in both engines. */
  private val perplexityBuckets = QueryDef(
    "llm_perplexity_buckets",
    (s, d) => {
      def toks(df: DataFrame) = df
        .select(col("doc_id"), col("lang"), posexplode(tokens(col("text"))).as(Seq("pos", "w1")))
      def bigrams(df: DataFrame) = {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        toks(df).withColumn("w2", lead(col("w1"), 1).over(w))
          .filter(col("w2").isNotNull)
      }
      val all = documents(s, d)
      val train = all.filter(col("doc_id") >= 100 && col("doc_id") < 400)
      val c2 = bigrams(train).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      // vocab-sized unigram table read by the V scalar AND the scoring
      // join — one training-token pass, not two
      val c1 = toks(train).groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        .localCheckpoint(true)
      val v = c1.agg(count(lit(1)).as("v"))
      val scored = bigrams(all)
        .join(c2, Seq("w1", "w2"), "left_outer")
        .join(c1, Seq("w1"), "left_outer")
        .crossJoin(broadcast(v))
        .select(col("doc_id"), col("lang"),
          log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)) + col("v"))).as("logp"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(round(avg(col("logp")), 4).as("score"))
        // narrow (doc, lang, score) table read by the tercile pass AND
        // the bucket join: materialize once instead of re-running the
        // whole corpus scoring per consumer (probed: no runtime reuse)
        .localCheckpoint(true)
      val th = scored.groupBy(col("lang"))
        .agg(round(percentile(col("score"), lit(1.0 / 3.0)), 6).as("t1"),
          round(percentile(col("score"), lit(2.0 / 3.0)), 6).as("t2"))
      scored.join(broadcast(th), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("score"),
          when(col("score") >= col("t2"), "head")
            .when(col("score") >= col("t1"), "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tr AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        WHERE doc_id >= 100 AND doc_id < 400),
      trtok AS (SELECT unnest(ws) AS w FROM tr),
      c1 AS (SELECT w AS w1, count(*) AS c1 FROM trtok GROUP BY 1),
      vv AS (SELECT count(DISTINCT w) AS v FROM trtok),
      trpos AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS g FROM tr),
      c2 AS (SELECT ws[g] AS w1, ws[g+1] AS w2, count(*) AS c2 FROM trpos GROUP BY 1, 2),
      ev AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      evpos AS (SELECT doc_id, lang, ws, unnest(generate_series(1, len(ws) - 1)) AS g FROM ev),
      evbg AS (SELECT doc_id, lang, ws[g] AS w1, ws[g+1] AS w2 FROM evpos),
      j AS (
        SELECT doc_id, lang,
               ln((coalesce(c2.c2, 0) + 1.0) /
                  (coalesce(c1.c1, 0) + (SELECT v FROM vv))) AS logp
        FROM evbg
        LEFT JOIN c2 ON c2.w1 = evbg.w1 AND c2.w2 = evbg.w2
        LEFT JOIN c1 ON c1.w1 = evbg.w1),
      scored AS (
        SELECT doc_id, lang, round(avg(logp), 4) AS score
        FROM j GROUP BY 1, 2),
      th AS (
        SELECT lang,
               round(quantile_cont(score, 1.0 / 3.0), 6) AS t1,
               round(quantile_cont(score, 2.0 / 3.0), 6) AS t2
        FROM scored GROUP BY 1)
      SELECT doc_id, s.lang, score,
             CASE WHEN score >= t2 THEN 'head'
                  WHEN score >= t1 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM scored s JOIN th USING (lang)
      ORDER BY doc_id"""))

  /** Winnowing-style fingerprint sampling (Schleimer et al. 2003, the
    * MOSS algorithm): hash every word-3-gram, slide a 4-shingle
    * window, keep each window's MINIMUM hash — guaranteeing any match
    * of ≥6 consecutive tokens shares a fingerprint while storing only
    * ~1/4 of the shingles, the position-robust sampling that plain
    * "every k-th shingle" selection lacks. Per-doc digest emitted:
    * complete-window count, distinct selected fingerprints, their sum
    * (an order-free checksum), density. All-integer arithmetic →
    * exact hash gate. Shapes: tokenize once via posexplode, ONE
    * shuffle on doc_id shared by the shingle-assembly lead(), the
    * ordinal row_number and the framed min — then the rollup reuses
    * the same partitioning. */
  private val winnowingFp = QueryDef(
    "llm_winnowing_fp",
    (s, d) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val frame = w.rowsBetween(-3, 0)
      documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos"),
          concat_ws(" ", col("tok"),
            lead(col("tok"), 1).over(w), lead(col("tok"), 2).over(w)).as("shingle"),
          lead(col("tok"), 2).over(w).isNotNull.as("full3"))
        .filter(col("full3"))
        .select(col("doc_id"), col("pos"), hashP(col("shingle")).as("h"))
        .withColumn("k", row_number().over(w))
        .withColumn("wmin", min(col("h")).over(frame))
        .filter(col("k") >= 4)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          countDistinct(col("wmin")).as("n_fp"),
          sum_distinct(col("wmin")).as("fp_sum"),
          round(countDistinct(col("wmin")).cast("double") / count(lit(1)), 4).as("density"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      sh AS (
        SELECT doc_id, g AS pos,
               ${dkHashP("ws[g+1] || ' ' || ws[g+2] || ' ' || ws[g+3]")} AS h
        FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 3)) AS g
              FROM tok WHERE len(ws) >= 3) t),
      win AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS k,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
        FROM sh)
      SELECT doc_id, count(*) AS n_windows,
             count(DISTINCT wmin) AS n_fp,
             CAST(sum(DISTINCT wmin) AS BIGINT) AS fp_sum,
             round(CAST(count(DISTINCT wmin) AS DOUBLE) / count(*), 4) AS density
      FROM win
      WHERE k >= 4
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Containment near-dup (Broder's asymmetric coefficient):
    * C(A→B) = |A∩B| / |A| over distinct 3-gram shingle sets — the
    * metric that catches a short doc EMBEDDED in a long one, which
    * Jaccard misses (the union denominator drowns the small side;
    * a 100-token quote inside a 10k-token page has J≈0.01 but
    * C≈1.0). Same inverted-shingle candidate generation as
    * llm_dedup_ngram_jaccard — pairs exist only where ≥1 shingle is
    * shared, never a cross join — with both metrics emitted so the
    * asymmetric detections are visible. Integer intersections,
    * broadcast size lookups, ROUNDED-value ordering. */
  private val containment = QueryDef(
    "llm_dedup_containment",
    (s, d) => {
      val ex = shingleRows(s, d, col("doc_id") < 150).distinct()
      val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("nsh", "n1")), "d1")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("nsh", "n2")), "d2")
        .select(col("d1"), col("d2"), col("n1"), col("n2"),
          round(col("n_inter").cast("double") / least(col("n1"), col("n2")), 4)
            .as("containment"),
          round(col("n_inter").cast("double") /
            (col("n1") + col("n2") - col("n_inter")), 4).as("jaccard"))
        .orderBy(col("containment").desc, col("d1"), col("d2"))
        .limit(20)
    },
    Some("""
      WITH docs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(0, len(string_split(text, ' ')) - 3),
                 i -> string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2] || ' ' ||
                      string_split(text, ' ')[i+3])) AS sh
        FROM documents WHERE doc_id < 150),
      sizes AS (SELECT doc_id, len(sh) AS nsh FROM docs),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
      inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT d1, d2, s1.nsh AS n1, s2.nsh AS n2,
             round(CAST(n_inter AS DOUBLE) / least(s1.nsh, s2.nsh), 4) AS containment,
             round(CAST(n_inter AS DOUBLE) / (s1.nsh + s2.nsh - n_inter), 4) AS jaccard
      FROM inter
      JOIN sizes s1 ON s1.doc_id = d1
      JOIN sizes s2 ON s2.doc_id = d2
      ORDER BY containment DESC, d1, d2
      LIMIT 20"""))

  /** Per-vector int8 scalar quantization (the FAISS-SQ / serving-side
    * compression step): affine-map each embedding to 0..255 with its
    * own min/max range, the 4× memory cut that makes billion-vector
    * ANN indexes fit in RAM. Emitted per vector: the range, the
    * quantized-code checksum and saturated-code count (the
    * reconstruction-health signals an index build monitors). Purely
    * per-row array lambdas — no shuffle at all until the final sort —
    * and float→double casts are exact in both engines, so the integer
    * codes hash-gate exactly. Degenerate constant vectors (max = min)
    * quantize to all-zeros by the guard, not a 0/0. */
  private val int8Quantize = QueryDef(
    "llm_int8_quantize",
    (s, d) => {
      val mn = array_min(col("embedding")).cast("double")
      val mx = array_max(col("embedding")).cast("double")
      embeddings(s, d)
        .withColumn("mn", mn).withColumn("mx", mx)
        .withColumn("scale",
          when(col("mx") > col("mn"), (col("mx") - col("mn")) / 255.0))
        .withColumn("codes",
          when(col("scale").isNotNull,
            transform(col("embedding"), x =>
              least(greatest(round((x.cast("double") - col("mn")) / col("scale")), lit(0.0)),
                lit(255.0)).cast("int")))
            .otherwise(transform(col("embedding"), _ => lit(0))))
        .select(col("vec_id"), col("label"),
          round(col("mn"), 6).as("v_min"),
          round(col("mx"), 6).as("v_max"),
          aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
          size(filter(col("codes"), c => c === 0 || c === 255)).as("n_saturated"))
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH q AS (
        SELECT vec_id, label,
               CAST(list_min(embedding) AS DOUBLE) AS mn,
               CAST(list_max(embedding) AS DOUBLE) AS mx,
               CASE WHEN CAST(list_max(embedding) AS DOUBLE) > CAST(list_min(embedding) AS DOUBLE)
                    THEN (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) / 255.0
               END AS scale
        FROM embeddings),
      coded AS (
        SELECT vec_id, label, mn, mx,
               CASE WHEN scale IS NOT NULL
                    THEN list_transform(embedding, x ->
                      CAST(least(greatest(round((CAST(x AS DOUBLE) - mn) / scale), 0.0), 255.0) AS INTEGER))
                    ELSE list_transform(embedding, x -> 0)
               END AS codes
        FROM q JOIN embeddings USING (vec_id, label))
      SELECT vec_id, label,
             round(mn, 6) AS v_min,
             round(mx, 6) AS v_max,
             CAST(list_sum(codes) AS BIGINT) AS code_sum,
             len(list_filter(codes, c -> c = 0 OR c = 255)) AS n_saturated
      FROM coded
      ORDER BY vec_id"""))

  /** Dataset-card rollup: the per-(lang, source) summary table a
    * curated corpus ships with — doc/token volumes, exact-dup rate
    * (1 − distinct-content/docs), and the token-length median that
    * sets truncation budgets. ONE pass: per-doc md5 + token counts
    * are computed in the scan projection, then a single (lang, source)
    * aggregation carries count-distinct-of-hash (16-byte digests
    * shuffle, never text) and the exact median. ~|langs|×|sources|
    * output rows regardless of corpus size. */
  private val datasetCard = QueryDef(
    "llm_dataset_card",
    (s, d) => {
      documents(s, d)
        .select(col("lang"), col("source"),
          md5(col("text")).as("h"),
          size(tokens(col("text"))).as("n_tok"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          countDistinct(col("h")).as("n_distinct"),
          round(lit(1.0) - countDistinct(col("h")).cast("double") / count(lit(1)), 4)
            .as("dup_rate"),
          round(percentile(col("n_tok"), lit(0.5)), 2).as("p50_tok"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""
      WITH per_doc AS (
        SELECT lang, source, md5(text) AS h,
               len(string_split(text, ' ')) AS n_tok
        FROM documents)
      SELECT lang, source,
             count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             count(DISTINCT h) AS n_distinct,
             round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 4) AS dup_rate,
             round(quantile_cont(n_tok, 0.5), 2) AS p50_tok
      FROM per_doc
      GROUP BY 1, 2
      ORDER BY lang, source"""))

  /** Tokenizer-fertility equity audit: subword tokens per whitespace
    * word, aggregated per LANGUAGE — the diagnostic behind "our
    * tokenizer taxes language X" (high fertility = more tokens per
    * word = less effective context and higher training cost for that
    * language; the reason multilingual tokenizers rebalance their
    * training mix). Per-doc fertility is exact integer-ratio math;
    * the per-lang rollup carries the mean, the exact p90, and an
    * over-fragmenting flag vs 1.25× the global mean — all compares on
    * ROUNDED values so both engines cut identically. One pass, one
    * 5-row rollup, the global mean on a broadcast cross join. */
  private val tokenizerFertility = QueryDef(
    "llm_tokenizer_fertility",
    (s, d) => {
      val perDoc = documents(s, d)
        .select(col("lang"),
          round(size(regexp_extract_all(col("text"), lit("[a-zA-Z0-9]{1,4}"), lit(0)))
            .cast("double") / size(tokens(col("text"))), 6).as("fert"))
      val perLang = perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("fert")), 4).as("mean_fert"),
          round(percentile(col("fert"), lit(0.9)), 4).as("p90_fert"))
      val global = perDoc.agg(round(avg(col("fert")), 4).as("global_fert"))
      perLang.crossJoin(broadcast(global))
        .select(col("lang"), col("n_docs"), col("mean_fert"), col("p90_fert"),
          col("global_fert"),
          (col("mean_fert") > col("global_fert") * 1.25).cast("int").as("over_fragmenting"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH per_doc AS (
        SELECT lang,
               round(CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]{1,4}')) AS DOUBLE) /
                     len(string_split(text, ' ')), 6) AS fert
        FROM documents),
      per_lang AS (
        SELECT lang, count(*) AS n_docs,
               round(avg(fert), 4) AS mean_fert,
               round(quantile_cont(fert, 0.9), 4) AS p90_fert
        FROM per_doc GROUP BY 1),
      g AS (SELECT round(avg(fert), 4) AS global_fert FROM per_doc)
      SELECT lang, n_docs, mean_fert, p90_fert, g.global_fert,
             CASE WHEN mean_fert > g.global_fert * 1.25 THEN 1 ELSE 0 END AS over_fragmenting
      FROM per_lang, g
      ORDER BY lang"""))

  /** Code-vs-prose detection: the char-class + keyword heuristic that
    * routes documents to the right pipeline branch (code wants its own
    * dedup granularity, quality rules, and tokenizer; prose filters
    * would throw away perfectly good code as "low quality"). Signals:
    * code-symbol density ({}()[];=<>), digit density, and programming
    * keyword hits — combined into a flag on ROUNDED ratios so both
    * engines branch identically. Pure per-row regex/array work, no
    * shuffle until the final sort; same-regex determinism (both
    * engines count the identical character classes). */
  private val codeDetect = QueryDef(
    "llm_code_detect",
    (s, d) => {
      val kw = Seq("def", "return", "import", "class", "function",
        "var", "const", "if", "else", "for")
      val sym = length(regexp_replace(col("text"), "[^{}()\\[\\];=<>]", ""))
      val dig = length(regexp_replace(col("text"), "[^0-9]", ""))
      val symR = round(sym.cast("double") / col("n_chars"), 4)
      val kwHits = size(filter(tokens(col("text")), t => t.isin(kw: _*)))
      documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          sym.as("sym_count"), symR.as("sym_ratio"),
          round(dig.cast("double") / col("n_chars"), 4).as("digit_ratio"),
          kwHits.as("kw_hits"),
          (symR > 0.02 && kwHits >= 1).cast("int").as("code_like"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH sig AS (
        SELECT doc_id, n_chars,
               len(regexp_replace(text, '[^{}()\[\];=<>]', '', 'g')) AS sym_count,
               len(regexp_replace(text, '[^0-9]', '', 'g')) AS dig_count,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('def', 'return', 'import', 'class', 'function',
                              'var', 'const', 'if', 'else', 'for'))) AS kw_hits
        FROM documents)
      SELECT doc_id, n_chars, sym_count,
             round(CAST(sym_count AS DOUBLE) / n_chars, 4) AS sym_ratio,
             round(CAST(dig_count AS DOUBLE) / n_chars, 4) AS digit_ratio,
             kw_hits,
             CASE WHEN round(CAST(sym_count AS DOUBLE) / n_chars, 4) > 0.02
                   AND kw_hits >= 1 THEN 1 ELSE 0 END AS code_like
      FROM sig
      ORDER BY doc_id"""))

  /** Soft dedup (down-weighting instead of dropping): every doc keeps
    * a training weight 1/n_copies of its exact content group — the
    * alternative to hard dedup when duplicates carry signal
    * (popularity) but must not dominate the loss; summing `weight`
    * over any slice gives its effective (dedup-adjusted) size. One
    * shuffle on the 16-byte content digest, one join back; weights
    * are exact reciprocals of integers, rounded identically. */
  private val softDedupWeights = QueryDef(
    "llm_softdedup_weights",
    (s, d) => {
      val copies = documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n_copies"))
      documents(s, d)
        .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
        .join(copies, Seq("h"))
        .select(col("doc_id"), col("source"), col("n_copies"),
          round(lit(1.0) / col("n_copies"), 6).as("weight"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH copies AS (
        SELECT md5(text) AS h, count(*) AS n_copies
        FROM documents GROUP BY 1)
      SELECT doc_id, source, n_copies,
             round(1.0 / n_copies, 6) AS weight
      FROM (SELECT doc_id, source, md5(text) AS h FROM documents) d
      JOIN copies USING (h)
      ORDER BY doc_id"""))

  /** T5-style span-corruption mask planning: deterministically select
    * ~15% of each document's token positions via the shared md5 hash
    * (reproducible masking — the property that lets a preemption
    * resume mid-epoch with identical batches), then coalesce adjacent
    * picks into spans (gaps-and-islands per doc) and report the mask
    * rate and span-length profile the objective actually realises.
    * All integer arithmetic on hash-selected positions → exact gate.
    * One doc_id shuffle shared by the position window and the rollup. */
  private val spanCorruption = QueryDef(
    "llm_span_corruption",
    (s, d) => {
      val picked = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .filter(hash60(concat(col("doc_id").cast("string"), lit(":"), col("pos").cast("string"))) % 100 < 15)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      picked
        .withColumn("island", col("pos") - row_number().over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(count(lit(1)).as("span_len"))
        .groupBy(col("doc_id"))
        .agg(sum(col("span_len")).as("n_masked"),
          count(lit(1)).as("n_spans"),
          max(col("span_len")).as("max_span"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos
        FROM documents),
      picked AS (
        SELECT doc_id, pos
        FROM tok
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 15))::BIGINT % 100) < 15),
      isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM picked),
      spans AS (
        SELECT doc_id, island, count(*) AS span_len
        FROM isl GROUP BY 1, 2)
      SELECT doc_id,
             CAST(sum(span_len) AS BIGINT) AS n_masked,
             count(*) AS n_spans,
             CAST(max(span_len) AS BIGINT) AS max_span
      FROM spans
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Bloom-screened incremental dedup — the Spark-NATIVE scale path
    * for "is this arriving document already in the corpus": build ONE
    * mergeable 8 KB bloom filter over the corpus content hashes
    * (graft_bloom_agg, Spark's codegen'd BloomFilterAggregate
    * re-exported through GraftExtensions — Spark only wires it into
    * its internal runtime-filter rewrite), broadcast it onto the
    * arriving batch, and exact-verify only the hits. At 100 TB the
    * filter replaces shuffling the batch against the corpus; the
    * exact join runs on the flagged sliver. Gate is the property
    * pattern (llm_similarity_ivf_trained precedent): the oracle
    * reproduces the EXACT dup count and asserts the two bloom
    * guarantees as constants — no false negatives (superset_ok) and
    * a bounded false-positive rate (fp_ok; 8192 bits for ≤400 items
    * ⇒ fpp ≪ the 10% bound) — while the filter's raw bits stay an
    * implementation detail. */
  private val bloomScreen = QueryDef(
    "llm_dedup_bloom_screen",
    (s, d) => {
      // might_contain requires the filter side to be a constant or
      // scalar subquery (it is planned as a one-row broadcast), so
      // this op runs on the SQL surface — which also exercises the
      // injected functions exactly the way a SQL-only user would.
      documents(s, d).filter(col("doc_id") >= 100)
        .createOrReplaceTempView("graft_bloom_corpus")
      documents(s, d).filter(col("doc_id") < 100)
        .createOrReplaceTempView("graft_bloom_batch")
      // screen key = the 10-token prefix fingerprint the incremental
      // dedup path (llm_dedup_incremental) keys on — full-text
      // equality has no cross-slice dups in this corpus, the prefix
      // fingerprint has real ones, so the no-false-negative guarantee
      // is exercised non-vacuously
      s.sql("""
        WITH flags AS (
          SELECT graft_might_contain(
                   (SELECT graft_bloom_agg(
                      xxhash64(array_join(slice(split(text, ' '), 1, 10), ' ')), 500L, 8192L)
                    FROM graft_bloom_corpus),
                   xxhash64(array_join(slice(split(b.text, ' '), 1, 10), ' '))) AS flagged,
                 CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS is_dup
          FROM graft_bloom_batch b
          LEFT JOIN (SELECT DISTINCT md5(array_join(slice(split(text, ' '), 1, 10), ' ')) AS h
                     FROM graft_bloom_corpus) c
            ON md5(array_join(slice(split(b.text, ' '), 1, 10), ' ')) = c.h)
        SELECT count(*) AS n_batch,
               count(CASE WHEN is_dup = 1 THEN 1 END) AS n_true_dups,
               CAST(count(CASE WHEN is_dup = 1 AND flagged THEN 1 END) =
                    count(CASE WHEN is_dup = 1 THEN 1 END) AS INT) AS superset_ok,
               CAST(count(CASE WHEN is_dup = 0 AND flagged THEN 1 END) <=
                    0.1 * count(CASE WHEN is_dup = 0 THEN 1 END) + 1 AS INT) AS fp_ok
        FROM flags""")
    },
    Some("""
      WITH corpus AS (
        SELECT DISTINCT md5(array_to_string(string_split(text, ' ')[1:10], ' ')) AS h
        FROM documents WHERE doc_id >= 100),
      batch AS (
        SELECT CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS is_dup
        FROM (SELECT md5(array_to_string(string_split(text, ' ')[1:10], ' ')) AS h
              FROM documents WHERE doc_id < 100) b
        LEFT JOIN corpus c USING (h))
      SELECT count(*) AS n_batch,
             count(CASE WHEN is_dup = 1 THEN 1 END) AS n_true_dups,
             1 AS superset_ok,
             1 AS fp_ok
      FROM batch"""))

  /** Source-pair n-gram overlap matrix — corpus provenance: which
    * sources copy from (or syndicate to) which, measured as shared
    * distinct word-3-grams over the smaller side's vocabulary. The
    * doc-level near-dup family can't see this (diffuse many-doc
    * copying never makes a single doc pair similar). Same
    * inverted-index discipline as every pairwise op here: pairs exist
    * only where a shingle is shared; the per-source shingle sets are
    * distinct-collapsed BEFORE the self-join so row volume is
    * vocabulary-bounded, not token-bounded; source sizes broadcast
    * back onto the ~|sources|² pair table. Integer counts, rounded
    * ratio, ROUNDED-value ordering with id tiebreaks. */
  private val sourceOverlap = QueryDef(
    "llm_source_overlap",
    (s, d) => {
      val ex = documents(s, d)
        .select(col("source"), col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .select(col("source"), col("doc_id"),
          concat_ws(" ", col("tok"),
            lead(col("tok"), 1).over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))),
            lead(col("tok"), 2).over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
            .as("shingle"),
          lead(col("tok"), 2).over(Window.partitionBy(col("doc_id")).orderBy(col("pos")))
            .isNotNull.as("full3"))
        .filter(col("full3"))
        .select(col("source"), col("shingle")).distinct()
      val sizes = ex.groupBy(col("source")).agg(count(lit(1)).as("nsh"))
      ex.as("a").join(ex.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("nsh", "n_a")), "src_a")
        .join(broadcast(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("nsh", "n_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          round(col("n_shared").cast("double") / least(col("n_a"), col("n_b")), 4)
            .as("overlap"))
        .orderBy(col("overlap").desc, col("src_a"), col("src_b"))
        .limit(20)
    },
    Some("""
      WITH docs AS (
        SELECT source,
               list_distinct(flatten(list(list_transform(
                 generate_series(0, len(string_split(text, ' ')) - 3),
                 i -> string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2] || ' ' ||
                      string_split(text, ' ')[i+3])))) AS sh
        FROM documents
        GROUP BY source),
      sizes AS (SELECT source, len(sh) AS nsh FROM docs),
      ex AS (SELECT source, unnest(sh) AS s FROM docs),
      pairs AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        FROM ex a JOIN ex b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, n_shared,
             round(CAST(n_shared AS DOUBLE) / least(s1.nsh, s2.nsh), 4) AS overlap
      FROM pairs
      JOIN sizes s1 ON s1.source = src_a
      JOIN sizes s2 ON s2.source = src_b
      ORDER BY overlap DESC, src_a, src_b
      LIMIT 20"""))

  /** BM25 ranked retrieval (Robertson–Spärck Jones, k1=1.2 b=0.75,
    * Lucene's +1 idf floor) for a fixed query over the corpus — the
    * lexical-search sibling of the embedding similarity family. Scale
    * shape: the term set is a broadcast-able constant, so the postings
    * build filters AT THE TOKENIZER (only query-term hits survive the
    * explode), document length rides along with each posting (no
    * corpus-sized side join), df and the corpus stats are tiny
    * broadcast aggregates, and the final per-doc fold touches ≤|terms|
    * rows per doc. Only matching docs ever shuffle. */
  /** The fixed query of the lexical-search family — ONE definition
    * for llm_bm25_search (stage 1) and llm_rerank_stage (stage 2),
    * in both engines, so the stages cannot filter on different
    * terms. */
  private val searchTerms = Seq("dup", "vector", "query")
  private val searchTermsSql =
    searchTerms.map(t => s"'$t'").mkString("(", ", ", ")")

  private val bm25Search = QueryDef(
    "llm_bm25_search",
    (s, d) => {
      val terms = searchTerms
      val postings = documents(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).as("dl"),
          explode(tokens(col("text"))).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      val dfreq = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val stats = documents(s, d)
        .select(size(tokens(col("text"))).as("dl"))
        .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      postings
        .join(broadcast(dfreq), Seq("tok"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
        .withColumn("w",
          col("idf") * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy(col("doc_id"))
        .agg((round(sum(col("w")), 4) + lit(0.0)).as("score"),
          count(lit(1)).as("n_terms"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      postings AS (
        SELECT doc_id, tok, count(*) AS tf
        FROM toks WHERE tok IN $searchTermsSql
        GROUP BY 1, 2),
      dfreq AS (SELECT tok, count(*) AS df FROM postings GROUP BY 1),
      scored AS (
        SELECT p.doc_id,
               ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0) *
               (p.tf * 2.2) /
               (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS w
        FROM postings p
        JOIN dfreq f USING (tok)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s)
      SELECT doc_id, round(sum(w), 4) + 0.0 AS score, count(*) AS n_terms
      FROM scored
      GROUP BY doc_id
      ORDER BY score DESC, doc_id
      LIMIT 20"""))

  /** Retrieval-quality evaluation: MRR and nDCG@10 of the exact
    * cosine ranking, with relevance = "neighbor carries the query's
    * label" (the natural judgment the embeddings table ships) — the
    * eval harness a retrieval stack runs before swapping ANN configs,
    * sibling of llm_dedup_eval's band-config pre-flight. Determinism:
    * the ranking is the bit-identical strict-fold cosine with id
    * tiebreaks (embTopk precedent), relevance/ranks are ints, MRR is
    * an exact reciprocal, and DCG/IDCG sum rel/log2(rank+1) — ln at
    * 1 ulp, rounded 4dp. IDCG derives from the SAME expression over
    * the ideal prefix, so nDCG ∈ [0,1] exactly. */
  private val retrievalEval = QueryDef(
    "llm_retrieval_eval",
    (s, d) => {
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("label").as("q_label"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"),
        col("label").as("n_label"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      val ranked = broadcast(q).join(c, col("qid") =!= col("nid"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        .withColumn("rel", (col("n_label") === col("q_label")).cast("int"))
      ranked
        .withColumn("ideal_rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("rk"))))
        .groupBy(col("qid"))
        .agg(count(when(col("rel") === 1, 1)).as("n_rel"),
          min(when(col("rel") === 1, col("rk"))).as("first_rel"),
          sum(col("rel").cast("double") / log2(col("rk").cast("double") + 1))
            .as("dcg"),
          sum(when(col("rel") === 1,
            lit(1.0) / log2(col("ideal_rk").cast("double") + 1))
            .otherwise(lit(0.0))).as("idcg"))
        .select(col("qid"), col("n_rel"),
          (round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 4) + lit(0.0))
            .as("mrr"),
          (round(when(col("n_rel") > 0, col("dcg") / col("idcg"))
            .otherwise(lit(0.0)), 4) + lit(0.0)).as("ndcg10"))
        .orderBy(col("qid"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, label AS q_label
        FROM embeddings WHERE vec_id <= 4),
      c AS (SELECT vec_id AS nid, embedding AS nv, label AS n_label
            FROM embeddings),
      sc AS (
        SELECT qid, nid, q_label, n_label,
               ${dkDot("qv", "nv")} /
               (sqrt(${dkDot("qv", "qv")}) * sqrt(${dkDot("nv", "nv")})) AS cos
        FROM q, c WHERE qid <> nid),
      rk AS (
        SELECT qid,
               CASE WHEN n_label = q_label THEN 1 ELSE 0 END AS rel,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
        FROM sc),
      t AS (
        SELECT qid, rel, rk,
               row_number() OVER (PARTITION BY qid ORDER BY rel DESC, rk)
                 AS ideal_rk
        FROM rk WHERE rk <= 10)
      SELECT qid,
             count(CASE WHEN rel = 1 THEN 1 END) AS n_rel,
             round(COALESCE(CAST(1.0 AS DOUBLE) /
                   min(CASE WHEN rel = 1 THEN rk END), 0.0), 4) + 0.0 AS mrr,
             round(CASE WHEN count(CASE WHEN rel = 1 THEN 1 END) > 0 THEN
               sum(CAST(rel AS DOUBLE) / log2(CAST(rk AS DOUBLE) + 1)) /
               sum(CASE WHEN rel = 1
                   THEN CAST(1.0 AS DOUBLE) / log2(CAST(ideal_rk AS DOUBLE) + 1)
                   ELSE CAST(0.0 AS DOUBLE) END)
               ELSE 0.0 END, 4) + 0.0 AS ndcg10
      FROM t
      GROUP BY qid
      ORDER BY qid"""))

  /** Model-based quality filtering: a fixed-weight logistic
    * classifier over document statistics — the fastText/quality-
    * classifier stage of a data pipeline (score docs with a trained
    * model, keep above threshold), with the weights frozen as
    * binary-exact literals so the model is reproducible inside the
    * query plan. Determinism discipline: features are 4dp-rounded
    * exact integer ratios, weights are binary-exact (0.25/2.5/3.0/
    * 1.5/2.0/0.75), and the logit is the same left-associated
    * expression in both engines — bit-identical doubles — so the
    * keep DECISION gates on the SIGN of the logit (exp only shapes
    * the reported probability, rounded 4dp). One narrow scan, pure
    * per-row regex/token counting, zero shuffles before the output
    * order. */
  private val qualityClassifier = QueryDef(
    "llm_quality_classifier",
    (s, d) => {
      val t = tokens(col("text"))
      val nTok = size(t)
      val nChars = length(col("text"))
      val stop = round((tokenCountOf(t, "the") + tokenCountOf(t, "a"))
        .cast("double") / nTok, 4)
      val digit = round(length(regexp_replace(col("text"), "[^0-9]", ""))
        .cast("double") / nChars, 4)
      val punct = round(length(regexp_replace(col("text"), "[^.,;:!?]", ""))
        .cast("double") / nChars, 4)
      val caps = round(length(regexp_replace(col("text"), "[^A-Z]", ""))
        .cast("double") / nChars, 4)
      val shortF = when(nTok < 20, 1.0).otherwise(0.0)
      val z = lit(0.25) + lit(2.5) * stop - lit(3.0) * digit -
        lit(1.5) * punct - lit(2.0) * caps - lit(0.75) * shortF
      documents(s, d).filter(length(col("text")) > 0)
        .select(col("doc_id"),
          stop.as("stop_ratio"), digit.as("digit_ratio"),
          punct.as("punct_ratio"), caps.as("caps_ratio"),
          (round(z, 6) + lit(0.0)).as("logit"),
          (round(lit(1.0) / (lit(1.0) + exp(-z)), 4) + lit(0.0)).as("p_keep"),
          when(z >= 0, 1).otherwise(0).as("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH f AS (
        SELECT doc_id,
               round(CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) +
                          len(list_filter(string_split(text, ' '), t -> t = 'a'))
                     AS DOUBLE) / len(string_split(text, ' ')), 4) AS s,
               round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                     AS DOUBLE) / length(text), 4) AS dg,
               round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                     AS DOUBLE) / length(text), 4) AS p,
               round(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                     AS DOUBLE) / length(text), 4) AS c,
               CASE WHEN len(string_split(text, ' ')) < 20
                    THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS sh
        FROM documents WHERE length(text) > 0),
      zt AS (
        SELECT doc_id, s, dg, p, c,
               CAST(0.25 AS DOUBLE) + 2.5 * s - 3.0 * dg - 1.5 * p - 2.0 * c
                 - 0.75 * sh AS z
        FROM f)
      SELECT doc_id, s AS stop_ratio, dg AS digit_ratio,
             p AS punct_ratio, c AS caps_ratio,
             round(z, 6) + 0.0 AS logit,
             round(1.0 / (1.0 + exp(-z)), 4) + 0.0 AS p_keep,
             CASE WHEN z >= 0 THEN 1 ELSE 0 END AS keep
      FROM zt
      ORDER BY doc_id"""))

  /** Hybrid retrieval: reciprocal-rank fusion (RRF, k=60) of the BM25
    * lexical ranking and the exact-cosine embedding ranking — the
    * standard two-leg RAG retrieval shape (lexical recall + semantic
    * recall, fused without score calibration). Each leg is top-20;
    * rrf = Σ 1/(60+rank) over the legs where the doc appears; output
    * is the fused top-10. Fully hash-gated: BM25 ranks order by the
    * 4dp-rounded score (the llm_bm25_search contract), cosine ranks
    * order by the raw strict-fold double (bit-identical across
    * engines — embTopk precedent), and the fused score is a sum of
    * exact reciprocals of small ints. Scale shape: the lexical leg
    * filters postings at the tokenizer (only query-term hits
    * survive); the ranking windows run over those bounded candidate
    * sets, not the corpus; fusion is a full-outer join of two ≤20-row
    * lists. Embeddings and documents share the id space (vec_id ≡
    * doc_id) — the "every document carries its embedding" layout. */
  private val hybridSearch = QueryDef(
    "llm_hybrid_search",
    (s, d) => {
      val terms = Seq("dup", "vector", "query")
      val postings = documents(s, d)
        .select(col("doc_id"), size(tokens(col("text"))).as("dl"),
          explode(tokens(col("text"))).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      val dfreq = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val stats = documents(s, d)
        .select(size(tokens(col("text"))).as("dl"))
        .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      // single-partition windows are safe here: both legs rank a
      // candidate set already bounded by the term filter / the corpus
      // cosine scan, and only top-20 survives
      val wLex = Window.orderBy(col("score").desc, col("doc_id"))
      val lex = postings
        .join(broadcast(dfreq), Seq("tok"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
        .withColumn("w",
          col("idf") * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy(col("doc_id"))
        .agg((round(sum(col("w")), 4) + lit(0.0)).as("score"))
        .withColumn("r_lex", row_number().over(wLex))
        .filter(col("r_lex") <= 20)
        .select(col("doc_id"), col("r_lex"))
      val e = embeddings(s, d)
      val wEmb = Window.orderBy(col("cos").desc, col("nid"))
      val emb = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
        .filter(col("nid") =!= 0)
        .crossJoin(broadcast(e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("r_emb", row_number().over(wEmb))
        .filter(col("r_emb") <= 20)
        .select(col("nid").as("doc_id"), col("r_emb"))
      lex.join(emb, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("r_lex"), lit(0)).cast("long").as("bm25_rank"),
          coalesce(col("r_emb"), lit(0)).cast("long").as("emb_rank"),
          (round(
            coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_emb")), lit(0.0)), 6) + lit(0.0))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    Some(s"""
      WITH dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      postings AS (
        SELECT doc_id, tok, count(*) AS tf
        FROM toks WHERE tok IN ('dup', 'vector', 'query')
        GROUP BY 1, 2),
      dfreq AS (SELECT tok, count(*) AS df FROM postings GROUP BY 1),
      scored AS (
        SELECT p.doc_id,
               ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0) *
               (p.tf * 2.2) /
               (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS w
        FROM postings p
        JOIN dfreq f USING (tok)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s),
      lex AS (
        SELECT doc_id, r_lex FROM (
          SELECT doc_id,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex
          FROM (SELECT doc_id, round(sum(w), 4) + 0.0 AS score
                FROM scored GROUP BY doc_id))
        WHERE r_lex <= 20),
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      emb AS (
        SELECT nid, r_emb FROM (
          SELECT nid, row_number() OVER (ORDER BY cos DESC, nid) AS r_emb
          FROM (SELECT c.vec_id AS nid,
                       ${dkDot("qv", "nv")} /
                       (sqrt(${dkDot("qv", "qv")}) * sqrt(${dkDot("nv", "nv")})) AS cos
                FROM (SELECT vec_id, embedding AS nv FROM embeddings WHERE vec_id <> 0) c
                CROSS JOIN q))
        WHERE r_emb <= 20)
      SELECT COALESCE(l.doc_id, e.nid) AS doc_id,
             CAST(COALESCE(l.r_lex, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(e.r_emb, 0) AS BIGINT) AS emb_rank,
             round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.r_lex), 0.0) +
                   COALESCE(CAST(1.0 AS DOUBLE) / (60 + e.r_emb), 0.0), 6) + 0.0 AS rrf
      FROM lex l FULL OUTER JOIN emb e ON l.doc_id = e.nid
      ORDER BY rrf DESC, doc_id
      LIMIT 10"""))

  /** Deterministic ±1 sign for the random-projection matrix cell
    * (i, j): a splitmix-style avalanche over the cell coordinates. The
    * matrix is a COMPILE-TIME constant — the same literal signs are
    * baked into both the Spark plan and the DuckDB oracle, so no
    * cross-engine hash agreement is needed. */
  private def rpSign(i: Int, j: Int): Double = {
    val m = ((i.toLong * 73856093L) ^ (j.toLong * 19349663L)) * 0x9E3779B97F4A7C15L
    if (((m >>> 33) & 1L) == 0L) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random projection (Achlioptas ±1 variant):
    * 64-dim float embeddings down to 8 dims via a fixed sign matrix,
    * plus the per-row norm-preservation ratio ‖Pe‖/√k ÷ ‖e‖ that JL
    * says concentrates near 1. Pure narrow per-row map — zero
    * shuffles, codegen'd higher-order functions, and at 100 TB it's
    * the cheap front half of every LSH/ANN pipeline (project first,
    * bucket the 8-dim result). Every fold is a strict left fold with a
    * double accumulator (Spark `aggregate` ≡ DuckDB `list_reduce` with
    * explicit casts) so the unrounded doubles are bit-identical; the
    * norm ratio is computed from the ROUNDED projections in both
    * engines so it inherits that determinism. */
  private val randomProjection = QueryDef(
    "llm_random_projection",
    (s, d) => {
      val (inDim, outDim) = (64, 8)
      def foldExpr(i: Int): String = {
        val signs = (0 until inDim).map(j => s"${rpSign(i, j)}D").mkString(", ")
        s"aggregate(zip_with(embedding, array($signs), (x, sg) -> CAST(x AS DOUBLE) * sg), 0D, (acc, v) -> acc + v)"
      }
      val raw = embeddings(s, d).select(
        col("vec_id") +:
          (0 until outDim).map(i => expr(foldExpr(i)).as(s"raw$i")) :+
          expr("aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("n2"): _*)
      val rounded = raw.select(
        col("vec_id") +:
          (0 until outDim).map(i => (round(col(s"raw$i"), 4) + lit(0.0)).as(s"p$i")) :+
          col("n2"): _*)
      val projNorm2 = (0 until outDim).map(i => col(s"p$i") * col(s"p$i")).reduce(_ + _)
      rounded
        .withColumn("norm_ratio",
          when(col("n2") > 0,
            round(sqrt(projNorm2 / lit(outDim.toDouble)) / sqrt(col("n2")), 4) + lit(0.0)))
        .drop("n2")
        .orderBy(col("vec_id"))
    },
    Some {
      val (inDim, outDim) = (64, 8)
      def dkProj(i: Int): String = {
        val signs = (0 until inDim).map(j => rpSign(i, j).toString).mkString(", ")
        s"list_reduce([CAST(0 AS DOUBLE)] || list_transform(generate_series(1, $inDim), j -> CAST(embedding[j] AS DOUBLE) * ([$signs])[j]), (acc, v) -> acc + v)"
      }
      val projCols = (0 until outDim).map(i => s"${dkProj(i)} AS raw$i").mkString(",\n               ")
      val roundCols = (0 until outDim).map(i => s"round(raw$i, 4) + 0.0 AS p$i").mkString(",\n               ")
      val normSum = (0 until outDim).map(i => s"p$i * p$i").mkString(" + ")
      s"""
      WITH raw AS (
        SELECT vec_id,
               $projCols,
               list_reduce([CAST(0 AS DOUBLE)] || list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v) AS n2
        FROM embeddings),
      rounded AS (
        SELECT vec_id,
               $roundCols,
               n2
        FROM raw)
      SELECT vec_id, ${(0 until outDim).map(i => s"p$i").mkString(", ")},
             CASE WHEN n2 > 0
                  THEN round(sqrt(($normSum) / $outDim.0) / sqrt(n2), 4) + 0.0 END AS norm_ratio
      FROM rounded
      ORDER BY vec_id"""
    })

  /** k-anonymity audit over quasi-identifiers (k=5): group the corpus
    * by the attribute tuple an adversary could join on — (lang,
    * source, 100-char length band) — and flag every group smaller
    * than k, whose documents are re-identifiable from metadata alone.
    * The release-risk complement of llm_pii_scrub (which handles
    * direct identifiers IN the text, not identifying combinations OF
    * attributes). One partial-agg shuffle on the QI tuple; the audit
    * table is bounded by the attribute-domain product, not the corpus,
    * so it stays tiny at 100 TB. */
  private val kanonAudit = QueryDef(
    "llm_kanon_audit",
    (s, d) => {
      documents(s, d)
        .withColumn("len_band", expr("n_chars div 100"))
        .groupBy(col("lang"), col("source"), col("len_band"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("sample_doc"))
        .withColumn("risky", (col("n_docs") < 5).cast("int"))
        .orderBy(col("lang"), col("source"), col("len_band"))
    },
    Some("""
      SELECT lang, source, n_chars // 100 AS len_band,
             count(*) AS n_docs,
             min(doc_id) AS sample_doc,
             CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS risky
      FROM documents
      GROUP BY 1, 2, 3
      ORDER BY lang, source, len_band"""))

  /** Binary-codec round-trip gate: REAL encoders (ImageIO writers +
    * hand-assembled RIFF/PPM containers) driven by integer parameters
    * derived from doc_id, decoded back through the production
    * [[graft.multimodal.Multimodal.decode]] tier — PNG/JPEG/GIF/BMP/
    * PPM/WAV/MJPEG-AVI all under the driver's hash gate, not just
    * specs. The oracle never sees bytes: because the construction is
    * parameter-deterministic, what the codec MUST parse out (dims,
    * frame counts, sample counts) is plain arithmetic over doc_id —
    * any drift in a header walker, the GIF frame walk, the AVI movi
    * scan, or the WAV chunk math flips the gate. Encode+decode run
    * distributed in mapPartitions (48 ids × 7 formats, each tiny);
    * the shape is the real decode tier's, so this also regression-
    * pins decode() precedence (e.g. AVI before WAV in the orElse
    * chain — both are RIFF). */
  private val multimodalCodecTwin = QueryDef(
    "llm_multimodal_codec_twin",
    (s, d) => {
      import s.implicits._
      import graft.multimodal.{MediaFixtures, Multimodal}
      val ids = documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 48).as[Long]
      ids.mapPartitions { it =>
        it.flatMap { id =>
          val g = (id % 32).toInt
          val pw = g % 9 + 1; val ph = g % 4 + 1
          val bw = g % 7 + 1; val bh = g % 5 + 1
          Seq(
            ("png", Multimodal.decode(MediaFixtures.png(pw, ph))),
            ("jpeg", Multimodal.decode(MediaFixtures.jpeg(pw, ph))),
            ("bmp", Multimodal.decode(MediaFixtures.bmp(bw, bh))),
            ("gif", Multimodal.decode(MediaFixtures.gif(bw, bh, g % 3 + 1))),
            ("ppm", Multimodal.decode(MediaFixtures.ppm(pw, bh))),
            ("wav", Multimodal.decode(MediaFixtures.wavPcm(g % 50 + 1))),
            ("avi", Multimodal.decode(MediaFixtures.aviMjpeg(2, 2, g % 4 + 2))),
            // IMA ADPCM: frame count rides the spec's fact chunk
            // (1 header sample + 2 per nibble byte)
            ("adpcm", Multimodal.decode(MediaFixtures.wavImaAdpcm(g, (g % 5 + 2) * 4))),
            // FLAC: rate/channels/total-samples ride STREAMINFO
            ("flac", Multimodal.decode(MediaFixtures.flacFixed(g, (g % 5 + 2) * 8)))
          ).map { case (fmt, (w, h, nf, _)) => (id, fmt, w, h, nf) }
        }
      }.toDF("doc_id", "fmt", "width", "height", "n_frames")
        .orderBy(col("doc_id"), col("fmt"))
    },
    Some("""
      WITH ids AS (
        SELECT doc_id, doc_id % 32 AS g FROM documents WHERE doc_id < 48)
      SELECT doc_id, fmt, CAST(width AS INT) AS width,
             CAST(height AS INT) AS height, CAST(n_frames AS INT) AS n_frames
      FROM (
        SELECT doc_id, 'png' AS fmt, g % 9 + 1 AS width, g % 4 + 1 AS height,
               1 AS n_frames FROM ids
        UNION ALL SELECT doc_id, 'jpeg', g % 9 + 1, g % 4 + 1, 1 FROM ids
        UNION ALL SELECT doc_id, 'bmp', g % 7 + 1, g % 5 + 1, 1 FROM ids
        UNION ALL SELECT doc_id, 'gif', g % 7 + 1, g % 5 + 1, g % 3 + 1 FROM ids
        UNION ALL SELECT doc_id, 'ppm', g % 9 + 1, g % 5 + 1, 1 FROM ids
        UNION ALL SELECT doc_id, 'wav', 8000, 1, g % 50 + 1 FROM ids
        UNION ALL SELECT doc_id, 'avi', 2, 2, g % 4 + 2 FROM ids
        UNION ALL SELECT doc_id, 'adpcm', 8000, 1, (g % 5 + 2) * 8 + 1 FROM ids
        UNION ALL SELECT doc_id, 'flac', 8000, 1, (g % 5 + 2) * 8 FROM ids)
      ORDER BY doc_id, fmt"""))

  /** IMA ADPCM decode gate at SAMPLE level — the codec-twin
    * discipline pushed from metadata into the predictive decode
    * itself: spec-faithful one-block mono ADPCM WAVs whose nibble
    * stream / initial predictor / initial step index are exact
    * integer formulas of doc_id, decoded through the production
    * [[graft.multimodal.Multimodal.audioStats]] path (the REAL
    * predictor + 89-entry step-table recurrence), while the oracle
    * re-runs the public IMA recurrence in a recursive CTE with the
    * tables as list literals — every decoded sample is pure integer
    * arithmetic, so peak, zero-crossings, and the sample count are
    * exact matches and RMS is bit-identical (integer Σs², one exact
    * division, correctly-rounded sqrt in both engines, 4dp round).
    * Any drift in the step tables, the clamp, the nibble order, or
    * the block header flips the gate. Scale shape: fixture build +
    * decode is partition-local flatMap work; the output is one row
    * per doc. */
  private val adpcmAudioTwin = QueryDef(
    "llm_adpcm_audio_twin",
    (s, d) => {
      import s.implicits._
      import graft.multimodal.{MediaFixtures, Multimodal}
      import graft.multimodal.Multimodal.MediaRow
      val media = documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 40).as[Long]
        .map(id => MediaRow(id, "audio",
          MediaFixtures.wavImaAdpcm((id % 32).toInt, ((id % 32 % 5) + 2).toInt * 4)))
      Multimodal.audioStats(media).toDF()
        .select(col("media_id").as("doc_id"), col("sample_rate"),
          col("n_samples"), (round(col("rms"), 4) + lit(0.0)).as("rms"),
          col("peak"), col("zero_crossings"))
        .orderBy(col("doc_id"))
    },
    Some {
      val steps = graft.multimodal.Multimodal.imaStepTableSql
      val idxTab = "[-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]"
      s"""
      WITH RECURSIVE par AS (
        SELECT doc_id, doc_id % 32 AS g,
               ((doc_id % 32) % 5 + 2) * 8 AS nnib,
               (doc_id % 32) * 997 % 24001 - 12000 AS p0,
               doc_id % 32 % 89 AS idx0
        FROM documents WHERE doc_id < 40),
      rec AS (
        SELECT doc_id, g, nnib, CAST(0 AS BIGINT) AS i,
               CAST(p0 AS BIGINT) AS pred, CAST(idx0 AS BIGINT) AS idx
        FROM par
        UNION ALL
        SELECT doc_id, g, nnib, i + 1,
               CAST(greatest(-32768, least(32767,
                 CASE WHEN nib >= 8 THEN pred - diff ELSE pred + diff END))
                 AS BIGINT),
               CAST(greatest(0, least(88, idx + ($idxTab)[CAST(nib AS INTEGER) + 1]))
                 AS BIGINT)
        FROM (
          SELECT doc_id, g, nnib, i, pred, idx, nib,
                 st // 8
                 + CASE WHEN nib % 2 = 1 THEN st // 4 ELSE 0 END
                 + CASE WHEN (nib // 2) % 2 = 1 THEN st // 2 ELSE 0 END
                 + CASE WHEN (nib // 4) % 2 = 1 THEN st ELSE 0 END AS diff
          FROM (
            SELECT r.*, (g * 7 + i * 5) % 16 AS nib,
                   ($steps)[CAST(idx AS INTEGER) + 1] AS st
            FROM rec r WHERE i < nnib) q) q2),
      stats AS (
        SELECT doc_id, count(*) AS n, max(abs(pred)) AS peak,
               CAST(sum(pred * pred) AS BIGINT) AS ss
        FROM rec GROUP BY 1),
      zc AS (
        SELECT doc_id,
               count(CASE WHEN neg <> lag_neg THEN 1 END) AS zc
        FROM (
          SELECT doc_id, (pred < 0) AS neg,
                 lag(pred < 0) OVER (PARTITION BY doc_id ORDER BY i) AS lag_neg
          FROM rec) t
        WHERE lag_neg IS NOT NULL
        GROUP BY 1)
      SELECT s.doc_id, 8000 AS sample_rate, CAST(n AS INT) AS n_samples,
             round(sqrt(CAST(ss AS DOUBLE) / n), 4) + 0.0 AS rms,
             CAST(peak AS INT) AS peak,
             CAST(coalesce(zc.zc, 0) AS BIGINT) AS zero_crossings
      FROM stats s LEFT JOIN zc ON zc.doc_id = s.doc_id
      ORDER BY s.doc_id"""
    })

  /** FLAC decode gate at SAMPLE level — the lossless-codec sibling of
    * llm_adpcm_audio_twin: spec-faithful single-frame FLAC streams
    * (RFC 9639 — STREAMINFO, sync + CRC-8 header, Rice(4) residuals,
    * FIXED order-2 predictor, whole-frame CRC-16) whose decoded
    * samples are the exact integer recurrence s(i) = 2s(i−1) −
    * s(i−2) + e(i) with formula-derived warmup and residuals
    * (MediaFixtures.flacSampleSeq), decoded through the production
    * [[graft.multimodal.Multimodal.audioStats]] path — real
    * bit-unpacking, zigzag Rice decode, polynomial reconstruction,
    * and CRC verification — while the oracle re-derives every sample
    * as TWO WINDOW PREFIX SUMS (the residual stream double-integrated:
    * d(i) = d(1) + Σe, s(i) = s(0) + Σd — no recursion needed because
    * a fixed order-2 predictor IS a double integrator). Peak,
    * zero-crossings, and sample count are exact; RMS is bit-identical
    * (integer Σs², one division, one sqrt, 4dp). Any drift in the
    * Rice fold, predictor coefficients, warmup order, CRC math, or
    * the bit reader flips the gate. Fixture build + decode is
    * partition-local flatMap work; one row per doc. */
  private val flacAudioTwin = QueryDef(
    "llm_flac_audio_twin",
    (s, d) => {
      import s.implicits._
      import graft.multimodal.{MediaFixtures, Multimodal}
      import graft.multimodal.Multimodal.MediaRow
      val media = documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 40).as[Long]
        .map(id => MediaRow(id, "audio",
          MediaFixtures.flacFixed((id % 32).toInt, ((id % 32 % 5) + 2).toInt * 8)))
      Multimodal.audioStats(media).toDF()
        .select(col("media_id").as("doc_id"), col("sample_rate"),
          col("n_samples"), (round(col("rms"), 4) + lit(0.0)).as("rms"),
          col("peak"), col("zero_crossings"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH par AS (
        SELECT doc_id, doc_id % 32 AS g, ((doc_id % 32) % 5 + 2) * 8 AS n
        FROM documents WHERE doc_id < 40),
      idx AS (
        SELECT doc_id, g, n, i
        FROM par, generate_series(0, 255) AS t(i) WHERE i < n),
      es AS (
        SELECT doc_id, g, n, i,
               CASE WHEN i >= 2 THEN (g * 7 + i * 5) % 16 - 8 ELSE 0 END AS e
        FROM idx),
      ds AS (
        SELECT doc_id, g, n, i,
               CASE WHEN i >= 1 THEN g % 40 - 20 +
                 CAST(sum(e) OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT)
               ELSE 0 END AS dd
        FROM es),
      ss AS (
        SELECT doc_id, n, i,
               (g * 31) % 200 - 100 +
                 CAST(sum(dd) OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS s
        FROM ds),
      stats AS (
        SELECT doc_id, count(*) AS n, max(abs(s)) AS peak,
               CAST(sum(s * s) AS BIGINT) AS sumsq
        FROM ss GROUP BY 1),
      zc AS (
        SELECT doc_id,
               count(CASE WHEN neg <> lag_neg THEN 1 END) AS zc
        FROM (
          SELECT doc_id, (s < 0) AS neg,
                 lag(s < 0) OVER (PARTITION BY doc_id ORDER BY i) AS lag_neg
          FROM ss) t
        WHERE lag_neg IS NOT NULL
        GROUP BY 1)
      SELECT st.doc_id, 8000 AS sample_rate, CAST(st.n AS INT) AS n_samples,
             round(sqrt(CAST(sumsq AS DOUBLE) / st.n), 4) + 0.0 AS rms,
             CAST(peak AS INT) AS peak,
             CAST(coalesce(zc.zc, 0) AS BIGINT) AS zero_crossings
      FROM stats st LEFT JOIN zc ON zc.doc_id = st.doc_id
      ORDER BY st.doc_id"""))

  /** Video scene-cut detection over REALLY-DECODED frames — the
    * temporal member of the multimodal tier (codec metadata → pixels
    * → now frame DYNAMICS): per video, the integer ITU-601 luma sum
    * of every frame, adjacent-frame |Δ|, and a cut flag where the
    * delta clears the threshold — the shot-boundary pass a video
    * training pipeline runs before sampling clips. Fixtures are
    * uncompressed BI_RGB AVIs (MediaFixtures.aviDib): real RIFF
    * container, real bottom-up-BGR stride-padded frame decode
    * (Multimodal.dibImage), pixels from an exact integer formula —
    * so the oracle recomputes every luma sum as PURE ARITHMETIC and
    * any container/stride/row-order/luma defect flips the gate
    * (lossy MJPEG could never offer this; that's why the DIB path
    * exists). Each video has one true cut at frame (doc_id % 4 + 1):
    * within-scene deltas are exactly 0, the cross-scene delta is
    * ≥ w·h·120 ≫ the threshold. Scale shape: fixture build + decode
    * is partition-local flatMap work (1 row → 6 frame rows); the
    * only shuffle is the per-video lag window on a 6-row frame. */
  private val videoSceneCut = QueryDef(
    "llm_video_scene_cut",
    (s, d) => {
      import s.implicits._
      import graft.multimodal.{MediaFixtures, Multimodal}
      val ids = documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 40).as[Long]
      val frames = ids.flatMap { id =>
        val b = (id % 4 + 1).toInt
        val shifts = (0 until 6).map(f =>
          ((id * 3) % 97 + (if (f >= b) 120 else 0)).toInt)
        val avi = MediaFixtures.aviDib(16, 12, shifts)
        (0 until 6).map(f =>
          (id, f, Multimodal.frameLumaSum(avi, f).getOrElse(-1L)))
      }.toDF("doc_id", "frame_no", "luma_sum")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
      frames
        .withColumn("delta",
          coalesce(abs(col("luma_sum") - lag(col("luma_sum"), 1).over(w)), lit(0L)))
        .select(col("doc_id"), col("frame_no"), col("luma_sum"), col("delta"),
          when(col("delta") > 9600L, 1).otherwise(0).as("is_cut"))
        .orderBy(col("doc_id"), col("frame_no"))
    },
    Some("""
      WITH ids AS (
        SELECT doc_id, doc_id % 4 + 1 AS b, (doc_id * 3) % 97 AS base
        FROM documents WHERE doc_id < 40),
      fr AS (
        SELECT doc_id, f,
               base + CASE WHEN f >= b THEN 120 ELSE 0 END AS s
        FROM ids, generate_series(0, 5) AS g(f)),
      ls AS (
        SELECT doc_id, f,
               CAST(sum((x * 7 + y * 11 + s) % 256) AS BIGINT) AS luma_sum
        FROM fr,
             generate_series(0, 15) AS gx(x),
             generate_series(0, 11) AS gy(y)
        GROUP BY 1, 2),
      dl AS (
        SELECT doc_id, CAST(f AS INT) AS frame_no, luma_sum,
               coalesce(abs(luma_sum - lag(luma_sum)
                 OVER (PARTITION BY doc_id ORDER BY f)), 0) AS delta
        FROM ls)
      SELECT doc_id, frame_no, luma_sum, CAST(delta AS BIGINT) AS delta,
             CASE WHEN delta > 9600 THEN 1 ELSE 0 END AS is_cut
      FROM dl
      ORDER BY doc_id, frame_no"""))

  /** Preference-pair construction for DPO/RLHF-style training — the
    * step that turns a scored corpus into (chosen, rejected) pairs:
    * within each (lang, source) "prompt group", the best- and
    * worst-scoring documents pair up, with the margin as the pair's
    * training weight. The score is EXACT-integer quality (distinct-
    * token-percentage · 1000 + capped length: lexical diversity
    * dominating, length tie-breaking), so argmax/argmin are
    * branch-safe; Spark picks them with min/max over a (score,
    * doc_id) struct — ONE map-side-combinable aggregation, no
    * per-group window sort — while the oracle uses rank-1 windows
    * with the identical (score, doc_id) tie order, because DuckDB's
    * max_by leaves ties unspecified. Groups need ≥ 2 docs and a
    * strictly positive margin (a pair with no quality gap teaches
    * nothing). At 100 TB: one shuffle at (lang, source) granularity;
    * the struct carries only two ints per row into the combiner. */
  private val preferencePairs = QueryDef(
    "llm_preference_pairs",
    (s, d) => {
      val score = expr(SharedExprs.qualityScoreSpark)
      val scored = documents(s, d)
        .select(col("lang"), col("source"), col("doc_id"),
          score.cast("long").as("score"))
      scored.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("score"), col("doc_id"))).as("hi"),
          min(struct(col("score"), col("doc_id"))).as("lo"))
        .filter(col("n_docs") >= 2 && col("hi.score") > col("lo.score"))
        .select(col("lang"), col("source"), col("n_docs"),
          col("hi.doc_id").as("chosen_id"), col("hi.score").as("chosen_score"),
          col("lo.doc_id").as("rejected_id"), col("lo.score").as("rejected_score"),
          (col("hi.score") - col("lo.score")).as("margin"))
        .orderBy(col("lang"), col("source"))
    },
    Some(s"""
      WITH scored AS (
        SELECT lang, source, doc_id,
               ${SharedExprs.qualityScoreDuck} AS score
        FROM documents),
      ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY lang, source
                 ORDER BY score DESC, doc_id DESC) AS rk_hi,
               row_number() OVER (PARTITION BY lang, source
                 ORDER BY score ASC, doc_id ASC) AS rk_lo,
               count(*) OVER (PARTITION BY lang, source) AS n_docs
        FROM scored),
      hi AS (SELECT lang, source, n_docs, doc_id AS chosen_id,
                    score AS chosen_score FROM ranked WHERE rk_hi = 1),
      lo AS (SELECT lang, source, doc_id AS rejected_id,
                    score AS rejected_score FROM ranked WHERE rk_lo = 1)
      SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs,
             chosen_id, chosen_score, rejected_id, rejected_score,
             chosen_score - rejected_score AS margin
      FROM hi JOIN lo USING (lang, source)
      WHERE n_docs >= 2 AND chosen_score > rejected_score
      ORDER BY lang, source"""))

  /** Differentially-private histogram release — the publication step
    * after llm_kanon_audit's risk scan and llm_pii_scrub's redaction:
    * per-(lang, source) document counts released with Laplace(1/ε)
    * noise (ε = 1, count sensitivity 1), the standard DP mechanism
    * for sharing corpus composition without leaking membership. The
    * noise draw is DETERMINISTIC per group (the kdb_bootstrap_ci
    * discipline: a seeded draw is a pure function both engines
    * compute, which is what makes a DP release oracle-gatable at
    * all): u ∈ (−1, 1) from the group key's md5-prefix hash60, then
    * the Laplace inverse CDF −sign(u)·ln(1 − |u|)/ε. ln is libm but
    * the release rounds to 4dp (the llm_skipgram_cooc PMI
    * precedent); ORDER is by the exact group key, never the noised
    * value. One aggregation shuffle; noise is per-GROUP work on the
    * aggregate-sized result. True counts never appear in the
    * output. */
  private val dpRelease = QueryDef(
    "llm_dp_release",
    (s, d) => {
      val u = ((hash60(concat(col("lang"), lit("|"), col("source"))) % 2000001L)
        - lit(1000000L)).cast("double") / 1000001.0
      documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .withColumn("u", u)
        .select(col("lang"), col("source"),
          (round(col("n") + -signum(col("u")) * log(lit(1.0) - abs(col("u"))), 4)
            + lit(0.0)).as("released_count"),
          lit(1.0).as("epsilon"), lit(1).as("l1_sensitivity"))
        .orderBy(col("lang"), col("source"))
    },
    Some(s"""
      WITH g AS (
        SELECT lang, source, count(*) AS n,
               CAST((${dkHashP("lang || '|' || source", 2000001L)}
                 - 1000000) AS DOUBLE) / 1000001.0 AS u
        FROM documents GROUP BY 1, 2)
      SELECT lang, source,
             round(n + -sign(u) * ln(1.0 - abs(u)), 4) + 0.0 AS released_count,
             CAST(1.0 AS DOUBLE) AS epsilon, 1 AS l1_sensitivity
      FROM g
      ORDER BY lang, source"""))

  /** Dedup-quality evaluation: recall/precision of the MinHash-LSH
    * candidate generator against exact n-gram-Jaccard ground truth
    * (pairs at J ≥ 0.5) on a bounded doc subset — the harness that
    * answers "is 4 bands × 2 rows enough?" before a 100 TB run, where
    * re-sharding signatures costs a full pass. Both sides reuse the
    * production machinery (lshPairs, the inverted shingle join); the
    * eval overlay is a full-outer join of two already-bounded pair
    * tables plus a one-row rollup. The J ≥ 0.5 threshold compares the
    * RAW double — one IEEE division of exact integer counts, identical
    * in both engines, so no rounding is needed at the cut. */
  private val dedupEval = QueryDef(
    "llm_dedup_eval",
    (s, d) => {
      val pred = col("doc_id") < 400
      // the bounded (doc_id < 400 by design) exploded shingle table
      // feeds sizes + both truth self-join legs: materialize once
      val ex = shingleRows(s, d, pred).distinct().localCheckpoint(true)
      val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val truth = ex.as("a").join(ex.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_inter"))
        .join(broadcast(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("nsh", "n1")), "d1")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("nsh", "n2")), "d2")
        .filter(col("n_inter").cast("double") /
          (col("n1") + col("n2") - col("n_inter")) >= 0.5)
        .select(col("d1"), col("d2"), lit(true).as("in_t"))
      val cand = lshPairs(s, d, pred)
        .select(col("d1"), col("d2"), lit(true).as("in_c"))
      truth.join(cand, Seq("d1", "d2"), "full_outer")
        .agg(count(when(col("in_t"), 1)).as("n_truth"),
          count(when(col("in_c"), 1)).as("n_cand"),
          count(when(col("in_t") && col("in_c"), 1)).as("n_hit"))
        .select(col("n_truth"), col("n_cand"), col("n_hit"),
          when(col("n_truth") > 0,
            round(col("n_hit") / col("n_truth"), 4)).as("recall"),
          when(col("n_cand") > 0,
            round(col("n_hit") / col("n_cand"), 4)).as("prec"))
    },
    Some(s"""
      WITH ${dkMinhashCteWhere("WHERE doc_id < 400")},
      ${dkLshPairsCtes},
      jd AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(0, len(string_split(text, ' ')) - 3),
                 i -> string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2] || ' ' ||
                      string_split(text, ' ')[i+3])) AS sh
        FROM documents WHERE doc_id < 400),
      jsizes AS (SELECT doc_id, len(sh) AS nsh FROM jd),
      jex AS (SELECT doc_id, unnest(sh) AS sstr FROM jd),
      jinter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
        FROM jex a JOIN jex b ON a.sstr = b.sstr AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      truth AS (
        SELECT d1, d2 FROM jinter
        JOIN jsizes s1 ON s1.doc_id = d1
        JOIN jsizes s2 ON s2.doc_id = d2
        WHERE CAST(n_inter AS DOUBLE) / (s1.nsh + s2.nsh - n_inter) >= 0.5),
      m AS (
        SELECT t.d1 IS NOT NULL AS in_t, c.d1 IS NOT NULL AS in_c
        FROM truth t FULL OUTER JOIN lsh_pairs c
          ON t.d1 = c.d1 AND t.d2 = c.d2)
      SELECT count(CASE WHEN in_t THEN 1 END) AS n_truth,
             count(CASE WHEN in_c THEN 1 END) AS n_cand,
             count(CASE WHEN in_t AND in_c THEN 1 END) AS n_hit,
             CASE WHEN count(CASE WHEN in_t THEN 1 END) > 0
                  THEN round(CAST(count(CASE WHEN in_t AND in_c THEN 1 END) AS DOUBLE) /
                             count(CASE WHEN in_t THEN 1 END), 4) END AS recall,
             CASE WHEN count(CASE WHEN in_c THEN 1 END) > 0
                  THEN round(CAST(count(CASE WHEN in_t AND in_c THEN 1 END) AS DOUBLE) /
                             count(CASE WHEN in_c THEN 1 END), 4) END AS prec
      FROM m"""))

  /** LSH banding-geometry sweep — the tuning run a dedup pipeline
    * executes BEFORE committing a band/row split: with 8 minhash
    * perms, every factorization b×r (8×1, 4×2, 2×4, 1×8) trades
    * recall for precision along the S-curve P(cand) = 1 − (1 − J^r)^b
    * (Broder / MMDS ch.3), and the right choice depends on the
    * corpus' actual similarity mass, which only a measured sweep
    * shows. Each config's band key is hash60 of
    * "rows:band:sig…sig" — ONE packing rendered identically in both
    * engines (P-base positional packing overflows int64 at r = 4,
    * which is why the production 4×2 key packs positionally but the
    * sweep hashes). Truth = exact Jaccard ≥ 0.5 on the
    * llm_dedup_eval subset (doc_id < 400, same bound, shared
    * machinery); the signature table checkpoints once and all four
    * configs band off it; candidates per config come from one
    * grouped self-join. Everything emitted is exact counts + two
    * single divisions. Expected shape (and the reason the prod
    * config is 4×2): recall falls and precision rises monotonically
    * from 8×1 to 1×8. */
  private val lshBandSweep = QueryDef(
    "llm_lsh_band_sweep",
    (s, d) => {
      val pred = col("doc_id") < 400
      val ex = shingleRows(s, d, pred).distinct().localCheckpoint(true)
      val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val truth = ex.as("a").join(ex.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_inter"))
        .join(broadcast(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("nsh", "n1")), "d1")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("nsh", "n2")), "d2")
        .filter(col("n_inter").cast("double") /
          (col("n1") + col("n2") - col("n_inter")) >= 0.5)
        .select(col("d1"), col("d2"), lit(true).as("in_t"))
        .localCheckpoint(true)
      val sig = minhashSigCore(s, d, pred).localCheckpoint(true)
      def bandsFor(rows: Int): DataFrame = {
        val nb = 8 / rows
        val keys = (0 until nb).map { b =>
          hash60(concat_ws(":",
            (lit(rows.toString) +: lit(b.toString) +:
              (0 until rows).map(r => col(s"sig${b * rows + r}").cast("string"))): _*))
        }
        sig.select(lit(s"${nb}b x ${rows}r").as("cfg"), col("doc_id"),
          posexplode(array(keys: _*)).as(Seq("band", "bkey")))
      }
      val bands = bandsFor(1).union(bandsFor(2)).union(bandsFor(4)).union(bandsFor(8))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.cfg") === col("b.cfg") && col("a.band") === col("b.band") &&
            col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.cfg").as("cfg"), col("a.doc_id").as("d1"),
          col("b.doc_id").as("d2"))
        .distinct()
      val truthN = truth.agg(count(lit(1)).as("n_truth"))
      cand.join(truth, Seq("d1", "d2"), "left_outer")
        .groupBy(col("cfg"))
        .agg(count(lit(1)).as("n_cand"),
          count(when(col("in_t"), 1)).as("n_hit"))
        .crossJoin(broadcast(truthN))
        .select(col("cfg"), col("n_truth"), col("n_cand"), col("n_hit"),
          when(col("n_truth") > 0,
            round(col("n_hit").cast("double") / col("n_truth"), 4) + lit(0.0))
            .as("recall"),
          (round(col("n_hit").cast("double") / col("n_cand"), 4) + lit(0.0))
            .as("prec"))
        .orderBy(col("cfg"))
    },
    Some {
      val bandSelects = Seq(1, 2, 4, 8).flatMap { rows =>
        val nb = 8 / rows
        (0 until nb).map { b =>
          val sigConcat = (0 until rows)
            .map(r => s"sig${b * rows + r}").mkString(" || ':' || ")
          s"""SELECT doc_id, '${nb}b x ${rows}r' AS cfg, $b AS band,
               ('0x' || substr(md5('$rows' || ':' || '$b' || ':' ||
                 $sigConcat), 1, 15))::BIGINT AS bkey
             FROM sigf"""
        }
      }.mkString("\n        UNION ALL ")
      s"""
      WITH ${dkMinhashCteWhere("WHERE doc_id < 400")},
      sigf AS (SELECT * FROM sig WHERE sig0 IS NOT NULL),
      bands AS MATERIALIZED (
        $bandSelects),
      cand AS (
        SELECT DISTINCT a.cfg, a.doc_id AS d1, b.doc_id AS d2
        FROM bands a JOIN bands b
          ON a.cfg = b.cfg AND a.band = b.band AND a.bkey = b.bkey
         AND a.doc_id < b.doc_id),
      jd AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(0, len(string_split(text, ' ')) - 3),
                 i -> string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2] || ' ' ||
                      string_split(text, ' ')[i+3])) AS sh
        FROM documents WHERE doc_id < 400),
      jsizes AS (SELECT doc_id, len(sh) AS nsh FROM jd),
      jex AS (SELECT doc_id, unnest(sh) AS sstr FROM jd),
      jinter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
        FROM jex a JOIN jex b ON a.sstr = b.sstr AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      truth AS MATERIALIZED (
        SELECT d1, d2 FROM jinter
        JOIN jsizes s1 ON s1.doc_id = d1
        JOIN jsizes s2 ON s2.doc_id = d2
        WHERE CAST(n_inter AS DOUBLE) / (s1.nsh + s2.nsh - n_inter) >= 0.5),
      tn AS (SELECT count(*) AS n_truth FROM truth)
      SELECT c.cfg, tn.n_truth,
             count(*) AS n_cand,
             count(t.d1) AS n_hit,
             CASE WHEN tn.n_truth > 0 THEN
               round(CAST(count(t.d1) AS DOUBLE) / tn.n_truth, 4) + 0.0 END
               AS recall,
             round(CAST(count(t.d1) AS DOUBLE) / count(*), 4) + 0.0 AS prec
      FROM cand c
      LEFT JOIN truth t ON t.d1 = c.d1 AND t.d2 = c.d2
      CROSS JOIN tn
      GROUP BY c.cfg, tn.n_truth
      ORDER BY c.cfg"""
    })

  /** PageRank centrality over the near-dup similarity graph (5 power
    * iterations, damping 0.85, undirected LSH-pair edges) — picks the
    * most-connected representative inside each duplicate
    * neighbourhood, the graph-analytics sibling of the
    * pointer-jumping connected components in graft.operators.Dedup.
    * Scale shape: the graph is the (already candidate-bounded) LSH
    * pair set, never the corpus; each iteration is one groupBy on the
    * edge list; lineage is truncated per iteration (localCheckpoint —
    * the Dedup.scala lesson) so 5 rounds don't stack a quadratic
    * plan. Cross-engine determinism: neighbour sums are
    * order-dependent doubles, so each iteration quantizes to 10dp in
    * BOTH engines (absorbing ~1e-16 summation noise) and the oracle
    * unrolls the 5 iterations as chained GROUP BY CTEs (recursive
    * terms can't aggregate in standard SQL). The one driver action is
    * a single node count for the teleport constant — bounded, like
    * Ivf's k-row collect. */
  private val pagerank = QueryDef(
    "llm_pagerank_centrality",
    (s, d) => {
      val pairs = lshPairs(s, d)
      val edges = pairs.select(col("d1").as("u"), col("d2").as("v"))
        .union(pairs.select(col("d2").as("u"), col("d1").as("v")))
        .localCheckpoint(true)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      // r14: adj is loop-INVARIANT — materialize it once instead of
      // re-paying the deg groupBy + join inside all 5 iterations; and
      // broadcast-hint the rank vector under its MEASURED node count
      // (SizedBroadcast: localCheckpoint erases size stats, so the
      // planner was sort-merge-joining the edge list every round;
      // a genuinely huge node set stays on the shuffle join —
      // guide §3.1)
      val adj = edges.join(deg, "u").localCheckpoint(true)
      val n = edges.select(col("u")).distinct().count()
      var rank = edges.select(col("u").as("node")).distinct()
        .withColumn("r", lit(1.0 / n))
      for (_ <- 1 to 5) {
        rank = adj.join(graft.operators.SizedBroadcast.hint(rank, n),
            col("u") === col("node"))
          .groupBy(col("v"))
          .agg(sum(col("r") / col("deg")).as("m"))
          .select(col("v").as("node"),
            round(lit(0.15 / n) + lit(0.85) * col("m"), 10).as("r"))
          .localCheckpoint(true)
      }
      rank.select(col("node"), (round(col("r"), 6) + lit(0.0)).as("pr"))
        .orderBy(col("pr").desc, col("node"))
    },
    Some {
      val iters = (1 to 5).map { k =>
        s"""pr$k AS (
        SELECT e.v AS node,
               round(0.15 / nc.c + 0.85 * sum(p.r / d.deg), 10) AS r
        FROM pr${k - 1} p
        JOIN edges e ON e.u = p.node
        JOIN deg d ON d.u = p.node
        CROSS JOIN ncnt nc
        GROUP BY e.v, nc.c)"""
      }.mkString(",\n      ")
      s"""
      WITH ${dkMinhashCte},
      ${dkLshPairsCtes},
      edges AS (
        SELECT d1 AS u, d2 AS v FROM lsh_pairs
        UNION ALL
        SELECT d2 AS u, d1 AS v FROM lsh_pairs),
      deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
      ncnt AS (SELECT count(DISTINCT u) AS c FROM edges),
      pr0 AS (
        SELECT DISTINCT u AS node, 1.0 / nc.c AS r
        FROM edges CROSS JOIN ncnt nc),
      $iters
      SELECT node, round(r, 6) + 0.0 AS pr
      FROM pr5
      ORDER BY pr DESC, node"""
    })

  /** k-core decomposition of the near-dup similarity graph (coreness
    * capped at 3) — the density complement of the component/centrality
    * views: a doc's coreness separates "attached to one near-dup"
    * (coreness 1) from "inside a dense mirror cluster" (coreness ≥ 3),
    * which is how a curation pipeline picks WHICH member of a template
    * farm to keep and how aggressively to downweight it. Classic
    * iterative peeling (Matula–Beck): for k ∈ {2,3}, repeatedly drop
    * nodes whose surviving degree < k; coreness = 1 + [in 2-core] +
    * [in 3-core] (3-core ⊆ 2-core). Scale shape: the graph is the
    * candidate-bounded LSH pair set, never the corpus; each peel round
    * is one degree groupBy + two semi joins, lineage truncated per
    * round (the Dedup.scala lesson). Rounds are FIXED at 6 to mirror
    * the oracle's unrolled CTEs (recursive SQL can't aggregate over
    * the recursive relation), and non-convergence is LOUD: if any
    * surviving node still has degree < k after round 6, the query
    * throws (one bounded driver-side count per k — the connected-
    * components discipline) rather than emitting a silently-shallow
    * core. Everything emitted is exact integers. */
  private val kcore = QueryDef(
    "llm_kcore",
    (s, d) => {
      val pairs = lshPairs(s, d)
      val edges0 = pairs.select(col("d1").as("u"), col("d2").as("v"))
        .union(pairs.select(col("d2").as("u"), col("d1").as("v")))
        .distinct().localCheckpoint(true)
      // r14: keep is a node-id set whose checkpoint erased size stats —
      // broadcast-hint it under the MEASURED node bound (SizedBroadcast;
      // a huge node set stays on the shuffle join) so each peel's two
      // semi joins are broadcast-hash instead of edge-list sort-merges
      // (guide §3.1)
      val nNodes = edges0.select(col("u")).distinct().count()
      def bcN(df: DataFrame) = graft.operators.SizedBroadcast.hint(df, nNodes)
      // peel k=3 from the 2-core's surviving edges (3-core ⊆ 2-core),
      // not from scratch — halves the checkpointed peel stages
      def coreNodes(k: Int, start: DataFrame): (DataFrame, DataFrame) = {
        var e = start
        for (_ <- 1 to 6) {
          val keep = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= k).select(col("u").as("n"))
            .localCheckpoint(true)
          e = e.join(bcN(keep), col("u") === col("n"), "left_semi")
            .join(bcN(keep), col("v") === col("n"), "left_semi")
            .localCheckpoint(true)
        }
        val stragglers = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") < k).count() // bounded: candidate-graph nodes
        require(stragglers == 0,
          s"llm_kcore: $k-core peel did not converge in 6 rounds " +
            s"($stragglers under-degree nodes remain) — raise the round cap")
        (e.select(col("u").as("n")).distinct(), e)
      }
      val deg0 = edges0.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val (n2, core2Edges) = coreNodes(2, edges0)
      val (n3, _) = coreNodes(3, core2Edges)
      val in2 = n2.withColumn("c2", lit(1))
      val in3 = n3.withColumn("c3", lit(1))
      deg0.join(in2, col("u") === in2("n"), "left_outer").drop("n")
        .join(in3, col("u") === in3("n"), "left_outer").drop("n")
        .select(col("u").as("doc_id"), col("deg"),
          (lit(1) + coalesce(col("c2"), lit(0)) +
            coalesce(col("c3"), lit(0))).as("coreness"))
        .orderBy(col("doc_id"))
    },
    Some {
      // AS MATERIALIZED: DuckDB inlines CTEs by default, and each peel
      // round references its predecessor 3×, so an inlined unroll
      // re-scans the base 3⁶ times (it ran out of file handles).
      def rounds(k: Int): String = (1 to 6).map { r =>
        s"""e${k}_$r AS MATERIALIZED (
        SELECT e.u, e.v FROM e${k}_${r - 1} e
        JOIN (SELECT u FROM e${k}_${r - 1} GROUP BY u
              HAVING count(*) >= $k) ku ON ku.u = e.u
        JOIN (SELECT u FROM e${k}_${r - 1} GROUP BY u
              HAVING count(*) >= $k) kv ON kv.u = e.v)"""
      }.mkString(",\n      ")
      s"""
      WITH ${dkMinhashCte},
      ${dkLshPairsCtes},
      edges AS MATERIALIZED (
        SELECT DISTINCT u, v FROM (
          SELECT d1 AS u, d2 AS v FROM lsh_pairs
          UNION ALL
          SELECT d2 AS u, d1 AS v FROM lsh_pairs)),
      e2_0 AS (SELECT u, v FROM edges),
      ${rounds(2)},
      e3_0 AS (SELECT u, v FROM e2_6),
      ${rounds(3)},
      n2 AS (SELECT DISTINCT u FROM e2_6),
      n3 AS (SELECT DISTINCT u FROM e3_6),
      deg0 AS (SELECT u, count(*) AS deg FROM edges GROUP BY 1)
      SELECT d.u AS doc_id, d.deg,
             CAST(1 + (CASE WHEN n2.u IS NOT NULL THEN 1 ELSE 0 END)
                    + (CASE WHEN n3.u IS NOT NULL THEN 1 ELSE 0 END)
                  AS INT) AS coreness
      FROM deg0 d
      LEFT JOIN n2 ON n2.u = d.u
      LEFT JOIN n3 ON n3.u = d.u
      ORDER BY doc_id"""
    })

  /** Exact set-similarity join via df-ordered PREFIX FILTERING (the
    * SSJoin/PPJoin family, Chaudhuri et al. ICDE'06 / Xiao et al.
    * WWW'08) — all pairs with shingle-set Jaccard ≥ 0.8, EXACT (no
    * LSH recall loss), without the full inverted-index join. Each
    * doc's distinct word-3-gram shingles are totally ordered by
    * (global df ASC, shingle ASC) — rarest first — and only the first
    * p = n − ⌈0.8·n⌉ + 1 shingles (the prefix, ~20% of the set at
    * t=0.8) enter the candidate join: the prefix-filter theorem says
    * two sets with |x∩y| ≥ ⌈t·max(|x|,|y|)⌉ must collide inside those
    * prefixes, so no qualifying pair is lost. A length filter
    * (5·min(n1,n2) ≥ 4·max — Jaccard ≥ t forces min ≥ t·max) prunes
    * candidates before verification, and verification fetches ONLY
    * candidate pairs' full sets (array_intersect on two sorted
    * arrays), with the threshold applied in exact integer
    * cross-multiplication (5·|∩| ≥ 4·|∪|) so the t=0.8 boundary can't
    * float-split between engines. Scale shape vs the inverted join
    * (llm_dedup_ngram_jaccard's candidate step): that one shuffles
    * EVERY shingle occurrence and emits a row per shared shingle per
    * pair — quadratic in df on common shingles; here common shingles
    * almost never make a prefix (they sort last), so the candidate
    * join touches only rare tokens and the df² blowup term vanishes.
    * The oracle is the INDEPENDENT full inverted join with the same
    * integer threshold — if prefix filtering ever dropped a pair, the
    * hash gate would catch it. */
  private val ppjoinExact = QueryDef(
    "llm_ppjoin_exact",
    (s, d) => {
      // ONE materialization of the distinct-shingle table: doc sizes,
      // global df, the prefix window, AND the verification set
      // collection all read this cache — without it each consumer
      // re-derives the tokenize→window→explode pipeline from raw text
      // (4 derivations; r12's honest-cache cost was 2.4× the cached
      // number). persist, not localCheckpoint: lineage stays visible
      // to the plan pin, and the harnesses clearCache() after every
      // query so the blocks never outlive one run.
      val sh = shingleRows(s, d, lit(true)).distinct().persist()
      // df and n as WINDOW counts, not groupBy+join chains: the old
      // shape paid two aggregations plus two sort-merge joins back
      // onto sh (four exchanges); this is exactly two exchanges of sh
      // — one clustering by shingle for df, one by doc_id that the rk
      // and n windows then share — with nothing joined back. Measured
      // same-session against the r12 shape AND both hybrids (df as
      // partial-agg join; windows without the persist) at ×1/×5/×20
      // replicated data: this variant won at every factor
      // (4.1/7.4/20.6 s vs the r12 shape's 7.8/10.7/26.2) — the
      // partial-agg df join does NOT beat the window count here
      // because the join side re-shuffles the full sh table anyway,
      // paying the df aggregation on top.
      val ordered = sh
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      val prefix = ordered
        .filter(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
        .select(col("doc_id"), col("shingle"), col("n"))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id") &&
            lit(5) * least(col("a.n"), col("b.n")) >=
              lit(4) * greatest(col("a.n"), col("b.n")))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
        // persist: the candidate set has TWO consumers (the doc-id
        // semi-join and the verification join); without a cache
        // boundary each re-derives the prefix window + self-join.
        .persist()
      // collect full sets ONLY for candidate docs: the BROADCAST
      // semi-join cuts the heavy shingle-payload shuffle to the
      // candidate universe before the groupBy — without it, every
      // corpus doc's full set would shuffle just to be discarded by
      // the join below (the defining anti-pattern at 100 TB, where
      // candidates ≪ corpus). The semi-join reads the SAME sh cache
      // as the prefix branch, so the exchange-reuse break that made
      // this cost 2× locally in r12 is gone. broadcast() is
      // justified: candDocs is output-bounded (2·|pairs| ids).
      val candDocs = cand.select(col("d1").as("doc_id"))
        .union(cand.select(col("d2").as("doc_id"))).distinct()
      val sets = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .groupBy(col("doc_id"))
        // no sort_array: only size(array_intersect(...)) is consumed,
        // and the intersection CARDINALITY of two distinct-element
        // arrays is order-independent — sorting pays n·log n per doc
        // for nothing
        .agg(collect_list(col("shingle")).as("set"),
          count(lit(1)).as("n"))
      cand
        .join(sets.select(col("doc_id").as("d1"), col("set").as("s1"),
          col("n").as("n1")), "d1")
        .join(sets.select(col("doc_id").as("d2"), col("set").as("s2"),
          col("n").as("n2")), "d2")
        .withColumn("n_inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
        .filter(lit(5) * col("n_inter") >= lit(4) * (col("n1") + col("n2") - col("n_inter")))
        .select(col("d1"), col("d2"), col("n1"), col("n2"), col("n_inter"),
          round(col("n_inter").cast("double") /
            (col("n1") + col("n2") - col("n_inter")), 4).as("jaccard"))
        .orderBy(col("d1"), col("d2"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(0, len(string_split(text, ' ')) - 3),
                 i -> string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2] || ' ' ||
                      string_split(text, ' ')[i+3])) AS sh
        FROM documents),
      sizes AS (SELECT doc_id, len(sh) AS n FROM docs WHERE len(sh) > 0),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
      inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ni
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT d1, d2, s1.n AS n1, s2.n AS n2, ni AS n_inter,
             round(CAST(ni AS DOUBLE) / (s1.n + s2.n - ni), 4) AS jaccard
      FROM inter
      JOIN sizes s1 ON s1.doc_id = d1
      JOIN sizes s2 ON s2.doc_id = d2
      WHERE 5 * ni >= 4 * (s1.n + s2.n - ni)
      ORDER BY d1, d2"""))

  /** Shared 4-round synchronous label propagation over the LSH
    * candidate graph: every node starts labelled with its own id; each
    * round it adopts the most frequent label among its NEIGHBOURS,
    * ties broken by smallest label (a total order, so the update is
    * deterministic — asynchronous LPA's order-dependence is exactly
    * what a cross-engine gate can't tolerate). Rounds are FIXED at 4
    * to mirror the oracle's unrolled CTEs; per-round localCheckpoint
    * truncates lineage (the Dedup.scala / llm_kcore lesson). Returns
    * (edges, labels). */
  private def lpaLabels(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val pairs = lshPairs(s, d)
    val edges = pairs.select(col("d1").as("u"), col("d2").as("v"))
      .union(pairs.select(col("d2").as("u"), col("d1").as("v")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node"))
    // r14: labels is node-sized but its checkpoint erased size stats —
    // broadcast-hint it under the MEASURED node count (SizedBroadcast;
    // a huge node set stays on the shuffle join) so each round's edge
    // join is broadcast-hash instead of a full edge-list sort-merge
    // (guide §3.1)
    val nNodes = labels.count()
    for (_ <- 1 to 4) {
      val w = Window.partitionBy(col("v")).orderBy(col("cnt").desc, col("lbl"))
      labels = edges.join(graft.operators.SizedBroadcast.hint(labels, nNodes),
          col("u") === col("node"))
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("v").as("node"), col("lbl"))
        .localCheckpoint(true)
    }
    (edges, labels)
  }

  /** DuckDB CTEs mirroring [[lpaLabels]] — assumes `lsh_pairs` is in
    * scope (dkLshPairsCtes). Final relation: lp4(node, lbl). Each
    * round is one GROUP BY + a row_number argmax with the identical
    * (count DESC, label ASC) tie order. AS MATERIALIZED: each round
    * references its predecessor inside a grouped window — inlined
    * unrolls re-scan the signature pipeline per round. */
  private def dkLpaCtes: String = {
    val rounds = (1 to 4).map { k =>
      s"""lp$k AS MATERIALIZED (
        SELECT node, lbl FROM (
          SELECT e.v AS node, p.lbl,
                 row_number() OVER (PARTITION BY e.v
                   ORDER BY count(*) DESC, p.lbl) AS rn
          FROM lpedges e JOIN lp${k - 1} p ON p.node = e.u
          GROUP BY e.v, p.lbl)
        WHERE rn = 1)"""
    }.mkString(",\n      ")
    s"""lpedges AS MATERIALIZED (
        SELECT DISTINCT u, v FROM (
          SELECT d1 AS u, d2 AS v FROM lsh_pairs
          UNION ALL
          SELECT d2 AS u, d1 AS v FROM lsh_pairs)),
      lp0 AS (SELECT DISTINCT u AS node, u AS lbl FROM lpedges),
      $rounds"""
  }

  /** Community detection by synchronous label propagation (Raghavan
    * et al. 2007) over the near-dup similarity graph — the
    * majority-vote complement to the min-id connected components in
    * graft.operators.Dedup: CC merges everything reachable, LPA keeps
    * densely-linked template farms apart even when a thin bridge
    * connects them, which is what a curation pipeline wants when one
    * boilerplate page links two otherwise-distinct mirror clusters.
    * Scale shape: the graph is the candidate-bounded LSH pair set,
    * never the corpus; each round is one edge-join + one (node, label)
    * groupBy + a per-node window argmax — all key-partitioned, nothing
    * driver-side; 4 fixed rounds, lineage truncated per round. */
  private val labelPropagation = QueryDef(
    "llm_label_propagation",
    (s, d) => {
      val (_, labels) = lpaLabels(s, d)
      labels.select(col("node").as("doc_id"), col("lbl").as("community"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${dkMinhashCte},
      ${dkLshPairsCtes},
      ${dkLpaCtes}
      SELECT node AS doc_id, lbl AS community
      FROM lp4
      ORDER BY doc_id"""))

  /** Newman modularity of the LPA partition, per community: Q_c =
    * d_c/D − (deg_c/D)² over the doubled (directed) edge list, where
    * d_c = internal directed edges, deg_c = total degree of c's
    * nodes, D = total directed edges — the standard quality score a
    * pipeline uses to decide whether the dedup graph's community
    * structure is real (ΣQ_c near 0 ⇒ the LSH graph is hairball
    * noise; large ⇒ genuine template farms worth group-level
    * downweighting). All inputs are exact integers from three
    * one-shuffle rollups (internal-edge count, per-community degree
    * sum, a 1-row total that rides a broadcast cross join — the
    * pagerank ncnt pattern, no driver collect); the only floats are
    * two divisions and one multiply per community, identical IEEE ops
    * in both engines, rounded to 6dp (+0.0 normalizes −0). */
  private val graphModularity = QueryDef(
    "llm_graph_modularity",
    (s, d) => {
      val (edges, labels) = lpaLabels(s, d)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val tot = edges.agg(count(lit(1)).as("dd"))
      val lu = labels.select(col("node").as("u"), col("lbl").as("cu"))
      val lv = labels.select(col("node").as("v"), col("lbl").as("cv"))
      val internal = edges.join(lu, "u").join(lv, "v")
        .filter(col("cu") === col("cv"))
        .groupBy(col("cu").as("community"))
        .agg(count(lit(1)).as("internal_directed"))
      val degc = deg.join(labels, col("u") === col("node"))
        .groupBy(col("lbl").as("community"))
        .agg(sum(col("deg")).as("degree_sum"), count(lit(1)).as("n_nodes"))
      degc.join(internal, Seq("community"), "left_outer")
        .crossJoin(broadcast(tot))
        .select(col("community"), col("n_nodes"), col("degree_sum"),
          coalesce(col("internal_directed"), lit(0L)).as("internal_directed"),
          (round(
            coalesce(col("internal_directed"), lit(0L)).cast("double") / col("dd") -
              (col("degree_sum").cast("double") / col("dd")) *
              (col("degree_sum").cast("double") / col("dd")), 6) + lit(0.0))
            .as("q_contrib"))
        .orderBy(col("community"))
    },
    Some(s"""
      WITH ${dkMinhashCte},
      ${dkLshPairsCtes},
      ${dkLpaCtes},
      deg AS (SELECT u, count(*) AS deg FROM lpedges GROUP BY 1),
      tot AS (SELECT count(*) AS dd FROM lpedges),
      internal AS (
        SELECT a.lbl AS community, count(*) AS internal_directed
        FROM lpedges e
        JOIN lp4 a ON a.node = e.u
        JOIN lp4 b ON b.node = e.v AND b.lbl = a.lbl
        GROUP BY 1),
      degc AS (
        SELECT p.lbl AS community,
               CAST(sum(d.deg) AS BIGINT) AS degree_sum,
               count(*) AS n_nodes
        FROM deg d JOIN lp4 p ON p.node = d.u
        GROUP BY 1)
      SELECT g.community, g.n_nodes, g.degree_sum,
             coalesce(i.internal_directed, 0) AS internal_directed,
             round(CAST(coalesce(i.internal_directed, 0) AS DOUBLE) / t.dd -
               (CAST(g.degree_sum AS DOUBLE) / t.dd) *
               (CAST(g.degree_sum AS DOUBLE) / t.dd), 6) + 0.0 AS q_contrib
      FROM degc g
      LEFT JOIN internal i ON i.community = g.community
      CROSS JOIN tot t
      ORDER BY g.community"""))

  /** N-gram novelty per source: the share of each doc's distinct
    * word-3-gram shingles whose corpus-wide FIRST occurrence (min
    * doc_id) is that doc — the freshness/memorization profile used to
    * compare candidate sources ("how much does source X add that the
    * corpus doesn't already have?"). Scale shape: the shared shingle
    * pipeline once, distinct (doc, hash) rows, one shuffle on the
    * 60-bit shingle hash for the min-doc window, a doc-sized rollup
    * joined to doc metadata, then a per-source aggregation — novelty
    * ratios come from exact integer gram counts (ONE division per
    * source), never an average of per-doc doubles (summation-order
    * fragile). Docs with <3 tokens have no shingles and are excluded
    * (inner join) in both engines. */
  private val ngramNovelty = QueryDef(
    "llm_ngram_novelty",
    (s, d) => {
      val w = Window.partitionBy(col("h"))
      val perDoc = shingleRows(s, d, lit(true))
        .select(col("doc_id"), hash60(col("shingle")).as("h"))
        .distinct()
        .withColumn("first_doc", min(col("doc_id")).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
      documents(s, d).select(col("doc_id"), col("source"))
        .join(perDoc, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_grams")).as("total_grams"),
          sum(col("n_novel")).as("novel_grams"))
        .select(col("source"), col("n_docs"), col("total_grams"),
          col("novel_grams"),
          round(col("novel_grams") / col("total_grams"), 4).as("novelty"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH ${dkMinhashCte},
      u AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, unnest(shingle_list) AS shingle FROM sh)),
      f AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS first_doc
        FROM u),
      pd AS (
        SELECT doc_id, count(*) AS n_grams,
               count(CASE WHEN first_doc = doc_id THEN 1 END) AS n_novel
        FROM f
        GROUP BY 1)
      SELECT d.source, count(*) AS n_docs,
             CAST(sum(pd.n_grams) AS BIGINT) AS total_grams,
             CAST(sum(pd.n_novel) AS BIGINT) AS novel_grams,
             round(sum(pd.n_novel) / sum(pd.n_grams), 4) AS novelty
      FROM documents d JOIN pd USING (doc_id)
      GROUP BY d.source
      ORDER BY d.source"""))

  /** Boilerplate-prefix clustering: group docs by the md5 of their
    * first 16 tokens — the cheap screen for template/header
    * duplication (mirror pages, scraped boilerplate) that exact-hash
    * dedup misses because bodies differ. Only 16-byte digests
    * shuffle; clusters (>1 doc) report size, keeper (min doc_id), and
    * total chars affected. slice-then-hash is one pass per doc, no
    * pairwise comparison anywhere. */
  private val prefixDedup = QueryDef(
    "llm_prefix_dedup",
    (s, d) => {
      documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          md5(concat_ws(" ", slice(tokens(col("text")), 1, 16))).as("prefix_hash"))
        .groupBy(col("prefix_hash"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("keeper_id"),
          sum(col("n_chars")).as("total_chars"))
        .filter(col("n_docs") > 1)
        .orderBy(col("keeper_id"))
    },
    Some("""
      SELECT md5(array_to_string(string_split(text, ' ')[1:16], ' ')) AS prefix_hash,
             count(*) AS n_docs,
             min(doc_id) AS keeper_id,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY 1
      HAVING count(*) > 1
      ORDER BY keeper_id"""))

  /** Zipf's-law fit of the token frequency distribution: OLS of
    * log10(freq) on log10(rank) over the top-200 vocabulary — natural
    * text tracks slope ≈ −1, so a fitted slope far off it flags
    * synthetic/templated/spammy corpora (the distributional cousin of
    * llm_repetition_filter's per-doc screen). Rank total order and the
    * llm_vocab_build counting pass are shared precedents: one token
    * explode + one shuffle, ranking window over the tiny vocab table,
    * regr_* aggregates over 200 O(1)-magnitude doubles rounded à la
    * kdb_ols_trend (both engines' Σ over 200 such terms agree far
    * beyond the 6dp/4dp rounds). */
  private val zipfFit = QueryDef(
    "llm_zipf_fit",
    (s, d) => {
      val w = Window.orderBy(col("n").desc, col("tok"))
      documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"))
        // top-200 first, rank the bounded table (vocab_build pattern)
        .orderBy(col("n").desc, col("tok")).limit(200)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(log10(col("rank").cast("double")).as("x"),
          log10(col("n").cast("double")).as("y"))
        .agg(count(lit(1)).as("n_terms"),
          (round(expr("regr_slope(y, x)"), 6) + lit(0.0)).as("slope"),
          (round(expr("regr_intercept(y, x)"), 4) + lit(0.0)).as("intercept"),
          (round(expr("regr_r2(y, x)"), 4) + lit(0.0)).as("r2"))
        .withColumn("zipfian", (abs(col("slope") + 1.0) <= lit(0.35)).cast("int"))
    },
    Some("""
      WITH c AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      v AS (
        SELECT tok, count(*) AS n FROM c GROUP BY tok),
      r AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank FROM v
        QUALIFY rank <= 200),
      xy AS (
        SELECT log10(CAST(rank AS DOUBLE)) AS x, log10(CAST(n AS DOUBLE)) AS y
        FROM r)
      SELECT count(*) AS n_terms,
             round(regr_slope(y, x), 6) + 0.0 AS slope,
             round(regr_intercept(y, x), 4) + 0.0 AS intercept,
             round(regr_r2(y, x), 4) + 0.0 AS r2,
             CASE WHEN abs(round(regr_slope(y, x), 6) + 0.0 + 1.0) <= 0.35
                  THEN 1 ELSE 0 END AS zipfian
      FROM xy"""))

  /** Dedup-graph triangle census: edge count, wedge count (Σ d(d−1)/2),
    * triangle count, and the global clustering coefficient 3T/W of the
    * LSH candidate-pair graph — high transitivity says candidate pairs
    * form coherent duplicate CLUSTERS (template families), low says
    * scattered band collisions; the structural audit that pairs with
    * llm_dedup_eval's precision/recall read. Triangles close via two
    * self-joins of the (d1<d2)-ordered edge list on shared endpoints —
    * work is O(edges²/nodes) on the CANDIDATE graph (already blocked
    * and bounded by the LSH band config), never on the corpus. The
    * edge list is localCheckpoint-materialized once (the Dedup.scala
    * discipline): four consumers would otherwise re-run the whole
    * minhash pipeline per leg. */
  private val dedupTriangles = QueryDef(
    "llm_dedup_triangles",
    (s, d) => {
      val e = lshPairs(s, d).localCheckpoint(true)
      val deg = e.select(col("d1").as("v")).union(e.select(col("d2").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val wedges = deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
      val tri = e.as("ab")
        .join(e.as("bc"), col("ab.d2") === col("bc.d1"))
        .join(e.as("ac"),
          col("ac.d1") === col("ab.d1") && col("ac.d2") === col("bc.d2"))
        .agg(count(lit(1)).as("n_triangles"))
      val edges = e.agg(count(lit(1)).as("n_edges"))
      edges.withColumn("one", lit(1))
        .join(broadcast(wedges.withColumn("one", lit(1))), "one")
        .join(broadcast(tri.withColumn("one", lit(1))), "one")
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
          round(lit(3.0) * col("n_triangles") /
            nullif(col("n_wedges").cast("double"), lit(0.0)), 4).as("global_cc"))
    },
    Some(s"""
      WITH ${dkMinhashCte},
      ${dkLshPairsCtes},
      deg AS (
        SELECT v, count(*) AS deg FROM (
          SELECT d1 AS v FROM lsh_pairs
          UNION ALL SELECT d2 FROM lsh_pairs)
        GROUP BY v),
      w AS (
        SELECT count(*) AS n_nodes,
               CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
        FROM deg),
      t AS (
        SELECT count(*) AS n_triangles
        FROM lsh_pairs ab
        JOIN lsh_pairs bc ON ab.d2 = bc.d1
        JOIN lsh_pairs ac ON ac.d1 = ab.d1 AND ac.d2 = bc.d2),
      ec AS (SELECT count(*) AS n_edges FROM lsh_pairs)
      SELECT n_nodes, n_edges, n_wedges, n_triangles,
             round(3.0 * n_triangles / nullif(CAST(n_wedges AS DOUBLE), 0), 4) AS global_cc
      FROM ec, w, t"""))

  /** Matryoshka-style truncated-dimension retrieval eval: for the
    * 5-query probe set, rank the corpus by full 64-dim cosine and by
    * cosine over the FIRST 16 dims only, and report top-10 overlap
    * (recall@10 of the truncated index vs the exact ranking) — the
    * pre-flight that tells you whether serving a prefix-truncated
    * embedding (4× smaller index, MRL-trained models) keeps retrieval
    * quality. Both rankings come from ONE broadcast-queries × corpus
    * scan (two cosines per pair, two windows sharing the same qid
    * partitioning — one shuffle); overlap is counted on the pair row
    * itself (a nid is in both top-10s iff both its ranks ≤ 10), so no
    * self-join. Exactness: both cosines are strict left-fold doubles
    * (bit-identical across engines, embTopk precedent), ties broken
    * by nid, recall is ONE division of small exact ints. At 100×
    * corpus the eval rides the same ANN candidate path as
    * llm_retrieval_eval — a bounded probe set, never all-pairs. */
  private val matryoshkaEval = QueryDef(
    "llm_matryoshka_eval",
    (s, d) => {
      val e = embeddings(s, d)
      val q = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val wf = Window.partitionBy(col("qid"))
        .orderBy(col("cos_full").desc, col("nid"))
      val wp = Window.partitionBy(col("qid"))
        .orderBy(col("cos_pre").desc, col("nid"))
      broadcast(q).join(c, col("qid") =!= col("nid"))
        .withColumn("cos_full", cosine(col("qv"), col("nv")))
        .withColumn("cos_pre",
          cosine(slice(col("qv"), 1, 16), slice(col("nv"), 1, 16)))
        .withColumn("rk_full", row_number().over(wf))
        .withColumn("rk_pre", row_number().over(wp))
        .groupBy(col("qid"))
        .agg(count(when(col("rk_full") <= 10 && col("rk_pre") <= 10, 1))
          .as("n_overlap"))
        .withColumn("recall_at_10",
          round(col("n_overlap") / 10.0, 4) + lit(0.0))
        .orderBy(col("qid"))
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, embedding[1:16] AS qv16
        FROM embeddings WHERE vec_id <= 4),
      c AS (
        SELECT vec_id AS nid, embedding AS nv, embedding[1:16] AS nv16
        FROM embeddings),
      sc AS (
        SELECT qid, nid,
               ${dkDot("qv", "nv")} /
               (sqrt(${dkDot("qv", "qv")}) * sqrt(${dkDot("nv", "nv")})) AS cos_full,
               ${dkDot("qv16", "nv16")} /
               (sqrt(${dkDot("qv16", "qv16")}) * sqrt(${dkDot("nv16", "nv16")})) AS cos_pre
        FROM q, c WHERE qid <> nid),
      rk AS (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos_full DESC, nid) AS rk_full,
               row_number() OVER (PARTITION BY qid ORDER BY cos_pre DESC, nid) AS rk_pre
        FROM sc)
      SELECT qid,
             count(CASE WHEN rk_full <= 10 AND rk_pre <= 10 THEN 1 END) AS n_overlap,
             round(count(CASE WHEN rk_full <= 10 AND rk_pre <= 10 THEN 1 END)
                   / 10.0, 4) + 0.0 AS recall_at_10
      FROM rk
      GROUP BY qid
      ORDER BY qid"""))

  /** Curriculum ordering: documents bucketed into 4 difficulty
    * quartiles by whitespace-token length (the classic
    * shortest-first curriculum proxy), then INTERLEAVED —
    * curriculum_pos = (rank within bucket − 1) × 4 + bucket — so
    * every consecutive batch of 4 training examples spans all
    * difficulty levels while still trending easy → hard within each
    * bucket. The semantics are exactly ntile(4) OVER (ORDER BY
    * n_tokens, doc_id) — but a global ntile window moves the ENTIRE
    * corpus to one partition (Spark plans Exchange SinglePartition),
    * the canonical 100 TB killer. Instead the global rank is
    * decomposed: a tiny n_tokens histogram (one aggregation) carries
    * each length's cumulative offset, broadcast back; within a
    * length, ranks come from a doc_id window partitioned BY length
    * (distributed); bucket and in-bucket rank are then closed-form
    * integer math from (rank, N) reproducing ntile's
    * first-(N mod 4)-buckets-get-one-extra rule. Everything is
    * integer and tie-free, so the permutation is bit-identical to
    * the oracle's literal ntile. Two scans of documents (histogram +
    * assignment) is the honest distributed-rank cost; the only
    * single-partition step is the cumsum over the ~|distinct
    * lengths|-row histogram. */
  private val curriculumOrder = QueryDef(
    "llm_curriculum_order",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      // tiny: one row per distinct length, cumulative start offset
      val wHist = Window.orderBy(col("n_tokens"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val hist = t.groupBy(col("n_tokens")).agg(count(lit(1)).as("cnt"))
        .withColumn("offset", coalesce(sum(col("cnt")).over(wHist), lit(0L)))
        .withColumn("n_total", sum(col("cnt")).over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("n_tokens").as("h_tok"), col("offset"), col("n_total"))
      val wInTok = Window.partitionBy(col("n_tokens")).orderBy(col("doc_id"))
      t.join(broadcast(hist), col("n_tokens") === col("h_tok"))
        .withColumn("r", col("offset") + row_number().over(wInTok))
        // ntile(4): first (N mod 4) buckets hold ⌈N/4⌉, the rest ⌊N/4⌋
        .withColumn("base", expr("n_total div 4"))
        .withColumn("rem", col("n_total") % 4)
        .withColumn("cut", col("rem") * (col("base") + 1))
        .withColumn("bucket",
          when(col("r") <= col("cut"),
            expr("(r + base) div (base + 1)"))
            .otherwise(col("rem") + expr("(r - cut + base - 1) div base")))
        .withColumn("bstart",
          (col("bucket") - 1) * col("base") +
            least(col("bucket") - 1, col("rem")) + 1)
        .select(col("doc_id"), col("n_tokens"),
          col("bucket").cast("int").as("bucket"),
          ((col("r") - col("bstart")) * 4 + col("bucket")).cast("int")
            .as("curriculum_pos"))
        .orderBy(col("curriculum_pos"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents),
      b AS (
        SELECT doc_id, n_tokens,
               ntile(4) OVER (ORDER BY n_tokens, doc_id) AS bucket
        FROM t),
      r AS (
        SELECT doc_id, n_tokens, bucket,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY n_tokens, doc_id) AS rk
        FROM b)
      SELECT doc_id, n_tokens, bucket,
             (rk - 1) * 4 + bucket AS curriculum_pos
      FROM r
      ORDER BY curriculum_pos"""))

  /** Clustering-quality eval: simplified silhouette of the labeled
    * embedding space (per-point a = distance to own-label centroid,
    * b = nearest other centroid; s = (b−a)/max(a,b)) plus the
    * misassignment count (points strictly nearer a foreign centroid)
    * — the "are these labels/clusters real?" pre-flight before
    * trusting label-stratified sampling or IVF cells built on them.
    * Cross-engine exactness in three layers: (1) centroids come from
    * per-(label,dim) INTEGER micro-unit sums (summation-order-proof),
    * each component one fixed CAST/÷1e6/÷n chain; (2) every distance
    * is the strict index-order l2 fold (bit-identical kernel, embTopk
    * precedent), so min-selection and the b² < a² decision compare
    * identical doubles; (3) per-point silhouettes are re-quantized to
    * micro-units before the per-label mean, so the REPORTED average
    * is again an exact-integer division. Scale shape: centroid build
    * is one (label,dim) partial-agg shuffle; scoring is corpus ×
    * broadcast(|labels| centroids) — the allowlisted broadcast NLJ
    * every ANN query uses — then one vec_id rollup and a tiny label
    * rollup. */
  private val clusterQuality = QueryDef(
    "llm_cluster_quality",
    (s, d) => {
      val e = embeddings(s, d)
      val cent = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .withColumn("q", round(col("x").cast("double") * 1000000.0, 0).cast("long"))
        .groupBy(col("label").as("clabel"), col("dim"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .withColumn("c", col("sq").cast("double") / 1000000.0 / col("n"))
        .groupBy(col("clabel"))
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("c")))),
          x => x.getField("c")).as("cvec"))
      e.crossJoin(broadcast(cent))
        .withColumn("d2", l2sqHof(col("embedding"), col("cvec")))
        .groupBy(col("vec_id"), col("label"))
        .agg(min(when(col("label") === col("clabel"), col("d2"))).as("a2"),
          min(when(col("label") =!= col("clabel"), col("d2"))).as("b2"))
        .withColumn("a", sqrt(col("a2")))
        .withColumn("b", sqrt(col("b2")))
        .withColumn("sil",
          when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
            .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
        .withColumn("sil6", round(col("sil") * 1000000.0, 0).cast("long"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_points"),
          (round(sum(col("sil6")).cast("double") / 1000000.0 / count(lit(1)), 4)
            + lit(0.0)).as("mean_silhouette"),
          count(when(col("b2") < col("a2"), lit(1))).as("n_misassigned"))
        .orderBy(col("label"))
    },
    Some("""
      WITH idx AS (
        SELECT label, embedding,
               unnest(generate_series(1, len(embedding))) AS dim
        FROM embeddings),
      qc AS (
        SELECT label, dim,
               CAST(round(CAST(embedding[dim] AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        FROM idx),
      cent AS (
        SELECT label AS clabel, dim, CAST(sum(q) AS BIGINT) AS sq, count(*) AS n
        FROM qc GROUP BY 1, 2),
      cv AS (
        SELECT clabel, list(CAST(sq AS DOUBLE) / 1000000.0 / n ORDER BY dim) AS cvec
        FROM cent GROUP BY 1),
      p AS (
        SELECT e.vec_id, e.label, c.clabel,
               list_reduce([0.0] || list_transform(generate_series(1, len(e.embedding)),
                 i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]) *
                      (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])),
                 (x, y) -> x + y) AS d2
        FROM embeddings e, cv c),
      ab AS (
        SELECT vec_id, label,
               min(CASE WHEN label = clabel THEN d2 END) AS a2,
               min(CASE WHEN label <> clabel THEN d2 END) AS b2
        FROM p GROUP BY 1, 2),
      sil AS (
        SELECT label, a2, b2,
               CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0.0 THEN 0.0
                    ELSE (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2))
               END AS s
        FROM ab),
      sq6 AS (
        SELECT label, a2, b2,
               CAST(round(s * 1000000.0) AS BIGINT) AS sil6
        FROM sil)
      SELECT label, count(*) AS n_points,
             round(CAST(CAST(sum(sil6) AS BIGINT) AS DOUBLE) / 1000000.0
                   / count(*), 4) + 0.0 AS mean_silhouette,
             count(CASE WHEN b2 < a2 THEN 1 END) AS n_misassigned
      FROM sq6 GROUP BY label ORDER BY label"""))

  /** PMI collocation mining: top adjacent-bigram phrases ranked by
    * count with pointwise mutual information — the word2vec-style
    * phrase-detection pass that decides which token pairs deserve a
    * fused vocab entry ("new_york" vs "new"+"york") before vocabulary
    * construction. All counts (bigram, both unigram marginals, both
    * totals) are exact int64; PMI is reported as the fixed chain
    * ln(c_ab/B) − ln(c_a/N) − ln(c_b/N) over exact-int divisions,
    * 4dp-rounded (libm 1-ulp drift is fine for a REPORTED value —
    * llm_zipf_fit precedent), and the ranking orders by the exact
    * count with pair tie-breaks, never by the float. Scale shape: one
    * corpus scan explodes bigrams into a (w1,w2) partial-agg rollup;
    * unigram marginals are vocab-bounded broadcasts, totals are 1-row
    * broadcast cross joins (allowlisted). */
  private val pmiCollocations = QueryDef(
    "llm_pmi_collocations",
    (s, d) => {
      val toks = documents(s, d).select(col("doc_id"), split(col("text"), " ").as("ws"))
      // vocab-sized unigram table read by the corpus total and BOTH
      // marginal joins; bigram-type table by its total and the filter
      // leg — materialize each once (probed: no runtime exchange reuse)
      val uc = toks.select(explode(col("ws")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
        .localCheckpoint(true)
      val tot = uc.agg(sum(col("cw")).as("n_tok"))
      val bc = toks.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
        .localCheckpoint(true)
      val btot = bc.agg(sum(col("c_ab")).as("b_tot"))
      bc.filter(col("c_ab") >= 10)
        .join(broadcast(uc.select(col("w").as("wa"), col("cw").as("ca"))),
          col("w1") === col("wa"))
        .join(broadcast(uc.select(col("w").as("wb"), col("cw").as("cb"))),
          col("w2") === col("wb"))
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(btot))
        .select(col("w1"), col("w2"), col("c_ab"),
          (round(
            log(col("c_ab").cast("double") / col("b_tot")) -
              log(col("ca").cast("double") / col("n_tok")) -
              log(col("cb").cast("double") / col("n_tok")), 4) + lit(0.0))
            .as("pmi"))
        .orderBy(col("c_ab").desc, col("w1"), col("w2"))
        .limit(30)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      uc AS (
        SELECT w, count(*) AS cw
        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1),
      tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_tok FROM uc),
      pos AS (
        SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS g FROM toks),
      bc AS (
        SELECT ws[g] AS w1, ws[g + 1] AS w2, count(*) AS c_ab
        FROM pos GROUP BY 1, 2),
      btot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS b_tot FROM bc)
      SELECT w1, w2, c_ab,
             round(ln(CAST(c_ab AS DOUBLE) / b_tot)
                   - ln(CAST(ua.cw AS DOUBLE) / n_tok)
                   - ln(CAST(ub.cw AS DOUBLE) / n_tok), 4) + 0.0 AS pmi
      FROM bc
      JOIN uc ua ON bc.w1 = ua.w
      JOIN uc ub ON bc.w2 = ub.w
      CROSS JOIN tot CROSS JOIN btot
      WHERE c_ab >= 10
      ORDER BY c_ab DESC, w1, w2
      LIMIT 30"""))

  /** Instruction-data detection: which corpus slices look like Q/A or
    * imperative-prompt data rather than prose? — the screen run
    * before pretraining mixes (instruction-formatted text leaking
    * into pretraining skews evals; conversely it's what you keep for
    * SFT). Pure per-row integer features, no regex-engine dependence
    * (Java vs RE2 semantics can drift — llm_code_detect's lesson):
    * Q:/A: template hits via replace-length deltas, question-mark
    * counts likewise, imperative openers by first-token membership.
    * flag = (has both Q: and A:) OR (imperative opener + a question
    * mark) OR ≥3 question marks. One map-side-combinable rollup per
    * (lang, source) slice. */
  private val instructionDetect = QueryDef(
    "llm_instruction_detect",
    (s, d) => {
      val t = lower(col("text"))
      val hasQ = length(t) - length(regexp_replace(t, lit("q:"), lit(""))) >= 2
      val hasA = length(t) - length(regexp_replace(t, lit("a:"), lit(""))) >= 2
      val qmarks = length(t) - length(regexp_replace(t, lit("\\?"), lit("")))
      val first = element_at(split(t, " "), 1)
      val imper = first.isin("write", "explain", "describe", "list",
        "summarize", "translate", "give", "create", "generate", "classify")
      val flag = (hasQ && hasA) || (imper && qmarks >= 1) || qmarks >= 3
      documents(s, d)
        .select(col("lang"), col("source"),
          flag.cast("int").as("f"), qmarks.as("qm"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f")).as("n_instruction_like"),
          round(avg(col("qm")), 2).as("avg_qmarks"))
        .withColumn("pct_flagged",
          round(col("n_instruction_like").cast("double") / col("n_docs"), 4))
        .orderBy(col("lang"), col("source"))
    },
    Some("""
      WITH f AS (
        SELECT lang, source,
               CASE WHEN (length(lower(text))
                      - length(replace(lower(text), 'q:', '')) >= 2
                     AND length(lower(text))
                      - length(replace(lower(text), 'a:', '')) >= 2)
                 OR (string_split(lower(text), ' ')[1] IN
                      ('write', 'explain', 'describe', 'list', 'summarize',
                       'translate', 'give', 'create', 'generate', 'classify')
                     AND length(text) - length(replace(text, '?', '')) >= 1)
                 OR length(text) - length(replace(text, '?', '')) >= 3
                 THEN 1 ELSE 0 END AS f,
               length(text) - length(replace(text, '?', '')) AS qm
        FROM documents)
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(f) AS BIGINT) AS n_instruction_like,
             round(avg(qm), 2) AS avg_qmarks,
             round(CAST(sum(f) AS DOUBLE) / count(*), 4) AS pct_flagged
      FROM f GROUP BY 1, 2
      ORDER BY lang, source"""))

  /** One BPE merge iteration — the inner loop of byte-pair-encoding
    * tokenizer TRAINING (llm_vocab_build learns a word vocab;
    * llm_bpe_tokens APPLIES a tokenizer; this is the step that
    * LEARNS one): count every adjacent symbol pair weighted by word
    * frequency and surface the top merges. Scale decomposition that
    * makes corpus-scale BPE feasible: the pair scan runs over the
    * WORD-FREQUENCY TABLE (aggregate-sized), not the corpus — one
    * data-sized shuffle builds the vocab, then positions explode over
    * distinct words only, exactly how production BPE trainers batch
    * it. Counts are exact ints; ordering is (count DESC, pair) so the
    * chosen merge is branch-safe. */
  /** Unigram-LM segmentation (the SentencePiece/Kudo 2018 Viterbi
    * core) — the THIRD tokenizer algorithm beside the BPE family
    * (llm_bpe_train learns merges; this scores optimal segmentations
    * under a piece-probability model): inventory = every corpus
    * character + the top-24 character bigrams by corpus-weighted
    * frequency, piece cost = −ln(f/T) in micros (one ln per piece on
    * an exact-integer ratio, micro-quantized — the psi_drift
    * discipline), and each vocabulary word's minimal segmentation
    * cost solved by the Viterbi DP best[i] = min(best[i−1]+c₁(i),
    * best[i−2]+c₂(i−1,i)) run as ONE integer left fold: the
    * accumulator packs (best[i−1], best[i]) as prev·2³² + cur and
    * each position packs (char cost, bigram cost | 2³⁰ sentinel) the
    * same way, so the whole DP is BIGINT shift/mod arithmetic —
    * bit-identical between Spark `aggregate` and DuckDB natural-seed
    * `list_reduce` (scalar accumulator, dodging the struct-fold bug;
    * the stream_cdc_twin encoding trick). Costs ≤ ~2·10⁷ micros and
    * words ≤ ~20 chars keep every packed value < 2⁶³ by orders of
    * magnitude. Scale shape: the DP runs on the aggregate-sized
    * word-frequency table, NEVER the corpus (the llm_bpe_train
    * doctrine); position rows explode that table ×|word| chars, cost
    * lookups are two broadcast joins, the fold is per-row; output is
    * the top-20 words by frequency with cost receipts. */
  private val unigramSegment = QueryDef(
    "llm_unigram_segment",
    (s, d) => {
      val B = 4294967296L // 2^32 packing base
      val vocab = documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val wpos = vocab
        .select(col("w"), col("cnt"),
          explode(sequence(lit(1), length(col("w")))).as("i"))
        .withColumn("ch", col("w").substr(col("i"), lit(1)))
        .withColumn("bg",
          when(col("i") >= 2, col("w").substr(col("i") - 1, lit(2))))
        .localCheckpoint(true)
      val charFreq = wpos.groupBy(col("ch")).agg(sum(col("cnt")).as("f"))
      val top24 = wpos.filter(col("i") >= 2)
        .groupBy(col("bg")).agg(sum(col("cnt")).as("f"))
        .orderBy(col("f").desc, col("bg")).limit(24)
        .localCheckpoint(true)
      val tot = charFreq.select(col("f"))
        .unionAll(top24.select(col("f")))
        .agg(sum(col("f")).as("t"))
      def cost(fcol: Column) =
        round(log(col("t").cast("double") / fcol) * 1000000, 0).cast("long")
      val charCost = charFreq.crossJoin(broadcast(tot))
        .select(col("ch"), cost(col("f")).as("c1cost"))
      val bigCost = top24.crossJoin(broadcast(tot))
        .select(col("bg"), cost(col("f")).as("c2cost"))
      val folded = wpos
        .join(broadcast(charCost), "ch")
        .join(broadcast(bigCost), Seq("bg"), "left_outer")
        .withColumn("enc", col("c1cost") * lit(B) +
          coalesce(col("c2cost"), lit(1073741824L)))
        .groupBy(col("w"), col("cnt"))
        .agg(sort_array(collect_list(struct(col("i"), col("enc")))).as("pe"))
        .withColumn("encs", expr("transform(pe, x -> x.enc)"))
        .withColumn("cost_micro", expr(
          """aggregate(encs, 1073741824L * 4294967296L,
             (acc, e) -> (acc % 4294967296L) * 4294967296L +
               least((acc % 4294967296L) + (e div 4294967296L),
                     (acc div 4294967296L) + (e % 4294967296L)),
             acc -> acc % 4294967296L)"""))
      folded
        .orderBy(col("cnt").desc, col("w")).limit(20)
        .select(col("w"), col("cnt"), length(col("w")).cast("long").as("len"),
          col("cost_micro"),
          expr("cost_micro div length(w)").as("cost_per_char"))
        .orderBy(col("cnt").desc, col("w"))
    },
    Some("""
      WITH vocab AS (
        SELECT w, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1),
      wpos AS (
        SELECT w, cnt, i, substr(w, i, 1) AS ch,
               CASE WHEN i >= 2 THEN substr(w, i - 1, 2) END AS bg
        FROM (SELECT w, cnt, unnest(generate_series(1, length(w))) AS i
              FROM vocab)),
      cf AS (SELECT ch, CAST(sum(cnt) AS BIGINT) AS f FROM wpos GROUP BY 1),
      bf AS (SELECT bg, CAST(sum(cnt) AS BIGINT) AS f
             FROM wpos WHERE i >= 2 GROUP BY 1
             ORDER BY f DESC, bg LIMIT 24),
      tot AS (SELECT CAST(sum(f) AS BIGINT) AS t FROM
              (SELECT f FROM cf UNION ALL SELECT f FROM bf)),
      cc AS (SELECT ch, CAST(round(ln(CAST(t AS DOUBLE) / f) * 1000000, 0)
               AS BIGINT) AS c1cost
             FROM cf CROSS JOIN tot),
      bc AS (SELECT bg, CAST(round(ln(CAST(t AS DOUBLE) / f) * 1000000, 0)
               AS BIGINT) AS c2cost
             FROM bf CROSS JOIN tot),
      enc AS (
        SELECT p.w, p.cnt, p.i,
               cc.c1cost * 4294967296 +
                 coalesce(bc.c2cost, 1073741824) AS enc
        FROM wpos p
        JOIN cc ON cc.ch = p.ch
        LEFT JOIN bc ON bc.bg = p.bg),
      folded AS (
        SELECT w, cnt,
               list_reduce([1073741824 * 4294967296] || list(enc ORDER BY i),
                 (acc, e) -> (acc % 4294967296) * 4294967296 +
                   least((acc % 4294967296) + (e // 4294967296),
                         (acc // 4294967296) + (e % 4294967296)))
                 % 4294967296 AS cost_micro
        FROM enc GROUP BY 1, 2)
      SELECT w, cnt, length(w) AS len, cost_micro,
             cost_micro // length(w) AS cost_per_char
      FROM folded
      ORDER BY cnt DESC, w LIMIT 20"""))

  private val bpeMergeStep = QueryDef(
    "llm_bpe_merge_step",
    (s, d) => {
      val vocab = documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      vocab.filter(length(col("w")) >= 2)
        .select(col("w"), col("cnt"),
          explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
        .select(col("w").substr(col("i"), lit(1)).as("c1"),
          col("w").substr(col("i") + 1, lit(1)).as("c2"),
          col("cnt"))
        .groupBy(col("c1"), col("c2"))
        .agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("c1"), col("c2"))
        .limit(20)
        .select(col("c1"), col("c2"),
          concat(col("c1"), col("c2")).as("merged"), col("pair_count"))
    },
    Some("""
      WITH vocab AS (
        SELECT w, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1),
      pos AS (
        SELECT w, cnt, unnest(generate_series(1, length(w) - 1)) AS i
        FROM vocab WHERE length(w) >= 2),
      pairs AS (
        SELECT substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2,
               CAST(sum(cnt) AS BIGINT) AS pair_count
        FROM pos GROUP BY 1, 2)
      SELECT c1, c2, c1 || c2 AS merged, pair_count
      FROM pairs
      ORDER BY pair_count DESC, c1, c2
      LIMIT 20"""))

  /** Full multi-iteration BPE tokenizer TRAINING — the driver-
    * controlled loop of llm_bpe_merge_step's pair-count pass, run to
    * `bpeTrainMerges` merges (the Dedup.connectedComponents loop
    * discipline: per-round localCheckpoint truncates lineage so
    * planning cost stays flat across iterations). State is the
    * WORD-FREQUENCY table only — each distinct word carries its
    * symbol sequence as a space-joined string with sentinel spaces
    * (" l o w "), so one plain `replace(" l r ", " lr ")` applies a
    * merge; applied TWICE because consecutive occurrences share the
    * separator space (" l r l r " consumes the middle space on the
    * first pass — the second pass catches the now-isolated
    * remainder). For distinct-symbol merges this equals reference
    * left-to-right BPE exactly; the ONE divergence is a SELF-pair
    * merge (l = r) over a run of ≥ 5 repeats, where the two-pass
    * scan pairs (1,2)(4,5) while reference pairs (1,2)(3,4) — same
    * deterministic rule in BOTH engines (the oracle replays it), and
    * no merge this corpus learns is a self-pair; the unit test pins
    * both the agreeing cases and the divergent run-of-5 case. Per
    * step the driver
    * collects ONE argmax row (count DESC, pair ASC — branch-safe
    * exact-int tie-break) plus one scalar; the corpus-sized work is
    * the single vocab-count shuffle before the loop. tokens_before
    * gates the merge APPLICATION, not just selection: it derives
    * from the evolving symbol state (Σ pair instances + invariant
    * word total), so a wrong replace on either engine flips it. The
    * oracle unrolls the same merges as chained CTEs
    * (llm_pagerank_centrality precedent). */
  private val bpeTrainMerges = 8

  /** The shared BPE learning loop (see llm_bpe_train's doc): returns
    * one row per merge step — (step, lhs, rhs, pair_count,
    * tokens_before). Driver-controlled, per-round localCheckpoint,
    * one argmax row collected per step. Reused by llm_bpe_train (the
    * training gate) and llm_bpe_encode_stats (the train→apply
    * composition). */
  private def bpeLearn(s: SparkSession, d: String): Seq[(Int, String, String, Long, Long)] = {
    val vocab = documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // aggregate-sized state; few partitions keep the per-step jobs cheap
    var words = vocab
      .select(col("cnt"),
        concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" ")).as("s"))
      .coalesce(8)
      .localCheckpoint()
    val wordTotal = words.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val merges = Seq.newBuilder[(Int, String, String, Long, Long)]
    for (step <- 1 to bpeTrainMerges) {
      val pairs = words
        .select(col("cnt"), split(trim(col("s")), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("g"),
          col("syms"))
        .select(element_at(col("syms"), col("g")).as("l"),
          element_at(col("syms"), col("g") + 1).as("r"), col("cnt"))
        .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("pair_count"))
        .localCheckpoint() // two driver reads (argmax + Σ) share one pass
      val bestRows = pairs
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1).collect() // bounded: exactly one merge decision
      require(bestRows.nonEmpty,
        s"bpeLearn (llm_bpe_train / llm_bpe_encode_stats): corpus exhausted after ${step - 1} merges " +
          s"(no adjacent pairs remain; lower bpeTrainMerges)")
      val best = bestRows(0)
      val tokensBefore =
        pairs.agg(sum(col("pair_count"))).collect()(0).getLong(0) + wordTotal
      val (l, r, pc) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((step, l, r, pc, tokensBefore))
      val pat = lit(s" $l $r "); val rep = lit(s" $l$r ")
      words = words
        .withColumn("s", replace(replace(col("s"), pat, rep), pat, rep))
        .localCheckpoint()
    }
    merges.result()
  }

  private val bpeTrain = QueryDef(
    "llm_bpe_train",
    (s, d) => {
      import s.implicits._
      bpeLearn(s, d)
        .map { case (step, l, r, pc, tb) => (step, l, r, l + r, pc, tb) }
        .toDF("step", "lhs", "rhs", "merged", "pair_count", "tokens_before")
        .orderBy(col("step"))
    },
    Some {
      s"""
      WITH $dkBpeTrainCtes
      SELECT * FROM ($dkBpeTrainRows)
      ORDER BY step"""
    })

  /** DuckDB CTE block replaying bpeLearn — vocab, wtot, w0, and the
    * p/b/t/w{1..n} chain (b_k is the step-k merge decision, w_k the
    * post-merge symbol state). Shared by llm_bpe_train's oracle and
    * llm_bpe_encode_stats' (which chains the learned b_k merges onto
    * a per-language vocabulary). */
  private def dkBpeTrainCtes: String = {
    val steps = (1 to bpeTrainMerges).map { k =>
      s"""p$k AS (
        SELECT syms[g] AS l, syms[g + 1] AS r,
               CAST(sum(cnt) AS BIGINT) AS pair_count
        FROM (SELECT cnt, syms, unnest(generate_series(1, len(syms) - 1)) AS g
              FROM (SELECT cnt, string_split(trim(s), ' ') AS syms FROM w${k - 1}))
        GROUP BY 1, 2),
      b$k AS (SELECT l, r, pair_count FROM p$k
              ORDER BY pair_count DESC, l, r LIMIT 1),
      t$k AS (SELECT CAST(sum(pair_count) AS BIGINT)
                     + (SELECT wtot FROM wtot) AS tokens_before FROM p$k),
      w$k AS (SELECT cnt,
          replace(replace(s, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' '),
                  ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS s
        FROM w${k - 1} CROSS JOIN b$k)"""
    }.mkString(",\n      ")
    s"""vocab AS (
        SELECT w, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0
        GROUP BY 1),
      wtot AS (SELECT CAST(sum(cnt) AS BIGINT) AS wtot FROM vocab),
      w0 AS (SELECT cnt,
          ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
        FROM vocab),
      $steps"""
  }

  private def dkBpeTrainRows: String =
    (1 to bpeTrainMerges).map(k =>
      s"""SELECT $k AS step, l AS lhs, r AS rhs, l || r AS merged, pair_count,
               (SELECT tokens_before FROM t$k) AS tokens_before FROM b$k""")
      .mkString("\n        UNION ALL ")

  /** Train → APPLY composition: encode every language's vocabulary
    * with the corpus-learned merges and report per-language
    * compression — the end-to-end tokenizer pipeline (llm_bpe_train
    * learns, this applies what was learned and measures the payoff,
    * the bytes-per-token equity audit llm_tokenizer_fertility does
    * for a FIXED vocab). Scale shape: application also runs on the
    * aggregate-sized (lang, word)-frequency table, never the corpus —
    * tokens_after folds as Σ cnt·|syms| per language. The oracle
    * chains the SAME learned b_k decisions (shared CTE block) onto a
    * per-language vocabulary, so a drift in either the training
    * argmax or the merge application flips the gate. */
  private val bpeEncodeStats = QueryDef(
    "llm_bpe_encode_stats",
    (s, d) => {
      val merges = bpeLearn(s, d)
      val langVocab = documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("s",
          concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" ")))
      val applied = merges.foldLeft(langVocab) { case (df, (_, l, r, _, _)) =>
        val pat = lit(s" $l $r "); val rep = lit(s" $l$r ")
        df.withColumn("s", replace(replace(col("s"), pat, rep), pat, rep))
      }
      applied
        .select(col("lang"), col("cnt"), col("w"),
          size(split(trim(col("s")), " ")).as("nsym"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("cnt")).as("word_instances"),
          sum(col("cnt") * length(col("w"))).as("tokens_before"),
          sum(col("cnt") * col("nsym")).as("tokens_after"))
        .select(col("lang"), col("n_words"), col("word_instances"),
          col("tokens_before"), col("tokens_after"),
          (round(col("tokens_before").cast("double") / col("tokens_after"), 4)
            + lit(0.0)).as("compression"))
        .orderBy(col("lang"))
    },
    Some {
      val lvs = (1 to bpeTrainMerges).map { k =>
        s"""lv$k AS (SELECT lang, w, cnt,
          replace(replace(s, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' '),
                  ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ') AS s
        FROM lv${k - 1} CROSS JOIN b$k)"""
      }.mkString(",\n      ")
      s"""
      WITH $dkBpeTrainCtes,
      lv0 AS (
        SELECT lang, w, count(*) AS cnt,
               ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0
        GROUP BY 1, 2),
      $lvs
      SELECT lang,
             count(*) AS n_words,
             CAST(sum(cnt) AS BIGINT) AS word_instances,
             CAST(sum(cnt * length(w)) AS BIGINT) AS tokens_before,
             CAST(sum(cnt * len(string_split(trim(s), ' '))) AS BIGINT)
               AS tokens_after,
             round(CAST(sum(cnt * length(w)) AS DOUBLE)
                   / sum(cnt * len(string_split(trim(s), ' '))), 4) + 0.0
               AS compression
      FROM lv$bpeTrainMerges
      GROUP BY lang
      ORDER BY lang"""
    })

  /** WordPiece trainer (Schuster & Nakajima 2012 — the BERT tokenizer
    * learner), completing the tokenizer-training triangle beside BPE
    * (llm_bpe_train: merge by raw pair count) and unigram
    * (llm_unigram_segment: Viterbi under a fixed vocab): WordPiece
    * merges the adjacent pair with the highest LIKELIHOOD GAIN
    * score(l, r) = c(l,r) / (c(l)·c(r)) — the pair whose fusion most
    * increases corpus likelihood under a unigram LM, which prefers
    * cohesive rare pieces over merely frequent ones. Word-initial vs
    * continuation symbols carry the ## convention, so a merge is
    * l ++ strip##(r) (the right element of an adjacent pair is never
    * word-initial). Determinism: the score is ONE double division of
    * exact integer operands (c(l)·c(r) ≤ 10¹² — exact in double), so
    * both engines compute the identical bit pattern and the argmax
    * (score desc, then l, r) cannot split; the reported score is
    * floor(score·10⁹) — no round-half ambiguity. Scale shape: the
    * same aggregate-sized-iteration discipline as bpeLearn — training
    * runs on the word-frequency table, NEVER the corpus; each step is
    * one pair rollup + one symbol rollup sharing a checkpointed
    * symbol table, and exactly one argmax row reaches the driver per
    * merge. The oracle replays all 8 decisions in a materialized CTE
    * chain (inlined, the 3-consumer chain would expand 3⁸ base
    * scans — the llm_kcore lesson). */
  private val wordpieceTrainMerges = 8
  private val wordpieceTrain = QueryDef(
    "llm_wordpiece_train",
    (s, d) => {
      import s.implicits._
      val vocab = documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      var words = vocab
        .select(col("cnt"),
          when(length(col("w")) === 1, concat(lit(" "), col("w"), lit(" ")))
            .otherwise(concat(lit(" "), substring(col("w"), 1, 1), lit(" "),
              array_join(transform(split(expr("substring(w, 2)"), ""),
                c => concat(lit("##"), c)), " "), lit(" "))).as("s"))
        .coalesce(8)
        .localCheckpoint()
      val out = Seq.newBuilder[(Int, String, String, String, Long, Long)]
      for (step <- 1 to wordpieceTrainMerges) {
        val syms = words
          .select(col("cnt"), split(trim(col("s")), " ").as("syms"))
          .localCheckpoint() // pair rollup + symbol marginals share it
        val pairs = syms
          .filter(size(col("syms")) >= 2)
          .select(col("cnt"),
            explode(sequence(lit(1), size(col("syms")) - 1)).as("g"),
            col("syms"))
          .select(element_at(col("syms"), col("g")).as("l"),
            element_at(col("syms"), col("g") + 1).as("r"), col("cnt"))
          .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("pair_count"))
        val symCounts = syms
          .select(col("cnt"), explode(col("syms")).as("sym"))
          .groupBy(col("sym")).agg(sum(col("cnt")).as("c"))
        val bestRows = pairs
          .join(symCounts.select(col("sym").as("l"), col("c").as("cl")), "l")
          .join(symCounts.select(col("sym").as("r"), col("c").as("cr")), "r")
          .withColumn("score",
            col("pair_count").cast("double") /
              (col("cl").cast("double") * col("cr")))
          .orderBy(col("score").desc, col("l"), col("r"))
          .limit(1).collect() // bounded: exactly one merge decision
        require(bestRows.nonEmpty,
          s"llm_wordpiece_train: corpus exhausted after ${step - 1} merges")
        val b = bestRows(0)
        val l = b.getAs[String]("l"); val r = b.getAs[String]("r")
        val pc = b.getAs[Long]("pair_count")
        val scoreNano = math.floor(b.getAs[Double]("score") * 1e9).toLong
        val merged = l + r.stripPrefix("##")
        out += ((step, l, r, merged, pc, scoreNano))
        val pat = lit(s" $l $r "); val rep = lit(s" $merged ")
        words = words
          .withColumn("s", replace(replace(col("s"), pat, rep), pat, rep))
          .localCheckpoint()
      }
      out.result()
        .toDF("step", "lhs", "rhs", "merged", "pair_count", "score_nano")
        .orderBy(col("step"))
    },
    Some {
      val n = wordpieceTrainMerges
      val steps = (1 to n).map { k =>
        s"""sy$k AS MATERIALIZED (
        SELECT cnt, string_split(trim(s), ' ') AS syms FROM w${k - 1}),
      p$k AS MATERIALIZED (
        SELECT syms[g] AS l, syms[g + 1] AS r,
               CAST(sum(cnt) AS BIGINT) AS pair_count
        FROM (SELECT cnt, syms, unnest(generate_series(1, len(syms) - 1)) AS g
              FROM sy$k WHERE len(syms) >= 2)
        GROUP BY 1, 2),
      sc$k AS MATERIALIZED (
        SELECT sym, CAST(sum(cnt) AS BIGINT) AS c
        FROM (SELECT cnt, unnest(syms) AS sym FROM sy$k)
        GROUP BY 1),
      b$k AS MATERIALIZED (
        SELECT l, r, pair_count,
               CAST(pair_count AS DOUBLE) / (CAST(sl.c AS DOUBLE) * sr.c)
                 AS score,
               l || substr(r, 3) AS merged
        FROM p$k JOIN sc$k sl ON sl.sym = p$k.l
                 JOIN sc$k sr ON sr.sym = p$k.r
        ORDER BY score DESC, l, r LIMIT 1),
      w$k AS MATERIALIZED (
        SELECT cnt,
               replace(replace(s, ' ' || l || ' ' || r || ' ',
                               ' ' || merged || ' '),
                       ' ' || l || ' ' || r || ' ', ' ' || merged || ' ') AS s
        FROM w${k - 1} CROSS JOIN b$k)"""
      }.mkString(",\n      ")
      val rows = (1 to n).map(k =>
        s"""SELECT $k AS step, l AS lhs, r AS rhs, merged, pair_count,
               CAST(floor(score * 1000000000) AS BIGINT) AS score_nano
        FROM b$k""").mkString("\n        UNION ALL ")
      s"""
      WITH vocab AS MATERIALIZED (
        SELECT w, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0
        GROUP BY 1),
      w0 AS MATERIALIZED (
        SELECT cnt,
               CASE WHEN length(w) = 1 THEN ' ' || w || ' '
                    ELSE ' ' || substr(w, 1, 1) || ' ' ||
                         array_to_string(list_transform(
                           string_split(substr(w, 2), ''), c -> '##' || c),
                           ' ') || ' ' END AS s
        FROM vocab),
      $steps
      SELECT * FROM ($rows)
      ORDER BY step"""
    })

  /** Skip-gram co-occurrence with PMI over a ±2 token window — the
    * word2vec/GloVe co-occurrence pass, generalizing
    * llm_pmi_collocations' adjacent bigrams to the window the
    * embedding objectives actually use. NO token self-join: the
    * forward window comes from two lead() steps over ONE doc_id
    * shuffle (the shingleRows discipline — tokenize once, window the
    * rows), and every marginal (center, context, total) folds from
    * the aggregate-sized pair table itself. PMI is reported 4dp; the
    * ORDER is the exact integer count, so libm ln ulps can't reorder
    * rows. */
  private val skipgramCooc = QueryDef(
    "llm_skipgram_cooc",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
        .withColumn("l1", lead(col("w"), 1).over(w))
        .withColumn("l2", lead(col("w"), 2).over(w))
      // ONE pass emits both context words (explode of the 2-slot lead
      // array) — a union of two projections would execute the
      // tokenize+posexplode+window subtree twice
      val pairs = toks
        .select(col("w").as("a"),
          explode(array(col("l1"), col("l2"))).as("b"))
        .filter(col("b").isNotNull)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        .localCheckpoint() // aggregate-sized; marginals + final read it
      val ma = pairs.groupBy(col("a")).agg(sum(col("c_ab")).as("ca"))
      val mb = pairs.groupBy(col("b")).agg(sum(col("c_ab")).as("cb"))
      val tot = pairs.agg(sum(col("c_ab")).as("p_tot"))
      pairs.filter(col("c_ab") >= 10)
        .join(broadcast(ma), Seq("a"))
        .join(broadcast(mb), Seq("b"))
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("c_ab"),
          (round(
            log(col("c_ab").cast("double") / col("p_tot")) -
              log(col("ca").cast("double") / col("p_tot")) -
              log(col("cb").cast("double") / col("p_tot")), 4) + lit(0.0))
            .as("pmi"))
        .orderBy(col("c_ab").desc, col("a"), col("b"))
        .limit(30)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, g AS pos, ws[g] AS w,
               lead(ws[g], 1) OVER (PARTITION BY doc_id ORDER BY g) AS l1,
               lead(ws[g], 2) OVER (PARTITION BY doc_id ORDER BY g) AS l2
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             unnest(generate_series(1, len(ws))) t(g)),
      pairs AS (
        SELECT a, b, count(*) AS c_ab FROM (
          SELECT w AS a, l1 AS b FROM toks WHERE l1 IS NOT NULL
          UNION ALL
          SELECT w AS a, l2 AS b FROM toks WHERE l2 IS NOT NULL)
        GROUP BY 1, 2),
      ma AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS ca FROM pairs GROUP BY 1),
      mb AS (SELECT b, CAST(sum(c_ab) AS BIGINT) AS cb FROM pairs GROUP BY 1),
      tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS p_tot FROM pairs)
      SELECT a, b, c_ab,
             round(ln(CAST(c_ab AS DOUBLE) / p_tot)
                   - ln(CAST(ca AS DOUBLE) / p_tot)
                   - ln(CAST(cb AS DOUBLE) / p_tot), 4) + 0.0 AS pmi
      FROM pairs JOIN ma USING (a) JOIN mb USING (b)
      CROSS JOIN tot
      WHERE c_ab >= 10
      ORDER BY c_ab DESC, a, b
      LIMIT 30"""))

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) — unsupervised
    * corpus keywords as PageRank over the word co-occurrence graph:
    * terms ≥ 4 chars (the stopword screen standing in for the paper's
    * POS filter), edges between terms within a ±2 window of the
    * FILTERED sequence, weighted by co-occurrence count; 3 damped
    * (d = 0.85) weighted-PageRank rounds; top-10 terms by final score.
    * Determinism is the llm_bradley_terry integer-MM discipline: scores
    * live in micros (seed 10⁶), each neighbor contribution is
    * (w·score) div out-strength — one integer division — summed as
    * order-independent BIGINTs, the update 150000 + (85·S) div 100,
    * so zero IEEE ops and Spark div ≡ DuckDB //. Scale shape: one
    * doc-partitioned window pass builds edges (the llm_skipgram_cooc
    * two-lead idiom — no token self-join); the graph, strengths, and
    * every iteration are vocabulary-sized, never corpus-sized;
    * per-round localCheckpoint truncates the iterative lineage
    * (Dedup.connectedComponents discipline); the final top-10 is a
    * k-bounded TakeOrdered on exact ints. */
  private val textrankKeywords = QueryDef(
    "llm_textrank_keywords",
    (s, d) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val tok = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
        .filter(length(col("term")) >= 4)
      val rawp = tok
        .withColumn("t1", lead(col("term"), 1).over(w))
        .withColumn("t2", lead(col("term"), 2).over(w))
        .select(col("term").as("a"), explode(array(col("t1"), col("t2"))).as("b"))
        .filter(col("b").isNotNull && col("a") =!= col("b"))
      val edges = rawp.unionAll(rawp.select(col("b").as("a"), col("a").as("b")))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
        .localCheckpoint(true)
      val strength = edges.groupBy(col("a")).agg(sum(col("w")).as("wsum"))
      val ew = edges.join(strength, "a")
      val nodes = edges.select(col("a").as("term")).distinct()
        .localCheckpoint(true)
      var r = nodes.withColumn("score", lit(1000000L))
      for (_ <- 1 to 3) {
        val sums = ew
          .join(r.select(col("term").as("a"), col("score")), "a")
          .select(col("b"), expr("(w * score) div wsum").as("contrib"))
          .groupBy(col("b")).agg(sum(col("contrib")).as("insum"))
        r = nodes
          .join(sums.select(col("b").as("term"), col("insum")), Seq("term"), "left_outer")
          .select(col("term"),
            expr("150000L + (85 * coalesce(insum, 0L)) div 100").as("score"))
          .localCheckpoint(true)
      }
      r.orderBy(col("score").desc, col("term")).limit(10)
        .select(col("term"), col("score").as("score_micro"))
        .orderBy(col("score_micro").desc, col("term"))
    },
    Some {
      val iter = (1 to 3).map { i =>
        s"""c$i AS (
        SELECT e.b AS term, CAST(sum((e.w * r.score) // s.wsum) AS BIGINT)
          AS insum
        FROM edges e JOIN strength s USING (a)
        JOIN r${i - 1} r ON r.term = e.a
        GROUP BY 1),
      r$i AS (
        SELECT n.term,
               150000 + (85 * coalesce(c.insum, 0)) // 100 AS score
        FROM nodes n LEFT JOIN c$i c USING (term))"""
      }.mkString(",\n      ")
      s"""
      WITH tok AS (
        SELECT doc_id, g AS pos, ws[g] AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             unnest(generate_series(1, len(ws))) t(g)
        WHERE length(ws[g]) >= 4),
      seqd AS (
        SELECT term,
               lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
               lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        FROM tok),
      rawp AS (
        SELECT a, b FROM (
          SELECT term AS a, t1 AS b FROM seqd
          UNION ALL SELECT term, t2 FROM seqd)
        WHERE b IS NOT NULL AND a <> b),
      edges AS (
        SELECT a, b, count(*) AS w FROM (
          SELECT a, b FROM rawp UNION ALL SELECT b, a FROM rawp)
        GROUP BY 1, 2),
      strength AS (SELECT a, CAST(sum(w) AS BIGINT) AS wsum FROM edges GROUP BY 1),
      nodes AS (SELECT DISTINCT a AS term FROM edges),
      r0 AS (SELECT term, CAST(1000000 AS BIGINT) AS score FROM nodes),
      $iter
      SELECT term, score AS score_micro
      FROM r3 ORDER BY score DESC, term LIMIT 10"""
    })

  /** Weighted sampling WITHOUT replacement via the Efraimidis–
    * Spirakis exponential-sort trick: each doc draws key =
    * ln(u)/w (u = deterministic unit uniform from the shared 60-bit
    * hash, w = n_chars) and the global top-20 keys ARE a weighted
    * sample without replacement — the one-pass, shuffle-free way to
    * draw "k docs, long docs proportionally more likely" at any
    * scale (naive weighted sampling needs a prefix-sum over the
    * weight column + k binary searches; this is a k-bounded
    * TakeOrderedAndProject). u = (h+1)/2⁶⁰ keeps u in (0,1] so
    * ln(u) is finite; the doc_id tie-break makes the order total.
    * No rand(): re-runs, retries, and both engines draw the same
    * sample. */
  private val weightedSample = QueryDef(
    "llm_weighted_sample",
    (s, d) => {
      val u = (hash60(concat(col("doc_id").cast("string"), lit(":ws"))) + 1)
        .cast("double") / lit(1152921504606846976.0)
      documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          (log(u) / col("n_chars")).as("es_key"))
        .orderBy(col("es_key").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("n_chars"),
          round(col("es_key") * 1000000, 4).as("es_key_ppm"))
        .orderBy(col("es_key_ppm").desc, col("doc_id"))
    },
    Some("""
      WITH keyed AS (
        SELECT doc_id, n_chars,
               ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'),
                   1, 15))::BIGINT AS DOUBLE) + 1)
                  / 1152921504606846976.0) / n_chars AS es_key
        FROM documents)
      SELECT doc_id, n_chars, es_key_ppm FROM (
        SELECT doc_id, n_chars, round(es_key * 1000000, 4) AS es_key_ppm
        FROM keyed
        ORDER BY es_key DESC, doc_id LIMIT 20)
      ORDER BY es_key_ppm DESC, doc_id"""))

  /** Cohen's kappa of the marker-token lang-id heuristic against the
    * gold `lang` label, per source — the inter-rater / label-QA audit
    * a labeling pipeline runs before trusting weak labels (chance-
    * corrected agreement, not raw accuracy: a rater that always says
    * the majority class scores high accuracy but κ ≈ 0). Exactness by
    * algebra: with h = agreements, n = docs, and S = Σ_c pred_c·gold_c
    * the chance-pair count, κ = (p_o − p_e)/(1 − p_e) reduces to
    * (h·n − S)/(n² − S) — a ratio of EXACT 128-bit integers
    * (decimal(38,0) / HUGEINT: S and n² reach n² magnitude, so a
    * BIGINT would wrap at ~3·10⁹ docs per source — the
    * llm_grpo_advantage Σr² lesson), so both engines perform ONE
    * identical IEEE division (no float accumulation to drift).
    * S = n² forces h = n (both raters constant on the same
    * class), pinned to κ = 1 before the division. Spark shape: a
    * narrow prediction pass, then three map-side-combinable
    * aggregations at (source[, class]) granularity and joins on the
    * tiny marginal tables — nothing data-sized shuffles twice. */
  private val agreementKappa = QueryDef(
    "llm_agreement_kappa",
    (s, d) => {
      val t = tokens(col("text"))
      val cs = Seq("the" -> "en", "a" -> "zh", "data" -> "fr", "scan" -> "es")
        .map { case (w, l) => (tokenCountOf(t, w), l) }
      val g = greatest((tokenCountOf(t, "hash") +: cs.map(_._1)): _*)
      val pred = cs.foldLeft(when(lit(false), "")) { case (acc, (c, l)) =>
        acc.when(c === g, l)
      }.otherwise("de")
      val per = documents(s, d)
        .select(col("source"), col("lang"), pred.as("pred"))
      val tot = per.groupBy(col("source")).agg(
        count(lit(1)).as("n"),
        sum((col("pred") === col("lang")).cast("long")).as("hits"))
      val pc = per.groupBy(col("source"), col("pred"))
        .agg(count(lit(1)).as("pc"))
      val gc = per.groupBy(col("source").as("gsource"), col("lang"))
        .agg(count(lit(1)).as("gc"))
      // h·n, n², and S reach n² magnitude: 128 bits (decimal(38,0) /
      // HUGEINT) like llm_grpo_advantage's Σr² — a BIGINT n² wraps at
      // ~3·10⁹ docs per source
      val chance = pc
        .join(gc, col("gsource") === col("source") && col("lang") === col("pred"))
        .groupBy(col("source"))
        .agg(sum(col("pc").cast("decimal(19,0)") * col("gc")).as("s_chance"))
      val hn = col("hits").cast("decimal(19,0)") * col("n")
      val nn = col("n").cast("decimal(19,0)") * col("n")
      tot.join(chance, Seq("source"), "left")
        .withColumn("s_chance", coalesce(col("s_chance"), lit(0L)))
        .select(col("source"), col("n"), col("hits"),
          col("s_chance").cast("long").as("s_chance"),
          when(nn === col("s_chance"), lit(1.0))
            .otherwise(round(
              SharedExprs.hugeToDouble(hn - col("s_chance")) /
                SharedExprs.hugeToDouble(nn - col("s_chance")), 6) +
              lit(0.0)).as("kappa"))
        .orderBy(col("source"))
    },
    Some("""
      WITH c AS (
        SELECT source, lang,
               len(list_filter(string_split(text, ' '), t -> t = 'the'))  AS c1,
               len(list_filter(string_split(text, ' '), t -> t = 'a'))    AS c2,
               len(list_filter(string_split(text, ' '), t -> t = 'data')) AS c3,
               len(list_filter(string_split(text, ' '), t -> t = 'scan')) AS c4,
               len(list_filter(string_split(text, ' '), t -> t = 'hash')) AS c5
        FROM documents),
      p AS (
        SELECT source, lang,
               CASE WHEN c1 = greatest(c1,c2,c3,c4,c5) THEN 'en'
                    WHEN c2 = greatest(c1,c2,c3,c4,c5) THEN 'zh'
                    WHEN c3 = greatest(c1,c2,c3,c4,c5) THEN 'fr'
                    WHEN c4 = greatest(c1,c2,c3,c4,c5) THEN 'es'
                    ELSE 'de' END AS pred
        FROM c),
      tot AS (
        SELECT source, count(*) AS n,
               count(CASE WHEN pred = lang THEN 1 END) AS hits
        FROM p GROUP BY 1),
      pc AS (SELECT source, pred, count(*) AS pc FROM p GROUP BY 1, 2),
      gc AS (SELECT source, lang, count(*) AS gc FROM p GROUP BY 1, 2),
      ch AS (
        SELECT pc.source, sum(CAST(pc.pc AS HUGEINT) * gc.gc) AS s_chance
        FROM pc JOIN gc ON gc.source = pc.source AND gc.lang = pc.pred
        GROUP BY 1)
      SELECT tot.source, n, hits,
             CAST(coalesce(s_chance, 0) AS BIGINT) AS s_chance,
             CASE WHEN CAST(n AS HUGEINT) * n = coalesce(s_chance, 0)
                  THEN CAST(1.0 AS DOUBLE)
                  ELSE round(
                    (CAST(((CAST(hits AS HUGEINT) * n - coalesce(s_chance, 0))
                           - (CAST(hits AS HUGEINT) * n - coalesce(s_chance, 0))
                             % 4294967296) // 4294967296 AS DOUBLE)
                     * CAST(4294967296 AS DOUBLE)
                     + CAST((CAST(hits AS HUGEINT) * n - coalesce(s_chance, 0))
                            % 4294967296 AS DOUBLE)) /
                    (CAST(((CAST(n AS HUGEINT) * n - coalesce(s_chance, 0))
                           - (CAST(n AS HUGEINT) * n - coalesce(s_chance, 0))
                             % 4294967296) // 4294967296 AS DOUBLE)
                     * CAST(4294967296 AS DOUBLE)
                     + CAST((CAST(n AS HUGEINT) * n - coalesce(s_chance, 0))
                            % 4294967296 AS DOUBLE)), 6) + 0.0
             END AS kappa
      FROM tot LEFT JOIN ch ON ch.source = tot.source
      ORDER BY tot.source"""))

  /** Per-source boilerplate scrub — the RefinedWeb/CCNet line-dedup
    * REWRITE step (dedup that edits documents instead of dropping
    * them): split each doc into consecutive 3-token segments, call a
    * segment boilerplate when its exact text recurs in ≥ 2 distinct
    * docs of the SAME source (nav bars, footers, cookie banners —
    * the within-site repetition signature), and re-emit each doc
    * with those segments cut out. Output per doc: segment/removal
    * counts, surviving token count, and the md5 of the rebuilt text
    * (segments rejoined in position order — the hash pins the exact
    * reconstruction, not just the counts). Spark shape: segmenting
    * follows the llm_chunk_documents explode(sequence)+slice idiom
    * (no shuffle, no lambda-re-evaluation of the split); the entire
    * frequency side — per-(source, digest) doc counts, the
    * boilerplate set, and the per-doc removed-index arrays — runs on
    * (doc_id, seg, source, md5(segment)) rows with NO text column,
    * so at 100 TB those shuffles carry 16-byte digests; segment TEXT
    * crosses the wire exactly once, into the doc_id-keyed rewrite
    * aggregation (unavoidable — the output IS the rewritten corpus),
    * whose join and groupBy share the doc_id partitioning.
    * Reassembly sorts the collected (seg, chunk) structs —
    * collect_list order is shuffle-dependent, array_sort makes it
    * total. */
  private val boilerplateScrub = QueryDef(
    "llm_boilerplate_scrub",
    (s, d) => {
      val segW = 3
      val seg = documents(s, d)
        .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
        .withColumn("nt", size(col("toks")))
        .withColumn("seg",
          explode(sequence(lit(0), floor((col("nt") - 1) / lit(segW)).cast("int"))))
        .select(col("doc_id"), col("source"), col("seg"),
          array_join(slice(col("toks"), col("seg") * segW + 1, lit(segW)), " ")
            .as("chunk"))
        .withColumn("chash", md5(col("chunk")))
      val dig = seg.select(col("doc_id"), col("source"), col("seg"), col("chash"))
      val bpSet = dig.groupBy(col("source"), col("chash"))
        .agg(countDistinct(col("doc_id")).as("df_docs"))
        .filter(col("df_docs") >= 2)
        .select(col("source"), col("chash"))
      val removed = dig.join(bpSet, Seq("source", "chash"))
        .groupBy(col("doc_id")).agg(collect_set(col("seg")).as("rsegs"))
      val keep = !coalesce(array_contains(col("rsegs"), col("seg")), lit(false))
      seg.join(removed, Seq("doc_id"), "left")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_segs"),
          sum((!keep).cast("long")).as("n_removed"),
          sum(when(keep, size(split(col("chunk"), " "))).otherwise(0L))
            .as("n_tokens_kept"),
          md5(array_join(
            transform(
              array_sort(collect_list(when(keep, struct(col("seg"), col("chunk"))))),
              x => x.getField("chunk")),
            " ")).as("clean_hash"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
      c AS (
        SELECT doc_id, source, toks,
               unnest(generate_series(0, (len(toks) - 1) // 3)) AS seg
        FROM t),
      x AS (
        SELECT doc_id, source, seg,
               array_to_string(list_slice(toks, seg * 3 + 1, seg * 3 + 3), ' ')
                 AS chunk
        FROM c),
      d AS (
        SELECT source, md5(chunk) AS chash, count(DISTINCT doc_id) AS df_docs
        FROM x GROUP BY 1, 2),
      f AS (
        SELECT x.doc_id, x.seg, x.chunk,
               CASE WHEN d.df_docs >= 2 THEN 1 ELSE 0 END AS bp
        FROM x JOIN d ON d.source = x.source AND d.chash = md5(x.chunk)),
      cnt AS (
        SELECT doc_id, count(*) AS n_segs,
               count(CASE WHEN bp = 1 THEN 1 END) AS n_removed
        FROM f GROUP BY 1),
      reb AS (
        SELECT doc_id,
               CAST(sum(len(string_split(chunk, ' '))) AS BIGINT) AS n_tokens_kept,
               md5(string_agg(chunk, ' ' ORDER BY seg)) AS clean_hash
        FROM f WHERE bp = 0 GROUP BY 1)
      SELECT cnt.doc_id, n_segs, n_removed,
             coalesce(n_tokens_kept, 0) AS n_tokens_kept,
             coalesce(clean_hash, md5('')) AS clean_hash
      FROM cnt LEFT JOIN reb ON reb.doc_id = cnt.doc_id
      ORDER BY cnt.doc_id"""))

  /** Band-bucketed Hamming near-dup pairs over a (doc_id, variant,
    * dhash) table of 56-bit fingerprints: 4 × 14-bit LSH bands
    * generate candidates (only band-key collisions ever join — never
    * all pairs), bit_count confirms at `maxHamming`. ONE pairing
    * definition shared by the image and audio fingerprint operators;
    * [[dkHammingTail]] is its DuckDB rendering. */
  private def bandedHammingPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val bands = hashes
      .select(col("doc_id"), col("variant"), col("dhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey",
        expr("shiftright(dhash, band * 14)").bitwiseAND(lit(16383L)))
    val l = bands.select(col("band"), col("bkey"), col("doc_id").as("id1"),
      col("variant").as("v1"), col("dhash").as("h1"))
    val r = bands.select(col("band"), col("bkey"), col("doc_id").as("id2"),
      col("variant").as("v2"), col("dhash").as("h2"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id1") < col("id2") ||
        (col("id1") === col("id2") && col("v1") < col("v2")))
      .select(col("id1"), col("v1"), col("id2"), col("v2"),
        col("h1"), col("h2"))
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(h1 ^ h2) as int)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("v1"), col("id2"), col("v2"), col("hamming"))
      .orderBy(col("id1"), col("v1"), col("id2"), col("v2"))
  }

  /** DuckDB rendering of [[bandedHammingPairs]]: appends the
    * banding/candidate/confirm tail to a CTE chain whose last CTE
    * `hs` holds (doc_id, variant, dhash). */
  private def dkHammingTail(maxHamming: Int): String = s""",
      bk AS (
        SELECT doc_id, variant, dhash, band,
               (dhash >> (band * 14)) & 16383 AS bkey
        FROM (SELECT *, unnest(generate_series(0, 3)) AS band FROM hs)),
      cand AS (
        SELECT DISTINCT l.doc_id AS id1, l.variant AS v1,
               r.doc_id AS id2, r.variant AS v2, l.dhash AS h1, r.dhash AS h2
        FROM bk l JOIN bk r ON r.band = l.band AND r.bkey = l.bkey
        WHERE l.doc_id < r.doc_id
           OR (l.doc_id = r.doc_id AND l.variant < r.variant))
      SELECT id1, v1, id2, v2,
             CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
      FROM cand
      WHERE bit_count(xor(h1, h2)) <= $maxHamming
      ORDER BY id1, v1, id2, v2"""

  /** Image near-duplicate detection by perceptual hash — the
    * LAION-style image-dedup pipeline run over REALLY-DECODED pixels:
    * deterministic PNG fixtures (base / top-row-brightness-shifted
    * near-dup / different-size distractor per id) decode through the
    * JDK ImageIO path, [[graft.multimodal.Multimodal.dhash56]] turns
    * each into a 56-bit difference hash, LSH banding (4 × 14-bit
    * bands) generates candidate pairs, and Hamming ≤ 8 confirms
    * near-dups. The oracle recomputes every hash as PURE ARITHMETIC
    * from the known pixel formula — integer nearest-neighbor grid +
    * integer luma make the codec → hash path bit-checkable, so a
    * decode defect anywhere flips the gate (the
    * llm_multimodal_codec_twin discipline extended from metadata to
    * pixels). Scale shape: hashing is a narrow per-partition map (no
    * shuffle), the pair search is band-bucketed — only 14-bit-key
    * collisions ever join, never all pairs — and what shuffles is the
    * 8-byte hash, not the image. */
  private val imageDhashDedup = QueryDef(
    "llm_image_dhash_dedup",
    (s, d) => {
      import s.implicits._
      import graft.multimodal.{MediaFixtures, Multimodal}
      val hashes = documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 32).as[Long]
        .mapPartitions { it =>
          it.flatMap { id =>
            val g = (id % 32).toInt
            val w = g % 8 + 5; val h = g % 7 + 7; val delta = g % 9 + 3
            val coef = 37 + 2 * g // per-id gradient: unrelated ids hash apart
            def hashOf(png: Array[Byte]): Long =
              Multimodal.dhash56(png)
                .getOrElse(sys.error("PNG fixture must decode"))
            Seq(
              (id, "a", hashOf(MediaFixtures.pngSeeded(w, h, coef))),
              (id, "b", hashOf(MediaFixtures.pngRowShift(w, h, delta, coef))),
              (id, "c", hashOf(MediaFixtures.pngSeeded(w + 1, h, coef))))
          }
        }.toDF("doc_id", "variant", "dhash")
      bandedHammingPairs(hashes, 8)
    },
    Some("""
      WITH ids AS (
        SELECT doc_id, CAST(doc_id % 32 AS INTEGER) AS g
        FROM documents WHERE doc_id < 32),
      imgs AS (
        SELECT doc_id, 'a' AS variant, g % 8 + 5 AS w, g % 7 + 7 AS h,
               0 AS delta, 37 + 2 * g AS coef FROM ids
        UNION ALL SELECT doc_id, 'b', g % 8 + 5, g % 7 + 7, g % 9 + 3,
               37 + 2 * g FROM ids
        UNION ALL SELECT doc_id, 'c', g % 8 + 6, g % 7 + 7, 0,
               37 + 2 * g FROM ids),
      grid AS (SELECT *, unnest(generate_series(0, 6)) AS gy FROM imgs),
      cells AS (SELECT *, unnest(generate_series(0, 8)) AS sx FROM grid),
      samp AS (
        SELECT doc_id, variant, gy, sx,
               (587 * (CASE WHEN (gy * h) // 7 = 0
                       THEN ((sx * w) // 9 * coef + delta) % 255
                       ELSE ((sx * w) // 9 * coef
                             + ((gy * h) // 7) * 101) % 255
                       END)) // 1000 AS s
        FROM cells),
      bits AS (
        SELECT a.doc_id, a.variant, a.gy, a.sx AS gx,
               CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
        FROM samp a
        JOIN samp b ON b.doc_id = a.doc_id AND b.variant = a.variant
          AND b.gy = a.gy AND b.sx = a.sx + 1
        WHERE a.sx < 8),
      hs AS (
        SELECT doc_id, variant,
               CAST(sum(CASE WHEN bit = 1
                 THEN (CAST(1 AS BIGINT) << (gy * 8 + gx)) ELSE 0 END)
                 AS BIGINT) AS dhash
        FROM bits GROUP BY 1, 2)""" + dkHammingTail(8)))

  /** Two-stage retrieval: rerank the BM25 top-20 with features a
    * first-stage scorer cannot see — the retrieve-then-rerank shape
    * every RAG/search pipeline runs (recall from a cheap corpus-wide
    * stage, precision from an expensive candidate-only stage). Stage
    * 1 IS llm_bm25_search's QueryDef, consumed verbatim (fn + oracle
    * both — the SharedExprs doctrine at whole-query granularity, so
    * the stages cannot drift apart). Stage 2 scores only the 20
    * candidates: query-term coverage, hit count, and minimum
    * inter-term position gap (the proximity signal BM25's
    * bag-of-words sum ignores), folded into an EXACT-integer rerank
    * score (coverage·100000 − min(gap, 9000)·10 + hits capped at 50 —
    * the gap cap makes the coverage tiers hold by ARITHMETIC,
    * 90000 + 50 < 100000, not by hoping documents stay short; a
    * branch-safe argsort). Scale shape: positions come from
    * the tokenizer-filtered postings semi-joined to the broadcast
    * 20-row candidate set, the gap self-join is candidate-bounded,
    * and both rank windows run on the constant 20-row frame (the
    * kdb_tail_index k-bounded discipline). */
  private val rerankStage = QueryDef(
    "llm_rerank_stage",
    (s, d) => {
      // 20 rows, reused by three consumers (pos semi-join + both rank
      // windows) — materialize once instead of re-running stage 1
      val cand = bm25Search.fn(s, d)
        .select(col("doc_id"), col("score").as("bm25_score"))
        .localCheckpoint()
      // candidate-bounded positions, consumed by cov AND both sides
      // of the gap self-join — without the checkpoint each reference
      // re-tokenizes the corpus (self-joins don't share subtrees)
      val pos = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .filter(col("tok").isin(searchTerms: _*))
        .join(broadcast(cand.select(col("doc_id"))), Seq("doc_id"))
        .localCheckpoint()
      val cov = pos.groupBy(col("doc_id")).agg(
        countDistinct(col("tok")).as("coverage"), count(lit(1)).as("n_hits"))
      val gaps = pos.as("p1")
        .join(pos.as("p2"),
          col("p1.doc_id") === col("p2.doc_id") && col("p1.tok") < col("p2.tok"))
        .groupBy(col("p1.doc_id").as("doc_id"))
        .agg(min(abs(col("p1.pos") - col("p2.pos"))).as("min_gap"))
      val wNew = Window.orderBy(col("rerank_score").desc, col("doc_id"))
      val wOld = Window.orderBy(col("bm25_score").desc, col("doc_id"))
      cand
        .join(cov, Seq("doc_id"))
        .join(gaps, Seq("doc_id"), "left")
        // cap at 9000 so the coverage tier holds by arithmetic
        // (10·9000 + 50 < 100000) and the no-pair sentinel collapses
        // onto the same cap
        .withColumn("min_gap", least(coalesce(col("min_gap"), lit(9999)), lit(9000)))
        .withColumn("rerank_score",
          col("coverage") * lit(100000L) - col("min_gap") * lit(10L) +
            least(col("n_hits"), lit(50L)))
        .withColumn("new_rank", row_number().over(wNew))
        .withColumn("old_rank", row_number().over(wOld))
        .select(col("doc_id"), col("old_rank"), col("new_rank"),
          (col("new_rank") - col("old_rank")).as("moved"),
          col("coverage"), col("n_hits"), col("min_gap"), col("rerank_score"))
        .orderBy(col("new_rank"))
    },
    Some(s"""
      WITH cand AS (SELECT doc_id, score FROM (${bm25Search.oracle.get})),
      t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      pos0 AS (
        SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS g FROM t),
      ch AS (
        SELECT h.doc_id, h.tok, h.pos
        FROM (SELECT doc_id, ws[g] AS tok, g AS pos FROM pos0
              WHERE ws[g] IN $searchTermsSql) h
        JOIN cand USING (doc_id)),
      cov AS (
        SELECT doc_id, count(DISTINCT tok) AS coverage, count(*) AS n_hits
        FROM ch GROUP BY 1),
      gaps AS (
        SELECT p1.doc_id, min(abs(p1.pos - p2.pos)) AS min_gap
        FROM ch p1
        JOIN ch p2 ON p2.doc_id = p1.doc_id AND p1.tok < p2.tok
        GROUP BY 1),
      rer AS (
        SELECT c.doc_id, c.score AS bm25_score, coverage, n_hits,
               least(CAST(coalesce(min_gap, 9999) AS INTEGER), 9000) AS min_gap
        FROM cand c
        JOIN cov USING (doc_id)
        LEFT JOIN gaps ON gaps.doc_id = c.doc_id),
      ranked AS (
        SELECT doc_id, coverage, n_hits, min_gap,
               coverage * 100000 - min_gap * 10 + least(n_hits, 50)
                 AS rerank_score,
               CAST(row_number() OVER (ORDER BY bm25_score DESC, doc_id)
                 AS INTEGER) AS old_rank
        FROM rer)
      SELECT doc_id, old_rank,
             CAST(row_number() OVER (ORDER BY rerank_score DESC, doc_id)
               AS INTEGER) AS new_rank,
             CAST(CAST(row_number() OVER (ORDER BY rerank_score DESC, doc_id)
               AS INTEGER) - old_rank AS INTEGER) AS moved,
             coverage, n_hits, min_gap, rerank_score
      FROM ranked
      ORDER BY new_rank"""))

  /** Audio near-duplicate detection by acoustic fingerprint — the
    * audio arm of the fingerprint-dedup family (one pairing
    * definition with llm_image_dhash_dedup): deterministic mono-PCM
    * WAV fixtures (base ramp / gain-0.75 re-encode / different-
    * stride distractor per id) decode through the real RIFF/PCM
    * path, [[graft.multimodal.Multimodal.audioEnergyHash56]] folds
    * each into a 56-bit frame-energy-order hash, and the shared
    * banded-Hamming pairing confirms at ≤ 4 bits. The gain twin
    * hashes IDENTICALLY (energy order is gain-invariant — the
    * perceptual property a loudness-normalized re-upload must not
    * defeat) while the nearest distractor sits ≥ 7 bits away, so the
    * threshold cleanly separates. The oracle recomputes every hash
    * as pure arithmetic from the ramp formula — both fixture
    * divisions run on non-negative ints so Scala truncation and
    * DuckDB floor agree. Hashing is a narrow per-partition map; only
    * 8-byte hashes shuffle. */
  private val audioFingerprint = QueryDef(
    "llm_audio_fingerprint",
    (s, d) => {
      import s.implicits._
      import graft.multimodal.{MediaFixtures, Multimodal}
      val n = 57 * 64
      val hashes = documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 32).as[Long]
        .mapPartitions { it =>
          it.flatMap { id =>
            val g = (id % 32).toInt
            val stride = 257 + 2 * g
            def hashOf(wav: Array[Byte]): Long =
              Multimodal.audioEnergyHash56(wav)
                .getOrElse(sys.error("PCM fixture must decode"))
            Seq(
              (id, "a", hashOf(MediaFixtures.wavPcmSeeded(n, stride, 1, 1))),
              (id, "b", hashOf(MediaFixtures.wavPcmSeeded(n, stride, 3, 4))),
              (id, "c", hashOf(MediaFixtures.wavPcmSeeded(n, stride + 101, 1, 1))))
          }
        }.toDF("doc_id", "variant", "dhash")
      bandedHammingPairs(hashes, 4)
    },
    Some("""
      WITH ids AS (
        SELECT doc_id, CAST(doc_id % 32 AS INTEGER) AS g
        FROM documents WHERE doc_id < 32),
      auds AS (
        SELECT doc_id, 'a' AS variant, 257 + 2 * g AS stride,
               1 AS num, 1 AS den FROM ids
        UNION ALL SELECT doc_id, 'b', 257 + 2 * g, 3, 4 FROM ids
        UNION ALL SELECT doc_id, 'c', 358 + 2 * g, 1, 1 FROM ids),
      frames AS (SELECT *, unnest(generate_series(0, 56)) AS f FROM auds),
      cells AS (SELECT *, unnest(generate_series(0, 63)) AS j FROM frames),
      vals AS (
        SELECT doc_id, variant, f,
               ((f * 64 + j) * stride % 30000) * num // den
                 - (15000 * num) // den AS v
        FROM cells),
      en AS (
        SELECT doc_id, variant, f,
               CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS e
        FROM vals GROUP BY 1, 2, 3),
      bits AS (
        SELECT a.doc_id, a.variant, a.f,
               CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
        FROM en a
        JOIN en b ON b.doc_id = a.doc_id AND b.variant = a.variant
          AND b.f = a.f + 1
        WHERE a.f < 56),
      hs AS (
        SELECT doc_id, variant,
               CAST(sum(CASE WHEN bit = 1
                 THEN (CAST(1 AS BIGINT) << f) ELSE 0 END) AS BIGINT) AS dhash
        FROM bits GROUP BY 1, 2)""" + dkHammingTail(4)))

  /** Population-stability-index (PSI) drift monitor — the
    * train/serve-skew audit a production pipeline runs on every
    * incoming batch: bin two per-doc features (length, type-token
    * ratio), compare the reference split's bin distribution (doc_id
    * % 5 ≠ 0 — llm_nb_train's train split) against the incoming
    * split's, and report each bin's PSI contribution
    * (p − q)·ln(p/q). Laplace add-one smoothing (p = (n_b+1)/(N+B))
    * keeps empty bins finite; counts, bin ids, and totals are exact
    * integers, the contribution is ONE fixed-order double expression
    * on those exact ints quantized to micros (the nb/lm_score ln()
    * discipline). Scale shape: one corpus pass explodes 2 rows/doc,
    * one map-side-combinable (feature, bin) count, per-feature
    * totals join back EQUI on feature (aggregate-sized — no scalar
    * cross join), output is bin-bounded. */
  private val psiDrift = QueryDef(
    "llm_psi_drift",
    (s, d) => {
      val ttr = expr(
        "((size(array_distinct(split(text, ' '))) * 100)" +
          " div size(split(text, ' '))) div 10")
      val fb = documents(s, d)
        .select(
          explode(array(
            struct(lit("len").as("feature"),
              expr("n_chars div 100").as("bin")),
            struct(lit("ttr").as("feature"), ttr.as("bin")))).as("fb"),
          (col("doc_id") % 5 === 0).cast("long").as("is_cur"))
        .select(col("fb.feature").as("feature"), col("fb.bin").as("bin"),
          col("is_cur"))
      val counts = fb.groupBy(col("feature"), col("bin"))
        .agg(sum(lit(1L) - col("is_cur")).as("ref_n"),
          sum(col("is_cur")).as("cur_n"))
      val tots = counts.groupBy(col("feature"))
        .agg(count(lit(1)).as("bcnt"), sum(col("ref_n")).as("nr"),
          sum(col("cur_n")).as("nc"))
      counts.join(tots, Seq("feature"))
        .withColumn("p",
          (col("ref_n") + 1).cast("double") / (col("nr") + col("bcnt")))
        .withColumn("q",
          (col("cur_n") + 1).cast("double") / (col("nc") + col("bcnt")))
        .select(col("feature"), col("bin"), col("ref_n"), col("cur_n"),
          round((col("p") - col("q")) * log(col("p") / col("q")) * 1000000, 0)
            .cast("long").as("contrib_micro"))
        .orderBy(col("feature"), col("bin"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id,
               n_chars // 100 AS len_bin,
               ((len(list_distinct(string_split(text, ' '))) * 100)
                 // len(string_split(text, ' '))) // 10 AS ttr_bin,
               CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS is_cur
        FROM documents),
      fb AS (
        SELECT 'len' AS feature, len_bin AS bin, is_cur FROM base
        UNION ALL SELECT 'ttr', ttr_bin, is_cur FROM base),
      counts AS (
        SELECT feature, bin,
               count(CASE WHEN is_cur = 0 THEN 1 END) AS ref_n,
               count(CASE WHEN is_cur = 1 THEN 1 END) AS cur_n
        FROM fb GROUP BY 1, 2),
      tots AS (
        SELECT feature, count(*) AS bcnt,
               CAST(sum(ref_n) AS BIGINT) AS nr,
               CAST(sum(cur_n) AS BIGINT) AS nc
        FROM counts GROUP BY 1),
      pq AS (
        SELECT c.feature, c.bin, c.ref_n, c.cur_n,
               CAST(c.ref_n + 1 AS DOUBLE) / (t.nr + t.bcnt) AS p,
               CAST(c.cur_n + 1 AS DOUBLE) / (t.nc + t.bcnt) AS q
        FROM counts c JOIN tots t USING (feature))
      SELECT feature, bin, ref_n, cur_n,
             CAST(round((p - q) * ln(p / q) * 1000000, 0) AS BIGINT)
               AS contrib_micro
      FROM pq ORDER BY feature, bin"""))

  /** Distributed suffix-array construction by prefix doubling — the
    * index behind exact-substring dedup of training corpora (Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better") — plus the longest-repeated-substring report read off
    * sort-adjacent LCPs. Token-level suffixes (one per token
    * position), ranked by their first 8 tokens in 3 Manber–Myers
    * doubling rounds: base rank = global dense rank of the single
    * token, then rank_{2k}(p) = dense rank of (rank_k(p),
    * rank_k(p+k)), past-end rank 0 so shorter suffixes sort first —
    * exactly array-lexicographic order, which is what the oracle
    * sorts directly. Output: top 20 distinct prefixes by repeat
    * length, where repeat = max(full prefix length if it occurs
    * twice, LCP with the sort-previous prefix, LCP with the
    * sort-next prefix) — the classic LRS-from-adjacent-LCP identity.
    *
    * Scale shape (the whole point — the oracle's direct sort of
    * materialized prefixes does NOT scale, the doubling does): only
    * (doc_id, pos, int64-rank) triples shuffle per round — never
    * substrings — for ⌈log₂ L⌉ rounds; global dense ranks come from
    * DistributedRank (range-partition + offsets, no single-partition
    * window); per-round localCheckpoint truncates the iterative
    * lineage (the Dedup.connectedComponents discipline); prefix
    * STRINGS materialize once, only for the R distinct ranks, via
    * one doc_id equi-join; sort-neighbors come from rank±1
    * equi-joins, not a global window. Uncapped construction is the
    * same loop run to rank saturation (rounds = log₂ max-repeat). */
  private val suffixArray = QueryDef(
    "llm_suffix_array",
    (s, d) => {
      val L = 8
      // checkpointed: the rank seed and the vocab distinct both read it
      val tok = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
        .localCheckpoint(true)
      val suf = graft.operators.SuffixRank.prefixDoublingRanks(tok, L)
      val reps = suf.groupBy(col("r"))
        .agg(count(lit(1)).as("n_occ"),
          min(struct(col("doc_id"), col("p"))).as("w"))
        .select(col("r"), col("n_occ"),
          col("w.doc_id").as("doc_id"), col("w.p").as("p"))
      val withPre = reps
        .join(documents(s, d).select(col("doc_id"), tokens(col("text")).as("toks")),
          "doc_id")
        .select(col("r"), col("n_occ"),
          slice(col("toks"), col("p"), lit(L)).as("pre"))
      // LCP of two ≤L-token prefixes: prefix-equality is monotone in
      // i, so the indicator sum over slice lengths IS the LCP.
      def lcp(a: Column, b: Column): Column =
        (1 to L).map(i =>
          when(b.isNotNull && slice(a, 1, i) === slice(b, 1, i), 1).otherwise(0))
          .reduce(_ + _)
      val nxt = withPre.select((col("r") - 1).as("r"), col("pre").as("nxt"))
      val prv = withPre.select((col("r") + 1).as("r"), col("pre").as("prv"))
      withPre
        .join(nxt, Seq("r"), "left_outer")
        .join(prv, Seq("r"), "left_outer")
        .select(
          concat_ws(" ", col("pre")).as("prefix"),
          col("n_occ"),
          greatest(
            when(col("n_occ") > 1, size(col("pre"))).otherwise(0),
            lcp(col("pre"), col("nxt")),
            lcp(col("pre"), col("prv"))).as("rep_len"))
        .orderBy(col("rep_len").desc, col("prefix"))
        .limit(20)
    },
    Some {
      val dkLcp = (other: String) =>
        s"""CAST(list_sum(list_transform(range(1, 9), i ->
             CASE WHEN $other IS NOT NULL
                   AND list_slice(pre, 1, i) = list_slice($other, 1, i)
                  THEN 1 ELSE 0 END)) AS INTEGER)"""
      s"""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      suf AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks)),
                                     i -> list_slice(toks, i, i + 7))) AS pre
        FROM toks),
      dp AS (SELECT pre, count(*) AS n_occ FROM suf GROUP BY pre),
      ord AS MATERIALIZED (
        -- MATERIALIZED: read 3× (self + both neighbor joins)
        SELECT pre, n_occ, row_number() OVER (ORDER BY pre) AS r FROM dp),
      nb AS (
        SELECT a.pre AS pre, a.n_occ, b.pre AS nxt, c.pre AS prv
        FROM ord a
        LEFT JOIN ord b ON b.r = a.r + 1
        LEFT JOIN ord c ON c.r = a.r - 1)
      SELECT array_to_string(pre, ' ') AS prefix, n_occ,
             greatest(
               CASE WHEN n_occ > 1 THEN CAST(len(pre) AS INTEGER) ELSE 0 END,
               ${dkLcp("nxt")},
               ${dkLcp("prv")}) AS rep_len
      FROM nb
      ORDER BY rep_len DESC, prefix
      LIMIT 20"""
    })

  /** ExactSubstr span SCRUB (Lee et al. 2022 §4.1, the step real
    * pretraining pipelines run): excise from every document the token
    * spans ≥ k = 8 tokens whose exact text occurs in ≥ 2 distinct
    * docs, and re-emit the rewritten corpus with an md5 gate proving
    * byte-exact reassembly — the composition of llm_suffix_array's
    * INDEX with llm_boilerplate_scrub's REWRITE discipline. Proof of
    * duplication comes from the suffix machinery, not window-text
    * hashing: the same 3 Manber–Myers prefix-doubling rounds give
    * every full k-token window a dense rank with rank-equality ⇔
    * identical k tokens (exact — no hash-collision probability at
    * 10¹² windows, where 64-bit window hashes WOULD collide), so a
    * duplicated window is just a rank group spanning ≥ 2 docs — the
    * sort-adjacency/LCP criterion expressed as its equivalence
    * classes. A token is excised iff some duplicated window covers it
    * (any cross-doc duplicated span of length ≥ k is exactly the
    * union of its duplicated k-windows, so the cover rule removes
    * precisely the ≥k-token duplicated spans). Scale shape: the
    * detection side shuffles ONLY (doc, pos, int64-rank) triples —
    * window text never materializes anywhere; coverage is one
    * per-DOC ordered window (doc_id is data-sized cardinality — no
    * funnel: covered(q) ⇔ last duplicated start ≤ q is ≥ q−k+1);
    * token text crosses the wire once, into the doc_id-keyed rewrite
    * aggregation (unavoidable — the output IS the rewritten corpus).
    * Reassembly sorts collected (pos, token) structs; the md5 of the
    * rejoined survivors is the hash gate. */
  private val exactSubstrScrub = QueryDef(
    "llm_exactsubstr_scrub",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val K = 8
      // checkpointed: FOUR consumers read it (the rank seed + vocab
      // distinct inside prefixDoublingRanks, nDoc, the coverage join)
      // — uncheckpointed, each re-pays the corpus tokenize+posexplode
      val tok = documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
        .localCheckpoint(true)
      val suf = graft.operators.SuffixRank.prefixDoublingRanks(tok, K)
      // full k-token windows only (a shared short TAIL is < k tokens
      // and must not trigger excision); checkpointed — BOTH the
      // dup-rank rollup and the start extraction read it, and without
      // the pin each re-runs the corpus-token-sized suf⋈nDoc join
      val nDoc = tok.groupBy(col("doc_id")).agg(max(col("p")).as("n"))
      val wins = suf.join(nDoc, "doc_id").filter(col("p") <= col("n") - (K - 1))
        .localCheckpoint(true)
      val dupRanks = wins.groupBy(col("r"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2).select(col("r"))
      val starts = wins.join(dupRanks, "r")
        .select(col("doc_id"), col("p"), lit(1).as("isdup"))
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val flagged = tok.join(starts, Seq("doc_id", "p"), "left_outer")
        .withColumn("lastStart",
          last(when(col("isdup") === 1, col("p")), ignoreNulls = true).over(wd))
        .withColumn("covered",
          col("lastStart").isNotNull && col("lastStart") >= col("p") - (K - 1))
      flagged.groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(col("covered").cast("long")).as("n_removed"),
          md5(array_join(
            transform(
              array_sort(collect_list(when(!col("covered"),
                struct(col("p"), col("tok"))))),
              x => x.getField("tok")),
            " ")).as("clean_hash"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      w AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS p
        FROM t),
      g AS (
        SELECT doc_id, p,
               md5(array_to_string(list_slice(toks, p, p + 7), ' ')) AS gh
        FROM w),
      dupg AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
      starts AS (SELECT doc_id, p FROM g WHERE gh IN (SELECT gh FROM dupg)),
      tokpos AS (
        SELECT doc_id, q, toks[q] AS tok
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks))) AS q
              FROM t)),
      cov AS (
        SELECT tp.doc_id, tp.q, tp.tok,
               count(s.p) > 0 AS covered
        FROM tokpos tp LEFT JOIN starts s
          ON s.doc_id = tp.doc_id AND s.p BETWEEN tp.q - 7 AND tp.q
        GROUP BY 1, 2, 3),
      reb AS (
        SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY q)) AS clean_hash
        FROM cov WHERE NOT covered GROUP BY 1)
      SELECT c.doc_id,
             count(*) AS n_tokens,
             count(CASE WHEN covered THEN 1 END) AS n_removed,
             coalesce(r.clean_hash, md5('')) AS clean_hash
      FROM cov c LEFT JOIN reb r ON r.doc_id = c.doc_id
      GROUP BY 1, 4
      ORDER BY c.doc_id"""))

  /** Count-min sketch (Cormode–Muthukrishnan) — the mergeable
    * fixed-size frequency summary that completes the sketch family
    * (SpaceSaving heavy hitters / KMV distinct / Bloom membership /
    * log₂-bucket quantiles): d=4 independent hash rows × w=512
    * counters, est(x) = min_i cell[i, h_i(x)], guaranteed ≥ exact.
    * The audit reports exact vs CMS estimate (and the ε-bound
    * overcount) for the top-10 tokens. Scale shape: ONE map-side-
    * combinable corpus pass builds the word-frequency table; cells
    * fold that vocabulary-sized table into exactly d·w counters
    * (2048 rows — the sketch is corpus-size-INDEPENDENT, mergeable
    * across shards by cell-wise add, the reason it beats exact
    * counting at 100 TB); probes and cells are both broadcast-sized
    * for the estimate join. Row hashes are (a_i·hashP + b_i) mod P
    * mod w with the (a_i, b_i) constants spliced into BOTH engines
    * from one Scala list (SharedExprs doctrine). */
  private val cmsSketch = QueryDef(
    "llm_cms_sketch",
    (s, d) => {
      val wf = documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .withColumn("hp", hashP(col("tok")))
        .localCheckpoint(true)
      val cellCols = CmsRows.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("r"), ((lit(a) * col("hp") + lit(b)) % P % CmsW).as("c"))
      }
      val cells = wf.select(col("n"), explode(array(cellCols: _*)).as("rc"))
        .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
        .agg(sum(col("n")).as("cn"))
      val probes = wf.orderBy(col("n").desc, col("tok")).limit(10)
      probes.select(col("tok"), col("n"), explode(array(cellCols: _*)).as("rc"))
        .join(broadcast(cells),
          col("rc.r") === col("r") && col("rc.c") === col("c"))
        .groupBy(col("tok"), col("n"))
        .agg(min(col("cn")).as("est_n"))
        .select(col("tok"), col("n").as("exact_n"), col("est_n"),
          (col("est_n") - col("n")).as("overcount"))
        .orderBy(col("exact_n").desc, col("tok"))
    },
    Some {
      val rows = CmsRows.zipWithIndex.map { case ((a, b), i) =>
        s"SELECT tok, n, $i AS r, ($a * hp + $b) % $P % $CmsW AS c FROM wfh"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH wf AS (
        SELECT tok, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok),
      wfh AS (SELECT tok, n, ${dkHashP("tok")} AS hp FROM wf),
      rc AS (
        $rows),
      cells AS (
        SELECT r, c, CAST(sum(n) AS BIGINT) AS cn FROM rc GROUP BY r, c),
      probes AS (SELECT tok, n FROM wf ORDER BY n DESC, tok LIMIT 10)
      SELECT p.tok, p.n AS exact_n, min(cl.cn) AS est_n,
             min(cl.cn) - p.n AS overcount
      FROM probes p
      JOIN rc h ON h.tok = p.tok
      JOIN cells cl ON cl.r = h.r AND cl.c = h.c
      GROUP BY p.tok, p.n
      ORDER BY exact_n DESC, p.tok"""
    })

  /** HITS hubs/authorities (Kleinberg) over the DIRECTED derived-from
    * graph: each LSH near-dup pair contributes later-doc → earlier-doc
    * ("copies from"), so authorities are the originals a corpus keeps
    * duplicating and hubs are the aggregators stitched from many
    * originals — the provenance complement to llm_pagerank_centrality
    * (undirected influence on the same candidate graph; one lshPairs
    * definition feeds both). 3 mutual-reinforcement rounds, each side
    * max-normalized and rounded to 10dp per round (the pagerank
    * float-iteration discipline); sourceless nodes keep score 0 via
    * the left-join coalesce in BOTH engines. Scale shape: the graph
    * is candidate-bounded (LSH buckets, never all-pairs), each round
    * is two degree-bounded equi-joins + map-side-combinable sums, the
    * normalizing max is a broadcast scalar, and per-round
    * localCheckpoint truncates the iterative lineage. */
  private val hitsScores = QueryDef(
    "llm_hits_scores",
    (s, d) => {
      val pairs = lshPairs(s, d)
      val edges = pairs.select(col("d2").as("u"), col("d1").as("v"))
        .localCheckpoint(true)
      val nodes = edges.select(col("u").as("node"))
        .union(edges.select(col("v").as("node"))).distinct()
        .localCheckpoint(true)
      var hub = nodes.withColumn("h", lit(1.0))
      var auth: DataFrame = null
      // r14: score vectors are node-sized but checkpoint-stat-less —
      // broadcast-hint them under the MEASURED node count
      // (SizedBroadcast; a huge node set stays on the shuffle join) so
      // every per-round join is broadcast-hash instead of an edge-list
      // sort-merge (guide §3.1); values are untouched (same sums, same
      // 10dp per-round quantization)
      val nNodes = nodes.count()
      def bcN(df: DataFrame) = graft.operators.SizedBroadcast.hint(df, nNodes)
      for (_ <- 1 to 3) {
        val aN = nodes.join(
            bcN(edges
              .join(bcN(hub.select(col("node").as("u"), col("h"))), Seq("u"))
              .groupBy(col("v").as("node")).agg(sum(col("h")).as("raw"))),
            Seq("node"), "left_outer")
          .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))
        auth = aN.crossJoin(broadcast(aN.agg(max(col("raw")).as("m"))))
          .select(col("node"), round(col("raw") / col("m"), 10).as("a"))
          .localCheckpoint(true)
        val hN = nodes.join(
            bcN(edges
              .join(bcN(auth.select(col("node").as("v"), col("a"))), Seq("v"))
              .groupBy(col("u").as("node")).agg(sum(col("a")).as("raw"))),
            Seq("node"), "left_outer")
          .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))
        hub = hN.crossJoin(broadcast(hN.agg(max(col("raw")).as("m"))))
          .select(col("node"), round(col("raw") / col("m"), 10).as("h"))
          .localCheckpoint(true)
      }
      auth.join(hub, Seq("node"))
        .select(col("node"), (round(col("a"), 6) + lit(0.0)).as("authority"),
          (round(col("h"), 6) + lit(0.0)).as("hub"))
        .orderBy(col("authority").desc, col("node"))
        .limit(30)
    },
    Some {
      val iters = (1 to 3).map { k =>
        s"""ar$k AS MATERIALIZED (
        -- MATERIALIZED: each score CTE is read twice (projection +
        -- max subquery) and feeds the next round — without pinning,
        -- DuckDB re-inlines the whole minhash/LSH pipeline per
        -- reference, exponentially in the round count
        SELECT n.node, coalesce(t.v, 0) AS raw
        FROM nodes n LEFT JOIN (
          SELECT e.v AS node, sum(h.h) AS v
          FROM edges e JOIN h${k - 1} h ON h.node = e.u GROUP BY e.v) t
          USING (node)),
      a$k AS MATERIALIZED (
        SELECT node, round(raw / (SELECT max(raw) FROM ar$k), 10) AS a
        FROM ar$k),
      hr$k AS MATERIALIZED (
        SELECT n.node, coalesce(t.v, 0) AS raw
        FROM nodes n LEFT JOIN (
          SELECT e.u AS node, sum(a.a) AS v
          FROM edges e JOIN a$k a ON a.node = e.v GROUP BY e.u) t
          USING (node)),
      h$k AS MATERIALIZED (
        SELECT node, round(raw / (SELECT max(raw) FROM hr$k), 10) AS h
        FROM hr$k)"""
      }.mkString(",\n      ")
      s"""
      WITH ${dkMinhashCte},
      ${dkLshPairsCtes},
      edges AS MATERIALIZED (SELECT d2 AS u, d1 AS v FROM lsh_pairs),
      nodes AS MATERIALIZED (
        SELECT DISTINCT u AS node FROM edges
        UNION SELECT DISTINCT v FROM edges),
      h0 AS (SELECT node, CAST(1 AS DOUBLE) AS h FROM nodes),
      $iters
      SELECT a.node, round(a.a, 6) + 0.0 AS authority,
             round(h.h, 6) + 0.0 AS hub
      FROM a3 a JOIN h3 h USING (node)
      ORDER BY authority DESC, a.node
      LIMIT 30"""
    })

  /** ROUGE-1 / ROUGE-2 overlap scoring between candidate near-dup
    * pairs — the n-gram eval metric (summarization/paraphrase
    * scoring) run at corpus scale over the LSH candidate graph (one
    * lshPairs definition with pagerank/HITS — never all-pairs).
    * Clipped-count overlap (Σ min(c₁, c₂) per gram, the ROUGE
    * definition) and the EXACT-integer F1: with P = ov/t₂ and
    * R = ov/t₁, harmonic F1 collapses to 2·ov/(t₁+t₂), so the score
    * is one integer division in micros — no float P/R intermediates
    * to wobble. Every doc in a pair has ≥3 tokens (LSH requires
    * shingles), so unigram AND bigram totals are nonzero by
    * construction — no zero-division branch. Scale shape: per-doc
    * gram count tables build once (one tokenize, bigrams via the
    * lead()-window idiom — no array-lambda re-splits), pairs join
    * grams d1-side then equi-join d2-side on (doc, gram), zero-
    * overlap pairs restored by left join; gram tables localCheckpoint
    * since both pair sides consume them. */
  private val rougePairs = QueryDef(
    "llm_rouge_pairs",
    (s, d) => {
      val pairs = lshPairs(s, d).localCheckpoint(true)
      // r14 (guide §3.2 — reduce the big side first): gram tables are
      // consumed ONLY joined to pair members, so tokenize and count
      // grams for candidate docs alone — the semi join prunes the
      // corpus before the tokenize+groupBy instead of after. pairDocs
      // is candidate-bounded (≤ 2·|pairs|) and measured before the
      // broadcast hint (SizedBroadcast: huge pair sets stay on the
      // shuffle join). Results are identical by construction.
      val pairDocs = pairs.select(col("d1").as("doc_id"))
        .union(pairs.select(col("d2").as("doc_id"))).distinct()
        .localCheckpoint(true)
      val nPairDocs = pairDocs.count()
      val toksDf = documents(s, d)
        .join(graft.operators.SizedBroadcast.hint(pairDocs, nPairDocs),
          Seq("doc_id"), "left_semi")
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p", "tok")))
      val uni = toksDf.groupBy(col("doc_id"), col("tok").as("g"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val bi = toksDf
        .select(col("doc_id"),
          concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w)).as("g"),
          lead(col("tok"), 1).over(w).isNotNull.as("full"))
        .filter(col("full"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      def tot(g: DataFrame, name: String) =
        g.groupBy(col("doc_id")).agg(sum(col("c")).as(name))
      // pairs rides a measured broadcast hint into the gram joins —
      // checkpointing erased its stats, and an SMJ here re-shuffles
      // the (now candidate-pruned) gram tables
      val nPairs = pairs.count()
      def overlap(g: DataFrame, name: String) =
        graft.operators.SizedBroadcast.hint(pairs, nPairs)
          .join(g.select(col("doc_id").as("d1"), col("g"), col("c").as("c1")),
            Seq("d1"))
          .join(g.select(col("doc_id").as("d2"), col("g"), col("c").as("c2")),
            Seq("d2", "g"))
          .groupBy(col("d1"), col("d2"))
          .agg(sum(least(col("c1"), col("c2"))).as(name))
      val uniTot = tot(uni, "ut").localCheckpoint(true)
      val biTot = tot(bi, "bt").localCheckpoint(true)
      pairs
        .join(overlap(uni, "uov"), Seq("d1", "d2"), "left_outer")
        .join(overlap(bi, "bov"), Seq("d1", "d2"), "left_outer")
        .join(uniTot.select(col("doc_id").as("d1"), col("ut").as("ut1")), Seq("d1"))
        .join(uniTot.select(col("doc_id").as("d2"), col("ut").as("ut2")), Seq("d2"))
        .join(biTot.select(col("doc_id").as("d1"), col("bt").as("bt1")), Seq("d1"))
        .join(biTot.select(col("doc_id").as("d2"), col("bt").as("bt2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          coalesce(col("uov"), lit(0L)).as("uni_overlap"),
          coalesce(col("bov"), lit(0L)).as("bi_overlap"),
          col("ut1"), col("ut2"), col("bt1"), col("bt2"))
        .select(col("d1"), col("d2"), col("uni_overlap"), col("bi_overlap"),
          expr("(2L * uni_overlap * 1000000L) div (ut1 + ut2)").as("rouge1_f_micro"),
          expr("(2L * bi_overlap * 1000000L) div (bt1 + bt2)").as("rouge2_f_micro"))
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""
      WITH ${dkMinhashCte},
      ${dkLshPairsCtes},
      lp AS MATERIALIZED (SELECT d1, d2 FROM lsh_pairs),
      tk2 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      uni AS MATERIALIZED (
        SELECT doc_id, g, count(*) AS c FROM (
          SELECT doc_id, unnest(tk) AS g FROM tk2)
        GROUP BY 1, 2),
      bi AS MATERIALIZED (
        SELECT doc_id, g, count(*) AS c FROM (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(tk) - 1),
                                       i -> tk[i] || ' ' || tk[i + 1])) AS g
          FROM tk2)
        GROUP BY 1, 2),
      ut AS MATERIALIZED (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM uni GROUP BY 1),
      bt AS MATERIALIZED (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM bi GROUP BY 1),
      uov AS (
        SELECT p.d1, p.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
        FROM lp p
        JOIN uni a ON a.doc_id = p.d1
        JOIN uni b ON b.doc_id = p.d2 AND b.g = a.g
        GROUP BY 1, 2),
      bov AS (
        SELECT p.d1, p.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
        FROM lp p
        JOIN bi a ON a.doc_id = p.d1
        JOIN bi b ON b.doc_id = p.d2 AND b.g = a.g
        GROUP BY 1, 2)
      SELECT p.d1, p.d2,
             coalesce(u.ov, 0) AS uni_overlap,
             coalesce(v.ov, 0) AS bi_overlap,
             (2 * coalesce(u.ov, 0) * 1000000) // (ut1.t + ut2.t)
               AS rouge1_f_micro,
             (2 * coalesce(v.ov, 0) * 1000000) // (bt1.t + bt2.t)
               AS rouge2_f_micro
      FROM lp p
      LEFT JOIN uov u ON u.d1 = p.d1 AND u.d2 = p.d2
      LEFT JOIN bov v ON v.d1 = p.d1 AND v.d2 = p.d2
      JOIN ut ut1 ON ut1.doc_id = p.d1
      JOIN ut ut2 ON ut2.doc_id = p.d2
      JOIN bt bt1 ON bt1.doc_id = p.d1
      JOIN bt bt2 ON bt2.doc_id = p.d2
      ORDER BY p.d1, p.d2"""))

  /** End-to-end training-data pipeline, oracle-gated as ONE query:
    * filter chain → exact dedup → MinHash-LSH near-dup (connected
    * components, one keeper per cluster) → decontamination + eval
    * holdout → temperature-smoothed mixture weights → sequence
    * packing. Every stage consumes the production machinery VERBATIM
    * — the filter-chain predicates, lshPairs (pred-parameterized),
    * Dedup.connectedComponents, [[contaminationPairs]],
    * the mixtureWeights α=0.5 formula, and
    * DistributedRank.withPrefixSum — so the gate proves the operators
    * COMPOSE without per-stage re-definitions drifting (the
    * llm_rerank_stage doctrine, applied to the whole pipeline).
    *
    * Stage-composition soundness notes: (a) near-dup pairs are
    * computed over the stage-1 survivors with endpoints restricted to
    * the stage-2 exact-dedup keepers — identical to running LSH on
    * the keeper set, because signatures are pure content functions
    * (duplicate texts share every band key, so pairs-among-keepers is
    * the same set either way) and the hybrid pair generation drops no
    * pairs; (b) contamination rarity (df ≤ 50) is measured on the
    * FULL corpus — the production reference-corpus semantics of
    * llm_decontaminate, consumed unchanged.
    *
    * Output: one row per surviving source (mixture stats) plus the
    * funnel receipts and packing stats as 1-row broadcast constants
    * (n_raw → n_s1 → n_s2 → n_s3 → n_final; total_blocks,
    * n_straddle). n_straddle depends on every doc's packed offset, so
    * the prefix-sum machinery is value-gated, not just row-counted.
    * Scale shape: stages hand each other only doc-id sets (semi/anti
    * joins on 8-byte keys); text is scanned by the stage that needs
    * it and never shuffled between stages; the 1-row receipt frames
    * ride broadcast cross joins (the llm_lm_score scalar shape). */
  private val pipelineE2e = QueryDef(
    "llm_pipeline_e2e",
    (s, d) => {
      val t = tokens(col("text"))
      val nTok = size(t)
      val meanLen = (col("n_chars") - nTok + 1).cast("double") / nTok
      val diversity = size(array_distinct(t)).cast("double") / nTok
      // llm_filter_chain's first-failure-wins chain, expressed as its
      // keep-branch predicate (same expressions, same order)
      val keepPred = col("n_chars") >= 120 && col("n_chars") <= 450 &&
        meanLen <= 5.0 && diversity >= 0.35
      val docs = documents(s, d)
      val s1 = docs.filter(keepPred)
      // stage 2: exact dedup — min doc_id per content hash (llm_dedup_exact)
      val s2 = s1.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")).localCheckpoint(true)
      // stage 3: LSH pairs over stage-1 survivors, endpoints
      // restricted to exact keepers, components, min-id keeper wins
      val pairs = lshPairs(s, d, keepPred)
        .join(s2.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
        .join(s2.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
      val comps = graft.operators.Dedup.connectedComponents(pairs)
      val dropped3 = comps.filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
      val s3 = s2.join(dropped3, Seq("doc_id"), "left_anti").localCheckpoint(true)
      comps.unpersist()
      // stage 4: eval holdout + decontamination (llm_decontaminate verbatim)
      val contaminated = contaminationPairs(s, d)
        .select(col("train_doc").as("doc_id")).distinct()
      val s4 = s3.filter(col("doc_id") % 97 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti").localCheckpoint(true)
      // stage 5 input: survivors with source + token counts (one text pass)
      val surv = docs.join(s4, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .localCheckpoint(true)
      val wAll = Window.partitionBy()
      val mix = surv.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .withColumn("sh", sqrt(col("n_tokens").cast("double")))
        .withColumn("tot", sum(col("sh")).over(wAll))
      // stage 6: pack the survivors (llm_pack_sequences machinery)
      val packed = graft.operators.DistributedRank.withPrefixSum(
          surv.select(col("doc_id"), col("n_tokens")),
          col("n_tokens"), "tok_offset", Seq(col("doc_id")))
        .select(expr("tok_offset div 2048").as("first_block"),
          expr("(tok_offset + n_tokens - 1) div 2048").as("last_block"))
      val packStats = packed.agg(
        (max(col("last_block")) + 1L).as("total_blocks"),
        count(when(col("last_block") > col("first_block"), 1)).as("n_straddle"))
      val counts = docs.agg(count(lit(1)).as("n_raw"))
        .crossJoin(broadcast(s1.agg(count(lit(1)).as("n_s1"))))
        .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_s2"))))
        .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_s3"))))
        .crossJoin(broadcast(s4.agg(count(lit(1)).as("n_final"))))
        .crossJoin(broadcast(packStats))
      mix.crossJoin(broadcast(counts))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("sh") / col("tot"), 6).as("weight"),
          round(col("sh") / col("tot") * 1000000L).cast("long").as("exp_tokens"),
          col("n_raw"), col("n_s1"), col("n_s2"), col("n_s3"), col("n_final"),
          col("total_blocks"), col("n_straddle"))
        .orderBy(col("source"))
    },
    Some {
      val keepWhere = "WHERE n_chars >= 120 AND n_chars <= 450" +
        " AND CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)" +
        " / len(string_split(text, ' ')) <= 5.0" +
        " AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)" +
        " / len(string_split(text, ' ')) >= 0.35"
      s"""
      WITH RECURSIVE ${dkMinhashCteWhere(keepWhere)},
      ${dkLshPairsCtes},
      s1 AS (SELECT doc_id, source, text FROM documents $keepWhere),
      s2 AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
      kp AS (SELECT d1, d2 FROM lsh_pairs
             WHERE d1 IN (SELECT doc_id FROM s2)
               AND d2 IN (SELECT doc_id FROM s2)),
      edges AS (SELECT d1 AS src, d2 AS dst FROM kp
                UNION ALL SELECT d2, d1 FROM kp),
      reach(id, r) AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT e.src AS id, reach.r
        FROM edges e JOIN reach ON e.dst = reach.id),
      dropped3 AS (
        SELECT id FROM reach GROUP BY id HAVING id <> min(r)),
      s3 AS (SELECT doc_id FROM s2
             WHERE doc_id NOT IN (SELECT id FROM dropped3)),
      ctoks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      csh AS (SELECT doc_id,
              list_transform(generate_series(0, len(toks) - 3),
                i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS sl
              FROM ctoks),
      cu AS (SELECT DISTINCT doc_id,
              ('0x' || substr(md5(unnest(sl)), 1, 15))::BIGINT AS h
             FROM csh),
      crare AS (SELECT h FROM cu GROUP BY h HAVING count(*) <= 50),
      cuf AS (SELECT cu.doc_id, cu.h FROM cu JOIN crare USING (h)),
      contam AS (
        SELECT DISTINCT train_doc FROM (
          SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc
          FROM cuf t JOIN cuf e ON t.h = e.h
          WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
          GROUP BY 1, 2
          HAVING count(*) >= 3)),
      s4 AS (SELECT doc_id FROM s3
             WHERE doc_id % 97 <> 0
               AND doc_id NOT IN (SELECT train_doc FROM contam)),
      surv AS (SELECT d.doc_id, d.source,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
               FROM documents d JOIN s4 USING (doc_id)),
      mix AS (SELECT source, count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS n_tokens
              FROM surv GROUP BY 1),
      wtab AS (SELECT *, sqrt(CAST(n_tokens AS DOUBLE)) AS shr,
               sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER () AS tot
               FROM mix),
      o AS (SELECT doc_id, n_tokens,
            CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS tok_offset
            FROM surv),
      pk AS (SELECT CAST(max((tok_offset + n_tokens - 1) // 2048) + 1 AS BIGINT)
               AS total_blocks,
             count(CASE WHEN (tok_offset + n_tokens - 1) // 2048
               > tok_offset // 2048 THEN 1 END) AS n_straddle
             FROM o),
      cns AS (SELECT (SELECT count(*) FROM documents) AS n_raw,
              (SELECT count(*) FROM s1) AS n_s1,
              (SELECT count(*) FROM s2) AS n_s2,
              (SELECT count(*) FROM s3) AS n_s3,
              (SELECT count(*) FROM s4) AS n_final)
      SELECT source, n_docs, n_tokens,
             round(shr / tot, 6) AS weight,
             CAST(round(shr / tot * 1000000) AS BIGINT) AS exp_tokens,
             n_raw, n_s1, n_s2, n_s3, n_final, total_blocks, n_straddle
      FROM wtab CROSS JOIN cns CROSS JOIN pk
      ORDER BY source"""
    })

  val defs: Seq[QueryDef] = Seq(
    suffixArray, exactSubstrScrub, cmsSketch, hitsScores, rougePairs, videoSceneCut, topicCoherence,
    filteredAnn, textrankKeywords, ngramGenerate, beamDecode, speculativeAccept,
    watermarkDetect,
    unigramSegment, nucleusSets,
    weightedSample, bpeMergeStep, bpeTrain, bpeEncodeStats, wordpieceTrain, skipgramCooc, instructionDetect,
    clusterQuality, pmiCollocations, kcore, ppjoinExact, labelPropagation, graphModularity,
    matryoshkaEval, curriculumOrder,
    dedupExact, minhashSignature, minhashLsh, simhashQ, simhashPairs, ngramJaccard, ngramCounts,
    tfidf, textTokens, bpeTokens, fingerprintQ, langId, quality,
    embTopk, embLshBuckets, embNearDup, embAnnProbe, embIvf, embIvfTrained, annIndexTwin, annPqTwin, annSqlTwin, annRerankTwin, annStatsTwin, annRecallTwin, annTuneTwin, semanticDedup, incrementalDedup, multimodalMeta,
    filterChain, packSeq, stratSample, dedupClusters, decontaminate, pipelineE2e, piiScrub,
    repetitionFilter, chunkDocuments, vocabBuild, trainValSplit, shuffleShard,
    dedupSubstring, encodeIds, editDistance, lmScore, lmScoreKn, filterOverlap, mixtureWeights,
    multimodalFrames, embNormAudit, knnClassify, dedupReport, lengthBands,
    tokenEntropy, dsirSample, perplexityBuckets, winnowingFp, containment,
    int8Quantize, datasetCard, tokenizerFertility, codeDetect,
    softDedupWeights, spanCorruption, bloomScreen, sourceOverlap,
    bm25Search, randomProjection, kanonAudit, dpRelease, preferencePairs, multimodalCodecTwin, adpcmAudioTwin, flacAudioTwin, dedupEval, lshBandSweep, pagerank,
    multimodalFeatures, similarityPq, hybridSearch, qualityClassifier,
    retrievalEval, ngramNovelty, prefixDedup, zipfFit, dedupTriangles,
    agreementKappa, boilerplateScrub, imageDhashDedup, rerankStage, psiDrift,
    audioFingerprint)
}
