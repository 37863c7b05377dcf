package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.TopK
import graft.functions.TopK.Scored
import graft.sources.Formats

/** Specs for the custom top-k aggregator and the CSV/JSON format
  * round-trip (schema-explicit interchange). */
class FunctionsSpec extends SparkTestBase {

  test("explode-and-vote simhash equals the HOF fold bit-for-bit") {
    import graft.functions.TextFunctions._
    val d = "/root/testdata/sf0.001"
    // production shape (llm_simhash): explode → one hash per token →
    // per-bit ±1 vote sums
    val got = SparkEntry.queries("llm_simhash")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // executable spec: the array-lambda fold (TextFunctions.simhashN)
    val hashes = transform(tokens(col("text")), t => hashP(t))
    val want = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), simhash16(hashes).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === want.size)
    got.foreach { case (id, sh) => assert(sh === want(id), s"doc $id") }
  }

  test("TopKAgg equals the window row_number top-k, with map-side-combinable shuffle") {
    import spark.implicits._
    // synthetic: 5 groups × 200 candidates, deterministic scores
    val rows = for (g <- 0L until 5L; i <- 0L until 200L)
      yield (g, Scored(i, ((i * 37 + g * 11) % 100).toDouble))
    val ds = rows.toDS()

    val agg = ds.groupByKey(_._1).mapValues(_._2)
      .agg(TopK.topK(3))
      .collect().toMap

    // reference: window over the same data
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val expected = ds.map { case (g, s) => (g, s.id, s.score) }
      .toDF("g", "id", "score")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(r => Scored(r.getLong(1), r.getDouble(2))).toSeq)
      .toMap

    assert(agg.keySet === expected.keySet)
    agg.foreach { case (g, top) => assert(top === expected(g), s"group $g") }
  }

  test("TopKAgg buffer never exceeds k and handles ties by id") {
    val a = TopK.TopKAgg(2)
    val b = Seq(Scored(5, 9.0), Scored(7, 9.0))
    // equal score, higher id: rejected by the fast path
    assert(a.reduce(b, Scored(9, 9.0)) === b)
    // equal score, lower id: displaces the floor
    assert(a.reduce(b, Scored(1, 9.0)) === Seq(Scored(1, 9.0), Scored(5, 9.0)))
    assert(a.merge(b, Seq(Scored(1, 10.0))).size === 2)
  }

  test("SpaceSavingAgg: guaranteed heavy hitters survive, estimates bound the truth") {
    import spark.implicits._
    import graft.functions.HeavyHitters
    // skewed stream: item 1 × 500, items 100..1098 × 1 each (N = 1499);
    // 500 > N/4, so item 1 MUST be in a k=4 summary by the
    // Space-Saving theorem, regardless of partitioning/merge order
    val items = (Seq.fill(500)(1L) ++ (100L until 1099L)).toDS().repartition(8)
    val summary = items.select(HeavyHitters.spaceSaving(4)).head()
    assert(summary.size === 4)
    assert(summary.exists(_.item === 1L), "guaranteed heavy hitter evicted")
    val c1 = summary.find(_.item === 1L).get
    // estimate is an upper bound; est − err is a lower bound
    assert(c1.count >= 500L)
    assert(c1.count - c1.err <= 500L)
    // exact regime: fewer distinct items than k → exact counts, no error
    val small = (Seq.fill(7)(10L) ++ Seq.fill(3)(20L)).toDS()
    val s2 = small.select(HeavyHitters.spaceSaving(8)).head()
    assert(s2.toSet === Set(
      HeavyHitters.Counter(10L, 7L, 0L), HeavyHitters.Counter(20L, 3L, 0L)))
  }

  test("KmvAgg: exact under k distinct; estimation within tolerance; set algebra works") {
    import spark.implicits._
    import graft.functions.Kmv
    // splitmix64 — uniform 64-bit hashes for the estimator's model
    def mix(i: Long): Long = {
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // exact regime: 10 distinct values, k=64 → summary IS the set
    val small = (1L to 10L).map(mix).toDS().repartition(4)
    val s0 = small.select(Kmv.kmv(64)).head()
    assert(s0.size === 10)
    assert(Kmv.estimate(s0, 64) === 10.0)
    // estimation regime: 5000 distinct, k=64 → within 3σ ≈ 37%
    val big = (1L to 5000L).map(mix).toDS().repartition(8)
    val est = Kmv.estimate(big.select(Kmv.kmv(64)).head(), 64)
    assert(math.abs(est - 5000.0) <= 5000.0 * 0.4, s"estimate $est too far from 5000")
    // set algebra: A = 1..3000, B = 2001..5000 → |A∪B| = 5000, |A∩B| = 1000
    val a = (1L to 3000L).map(mix).toDS().select(Kmv.kmv(256)).head()
    val b = (2001L to 5000L).map(mix).toDS().select(Kmv.kmv(256)).head()
    val (u, i) = Kmv.setEstimates(a, b, 256)
    assert(math.abs(u - 5000.0) <= 5000.0 * 0.25, s"union estimate $u")
    assert(math.abs(i - 1000.0) <= 1000.0 * 0.5, s"intersection estimate $i")
    // determinism: same inputs → identical summary regardless of partitioning
    val again = (1L to 3000L).map(mix).toDS().repartition(13).select(Kmv.kmv(256)).head()
    assert(a === again)
  }

  test("CSV and JSONL round-trip preserves rows with explicit schema") {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .limit(100)
    val dir = Files.createTempDirectory("graft-fmt").toString

    Formats.writeCsv(src, s"$dir/csv")
    val fromCsv = Formats.readCsv(spark, s"$dir/csv", src.schema)
    assert(fromCsv.count() === 100)
    assert(fromCsv.exceptAll(src).count() === 0)
    assert(src.exceptAll(fromCsv).count() === 0)

    Formats.writeJsonl(src, s"$dir/json")
    val fromJson = Formats.readJsonl(spark, s"$dir/json", src.schema)
    assert(fromJson.exceptAll(src).count() === 0)
    assert(src.exceptAll(fromJson).count() === 0)

    Formats.writeOrc(src, s"$dir/orc")
    val fromOrc = Formats.readOrc(spark, s"$dir/orc", src.schema)
    assert(fromOrc.exceptAll(src).count() === 0)
    assert(src.exceptAll(fromOrc).count() === 0)
  }

  test("double-replace BPE merge: reference-exact to run length 4, pinned divergence at 5+") {
    // llm_bpe_train's merge application: consecutive pair occurrences
    // share a separator space, so one replace pass skips alternate
    // matches (it consumes the middle space) and a SECOND pass merges
    // the now-isolated remainder. For distinct-symbol merges and
    // self-pair runs up to 4 this equals reference left-to-right BPE;
    // a SELF-pair run of 5+ pairs at different positions — the same
    // deterministic rule in both engines (the oracle replays it), so
    // pin the divergent case too.
    def merge2(s: String) = spark.sql(
      s"SELECT replace(replace('$s', ' a a ', ' aa '), ' a a ', ' aa ') AS r")
      .collect()(0).getString(0)
    assert(merge2(" a a ") === " aa ")
    assert(merge2(" a a a ") === " aa a ")       // odd run: leftover single
    assert(merge2(" a a a a ") === " aa aa ")    // even run: both pairs merge
    assert(merge2(" b a a a a b ") === " b aa aa b ")
    assert(merge2(" a b a a ") === " a b aa ")   // leading non-pair untouched
    // DIVERGENCE, pinned: run of 5 pairs as (1,2)(4,5) = "aa a aa";
    // reference left-to-right would pair (1,2)(3,4) = "aa aa a".
    // Same multiset of symbols, different adjacency.
    assert(merge2(" a a a a a ") === " aa a aa ")
    // distinct-symbol chains stay reference-exact at any length
    def merge2ab(s: String) = spark.sql(
      s"SELECT replace(replace('$s', ' x y ', ' xy '), ' x y ', ' xy ') AS r")
      .collect()(0).getString(0)
    assert(merge2ab(" x y x y x y ") === " xy xy xy ")
  }
}
