package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale headroom smoke: blow the corpus up 20× with exact replicas
  * and push it through the full dedup pipeline (shingles → MinHash →
  * LSH banding → candidate pairs → connected components → keepers).
  * Replicas of a document MUST land in one cluster with the original
  * as keeper — the end-to-end guarantee a 100 TB dedup run needs —
  * and the pipeline must absorb the 20× row count and the giant
  * same-signature buckets it creates (the worst-case skew shape for
  * bucket-local pair generation). */
class ScaleSmokeSpec extends SparkTestBase {

  test("replicated corpus: every replica group collapses to its original keeper (both pair-gen paths)") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = src.count()
    // mixed replication exercises BOTH pair-generation paths: even
    // docs get 80 replicas (bucket > 64 → distributed big-bucket
    // join), odd docs get 10 (local in-bucket pairing)
    val big = src
      .withColumn("k", explode(sequence(lit(0),
        when(col("doc_id") % 2 === 0, 79).otherwise(9))))
      .select((col("doc_id") + col("k") * 100000L).as("doc_id"), col("text"))
    assert(big.count() > nDocs * 10)

    val dir = Files.createTempDirectory("graft-scale").toString
    big.write.parquet(s"$dir/documents.parquet")

    val pairs = SparkEntry.queries("llm_dedup_minhash_lsh")(spark, dir)
    val comps = Dedup.connectedComponents(pairs, maxIter = 30).persist()

    // every replica (id >= 100000) must share a component with its
    // original (id % 100000), via MinHash → LSH → components
    val replicaToOrig = comps
      .withColumn("orig", col("id") % 100000L)
    val origComp = comps.filter(col("id") < 100000L)
      .select(col("id").as("orig"), col("comp").as("orig_comp"))
    val mismatched = replicaToOrig.join(origComp, "orig")
      .filter(col("comp") =!= col("orig_comp"))
    assert(mismatched.count() === 0L,
      "replicas must cluster with their originals")

    // keepers: one per cluster, and each keeper is an original doc
    val k = Dedup.keepers(comps).filter(col("is_keeper") === 1)
    assert(k.count() === comps.select(col("comp")).distinct().count())
    assert(k.filter(col("doc_id") >= 100000L).count() === 0L,
      "every keeper must be an original (min id) doc")
    comps.unpersist()
  }

  test("hot-key window join: wj_agg stays correct when one (user, hour) holds the stream") {
    // one user emits 5000 clicks inside a single hour bucket — the
    // hottest (user, bucket) key the equi-join can see; the bucket
    // explode must neither lose nor double-count any of them
    import graft.queries.KdbQueries.{Hour, T0}
    val s = spark
    import s.implicits._
    val clicks = (0 until 5000).map(i =>
      (i.toLong, T0 + i.toLong, 1L, "click", 1.0, "{}"))
    val purchases = Seq(
      // window [T0, T0+2h]: catches all 5000 clicks
      (9001L, T0 + 2 * Hour, 1L, "purchase", 1.0, "{}"),
      // window [T0+1h+1, T0+3h+1]: catches none (clicks all < T0+5µs)
      (9002L, T0 + 3 * Hour + 1, 1L, "purchase", 1.0, "{}"),
      // a cold user: zero clicks, left semantics must keep the row
      (9003L, T0 + 2 * Hour, 2L, "purchase", 1.0, "{}"))
    val dir = Files.createTempDirectory("graft-wj-hot").toString
    (clicks ++ purchases)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("kdb_wj_agg")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_clicks")).toMap
    assert(out === Map(9001L -> 5000L, 9002L -> 0L, 9003L -> 0L))
  }

  test("stopword bomb: BoundedPostings keeps O(dfCap) buffers under a 100k-doc shingle") {
    import graft.functions.Postings
    // unit-level proof of the bound: reduce 100k postings of ONE
    // shingle into a single buffer — the exact shape that OOMs an
    // unbounded collect_list at corpus scale — and confirm the
    // buffer never exceeds dfCap+1 per side while df stays exact
    val agg = Postings.BoundedPostings(50)
    var buf = agg.zero
    var i = 0L
    while (i < 100000L) { buf = agg.reduce(buf, Postings.PostIn(i, i % 97 == 0)); i += 1 }
    assert(buf.df === 100000L)
    assert(buf.trains.size <= 51 && buf.evals.size <= 51)
    val merged = agg.merge(buf, buf) // shuffle-side combine keeps the bound
    assert(merged.df === 200000L)
    assert(merged.trains.size <= 51 && merged.evals.size <= 51)

    // end-to-end: a corpus where one shingle hash appears in 100k
    // docs (df ≫ cap → dropped) alongside rare train/eval-shared
    // shingles — the bounded aggregation must produce exactly what
    // unbounded collect_list semantics would: only rare shingles
    // survive, with complete posting lists
    import spark.implicits._
    val bomb = spark.range(100000L).select(col("id").as("doc_id"), lit(0L).as("h"))
    val rare = Seq((97L, 1L), (1L, 1L), (2L, 1L), (194L, 2L), (3L, 2L))
      .toDF("doc_id", "h")
    val u = bomb.union(rare)
    val bounded = udaf(Postings.BoundedPostings(50))
    val out = u.groupBy(col("h"))
      .agg(bounded(col("doc_id"), col("doc_id") % 97 === 0).as("p"))
      .select(col("h"), col("p.df").as("df"),
        col("p.trains").as("trains"), col("p.evals").as("evals"))
      .filter(col("df") <= 50 &&
        size(col("trains")) > 0 && size(col("evals")) > 0)
      .collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L, 2L),
      "only rare shingles survive the df cap")
    val h1 = out.find(_.getLong(0) == 1L).get
    assert(h1.getSeq[Long](2).sorted === Seq(1L, 2L) &&
      h1.getSeq[Long](3) === Seq(97L),
      "surviving posting lists are exact, not truncated")
  }
}
