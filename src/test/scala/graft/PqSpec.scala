package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Pq

/** Product quantization: codebook shape/determinism, the 8-byte code
  * representation, ADC's quantization contract (codes of a vector
  * score zero distance against its OWN reconstructed table when the
  * vector IS a centroid), and shortlist+rerank recall. */
class PqSpec extends SparkTestBase {

  private def vectors = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("train yields m*k codebook rows; encode emits one m-code row per vector") {
    val books = Pq.train(vectors, m = 8, dim = 64, k = 16, iters = 1)
    assert(books.count() === 8L * 16L)
    // every subspace keeps exactly k entries
    val perSub = books.groupBy(col("sub")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(perSub.length === 8 && perSub.forall(_ === 16L))
    val enc = Pq.encode(vectors, books, m = 8, dim = 64)
    assert(enc.count() === vectors.count())
    val sizes = enc.select(size(col("codes"))).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq === Seq(8), "every vector carries exactly m codes")
    // codes address the codebook: all in [0, k)
    val rng = enc.select(explode(col("codes")).as("c"))
      .agg(min(col("c")), max(col("c"))).head()
    assert(rng.getLong(0) >= 0L && rng.getLong(1) < 16L)
  }

  test("training is deterministic across invocations") {
    def fingerprint() = {
      val b = Pq.train(vectors, m = 4, dim = 64, k = 8, iters = 2)
      Pq.encode(vectors, b, m = 4, dim = 64)
        .select(col("vec_id"), col("codes").cast("array<string>"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).mkString(",")))
        .sortBy(_._1).toSeq
    }
    assert(fingerprint() === fingerprint())
  }

  test("ADC ranks a vector's own near-duplicate first (quantization preserves locality)") {
    import spark.implicits._
    // a tiny corpus with a planted near-duplicate pair far from the rest
    val base = vectors.limit(20).collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    val dup = base.head._2.map(v => v + 0.001f)
    val corpus = (base :+ (999L, dup)).toSeq
      .toDF("vec_id", "embedding")
    val books = Pq.train(corpus, m = 8, dim = 64, k = 8, iters = 2)
    val enc = Pq.encode(corpus, books, m = 8, dim = 64)
    val q = corpus.filter(col("vec_id") === 999L)
    val top = Pq.search(enc, books, q, m = 8, dim = 64, topk = 1)
      .select(col("nid")).head().getLong(0)
    assert(top === base.head._1,
      "the planted near-duplicate must be the ADC nearest neighbor")
  }

  test("ADC shortlist + exact rerank recovers most of the exact top-5") {
    val books = Pq.train(vectors, m = 8, dim = 64, k = 16, iters = 2)
    val enc = Pq.encode(vectors, books, m = 8, dim = 64)
    val qs = vectors.filter(col("vec_id") <= 4)
    val short = Pq.search(enc, books, qs, m = 8, dim = 64, topk = 50)
    // shortlist is 50 ids/query = 10% of the corpus — the data-touch bound
    val counts = short.groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(counts.forall(_ === 50L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    val exact = broadcast(qs.select(col("vec_id").as("qid"), col("embedding").as("qv")))
      .join(vectors.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("qid"), col("nid"))
    val minHits = short.select(col("qid"), col("nid")).join(exact, Seq("qid", "nid"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
      .agg(min(col("n_hits"))).head().getLong(0)
    assert(minHits >= 2L,
      s"every query must recover >=2 exact neighbors in its shortlist, min=$minHits")
  }
}
