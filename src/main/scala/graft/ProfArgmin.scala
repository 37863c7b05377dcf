package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Dev scratch: decompose the r14 ANN regression — time the argmin
  * assign (array-HOF vs crossJoin+window) and the top-k (TopKAgg vs
  * qid window) in isolation on sf0.1 embeddings. Not a declared
  * query; never run by the driver. */
object ProfArgmin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val vectors = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cent = graft.operators.Ivf.train(vectors, k = 8, iters = 1)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"$name%-28s r$r: ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    // A. assign via array-HOF argmin (current)
    time("assign argmin-HOF")(graft.operators.Ivf.assign(vectors, cent))
    // B. assign via crossJoin + window (pre-r14 shape, inlined)
    time("assign crossJoin+window") {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      vectors.crossJoin(broadcast(cent))
        .withColumn("dist", l2sq(col("embedding"), col("cv")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid"))
    }
    // C. probe top-k via TopKAgg (current) vs window, over the same candidates
    val inv = graft.operators.Ivf.assign(vectors, cent).localCheckpoint(true)
    val queries = vectors.filter(col("vec_id") % 50 === 0)
    time("probe TopKAgg")(
      graft.operators.Ivf.probe(inv, cent, queries, nprobe = 2, topk = 10))
    time("probe window") {
      val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .crossJoin(broadcast(graft.operators.Ivf.centArray(cent)))
        .select(col("qid"), col("qv"),
          explode(graft.operators.Ivf.nearestCids(col("qv"), col("__cents"), 2)).as("cid"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      q.join(inv.select(col("vec_id").as("nid"), col("embedding").as("nv"), col("cid")), Seq("cid"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("cos", cosine(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= 10)
        .select(col("qid"), col("rk"), col("nid"), col("cos"))
    }
    // D. PQ encode: per-row argmin (current) vs explode+window (old)
    val books = graft.operators.Pq.train(vectors, 8, 64, 16, 1)
    time("pq encode argmin-HOF")(
      graft.operators.Pq.encode(vectors, books, 8, 64))
    time("pq encode explode+window") {
      val sd = 8
      val subs = vectors.select(col("vec_id"),
          explode(sequence(lit(0), lit(7))).as("sub"),
          col("embedding").cast("array<double>").as("ev"))
        .select(col("vec_id"), col("sub"),
          slice(col("ev"), col("sub") * sd + 1, lit(sd)).as("sv"))
      val w = Window.partitionBy(col("vec_id"), col("sub"))
        .orderBy(col("dist"), col("cid"))
      subs.join(broadcast(books), Seq("sub"))
        .withColumn("dist", l2sq(col("sv"), col("cv")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("sc"))
        .select(col("vec_id"), transform(col("sc"), s => s.getField("cid")).as("codes"))
    }
    spark.stop()
  }
}
