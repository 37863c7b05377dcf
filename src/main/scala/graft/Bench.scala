package graft
import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Driver-run benchmark: every SparkEntry query timed at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout. A short warmup (table
  * footer reads + one trivial job) runs first so the first timed query
  * doesn't absorb session/JIT startup — the numbers approximate
  * steady-state executor throughput, which is what a long-lived
  * cluster sees. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.EngineSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // warmup: parquet footers + codegen/JIT infrastructure
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "events", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).count())
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // the first noop save in a JVM pays writer/commit infra (~2.5s),
    // and the first aggregate / window / sketch pays codegen and
    // class-loading one-offs — warm them all so the first timed query
    // doesn't absorb them (nothing here caches table data)
    spark.range(1000L)
      .selectExpr("id % 5 AS k", "id AS v")
      .selectExpr("k", "v",
        "approx_count_distinct(v) OVER (PARTITION BY k) AS acd",
        "sum(v) OVER (PARTITION BY k ORDER BY v) AS rs")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
      .write.mode("overwrite").format("noop").save()

    // a failed query reports -1.0, never a fake timing
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val secs =
        try {
          // noop sink, NOT count(): count lets Catalyst drop the sorts,
          // left joins, and projections the count doesn't need — the
          // timing would flatter exactly the operators a user pays for.
          // The noop writer executes the full physical plan and
          // discards rows executor-side (no driver collect).
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      name -> secs
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
