package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named SparkEntry queries to
  * files — the optimization-round evidence artifact (plans/r14/
  * <query>_{before,after}.txt). Usage:
  *
  *   runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>
  *
  * Each query's DataFrame is BUILT (lifecycle queries run their
  * engine verbs — that is what produces the final probe plan) and
  * its formatted physical plan written to <outDir>/<name>_<suffix>.txt.
  * Data dir / cores come from the bench env contract
  * (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val (outDir, suffix, names) = (args(0), args(1), args(2).split(",").map(_.trim).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.core.EngineSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qmap = SparkEntry.queries
    names.foreach { name =>
      val fn = qmap.getOrElse(name, sys.error(s"unknown query: $name"))
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        System.err.println(s"[plandump] wrote $name ($suffix)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
