package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: per-query timing (args = query names) or plan audit
  * (no args): flags cartesian products and un-pushed scans. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.EngineSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    if (args.nonEmpty) {
      for (name <- args; round <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"$name%-28s r$round: ${(System.nanoTime()-t0)/1e9}%8.3f s  rows=$n")
      }
    } else {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CARTESIAN" -> plan.contains("CartesianProduct"),
          "NESTEDLOOP" -> plan.contains("BroadcastNestedLoopJoin"),
          "SMJ" -> plan.contains("SortMergeJoin"),
          "BHJ" -> plan.contains("BroadcastHashJoin"),
          "SHJ" -> plan.contains("ShuffledHashJoin"),
          "EXCH" -> plan.contains("Exchange")).collect { case (f, true) => f }
        val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
        println(f"$name%-30s scans=$scans%-3d ${flags.mkString(",")}")
      }
    }
    spark.stop()
  }
}
