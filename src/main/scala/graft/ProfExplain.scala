package graft
object ProfExplain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.count() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    println("=== reused exchanges: " + plan.linesIterator.count(_.contains("ReusedExchange")))
    println("=== window (shingle) ops: " + plan.linesIterator.count(l => l.contains("Window")))
    println("=== scans: " + plan.linesIterator.count(_.contains("FileScan parquet")))
    spark.stop()
  }
}
