package graft
// Plan audit: per-query physical-plan shape counters (exchanges, reuse,
// scans, sorts, nested loops) - run with query names as args.
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      df.write.mode("overwrite").format("noop").save()
      val plan = df.queryExecution.executedPlan.toString
      def c(s: String) = plan.linesIterator.count(_.contains(s))
      println(s"=== $name exchanges=${c("Exchange")} reused=${c("ReusedExchange")} " +
        s"scans=${c("Scan parquet")} sorts=${c("Sort ")} bnlj=${c("BroadcastNestedLoop")}")
    }
    spark.stop()
  }
}
