package graft

/** One-off diagnostic: execute a query, then print how many scans and
  * reused exchanges/stages the FINAL adaptive plan ran — tells whether
  * the static multi-scan counts in ScanAudit are real runtime cost or
  * AQE stage-reuse artifacts. */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("kdb_association_rules", "kdb_entropy_rate",
        "llm_label_noise", "llm_similarity_pq", "llm_lm_score_kn")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      df.write.mode("overwrite").format("noop").save()
      val plan = df.queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      val reused = plan.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("ReusedQueryStage"))
      println(s"PROBE $n: scans=$scans reused=$reused")
    }
    spark.stop()
  }
}
