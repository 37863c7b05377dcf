package graft

/** One-off diagnostic (not a test): per query, count parquet scans and
  * hash exchanges in the executed plan at sf0.001 — surfaces the
  * "shared tiny table rebuilt per branch" multi-scan pattern. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val scans = plan.linesIterator.count(_.contains("Scan parquet"))
        val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
        Some((name, scans, ex))
      } catch { case e: Throwable =>
        System.err.println(s"[audit] $name failed: ${e.getMessage}"); None
      }
    }
    rows.filter(_._2 >= 3).sortBy(-_._2).foreach { case (n, s, e) =>
      println(f"SCANS $s%2d EX $e%2d  $n")
    }
    println(s"== audited ${rows.size} queries ==")
    spark.stop()
  }
}
