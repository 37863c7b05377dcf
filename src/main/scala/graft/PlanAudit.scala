package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("stream_") && name != "kdb_erase_twin" &&
          name != "kdb_sql_view_twin") {
        try {
          val plan = fn(spark, "/root/testdata/sf0.001")
            .queryExecution.executedPlan.toString
          // a Window line like: Window [f() windowspecdefinition(ORDER-only...)], [order]
          // partitioned windows print: Window [...], [partcols], [order]
          plan.linesIterator.filter(_.trim.startsWith("+- Window ")).foreach { l =>
            // partitioned windows have windowspecdefinition(col#, ..., ORDER) with
            // partition columns BEFORE the first "ASC NULLS"/"DESC NULLS" token;
            // crude but effective: a windowspecdefinition whose first arg is already
            // an ordering spec means no partitioning
            val spec = l.substring(l.indexOf("windowspecdefinition(") + "windowspecdefinition(".length)
            val firstArg = spec.takeWhile(c => c != ',' && c != ')')
            if (firstArg.contains(" ASC") || firstArg.contains(" DESC"))
              println(s"GLOBALWINDOW $name :: ${l.trim.take(140)}")
          }
        } catch { case e: Throwable => println(s"ERR $name ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
