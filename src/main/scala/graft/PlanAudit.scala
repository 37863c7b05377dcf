package graft

/** Plan hygiene sweep: prints every batch query whose executed plan
  * contains a partition-less Window (`GLOBALWINDOW`) — the
  * all-rows-to-one-partition shape that turns into a straggler at
  * 100 TB unless its input is provably bounded (a slot grid, a
  * top-K cut, a histogram). Run after adding queries; each hit must
  * either be rewritten (top-K before rank — llm_vocab_build
  * precedent) or carry a bounded-input justification in its
  * scaladoc (kdb_rfm precedent). Engine-lifecycle twins are skipped
  * (they build engines, not comparable plans). */
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
          plan.linesIterator.filter(_.trim.startsWith("+- Window ")).foreach { l =>
            // partitioned windows list partition columns before the
            // first ordering spec inside windowspecdefinition(...)
            val spec = l.substring(
              l.indexOf("windowspecdefinition(") + "windowspecdefinition(".length)
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
