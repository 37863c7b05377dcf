package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL face of the engine: register every testdata table as a temp
  * view so the full surface is reachable through `spark.sql(...)` —
  * the DataFrame queries in graft.queries and ad-hoc SQL compile to
  * the same Catalyst plans. */
object SqlCatalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
