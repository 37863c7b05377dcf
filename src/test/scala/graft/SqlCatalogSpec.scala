package graft

import graft.sources.SqlCatalog

/** The SQL face: registered views make the whole surface reachable
  * through spark.sql, compiling to the same plans as the DataFrame
  * queries. */
class SqlCatalogSpec extends SparkTestBase {

  test("registered views answer SQL identically to the DataFrame query") {
    val sf = "/root/testdata/sf0.001"
    SqlCatalog.registerViews(spark, sf)
    val viaSql = spark.sql("""
      SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY 1 ORDER BY 1""").collect()
    import org.apache.spark.sql.functions._
    val viaDf = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag")).collect()
    assert(viaSql.toSeq === viaDf.toSeq)
    // all ten tables visible
    assert(SqlCatalog.tableNames.forall(t => spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1))
  }
}
