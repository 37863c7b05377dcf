package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) join: pre-bucketing both fact tables on the
  * join key lets the join run with NO exchange on either side — at
  * 100 TB this converts the dominant shuffle of fact×fact joins into
  * local merges. Demonstrated with orders ⋈ lineitem bucketed on the
  * order key. */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed fact-fact join plans without exchanges and matches the plain join") {
    val sf = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("orders_b")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("lineitem_b")

    // disable broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "expected sort-merge over buckets")
      val exchangesBeforeAgg = plan.linesIterator
        .dropWhile(!_.contains("SortMergeJoin"))
        .count(_.contains("Exchange"))
      assert(exchangesBeforeAgg === 0,
        s"bucketed join must not re-shuffle its inputs:\n$plan")

      // same result as the plain (unbucketed) join
      val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      assert(joined.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(joined).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
