package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join injection — Spark's runtime-filter lever
  * for the 100 TB case: when a shuffle join's build side is selective,
  * the optimizer injects a bloom filter built from the build-side keys
  * into the probe-side scan, so most probe rows die at the scan
  * instead of crossing the shuffle. This spec pins that the lever
  * ENGAGES on our session config for the canonical selective-dim ×
  * big-fact shape (thresholds lowered to fire at test scale — at real
  * scale the defaults govern). */
class RuntimeFilterSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective shuffle join injects a bloom filter into the fact-side scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the fact side is tiny at sf0.001 — drop the size floors so the
      // optimizer treats it as worth filtering
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // force a shuffle join (broadcast joins don't take runtime filters)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") < 1000.0) // selective build side
        .select(col("o_orderkey"))
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter (might_contain) in:\n$optimized")
      // and the filtered result is still correct
      val expected = li.join(ord.hint("broadcast"), col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    }
  }
}
