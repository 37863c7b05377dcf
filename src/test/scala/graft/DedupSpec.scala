package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Connected-components cluster assignment over near-dup pairs. */
class DedupSpec extends SparkTestBase {

  test("min-label propagation finds components on a known graph") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {7,8}, singleton edges only
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("d1", "d2")
    val comps = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
    val k = Dedup.keepers(Dedup.connectedComponents(edges))
    assert(k.filter(col("is_keeper") === 1).count() === 2L)
  }

  test("components over real minhash pairs: endpoints of every edge share a component") {
    val pairs = SparkEntry.queries("llm_dedup_minhash_lsh")(spark, "/root/testdata/sf0.001")
    val comps = Dedup.connectedComponents(pairs)
    val withC = pairs
      .join(comps.withColumnRenamed("id", "d1").withColumnRenamed("comp", "c1"), "d1")
      .join(comps.withColumnRenamed("id", "d2").withColumnRenamed("comp", "c2"), "d2")
    assert(withC.filter(col("c1") =!= col("c2")).count() === 0L)
    // every cluster's keeper is its minimum member
    val bad = comps.groupBy(col("comp")).agg(min(col("id")).as("mn"))
      .filter(col("comp") =!= col("mn"))
    assert(bad.count() === 0L)
  }
}
