package graft

import org.apache.spark.sql.functions._
import graft.plans.Fnv64

/** Native fnv64() expression: SQL registration via GraftExtensions,
  * codegen/interpreted agreement, and whole-stage codegen residency. */
class Fnv64Spec extends SparkTestBase {

  test("fnv64 SQL function matches the interpreted reference") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "graft-engine")
    val got = inputs.toDF("s")
      .selectExpr("s", "fnv64(cast(s as binary)) as h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      assert(got(s) === Fnv64.hash(s.getBytes("UTF-8")), s"input '$s'")
    }
    // known FNV-1a vector: empty input = offset basis
    assert(got("") === 0xcbf29ce484222325L)
  }

  test("fnv64 stays inside WholeStageCodegen (no UDF fallback)") {
    val df = spark.range(100)
      .select(expr("fnv64(cast(cast(id as string) as binary))").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [fnv64("))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    // and it evaluates: distinct hashes for distinct inputs
    assert(df.distinct().count() === 100L)
  }

  test("fnv64 null propagation") {
    import spark.implicits._
    val r = Seq(Some("x"), None).toDF("s")
      .selectExpr("fnv64(cast(s as binary)) as h")
      .collect()
    assert(r.count(_.isNullAt(0)) === 1)
  }
}
