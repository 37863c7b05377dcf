package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** The native float-vector kernels (graft.plans.FloatVecFold) must be
  * BIT-identical to the higher-order-function composition they
  * replace — the DuckDB oracles were written against the HOF fold
  * order, so any drift here silently breaks the correctness gate. */
class VectorExprsSpec extends SparkTestBase {

  private def vecsDf = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val dim = 64
      Row(i.toLong,
        Array.fill(dim)(rnd.nextFloat() * 2f - 1f).toSeq,
        Array.fill(dim)(rnd.nextFloat() * 2f - 1f).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType),
        StructField("a", ArrayType(FloatType, containsNull = false)),
        StructField("b", ArrayType(FloatType, containsNull = false)))))
  }

  test("native dot/cosine/l2sq are bit-identical to the HOF fold") {
    val out = vecsDf.select(
      dot(col("a"), col("b")).as("d_n"), dotHof(col("a"), col("b")).as("d_h"),
      cosine(col("a"), col("b")).as("c_n"), cosineHof(col("a"), col("b")).as("c_h"),
      l2sq(col("a"), col("b")).as("l_n"), l2sqHof(col("a"), col("b")).as("l_h"))
      .collect()
    assert(out.length === 200)
    out.foreach { r =>
      // exact double equality on purpose — same IEEE ops in same order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(5)))
    }
  }

  test("length mismatch and null elements yield NULL, like the HOF form") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1f, 2f), Seq(1f, 2f, 3f)),          // length mismatch
        Row(2L, Seq(1f, null, 3f), Seq(1f, 2f, 3f)),    // null element
        Row(3L, Seq(1f, 2f), Seq(3f, 4f))), 1),         // clean
      StructType(Seq(
        StructField("id", LongType),
        StructField("a", ArrayType(FloatType, containsNull = true)),
        StructField("b", ArrayType(FloatType, containsNull = true)))))
    val got = df.select(col("id"), dot(col("a"), col("b")).as("d"),
        cosine(col("a"), col("b")).as("c"), l2sq(col("a"), col("b")).as("l"))
      .orderBy(col("id")).collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2) && got(0).isNullAt(3))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    assert(got(2).getDouble(1) === 11.0)
    assert(got(2).getDouble(3) === 8.0)
  }

  test("double-array operands work on either side (float vs double centroid)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1f, 2f, 3f), Seq(0.5, 1.5, 2.5))), 1),
      StructType(Seq(
        StructField("id", LongType),
        StructField("a", ArrayType(FloatType, containsNull = false)),
        StructField("c", ArrayType(DoubleType, containsNull = false)))))
    val r = df.select(
      dot(col("a"), col("c")).as("d"),
      l2sq(col("a"), col("c")).as("l"),
      l2sqHof(col("a"), col("c")).as("lh")).collect()(0)
    assert(r.getDouble(0) === 1.0 * 0.5 + 2.0 * 1.5 + 3.0 * 2.5)
    assert(r.getDouble(1) === 0.75)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
      java.lang.Double.doubleToLongBits(r.getDouble(2)))
  }

  test("expressions survive both codegen and interpreted eval") {
    // Interpreted path: nondeterministic-free eval via a literal frame
    val one = vecsDf.limit(1).select(
      round(cosine(col("a"), col("b")), 6).as("c")).collect()(0).getDouble(0)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val two = vecsDf.limit(1).select(
        round(cosine(col("a"), col("b")), 6).as("c")).collect()(0).getDouble(0)
      assert(one === two)
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = kvs.map { case (k, _) => k -> conf.getOption(k) }
    kvs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
