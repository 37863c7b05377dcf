package graft

import org.apache.spark.sql.functions._
import graft.queries.SharedExprs

/** Pins SharedExprs.hugeToDouble to the engine-neutral two-op model
  * (split at 2³², exact half conversions, one multiply-round + one
  * add-round) at magnitudes past 2⁶⁴ — the regime where DuckDB's
  * native HUGEINT→DOUBLE cast double-rounds and diverges from Spark's
  * correctly-rounded Decimal→double by 1 ulp (measured ~0.2% of
  * 75-bit values). The sf gates only cover < 2⁵³ where every
  * conversion is exact; this spec is the >2⁶⁴ evidence for the Spark
  * side, mirroring the model the oracles' SQL expression performs. */
class HugeToDoubleSpec extends SparkTestBase {

  private def model(v: BigInt): Double = {
    val m = v % BigInt(4294967296L) // dividend-sign %, as in both engines
    val hi = (v - m) / BigInt(4294967296L)
    hi.toDouble * 4294967296.0 + m.toDouble
  }

  test("hugeToDouble matches the two-op split model past 2^64, both signs") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(200)(BigInt(75, rnd) - (BigInt(1) << 74)) ++
      Seq(BigInt(0), BigInt(1) << 64, -(BigInt(1) << 64),
        (BigInt(1) << 85) - 1, BigInt("4999999999999999999999"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vals.map(v => org.apache.spark.sql.Row(new java.math.BigDecimal(v.bigInteger)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DecimalType(38, 0)))))
    val got = df.select(SharedExprs.hugeToDouble(col("v")).as("d"))
      .collect().map(_.getDouble(0))
    val want = vals.map(model)
    got.zip(want).zip(vals).foreach { case ((g, w), v) =>
      assert(java.lang.Double.doubleToLongBits(g) ===
        java.lang.Double.doubleToLongBits(w), s"value $v")
    }
  }

  test("determinism ceiling: the high half stays a one-rounding BIGINT below 2^95") {
    // the helper's cross-engine guarantee needs |x div 2^32| < 2^63
    // (DuckDB converts a BIGINT high half with ONE rounding, like
    // Spark); verify the documented consumer headroom (~1e28) and the
    // stated ceiling boundary both satisfy it, and that the model
    // still matches Spark right up to the ceiling
    val ceiling = BigInt(1) << 95
    val headroom = BigInt(10).pow(28)
    assert(headroom < ceiling)
    for (v <- Seq(ceiling - 1, -(ceiling - 1), headroom, -headroom)) {
      assert(((v - v % BigInt(4294967296L)) / BigInt(4294967296L)).abs
        < (BigInt(1) << 63), s"high half of $v must fit a BIGINT")
      val df = spark.sql(s"SELECT CAST('$v' AS DECIMAL(38,0)) AS v")
      val got = df.select(SharedExprs.hugeToDouble(col("v")).as("d"))
        .collect()(0).getDouble(0)
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(model(v)), s"value $v")
    }
  }
}
