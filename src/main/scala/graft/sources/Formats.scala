package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format surface beyond parquet: CSV and JSON lines,
  * schema-explicit (never inferSchema on the read path at scale — a
  * schema inference pass is a full extra scan of 100 TB). Parquet
  * stays the canonical store (columnar, stats, pushdown); these cover
  * interchange in/out of the engine. */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC: the other columnar interchange format (stats + pushdown,
    * like parquet; some lakes standardize on it). Schema passed
    * explicitly for symmetry even though ORC self-describes. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
