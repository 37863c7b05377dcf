package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise
    * make a consumer's json.load fail. Shared with OracleTypeLintSpec
    * so the lint serializes oracle SQL exactly as the gate dump does
    * (a weaker copy would turn an exotic-but-legal control char into
    * a spurious lint failure). */
  private[graft] def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.EngineSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: GRAFT_ONLY=q1,q2 runs a subset. The
    // driver never sets it, so the gate always runs the full surface.
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    def keep(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // per-query persist() blocks must not accumulate across the
      // 350-query dump (CacheManager entries never expire on their own)
      finally spark.sharedState.cacheManager.clearCache()
    }
    def q(s: String): String = jsonEscape(s)
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // When GRAFT_ONLY trimmed the surface, stamp the outDir so a
    // partial local-iteration dump can never be mistaken for (or
    // accidentally graded as) a full gate run.
    if (only.isDefined)
      Files.writeString(Paths.get(s"$outDir/_PARTIAL"),
        only.get.toSeq.sorted.mkString("\n"))
    else
      // a full run into a dir previously used for a partial local
      // iteration must not inherit its stale partial stamp
      Files.deleteIfExists(Paths.get(s"$outDir/_PARTIAL"))
    spark.stop()
  }
}
