package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recurrence guard for the round-8 gate defect class: an oracle SQL
  * whose DuckDB result schema contains HUGEINT (an uncast `sum()` over
  * BIGINT) hash-mismatches at the driver even when every value is
  * identical, because the driver's hasher is type-sensitive. This spec
  * shells the repo's DuckDB lint (`tools/lint_oracle_types.py`) over
  * the full `SparkEntry.oracleSql` map so an uncast sum turns the
  * suite red before it ever reaches the driver's gate.
  *
  * DuckDB lives on the driver side of this container (python3), not on
  * the sbt classpath — if either is absent the spec cancels rather
  * than fails, so the lint never masks a legitimately green suite on a
  * stripped host.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private def have(cmd: String*): Boolean =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  test("no oracle SQL emits HUGEINT columns") {
    assume(have("python3", "-c", "import duckdb"), "python3+duckdb unavailable")
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists, "testdata unavailable")

    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    // the gate's own escaper (Verify.jsonEscape) — a weaker local copy
    // would turn a legal-but-exotic control char into a spurious failure
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${Verify.jsonEscape(k)}: ${Verify.jsonEscape(v)}"
    }.mkString("{", ",\n", "}")
    java.nio.file.Files.write(tmp, json.getBytes("UTF-8"))

    val p = new ProcessBuilder(
      "python3", "tools/lint_oracle_types.py", sfDir, tmp.toString)
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val code = p.waitFor()
    java.nio.file.Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle type lint failed:\n$out")
  }
}
