package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Oracle-side budget guard: every `SparkEntry.oracleSql` entry must
  * complete in DuckDB within a few seconds at sf0.01.
  *
  * The driver's correctness gate runs each oracle in DuckDB; an
  * exponentially slow oracle blows the gate's wall budget and empties the
  * whole round artifact — exactly what the BPE trio's CTE-inlining bug did
  * to CORRECTNESS_r09 and _r10 (q113 30.5 s, q118 211 s, q125 >600 s at
  * sf0.01, vs 0.03–0.05 s with `AS MATERIALIZED`). Verify's per-query cap
  * covers only the Spark side; this spec puts the SQL side under the same
  * discipline, so a slow oracle fails `sbt test` the day it is written. */
class OracleBudgetSpec extends GraftSuite {

  test("every oracle SQL completes in DuckDB within 5s at sf0.01") {
    val haveDuck =
      try Seq("python3", "-c", "import duckdb").! == 0
      catch { case _: Throwable => false }
    assume(haveDuck, "python3+duckdb not available in this environment")
    val sfDir = "/root/testdata/sf0.01"
    assume(Files.isDirectory(Paths.get(sfDir)), s"$sfDir missing")

    val prev = SparkEntry.oracleContext
    val oracle =
      try {
        SparkEntry.oracleContext = Some((spark, sfDir))
        SparkEntry.oracleSql
      } finally SparkEntry.oracleContext = prev
    val json = oracle
      .map { case (k, v) => s"${Jsons.quote(k)}: ${Jsons.quote(v)}" }
      .mkString("{", ",", "}")
    val tmp = Files.createTempDirectory("oracle-budget")
    val jsonPath = tmp.resolve("oracle_sql.json")
    Files.writeString(jsonPath, json)

    val out = new StringBuilder
    val rc = Seq("python3", "scripts/oracle_bench.py",
      sfDir, jsonPath.toString, "5")
      .!(ProcessLogger(l => out.append(l).append('\n')))
    info(out.toString.trim)
    assert(rc == 0, s"oracle budget overrun:\n$out")
  }
}
