package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Oracle-output TYPE lint (CI form of tools/lint_oracle_types.py):
 * every SparkEntry.oracleSql must DESCRIBE through DuckDB without a
 * HUGEINT/UHUGEINT/DECIMAL output column. Those types are ones Spark
 * never emits, so the driver's type-sensitive canonicalization
 * (Arrow → pandas) stringifies them differently from the Spark dump
 * and hash-reds the carrier even when every value matches — the
 * mechanism behind ALL r14 (4) and r15 (6) CORRECTNESS failures
 * (uncast `sum(BIGINT)` → HUGEINT; bare `0.5` literal → DECIMAL(2,1)).
 * The fix is always a CAST at the emission site (CorpusPipeline
 * precedent); this spec makes a recurrence fail `sbt test` instead of
 * a driver round.
 *
 * Shells out to python3+duckdb (present on the build host for the
 * oracle tooling); skips cleanly where they are not.
 */
class OracleTypeLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private val lint = "tools/lint_oracle_types.py"

  private def duckdbAvailable: Boolean =
    scala.util.Try(
      Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ()))
    ).toOption.contains(0)

  private def runLint(sqls: Map[String, String]): (Int, String) = {
    val tmp = Files.createTempFile("oracle_sql", ".json")
    val json = sqls.toSeq.sortBy(_._1).map { case (k, v) =>
      def esc(s: String) = s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case '\r' => "\\r"
        // any other control char would otherwise emit invalid JSON and
        // fail the whole lint with an opaque parse error (r16 ADVICE)
        case c if c < 0x20 => f"\\u${c.toInt}%04x"
        case c    => c.toString
      }
      s""""${esc(k)}": "${esc(v)}""""
    }.mkString("{", ",\n", "}")
    Files.write(tmp, json.getBytes("UTF-8"))
    val out = new StringBuilder
    val code = Process(Seq("python3", lint, sfDir, tmp.toString))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(tmp)
    (code, out.toString)
  }

  test("every oracleSql output column is HUGEINT/DECIMAL-free") {
    assume(duckdbAvailable, "python3+duckdb not on this host")
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir missing")
    val (code, out) = runLint(SparkEntry.oracleSql)
    assert(code == 0, s"oracle type lint failed:\n$out")
  }

  test("negative control: an uncast integer sum fails the lint") {
    assume(duckdbAvailable, "python3+duckdb not on this host")
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir missing")
    val (code, out) = runLint(Map(
      "bad_hugeint" -> "SELECT sum(l_orderkey) AS s FROM lineitem",
      "bad_decimal" -> "SELECT 0.5 AS v"))
    assert(code != 0, "lint must fail on HUGEINT/DECIMAL output")
    assert(out.contains("bad_hugeint") && out.contains("bad_decimal"), out)
  }
}
