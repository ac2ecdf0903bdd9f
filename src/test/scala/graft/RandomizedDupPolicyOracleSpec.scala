package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.WritePath
import scala.util.Random

/**
 * Randomized duplicate-policy differential vs the DUCKDB oracle: random
 * duplicate-heavy batches (NaN mixes, arrival-order seq) × per-series
 * catalog policies × global default × occasional command override,
 * checking [[WritePath.applyDupPolicy]] and the single-pass
 * [[WritePath.applyDupPolicyPerSeries]] resolution against SQL run in
 * DuckDB. The reference's NaN fold is the subtle part (valid wins under
 * FIRST/LAST; a NaN-FIRST timestamp poisons MIN/MAX/SUM forever —
 * handleDuplicateSample generic_chunk.c:62-96, policy chain
 * module.c:1014-1016); the oracle re-derives it with independent
 * struct-packing and FILTER aggregates.
 */
class RandomizedDupPolicyOracleSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def dLit(d: Double): String =
    if (d.isNaN) "'NaN'::DOUBLE" else d.toString

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private val POLICIES = Seq("FIRST", "LAST", "MIN", "MAX", "SUM")

  test("randomized duplicate batches resolve like the DuckDB oracle (NaN fold included)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")

    val rnd = new Random(20260813L)
    case class Combo(name: String, rows: Seq[(String, Long, Double, Long)],
                     pols: Seq[(String, String)], global: String, cmd: Option[String])
    val combos = (0 until 50).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      var seq = 0L
      val rows = (0 until nSeries).flatMap { si =>
        val nTs = 1 + rnd.nextInt(6)
        (0 until nTs).flatMap { _ =>
          val ts = rnd.nextInt(20).toLong // few slots -> many duplicates
          val nDup = 1 + rnd.nextInt(4)
          (0 until nDup).map { _ =>
            val v = if (rnd.nextInt(4) == 0) Double.NaN else rnd.nextInt(100) / 10.0
            seq += 1
            (s"s$si", ts, v, seq)
          }
        }
      }
      // catalog rows for a random subset of series (the rest fall back
      // to the global default through the resolution chain)
      val pols = (0 until nSeries).flatMap { si =>
        if (rnd.nextBoolean()) Some(s"s$si" -> POLICIES(rnd.nextInt(POLICIES.size)))
        else None
      }
      val global = POLICIES(rnd.nextInt(POLICIES.size))
      val cmd = if (iter % 4 == 0) Some(POLICIES(rnd.nextInt(POLICIES.size))) else None
      Combo(f"dup_$iter%03d", rows, pols, global, cmd)
    }

    def oracleSql(c: Combo): String = {
      val sv = c.rows.map { case (s, t, v, q) =>
        s"('$s', ${t}::BIGINT, ${dLit(v)}, ${q}::BIGINT)" }.mkString(", ")
      val pv =
        if (c.pols.isEmpty) "(SELECT NULL::VARCHAR, NULL::VARCHAR WHERE 1=0)"
        else "(VALUES " + c.pols.map { case (s, p) => s"('$s', '$p')" }.mkString(", ") + ")"
      // command override wins over catalog and global (module.c:1014-1016)
      val polExpr = c.cmd match {
        case Some(p) => s"'$p'"
        case None    => s"coalesce(pol, '${c.global}')"
      }
      s"""WITH samples(series, ts, value, seq) AS (VALUES $sv),
         |pols(series, pol) AS $pv,
         |agg AS (
         |  SELECT series, ts,
         |    (min(CASE WHEN NOT isnan(value) THEN struct_pack(s := seq, v := value) END)).v AS first_v,
         |    (max(CASE WHEN NOT isnan(value) THEN struct_pack(s := seq, v := value) END)).v AS last_v,
         |    isnan((min(struct_pack(s := seq, v := value))).v) AS nan_first,
         |    min(value) FILTER (WHERE NOT isnan(value)) AS min_v,
         |    max(value) FILTER (WHERE NOT isnan(value)) AS max_v,
         |    sum(value) FILTER (WHERE NOT isnan(value)) AS sum_v
         |  FROM samples GROUP BY 1, 2)
         |SELECT series, ts,
         |  CASE $polExpr
         |    WHEN 'FIRST' THEN coalesce(first_v, 'NaN'::DOUBLE)
         |    WHEN 'LAST'  THEN coalesce(last_v, 'NaN'::DOUBLE)
         |    WHEN 'MIN'   THEN CASE WHEN nan_first THEN 'NaN'::DOUBLE ELSE min_v END
         |    WHEN 'MAX'   THEN CASE WHEN nan_first THEN 'NaN'::DOUBLE ELSE max_v END
         |    WHEN 'SUM'   THEN CASE WHEN nan_first THEN 'NaN'::DOUBLE ELSE sum_v END
         |  END AS value
         |FROM agg LEFT JOIN pols USING (series)""".stripMargin
    }

    val dir = java.nio.file.Files.createTempDirectory("rand_dup")
    val sqlOf = combos.map(c => c.name -> oracleSql(c)).toMap
    val in = dir.resolve("sqls.json"); val out = dir.resolve("rows.tsv")
    java.nio.file.Files.writeString(in,
      combos.map(c => s"${jq(c.name)}: ${jq(sqlOf(c.name))}").mkString("{", ",", "}"))
    import scala.sys.process._
    val log = new StringBuilder
    val rc = Seq("python3", py.toAbsolutePath.toString, in.toString, out.toString)
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, s"oracle batch runner failed (rc=$rc):\n$log")

    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(out)).asScala.toSeq
    val errs = lines.filter(_.split("\t", -1).lift(1).contains("__ERROR__"))
    assert(errs.isEmpty, s"DuckDB rejected generated oracle SQL:\n${errs.mkString("\n")}")
    assert(lines.count(_.split("\t", -1).lift(1).contains("__DONE__")) == combos.size,
      "oracle did not run every combo")
    val expected: Map[String, Seq[(String, Long, Option[Double])]] =
      lines.filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
        .map(_.split("\t", -1)).groupBy(_.head)
        .map { case (name, rows) =>
          name -> rows.map { f =>
            (f(1), f(2).toLong, f(3) match {
              case ""    => None
              case "NaN" => Some(Double.NaN)
              case s     => Some(s.toDouble)
            })
          }.sortBy(r => (r._1, r._2)).toSeq
        }

    var checkedRows = 0
    combos.foreach { c =>
      val df = c.rows.toSeq.toDF("series", "ts", "value", "seq")
      val polDf = c.pols.toSeq.toDF("series", "dup_policy")
      val res = WritePath.applyDupPolicyPerSeries(
        df, polDf, commandPolicy = c.cmd, globalPolicy = c.global)
      val got = res.collect().map { r =>
        (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      }.sortBy(r => (r._1, r._2)).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name}\npols=${c.pols} global=${c.global} cmd=${c.cmd}\n" +
        s"rows=${c.rows.sortBy(r => (r._1, r._2, r._4))}\ngot=$got\nexp=$exp\n" +
        s"sql=\n${sqlOf(c.name)}"
      assert(got.map(r => (r._1, r._2)) == exp.map(r => (r._1, r._2)),
        s"(series, ts) keys differ: $ctx")
      got.zip(exp).foreach { case ((s, t, g), (_, _, e)) =>
        val ok = (g, e) match {
          case (None, None) => true
          case (Some(x), Some(y)) =>
            (x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y))
          case _ => false
        }
        assert(ok, s"series=$s ts=$t: got $g expected $e\n$ctx")
      }
      checkedRows += got.size
    }
    assert(checkedRows > 200, s"only $checkedRows rows compared — generator too weak")
  }
}
