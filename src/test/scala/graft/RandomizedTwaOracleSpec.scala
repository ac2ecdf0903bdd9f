package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{RangeQuery, Twa}
import graft.ts.RangeQuery.RangeArgs
import scala.util.Random

/**
 * Randomized TWA differential vs the DUCKDB oracle. TWA is the one
 * aggregator `rangeSqlFull` refuses (its trapezoid/boundary
 * interpolation needs its own SQL shape), so the DuckDB-backed stress
 * specs left it covered only by the in-memory model
 * (RandomizedTwaSpec) — the author-shared-blind-spot caveat applied to
 * the HARDEST aggregator. This spec routes seeded random combos
 * through [[Twa.sql]]/[[Twa.emptySql]] with an inline VALUES fixture
 * and compares row-for-row; beyond the model spec's surface it also
 * exercises MULTI-series fixtures, NaN samples (invalid for twa — the
 * validity filter must hide them from neighbour interpolation), and
 * FILTER_BY_VALUE / FILTER_BY_TS (applied before the neighbour
 * windows, reference order).
 * (Reference semantics: src/compaction.c:302-459 trapezoid + boundary,
 * src/filter_iterator.c:307-359 empty-bucket interpolation.)
 */
class RandomizedTwaOracleSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def dLit(d: Double): String =
    if (d.isNaN) "'NaN'::DOUBLE" else d.toString

  private def valuesCte(samples: Seq[(String, Long, Double)]): String =
    if (samples.isEmpty)
      "WITH samples(series, ts, value) AS (SELECT NULL::VARCHAR, NULL::BIGINT, NULL::DOUBLE WHERE 1=0)"
    else
      "WITH samples(series, ts, value) AS (VALUES " +
        samples.map { case (s, t, v) => s"('$s', ${t}::BIGINT, ${dLit(v)})" }.mkString(", ") + ")"

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("randomized TWA combos match the DuckDB oracle (incl. EMPTY, NaN, filters)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")

    val rnd = new Random(20260813L)
    case class Combo(name: String, samples: Seq[(String, Long, Double)],
                     args: RangeArgs, extraPred: Option[String])
    val combos = (0 until 80).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      val samples = (0 until nSeries).flatMap { si =>
        val n = 2 + rnd.nextInt(20)
        (0 until n).map { _ =>
          val v = if (rnd.nextInt(10) == 0) Double.NaN else rnd.nextInt(400) / 10.0 - 20.0
          (rnd.nextInt(1000).toLong, v)
        }.groupBy(_._1).map { case (t, vs) => (s"s$si", t, vs.head._2) }
      }
      val dur = Seq(7L, 10L, 50L, 100L)(rnd.nextInt(4))
      val align = Seq(0L, 3L, -5L)(rnd.nextInt(3))
      val from0 = if (rnd.nextBoolean()) Some(rnd.nextInt(600).toLong) else None
      val to0 = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      val (from, to) = (from0, to0) match {
        case (Some(f), Some(t)) if f > t => (Some(t), Some(f))
        case other                       => other
      }
      val filterByValue = if (rnd.nextInt(4) == 0) Some((-10.0, 10.0)) else None
      val filterByTs =
        if (rnd.nextInt(6) == 0 && samples.nonEmpty)
          rnd.shuffle(samples.map(_._2).distinct).take(1 + rnd.nextInt(samples.size)).toSeq
        else Nil
      val args = RangeArgs(from = from, to = to, aggs = Seq("twa"),
        bucketMs = dur, alignMs = align, empty = rnd.nextBoolean(),
        filterByTs = filterByTs, filterByValue = filterByValue)
      val extraPred = (
        filterByTs.headOption.map(_ => s"ts IN (${filterByTs.mkString(",")})").toSeq ++
        filterByValue.map { case (lo, hi) => s"value >= $lo AND value <= $hi" }.toSeq
      ) match { case Nil => None; case cs => Some(cs.mkString(" AND ")) }
      Combo(f"twa_$iter%03d", samples, args, extraPred)
    }

    // --- DuckDB side ------------------------------------------------
    val dir = java.nio.file.Files.createTempDirectory("rand_twa")
    val sqlOf = combos.map { c =>
      val inner =
        if (c.args.empty)
          Twa.emptySql(c.args.bucketMs, c.args.alignMs, c.args.from, c.args.to,
            None, c.extraPred, valuesCte(c.samples))
        else
          Twa.sql(c.args.bucketMs, c.args.alignMs, c.args.from, c.args.to,
            None, c.extraPred, valuesCte(c.samples))
      c.name -> s"SELECT series, bucket AS ts, twa_value FROM (\n$inner)"
    }.toMap
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

    // --- Spark side + compare ---------------------------------------
    var checkedRows = 0
    combos.foreach { c =>
      val df = c.samples.toSeq.toDF("series", "ts", "value")
      val got = RangeQuery.range(df, c.args).collect().map { r =>
        (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      }.sortBy(r => (r._1, r._2)).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name}\nargs=${c.args} extraPred=${c.extraPred}\n" +
        s"samples=${c.samples.sortBy(r => (r._1, r._2))}\ngot=$got\nexp=$exp\n" +
        s"sql=\n${sqlOf(c.name)}"
      assert(got.map(r => (r._1, r._2)) == exp.map(r => (r._1, r._2)),
        s"(series, bucket) keys differ: $ctx")
      got.zip(exp).foreach { case ((s, b, g), (_, _, e)) =>
        val ok = (g, e) match {
          case (None, None) => true
          case (Some(x), Some(y)) =>
            (x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-7 * math.max(1.0, math.abs(y))
          case _ => false
        }
        assert(ok, s"series=$s bucket=$b: got $g expected $e\n$ctx")
      }
      checkedRows += got.size
    }
    assert(checkedRows > 300, s"only $checkedRows rows compared — generator too weak")
  }
}
