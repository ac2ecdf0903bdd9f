package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Aggs, Multi, RangeQuery}
import graft.ts.RangeQuery.RangeArgs
import scala.util.Random

/**
 * Randomized NRANGE differential vs the DUCKDB oracle: the pivot path
 * (`Multi.nrange` / `nrangeSpecs` — conditional aggregation, NaN gaps,
 * per-key aggregator specs) over random key lists × the full range
 * option surface (EMPTY spines, COUNT truncation, FILTER_BY_*, raw
 * mode). The hand-picked ts_nrange_* queries pin one shape each;
 * NrangeCompareSpec checks vs per-key ranges merged in memory — this
 * routes the cross-product through DuckDB instead (reference:
 * module.c:724-906; reference's own stress
 * tests/flow/test_ts_nrange_compare.py).
 */
class RandomizedNrangeOracleSpec extends AnyFunSuite {
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

  test("randomized NRANGE pivots match the DuckDB oracle (plain + per-key specs)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")

    val rnd = new Random(20260813L)
    case class Combo(name: String, samples: Seq[(String, Long, Double)],
                     keys: Seq[String], specs: Option[Seq[(String, Seq[String])]],
                     args: RangeArgs)
    val combos = (0 until 60).map { iter =>
      val nSeries = 2 + rnd.nextInt(3)
      val samples = (0 until nSeries).flatMap { si =>
        // s<last> is occasionally sample-free: an NRANGE key with no
        // data must still pivot to an all-NaN column
        val n = if (si == nSeries - 1 && rnd.nextInt(4) == 0) 0 else rnd.nextInt(16)
        (0 until n).map { _ =>
          val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
          (rnd.nextInt(1000).toLong, v)
        }.groupBy(_._1).map { case (t, vs) => (s"s$si", t, vs.head._2) }
      }
      val keys = (0 until nSeries).map(i => s"s$i")
      val raw = iter % 10 == 0
      val dur = Seq(7L, 10L, 50L, 100L)(rnd.nextInt(4))
      val specsMode = !raw && iter % 2 == 1
      val nAggs = 1 + rnd.nextInt(2)
      val args = RangeArgs(
        from = if (rnd.nextBoolean()) Some(rnd.nextInt(500).toLong) else None,
        to = if (rnd.nextBoolean()) Some(500L + rnd.nextInt(600)) else None,
        aggs = if (raw) Nil else rnd.shuffle(Aggs.names).take(nAggs),
        bucketMs = if (raw) 0L else dur,
        alignMs = if (raw) 0L else Seq(0L, 3L, -5L)(rnd.nextInt(3)),
        bucketTs = if (raw) "-" else Seq("-", "~", "+")(rnd.nextInt(3)),
        empty = !raw && rnd.nextInt(3) == 0,
        filterByValue = if (rnd.nextInt(4) == 0) Some((-5.0, 5.0)) else None,
        count = if (rnd.nextInt(5) == 0) Some(1 + rnd.nextInt(5)) else None,
        reverse = rnd.nextBoolean())
      val specs =
        if (specsMode)
          Some(keys.map(k => k -> rnd.shuffle(Aggs.names).take(1 + rnd.nextInt(2)).toSeq))
        else None
      Combo(f"nr_$iter%03d", samples, keys, specs, args)
    }

    // --- DuckDB side: pivot over the per-series full renderer --------
    def pivotSql(c: Combo): String = {
      val innerArgs = c.specs match {
        case Some(sp) => c.args.copy(aggs = sp.flatMap(_._2).distinct)
        case None     => c.args
      }
      val per = RangeQuery.rangeSqlFull(innerArgs,
        Some(s"series IN (${c.keys.map(k => s"'$k'").mkString(",")})"),
        valuesCte(c.samples))
      val cells = c.specs match {
        case Some(sp) =>
          for ((k, aggs) <- sp; a <- aggs) yield
            s"coalesce(max(CAST(${Aggs.colName(a)} AS DOUBLE)) FILTER (WHERE series = '$k'), " +
              s"'NaN'::DOUBLE) AS ${k}_${a.replace('.', '_')}"
        case None =>
          val c0 = if (c.args.aggs.isEmpty) "value" else Aggs.colName(c.args.aggs.head)
          c.keys.map(k =>
            s"coalesce(max(CAST($c0 AS DOUBLE)) FILTER (WHERE series = '$k'), 'NaN'::DOUBLE) AS $k")
      }
      s"""SELECT ts,
         |  ${cells.mkString(",\n  ")}
         |FROM ($per)
         |GROUP BY ts""".stripMargin
    }
    val dir = java.nio.file.Files.createTempDirectory("rand_nrange")
    val sqlOf = combos.map(c => c.name -> pivotSql(c)).toMap
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
    val expected: Map[String, Seq[(Long, Seq[Double])]] =
      lines.filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
        .map(_.split("\t", -1)).groupBy(_.head)
        .map { case (name, rows) =>
          name -> rows.map { f =>
            (f(1).toLong, f.drop(2).toSeq.map {
              case "NaN" => Double.NaN
              case s     => s.toDouble
            })
          }.sortBy(_._1).toSeq
        }

    // --- Spark side + compare ---------------------------------------
    var checkedRows = 0
    combos.foreach { c =>
      val df = c.samples.toSeq.toDF("series", "ts", "value")
      val res = c.specs match {
        case Some(sp) => Multi.nrangeSpecs(df, sp, c.args)
        case None     => Multi.nrange(df, c.keys, c.args)
      }
      val nCells = c.specs.map(_.map(_._2.size).sum).getOrElse(c.keys.size)
      val got = res.collect().map { r =>
        (r.getLong(0), (1 to nCells).map { i =>
          r.get(i) match {
            case null                => Double.NaN
            case l: java.lang.Long   => l.toDouble
            case d: java.lang.Double => d.doubleValue
          }
        })
      }.sortBy(_._1).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name}\nkeys=${c.keys} specs=${c.specs}\nargs=${c.args}\n" +
        s"samples=${c.samples.sortBy(r => (r._1, r._2))}\ngot=$got\nexp=$exp\n" +
        s"sql=\n${sqlOf(c.name)}"
      assert(got.map(_._1) == exp.map(_._1), s"pivot timestamps differ: $ctx")
      got.zip(exp).foreach { case ((ts, gv), (_, ev)) =>
        gv.zip(ev).zipWithIndex.foreach { case ((g, e), i) =>
          val ok = (g.isNaN && e.isNaN) ||
            math.abs(g - e) <= 1e-7 * math.max(1.0, math.abs(e))
          assert(ok, s"ts=$ts cell=$i: got $g expected $e\n$ctx")
        }
      }
      checkedRows += got.size
    }
    assert(checkedRows > 300, s"only $checkedRows rows compared — generator too weak")
  }
}
