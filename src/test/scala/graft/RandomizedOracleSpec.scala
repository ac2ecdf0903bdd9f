package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Aggs, RangeQuery}
import graft.ts.RangeQuery.RangeArgs
import scala.util.Random

/**
 * Randomized differential vs the DUCKDB oracle (VERDICT r06 next #3,
 * carried r5 #8): RandomizedRangeSpec checks RangeQuery against an
 * in-memory Scala model — but a model that shares its author with the
 * engine can share its blind spots. This spec routes >=100 seeded
 * random EMPTY × ALIGN × BUCKETTIMESTAMP × FILTER_BY_* × COUNT × REV
 * combos through [[RangeQuery.rangeSqlFull]] and executes the SQL in
 * an actual DuckDB process (the same engine the driver's correctness
 * gate uses), comparing row-for-row. Mirrors the reference's own
 * stress test (reference: tests/flow/test_ts_range_empty_filter_stress.py).
 *
 * The DuckDB run is ONE python3 subprocess over all combos (python3 +
 * duckdb are present in this container — tools/check_oracle.py already
 * depends on them). If python3/duckdb are genuinely unavailable the
 * spec cancels rather than silently passing.
 */
class RandomizedOracleSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def dLit(d: Double): String =
    if (d.isNaN) "'NaN'::DOUBLE" else d.toString

  /** Inline the combo's samples as a VALUES CTE so DuckDB sees the
    * exact same doubles (Double.toString round-trips; DuckDB's parser
    * is correctly-rounding, so both engines hold identical bits). */
  private def valuesCte(samples: Seq[(Long, Double)]): String =
    if (samples.isEmpty)
      "WITH samples(series, ts, value) AS (SELECT NULL::VARCHAR, NULL::BIGINT, NULL::DOUBLE WHERE 1=0)"
    else
      "WITH samples(series, ts, value) AS (VALUES " +
        samples.map { case (t, v) => s"('k', ${t}::BIGINT, ${dLit(v)})" }.mkString(", ") + ")"

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def closeEnough(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
    case (None, None) => true
    case (Some(x), Some(y)) =>
      (x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-7 * math.max(1.0, math.abs(y))
    case _ => false
  }

  test("randomized option cross-product matches the DuckDB oracle (>=100 combos)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")

    val rnd = new Random(20260813L)
    val aggsPool = Aggs.names
    case class Combo(name: String, samples: Seq[(Long, Double)], args: RangeArgs)
    val combos = (0 until 120).map { iter =>
      val n = rnd.nextInt(30)
      val samples = (0 until n).map { _ =>
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
        (ts, v)
      }.groupBy(_._1).map { case (t, rows) => (t, rows.head._2) }.toSeq
      val raw = iter % 12 == 0
      val dur = Seq(7L, 10L, 50L, 100L)(rnd.nextInt(4))
      val align = if (raw) 0L else Seq(0L, 3L, 10L, -5L)(rnd.nextInt(4))
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(500).toLong) else None
      val to = if (rnd.nextBoolean()) Some(500L + rnd.nextInt(600)) else None
      val aggs = if (raw) Nil else rnd.shuffle(aggsPool).take(1 + rnd.nextInt(3))
      val filterTs =
        if (rnd.nextInt(4) == 0 && samples.nonEmpty)
          rnd.shuffle(samples.map(_._1)).take(1 + rnd.nextInt(samples.size))
        else Nil
      val args = RangeArgs(
        from = from, to = to, aggs = aggs,
        bucketMs = if (raw) 0L else dur, alignMs = align,
        bucketTs = if (raw) "-" else Seq("-", "~", "+")(rnd.nextInt(3)),
        empty = !raw && rnd.nextInt(2) == 0,
        filterByTs = filterTs,
        filterByValue = if (rnd.nextInt(4) == 0) Some((-5.0, 5.0)) else None,
        count = if (rnd.nextInt(5) == 0) Some(1 + rnd.nextInt(5)) else None,
        reverse = rnd.nextBoolean())
      Combo(f"combo_$iter%03d", samples, args)
    }

    // --- DuckDB side: one subprocess over every combo's SQL ----------
    val dir = java.nio.file.Files.createTempDirectory("rand_oracle")
    val sqlJson = combos.map { c =>
      s"${jq(c.name)}: ${jq(RangeQuery.rangeSqlFull(c.args, None, valuesCte(c.samples)))}"
    }.mkString("{", ",", "}")
    val in = dir.resolve("sqls.json"); val out = dir.resolve("rows.tsv")
    java.nio.file.Files.writeString(in, sqlJson)
    import scala.sys.process._
    val log = new StringBuilder
    val rc = Seq("python3", py.toAbsolutePath.toString, in.toString, out.toString)
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, s"oracle batch runner failed (rc=$rc):\n$log")

    val expected: Map[String, Seq[(Long, Seq[Option[Double]])]] = {
      val lines = scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(out)).asScala.toSeq
      val errs = lines.filter(_.split("\t", -1).lift(1).contains("__ERROR__"))
      assert(errs.isEmpty, s"DuckDB rejected generated oracle SQL:\n${errs.mkString("\n")}")
      lines.filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
        .map(_.split("\t", -1)).groupBy(_.head)
        .map { case (name, rows) =>
          name -> rows.map { f =>
            // f = name, series, ts, v... ; "" = NULL, "NaN" = NaN
            (f(2).toLong, f.drop(3).toSeq.map {
              case ""    => None
              case "NaN" => Some(Double.NaN)
              case s     => Some(s.toDouble)
            })
          }.sortBy(_._1).toSeq
        }
    }
    val done = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(out)).asScala
      .count(_.split("\t", -1).lift(1).contains("__DONE__"))
    assert(done == combos.size, s"oracle ran $done of ${combos.size} combos")

    // --- Spark side + compare ---------------------------------------
    var checkedRows = 0
    combos.foreach { c =>
      val df = c.samples.map { case (t, v) => ("k", t, v) }.toDF("series", "ts", "value")
      val nVals = if (c.args.aggs.isEmpty) 1 else c.args.aggs.size
      val got = RangeQuery.range(df, c.args).collect().map { r =>
        (r.getLong(1), (0 until nVals).map { i =>
          if (r.isNullAt(i + 2)) None
          else r.get(i + 2) match {
            case l: java.lang.Long   => Some(l.toDouble)
            case d: java.lang.Double => Some(d.doubleValue)
          }
        })
      }.sortBy(_._1).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name}\nargs=${c.args}\nsamples=${c.samples.sortBy(_._1)}\n" +
        s"got=$got\nexp=$exp\nsql=\n${RangeQuery.rangeSqlFull(c.args, None, valuesCte(c.samples))}"
      assert(got.map(_._1) == exp.map(_._1), s"bucket timestamps differ: $ctx")
      got.zip(exp).foreach { case ((ts, gv), (_, ev)) =>
        gv.zip(ev).zipWithIndex.foreach { case ((g, e), i) =>
          assert(closeEnough(g, e), s"ts=$ts col=$i: got $g expected $e\n$ctx")
        }
      }
      checkedRows += got.size
    }
    assert(checkedRows > 300, s"only $checkedRows rows compared — generator too weak")
  }

  /** Same differential, but through the REAL fixture loader (VERDICT r8
    * #6): the combos above feed self-generated frames, which is exactly
    * how the r8 encoding break (timestamp[us] read as TIMESTAMP_NTZ)
    * stayed invisible to every randomized suite. Here the Spark side
    * reads /root/testdata via [[TSModel.samplesPruned]] (the NTZ
    * dispatch + series pushdown path) and DuckDB reads the SAME parquet
    * file natively — so the two engines must agree on the ms conversion
    * itself, not just the aggregation algebra. */
  test("randomized combos over the fixture loader match DuckDB reading the same parquet") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")
    import graft.ts.TSModel

    val fixtureCte =
      s"""WITH events AS (SELECT * FROM '$sf/events.parquet'),
         |samples AS (
         |  SELECT event_type || '_' || CAST(user_id AS VARCHAR) AS series,
         |         epoch_ms(ts) AS ts, value
         |  FROM events
         |)""".stripMargin
    val series = TSModel.labels(spark, sf).select("series")
      .orderBy("series").limit(4).collect().map(_.getString(0)).toSeq
    assert(series.nonEmpty, "fixture has no series")

    val JAN = 1704067200000L
    val rnd = new Random(20260814L)
    case class Combo(name: String, key: String, args: RangeArgs)
    val combos = (0 until 24).map { iter =>
      val raw = iter % 8 == 0
      val dur = Seq(3600000L, 6L * 3600000L, 86400000L)(rnd.nextInt(3))
      val fromDay = rnd.nextInt(20)
      val toDay = fromDay + rnd.nextInt(31 - fromDay)
      val args = RangeArgs(
        from = if (rnd.nextBoolean()) Some(JAN + fromDay * 86400000L) else None,
        to = if (rnd.nextBoolean()) Some(JAN + toDay * 86400000L) else None,
        aggs = if (raw) Nil else rnd.shuffle(Aggs.names).take(1 + rnd.nextInt(2)),
        bucketMs = if (raw) 0L else dur,
        alignMs = if (raw) 0L else Seq(0L, 1800000L, -3600000L)(rnd.nextInt(3)),
        bucketTs = if (raw) "-" else Seq("-", "~", "+")(rnd.nextInt(3)),
        empty = !raw && rnd.nextInt(2) == 0,
        filterByValue = if (rnd.nextInt(4) == 0) Some((-1000.0, 1000.0)) else None,
        count = if (rnd.nextInt(5) == 0) Some(1 + rnd.nextInt(10)) else None,
        reverse = rnd.nextBoolean())
      Combo(f"fix_$iter%03d", series(rnd.nextInt(series.size)), args)
    }

    val dir = java.nio.file.Files.createTempDirectory("rand_oracle_fix")
    val sqlJson = combos.map { c =>
      s"${jq(c.name)}: ${jq(RangeQuery.rangeSqlFull(
        c.args, Some(s"series = '${c.key}'"), fixtureCte))}"
    }.mkString("{", ",", "}")
    val in = dir.resolve("sqls.json"); val out = dir.resolve("rows.tsv")
    java.nio.file.Files.writeString(in, sqlJson)
    import scala.sys.process._
    val log = new StringBuilder
    val rc = Seq("python3", py.toAbsolutePath.toString, in.toString, out.toString)
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, s"oracle batch runner failed (rc=$rc):\n$log")

    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(out)).asScala.toSeq
    val errs = lines.filter(_.split("\t", -1).lift(1).contains("__ERROR__"))
    assert(errs.isEmpty, s"DuckDB rejected generated oracle SQL:\n${errs.mkString("\n")}")
    val expected = lines.filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
      .map(_.split("\t", -1)).groupBy(_.head)
      .map { case (name, rows) =>
        name -> rows.map { f =>
          (f(2).toLong, f.drop(3).toSeq.map {
            case ""    => None
            case "NaN" => Some(Double.NaN)
            case s     => Some(s.toDouble)
          })
        }.sortBy(_._1).toSeq
      }

    var checkedRows = 0
    combos.foreach { c =>
      // series pruning at the loader (the pushdown path under test);
      // time/value filters stay inside range() so EMPTY-lifetime and
      // LOCF-seed semantics see the full series history, like the oracle
      val df = TSModel.samplesPruned(spark, sf, seriesKeys = Seq(c.key))
      val nVals = if (c.args.aggs.isEmpty) 1 else c.args.aggs.size
      val got = RangeQuery.range(df, c.args).collect().map { r =>
        (r.getLong(1), (0 until nVals).map { i =>
          if (r.isNullAt(i + 2)) None
          else r.get(i + 2) match {
            case l: java.lang.Long   => Some(l.toDouble)
            case d: java.lang.Double => Some(d.doubleValue)
          }
        })
      }.sortBy(_._1).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name} key=${c.key}\nargs=${c.args}\ngot=$got\nexp=$exp"
      assert(got.map(_._1) == exp.map(_._1), s"bucket timestamps differ: $ctx")
      got.zip(exp).foreach { case ((ts, gv), (_, ev)) =>
        gv.zip(ev).zipWithIndex.foreach { case ((g, e), i) =>
          assert(closeEnough(g, e), s"ts=$ts col=$i: got $g expected $e\n$ctx")
        }
      }
      checkedRows += got.size
    }
    assert(checkedRows > 100, s"only $checkedRows rows compared — generator too weak")
  }
}
