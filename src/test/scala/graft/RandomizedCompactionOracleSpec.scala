package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Aggs, Compaction, TSModel, Twa}
import scala.util.Random

/**
 * Randomized compaction differential vs the DUCKDB oracle: random rule
 * mixes (all 15 aggregators incl. TWA) × bucket/align geometry ×
 * flushed-vs-LATEST over multi-series NaN-bearing fixtures, checking
 * [[Compaction.materialize]] and the single-scan
 * [[Compaction.materializeAll]] fan-out row-for-row against generated
 * SQL executed by DuckDB. The hand-picked compaction queries pin a few
 * rule shapes; this sweeps the cross-product (reference semantics:
 * bucket flush on newer-bucket open src/module.c:915-984, TWA boundary
 * carry src/compaction.c:302-459, dest naming tsdb.c:1119-1133).
 */
class RandomizedCompactionOracleSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def dLit(d: Double): String =
    if (d.isNaN) "'NaN'::DOUBLE" else d.toString

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

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

  /** One rule's dest rows as SQL: aggregate per bucket (keeping
    * NaN-only buckets as NULL values, like Aggs.expr), flag each
    * series' max bucket as in-flight, drop it unless LATEST. */
  private def ruleSql(r: Compaction.Rule, cte: String, latest: Boolean): String = {
    val suffix = sqlLit(r.destSuffix)
    val flushWhere = if (latest) "" else "\nWHERE bucket < maxb"
    if (r.agg == "twa") {
      val inner = Twa.sql(r.bucketMs, r.alignMs, None, None, None, None, cte)
      s"""SELECT series || $suffix AS series, bucket AS ts, CAST(twa_value AS DOUBLE) AS value
         |FROM (SELECT *, max(bucket) OVER (PARTITION BY series) AS maxb FROM ($inner))$flushWhere""".stripMargin
    } else {
      val b = TSModel.bucketStartSql("ts", r.bucketMs, r.alignMs)
      val c = Aggs.colName(r.agg)
      s"""SELECT series || $suffix AS series, bucket AS ts, CAST($c AS DOUBLE) AS value
         |FROM (SELECT *, max(bucket) OVER (PARTITION BY series) AS maxb FROM (
         |  $cte SELECT series, $b AS bucket, ${Aggs.sql(r.agg)} FROM samples GROUP BY 1, 2))$flushWhere""".stripMargin
    }
  }

  test("randomized rule mixes match the DuckDB oracle (materialize + materializeAll)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")

    val rnd = new Random(20260813L)
    val aggPool = Aggs.names :+ "twa"
    case class Combo(name: String, samples: Seq[(String, Long, Double)],
                     rules: Seq[Compaction.Rule], latest: Boolean)
    val combos = (0 until 60).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      val samples = (0 until nSeries).flatMap { si =>
        val n = rnd.nextInt(19)
        (0 until n).map { _ =>
          val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(400) / 10.0 - 20.0
          (rnd.nextInt(1000).toLong, v)
        }.groupBy(_._1).map { case (t, vs) => (s"s$si", t, vs.head._2) }
      }
      def randRule() = Compaction.Rule(
        aggPool(rnd.nextInt(aggPool.size)),
        Seq(7L, 10L, 50L, 100L)(rnd.nextInt(4)),
        Seq(0L, 3L, -5L)(rnd.nextInt(3)))
      val (rules, latest) = iter % 3 match {
        case 2 => // multi-rule single-scan fan-out (flushed only)
          val target = 2 + rnd.nextInt(2)
          val rs = Iterator.continually(randRule())
            .scanLeft(Seq.empty[Compaction.Rule]) { (acc, r) =>
              if (acc.exists(_.destSuffix == r.destSuffix)) acc else acc :+ r
            }.dropWhile(_.size < target).next()
          (rs, false)
        case _ => (Seq(randRule()), rnd.nextBoolean())
      }
      Combo(f"comp_$iter%03d", samples, rules, latest)
    }

    // --- DuckDB side ------------------------------------------------
    val dir = java.nio.file.Files.createTempDirectory("rand_comp")
    val sqlOf = combos.map { c =>
      c.name -> c.rules.map(r => ruleSql(r, valuesCte(c.samples), c.latest))
        .mkString("\nUNION ALL\n")
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
      val res =
        if (c.rules.size == 1) Compaction.materialize(df, c.rules.head, c.latest)
        else Compaction.materializeAll(df, c.rules)
      val got = res.collect().map { r =>
        (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      }.sortBy(r => (r._1, r._2)).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name}\nrules=${c.rules} latest=${c.latest}\n" +
        s"samples=${c.samples.sortBy(r => (r._1, r._2))}\ngot=$got\nexp=$exp\n" +
        s"sql=\n${sqlOf(c.name)}"
      assert(got.map(r => (r._1, r._2)) == exp.map(r => (r._1, r._2)),
        s"(dest, bucket) keys differ: $ctx")
      got.zip(exp).foreach { case ((s, b, g), (_, _, e)) =>
        val ok = (g, e) match {
          case (None, None) => true
          case (Some(x), Some(y)) =>
            (x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-7 * math.max(1.0, math.abs(y))
          case _ => false
        }
        assert(ok, s"dest=$s bucket=$b: got $g expected $e\n$ctx")
      }
      checkedRows += got.size
    }
    assert(checkedRows > 400, s"only $checkedRows rows compared — generator too weak")
  }
}
