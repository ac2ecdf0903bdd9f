package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Aggs, Multi, RangeQuery}
import graft.ts.RangeQuery.RangeArgs
import scala.util.Random

/**
 * Randomized multi-series differential vs the DUCKDB oracle, extending
 * RandomizedOracleSpec's single-series cross-product to the MRANGE
 * surface: random LABEL-PREDICATE conjunctions × per-series range
 * options × (plain | GROUPBY label REDUCE reducer) combos, each checked
 * row-for-row against generated SQL executed by an actual DuckDB
 * process. The multi-series path (Multi.filterSeries's broadcast
 * semi-join, mrangeGroupBy's agg-then-reduce with NaN/count fills) has
 * its own logic the single-series stress never touches.
 *
 * The oracle resolves label predicates INDEPENDENTLY — as EXISTS /
 * NOT EXISTS subqueries over a tall (series, name, val) relation —
 * rather than reusing the engine's map-column compilation, so a shared
 * blind spot in predColumn would surface as a mismatch.
 * (Reference semantics: indexer.c:132-170 for the matcher classes,
 * replyGroupedMultiRange module.c:467-526 for per-series-agg-then-
 * reduce order, multiseries_agg_dup_sample_iterator.c:46-59 for
 * all-NaN -> NaN and count-family -> 0 group fills.)
 */
class RandomizedMrangeOracleSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def dLit(d: Double): String =
    if (d.isNaN) "'NaN'::DOUBLE" else d.toString

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

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

  // ---- fixture -> SQL rendering --------------------------------------

  private def samplesValues(samples: Seq[(String, Long, Double)]): String =
    if (samples.isEmpty)
      "(SELECT NULL::VARCHAR, NULL::BIGINT, NULL::DOUBLE WHERE 1=0)"
    else
      "(VALUES " + samples.map { case (s, t, v) =>
        s"(${sqlLit(s)}, ${t}::BIGINT, ${dLit(v)})" }.mkString(", ") + ")"

  private def labelsValues(labels: Seq[(String, String, String)]): String =
    if (labels.isEmpty)
      "(SELECT NULL::VARCHAR, NULL::VARCHAR, NULL::VARCHAR WHERE 1=0)"
    else
      "(VALUES " + labels.map { case (s, n, v) =>
        s"(${sqlLit(s)}, ${sqlLit(n)}, ${sqlLit(v)})" }.mkString(", ") + ")"

  /** One matcher as an EXISTS test over the tall labels relation `u` is
    * the candidate-series row. Engine's NotEq/NotInSet are satisfied by
    * an ABSENT label too (predColumn: isNull || =!=), hence plain
    * NOT EXISTS of the positive match. */
  private def predSql(p: Multi.LabelPred): String = {
    def ex(cond: String) =
      s"EXISTS (SELECT 1 FROM labels l WHERE l.series = u.series AND $cond)"
    p match {
      case Multi.Eq(l, v)        => ex(s"l.name = ${sqlLit(l)} AND l.val = ${sqlLit(v)}")
      case Multi.NotEq(l, v)     => "NOT " + ex(s"l.name = ${sqlLit(l)} AND l.val = ${sqlLit(v)}")
      case Multi.Absent(l)       => "NOT " + ex(s"l.name = ${sqlLit(l)}")
      case Multi.Present(l)      => ex(s"l.name = ${sqlLit(l)}")
      case Multi.InSet(l, vs)    =>
        ex(s"l.name = ${sqlLit(l)} AND l.val IN (${vs.map(sqlLit).mkString(",")})")
      case Multi.NotInSet(l, vs) =>
        "NOT " + ex(s"l.name = ${sqlLit(l)} AND l.val IN (${vs.map(sqlLit).mkString(",")})")
    }
  }

  private case class Fixture(
      serieses: Seq[String],
      samples: Seq[(String, Long, Double)],
      labels: Seq[(String, String, String)]) {
    def cte(preds: Seq[Multi.LabelPred]): String = {
      val sv = serieses.map(s => s"(${sqlLit(s)})").mkString(", ")
      s"""WITH samples(series, ts, value) AS ${samplesValues(samples)},
         |serieses(series) AS (VALUES $sv),
         |labels(series, name, val) AS ${labelsValues(labels)},
         |matched AS (SELECT series FROM serieses u
         |            WHERE ${preds.map(predSql).mkString("\n              AND ")})""".stripMargin
    }
  }

  /** GROUPBY label REDUCE reducer oracle: wrap the per-series SQL (its
    * WITH scope is closed inside the subquery, so the labels relation
    * is repeated inline for the group-label join), reduce each value
    * column per (label value, report ts) with the engine's own DuckDB
    * aggregator rendering, then apply the group fills. */
  private def groupBySql(
      fx: Fixture, preds: Seq[Multi.LabelPred], args: RangeArgs,
      gLabel: String, reducer: String): String = {
    val per = RangeQuery.rangeSqlFull(
      args, Some("series IN (SELECT series FROM matched)"), fx.cte(preds))
    val cols = if (args.aggs.isEmpty) Seq("value") else args.aggs.map(Aggs.colName)
    def reduceExpr(c: String): String =
      Aggs.sql(reducer, v = c, t = "ts").stripSuffix(s" AS ${Aggs.colName(reducer)}")
    val fill = if (Set("count", "countnan", "countall")(reducer)) "0.0" else "'NaN'::DOUBLE"
    val sel = cols.map(c =>
      s"coalesce(CAST(${reduceExpr(c)} AS DOUBLE), $fill) AS $c").mkString(",\n       ")
    // count-family per-series columns are integral; cast before isnan()
    val castCols = cols.map(c => s"CAST($c AS DOUBLE) AS $c").mkString(", ")
    s"""SELECT ${sqlLit(gLabel + "=")} || g.lv AS series, per.ts, $sel
       |FROM (SELECT series, ts, $castCols FROM ($per)) per
       |JOIN (SELECT series, val AS lv FROM ${labelsValues(fx.labels)}
       |        AS l(series, name, val) WHERE name = ${sqlLit(gLabel)}) g
       |  USING (series)
       |GROUP BY g.lv, per.ts""".stripMargin
  }

  // ---- the stress -----------------------------------------------------

  test("randomized MRANGE label-filter/GROUPBY combos match the DuckDB oracle") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")

    val rnd = new Random(20260813L)
    val keyPool = Seq(
      "type" -> Seq("a", "b", "c"),
      "user" -> Seq("u1", "u2", "u3"),
      "dc"   -> Seq("east", "west"))
    val reducers = Aggs.names.filterNot(Set("first", "last", "twa"))

    case class Combo(name: String, fx: Fixture, preds: Seq[Multi.LabelPred],
                     args: RangeArgs, group: Option[(String, String)])

    val combos = (0 until 80).map { iter =>
      val nS = 3 + rnd.nextInt(6)
      val serieses = (0 until nS).map(i => s"s$i")
      val labels = serieses.flatMap { s =>
        keyPool.flatMap { case (k, vs) =>
          if (rnd.nextInt(4) < 3) Some((s, k, vs(rnd.nextInt(vs.size)))) else None
        }
      }
      val samples = serieses.flatMap { s =>
        val n = rnd.nextInt(16)
        (0 until n).map { _ =>
          val ts = rnd.nextInt(1000).toLong
          val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
          (ts, v)
        }.groupBy(_._1).map { case (t, rows) => (s, t, rows.head._2) }
      }
      def randKV(): (String, Seq[String]) = keyPool(rnd.nextInt(keyPool.size))
      val (ik, ivs) = randKV()
      val inclusive: Multi.LabelPred =
        if (rnd.nextBoolean()) Multi.Eq(ik, ivs(rnd.nextInt(ivs.size)))
        else Multi.InSet(ik, rnd.shuffle(ivs :+ "nope").take(1 + rnd.nextInt(3)))
      val extra: Seq[Multi.LabelPred] = if (rnd.nextInt(3) == 0) {
        val (k, vs) = randKV()
        Seq(rnd.nextInt(4) match {
          case 0 => Multi.NotEq(k, vs(rnd.nextInt(vs.size)))
          case 1 => Multi.Present(k)
          case 2 => Multi.Absent(k)
          case _ => Multi.NotInSet(k, rnd.shuffle(vs).take(1 + rnd.nextInt(2)))
        })
      } else Nil
      val preds = inclusive +: extra

      val raw = iter % 10 == 0
      val dur = Seq(7L, 10L, 50L, 100L)(rnd.nextInt(4))
      val args = RangeArgs(
        from = if (rnd.nextBoolean()) Some(rnd.nextInt(500).toLong) else None,
        to = if (rnd.nextBoolean()) Some(500L + rnd.nextInt(600)) else None,
        aggs = if (raw) Nil else rnd.shuffle(Aggs.names).take(1 + rnd.nextInt(3)),
        bucketMs = if (raw) 0L else dur,
        alignMs = if (raw) 0L else Seq(0L, 3L, 10L, -5L)(rnd.nextInt(4)),
        bucketTs = if (raw) "-" else Seq("-", "~", "+")(rnd.nextInt(3)),
        empty = !raw && rnd.nextInt(3) == 0,
        filterByValue = if (rnd.nextInt(4) == 0) Some((-5.0, 5.0)) else None,
        count = if (rnd.nextInt(5) == 0) Some(1 + rnd.nextInt(5)) else None,
        reverse = rnd.nextBoolean())
      val group =
        if (iter % 2 == 1)
          Some((keyPool(rnd.nextInt(keyPool.size))._1, reducers(rnd.nextInt(reducers.size))))
        else None
      Combo(f"mcombo_$iter%03d", Fixture(serieses, samples, labels), preds, args, group)
    }

    // --- DuckDB side: one subprocess over every combo's SQL ----------
    val dir = java.nio.file.Files.createTempDirectory("rand_mrange")
    val sqlOf = combos.map { c =>
      c.name -> (c.group match {
        case Some((gl, red)) => groupBySql(c.fx, c.preds, c.args, gl, red)
        case None => RangeQuery.rangeSqlFull(
          c.args, Some("series IN (SELECT series FROM matched)"), c.fx.cte(c.preds))
      })
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
    val expected: Map[String, Seq[(String, Long, Seq[Option[Double]])]] =
      lines.filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
        .map(_.split("\t", -1)).groupBy(_.head)
        .map { case (name, rows) =>
          name -> rows.map { f =>
            (f(1), f(2).toLong, f.drop(3).toSeq.map {
              case ""    => None
              case "NaN" => Some(Double.NaN)
              case s     => Some(s.toDouble)
            })
          }.sortBy(r => (r._1, r._2)).toSeq
        }

    // --- Spark side + compare ---------------------------------------
    var checkedRows = 0
    combos.foreach { c =>
      val samplesDf = c.fx.samples.toSeq.toDF("series", "ts", "value")
      val labelsDf = c.fx.serieses.map { s =>
        (s, c.fx.labels.collect { case (`s`, k, v) => k -> v }.toMap)
      }.toDF("series", "labels")
      val res = c.group match {
        case Some((gl, red)) =>
          Multi.mrangeGroupBy(samplesDf, labelsDf, c.preds, c.args, gl, red)
        case None => Multi.mrange(samplesDf, labelsDf, c.preds, c.args)
      }
      val nVals = if (c.args.aggs.isEmpty) 1 else c.args.aggs.size
      val got = res.collect().map { r =>
        (r.getString(0), r.getLong(1), (0 until nVals).map { i =>
          if (r.isNullAt(i + 2)) None
          else r.get(i + 2) match {
            case l: java.lang.Long   => Some(l.toDouble)
            case d: java.lang.Double => Some(d.doubleValue)
          }
        })
      }.sortBy(r => (r._1, r._2)).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name}\npreds=${c.preds} group=${c.group}\nargs=${c.args}\n" +
        s"got=$got\nexp=$exp\nsql=\n${sqlOf(c.name)}"
      assert(got.map(r => (r._1, r._2)) == exp.map(r => (r._1, r._2)),
        s"(series, ts) keys differ: $ctx")
      got.zip(exp).foreach { case ((s, ts, gv), (_, _, ev)) =>
        gv.zip(ev).zipWithIndex.foreach { case ((g, e), i) =>
          assert(closeEnough(g, e), s"series=$s ts=$ts col=$i: got $g expected $e\n$ctx")
        }
      }
      checkedRows += got.size
    }
    assert(checkedRows > 400, s"only $checkedRows rows compared — generator too weak")
  }

  /** Same differential through the REAL fixture loader (VERDICT r8 #6
    * extended to the multi-series surface): Spark reads /root/testdata
    * via [[graft.ts.TSModel.samples]]/[[graft.ts.TSModel.labels]] while
    * DuckDB derives samples, the tall labels relation, and the GROUPBY
    * join directly from the SAME parquet file — so label compilation,
    * the broadcast semi-join, agg-then-reduce order AND the loader's ms
    * conversion are all under randomized cross-engine test at once. */
  test("randomized MRANGE/GROUPBY combos over the fixture loader match DuckDB") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")
    import graft.ts.TSModel
    import org.apache.spark.sql.functions.{col, element_at}

    val ev = s"'$sf/events.parquet'"
    val seriesExpr = "event_type || '_' || CAST(user_id AS VARCHAR)"
    def fixtureCte(preds: Seq[Multi.LabelPred]): String =
      s"""WITH samples(series, ts, value) AS (
         |  SELECT $seriesExpr, epoch_ms(ts), value FROM $ev),
         |serieses(series) AS (SELECT DISTINCT series FROM samples),
         |labels(series, name, val) AS (
         |  SELECT DISTINCT $seriesExpr, 'type', event_type FROM $ev
         |  UNION ALL
         |  SELECT DISTINCT $seriesExpr, 'user', CAST(user_id AS VARCHAR) FROM $ev),
         |matched AS (SELECT series FROM serieses u
         |            WHERE ${preds.map(predSql).mkString("\n              AND ")})""".stripMargin
    def groupRelSql(gLabel: String): String = gLabel match {
      case "type" => s"(SELECT DISTINCT $seriesExpr AS series, event_type AS lv FROM $ev)"
      case "user" => s"(SELECT DISTINCT $seriesExpr AS series, CAST(user_id AS VARCHAR) AS lv FROM $ev)"
      case other  => fail(s"no group relation for fixture label $other")
    }
    def groupBySqlFix(preds: Seq[Multi.LabelPred], args: RangeArgs,
        gLabel: String, reducer: String): String = {
      val per = RangeQuery.rangeSqlFull(
        args, Some("series IN (SELECT series FROM matched)"), fixtureCte(preds))
      val cols = if (args.aggs.isEmpty) Seq("value") else args.aggs.map(Aggs.colName)
      def reduceExpr(c: String): String =
        Aggs.sql(reducer, v = c, t = "ts").stripSuffix(s" AS ${Aggs.colName(reducer)}")
      val fill = if (Set("count", "countnan", "countall")(reducer)) "0.0" else "'NaN'::DOUBLE"
      val sel = cols.map(c =>
        s"coalesce(CAST(${reduceExpr(c)} AS DOUBLE), $fill) AS $c").mkString(",\n       ")
      val castCols = cols.map(c => s"CAST($c AS DOUBLE) AS $c").mkString(", ")
      s"""SELECT ${sqlLit(gLabel + "=")} || g.lv AS series, per.ts, $sel
         |FROM (SELECT series, ts, $castCols FROM ($per)) per
         |JOIN ${groupRelSql(gLabel)} g USING (series)
         |GROUP BY g.lv, per.ts""".stripMargin
    }

    // real label values from the loader (the predicates must hit)
    val lbl = TSModel.labels(spark, sf).select(
      element_at(col("labels"), "type").as("t"),
      element_at(col("labels"), "user").as("u"))
    val types = lbl.select("t").distinct().orderBy("t")
      .collect().map(_.getString(0)).toSeq
    val users = lbl.select("u").distinct().orderBy("u").limit(8)
      .collect().map(_.getString(0)).toSeq
    val keyPool = Seq("type" -> types, "user" -> users)
    val reducers = Aggs.names.filterNot(Set("first", "last", "twa"))

    val JAN = 1704067200000L
    val rnd = new Random(20260815L)
    case class Combo(name: String, preds: Seq[Multi.LabelPred],
                     args: RangeArgs, group: Option[(String, String)])
    val combos = (0 until 30).map { iter =>
      def randKV(): (String, Seq[String]) = keyPool(rnd.nextInt(keyPool.size))
      val (ik, ivs) = randKV()
      val inclusive: Multi.LabelPred =
        if (rnd.nextBoolean()) Multi.Eq(ik, ivs(rnd.nextInt(ivs.size)))
        else Multi.InSet(ik, rnd.shuffle(ivs :+ "nope").take(1 + rnd.nextInt(3)))
      val extra: Seq[Multi.LabelPred] = if (rnd.nextInt(3) == 0) {
        val (k, vs) = randKV()
        Seq(rnd.nextInt(4) match {
          case 0 => Multi.NotEq(k, vs(rnd.nextInt(vs.size)))
          case 1 => Multi.Present(k)
          case 2 => Multi.Absent("dc") // label no fixture series carries
          case _ => Multi.NotInSet(k, rnd.shuffle(vs).take(1 + rnd.nextInt(2)))
        })
      } else Nil
      val preds = inclusive +: extra
      val raw = iter % 10 == 0
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
        empty = !raw && rnd.nextInt(3) == 0,
        filterByValue = if (rnd.nextInt(4) == 0) Some((-1000.0, 1000.0)) else None,
        count = if (rnd.nextInt(5) == 0) Some(1 + rnd.nextInt(5)) else None,
        reverse = rnd.nextBoolean())
      val group =
        if (iter % 2 == 1)
          Some((keyPool(rnd.nextInt(keyPool.size))._1, reducers(rnd.nextInt(reducers.size))))
        else None
      Combo(f"fcombo_$iter%03d", preds, args, group)
    }

    val dir = java.nio.file.Files.createTempDirectory("rand_mrange_fix")
    val sqlOf = combos.map { c =>
      c.name -> (c.group match {
        case Some((gl, red)) => groupBySqlFix(c.preds, c.args, gl, red)
        case None => RangeQuery.rangeSqlFull(
          c.args, Some("series IN (SELECT series FROM matched)"), fixtureCte(c.preds))
      })
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
    val expected: Map[String, Seq[(String, Long, Seq[Option[Double]])]] =
      lines.filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
        .map(_.split("\t", -1)).groupBy(_.head)
        .map { case (name, rows) =>
          name -> rows.map { f =>
            (f(1), f(2).toLong, f.drop(3).toSeq.map {
              case ""    => None
              case "NaN" => Some(Double.NaN)
              case s     => Some(s.toDouble)
            })
          }.sortBy(r => (r._1, r._2)).toSeq
        }

    val samplesDf = TSModel.samples(spark, sf)
    val labelsDf = TSModel.labels(spark, sf)
    var checkedRows = 0
    combos.foreach { c =>
      val res = c.group match {
        case Some((gl, red)) =>
          Multi.mrangeGroupBy(samplesDf, labelsDf, c.preds, c.args, gl, red)
        case None => Multi.mrange(samplesDf, labelsDf, c.preds, c.args)
      }
      val nVals = if (c.args.aggs.isEmpty) 1 else c.args.aggs.size
      val got = res.collect().map { r =>
        (r.getString(0), r.getLong(1), (0 until nVals).map { i =>
          if (r.isNullAt(i + 2)) None
          else r.get(i + 2) match {
            case l: java.lang.Long   => Some(l.toDouble)
            case d: java.lang.Double => Some(d.doubleValue)
          }
        })
      }.sortBy(r => (r._1, r._2)).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name}\npreds=${c.preds} group=${c.group}\nargs=${c.args}\n" +
        s"got=${got.take(20)}\nexp=${exp.take(20)}\nsql=\n${sqlOf(c.name)}"
      assert(got.map(r => (r._1, r._2)) == exp.map(r => (r._1, r._2)),
        s"(series, ts) keys differ: $ctx")
      got.zip(exp).foreach { case ((s, ts, gv), (_, _, ev)) =>
        gv.zip(ev).zipWithIndex.foreach { case ((g, e), i) =>
          assert(closeEnough(g, e), s"series=$s ts=$ts col=$i: got $g expected $e\n$ctx")
        }
      }
      checkedRows += got.size
    }
    assert(checkedRows > 200, s"only $checkedRows rows compared — generator too weak")
  }
}
