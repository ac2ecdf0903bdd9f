package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.AsOf
import scala.util.Random

/** As-of join differentials: (1) a driver-side brute-force model on
  * random data; (2) DuckDB's NATIVE ASOF LEFT JOIN via the shared
  * batch runner — a genuinely independent algorithm for the same
  * contract. Plus the bucket-aligned Pearson correlation vs a direct
  * formula. */
class AsOfSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def dLit(d: Double): String = s"(${d})::DOUBLE"

  private def valuesCte(samples: Seq[(String, Long, Double)]): String =
    "WITH samples(series, ts, value) AS (VALUES " +
      samples.map { case (s, t, v) => s"('$s', ${t}::BIGINT, ${dLit(v)})" }
        .mkString(", ") + ")"

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def genSamples(rnd: Random): Seq[(String, Long, Double)] =
    (0 until 1 + rnd.nextInt(40)).map { _ =>
      (s"s${rnd.nextInt(2)}", rnd.nextInt(300).toLong, rnd.nextInt(200) / 10.0 - 10.0)
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

  /** Brute-force model: latest right sample with ts <= l.ts (+tol). */
  private def model(
      samples: Seq[(String, Long, Double)], tol: Option[Long],
      from: Option[Long], to: Option[Long]): Seq[(Long, Double, Option[Double])] = {
    val inRange = samples.filter { case (_, t, _) =>
      from.forall(t >= _) && to.forall(t <= _) }
    val left = inRange.filter(_._1 == "s0").sortBy(_._2)
    val right = inRange.filter(_._1 == "s1").sortBy(_._2)
    left.map { case (_, lt, lv) =>
      val m = right.takeWhile(_._2 <= lt).lastOption
        .filter { case (_, rt, _) => tol.forall(t => rt >= lt - t) }
      (lt, lv, m.map(_._3))
    }
  }

  test("asof join matches the brute-force model on 60 random cases") {
    val rnd = new Random(20260814L)
    for (_ <- 0 until 60) {
      val samples = genSamples(rnd)
      val tol = if (rnd.nextBoolean()) Some(10L + rnd.nextInt(50)) else None
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong) else None
      val to = if (rnd.nextBoolean()) Some(100L + rnd.nextInt(250)) else None
      val df = samples.toDF("series", "ts", "value")
      val got = AsOf.asofJoin(df, "s0", "s1", tol, from, to)
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .sortBy(_._1).toSeq
      assert(got == model(samples, tol, from, to), s"samples=$samples tol=$tol from=$from to=$to")
    }
  }

  test("asof join matches DuckDB's native ASOF LEFT JOIN (30 combos)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")
    val rnd = new Random(99L)
    case class Combo(name: String, samples: Seq[(String, Long, Double)],
        tol: Option[Long], from: Option[Long], to: Option[Long])
    val combos = (0 until 30).map { i =>
      Combo(f"asof_$i%03d", genSamples(rnd),
        if (rnd.nextBoolean()) Some(10L + rnd.nextInt(50)) else None,
        if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong) else None,
        if (rnd.nextBoolean()) Some(100L + rnd.nextInt(250)) else None)
    }
    val dir = java.nio.file.Files.createTempDirectory("asof_oracle")
    val sqlJson = combos.map { c =>
      s"${jq(c.name)}: ${jq(AsOf.asofJoinSql("s0", "s1", c.tol, c.from, c.to, valuesCte(c.samples)))}"
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
    assert(!lines.exists(_.contains("__ERROR__")), lines.filter(_.contains("__ERROR__")).mkString("\n"))
    val expected = lines.filterNot(_.contains("__DONE__"))
      .map(_.split("\t", -1)).groupBy(_.head)
      .view.mapValues(_.map { f =>
        (f(1).toLong, f(2).toDouble, if (f(3).isEmpty) None else Some(f(3).toDouble))
      }.sortBy(_._1).toSeq).toMap
    combos.foreach { c =>
      val df = c.samples.toDF("series", "ts", "value")
      val got = AsOf.asofJoin(df, "s0", "s1", c.tol, c.from, c.to)
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .sortBy(_._1).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      assert(got.size == exp.size, s"${c.name}: ${got.size} vs ${exp.size}")
      got.zip(exp).foreach { case ((gt, gv, ga), (et, ev, ea)) =>
        assert(gt == et && math.abs(gv - ev) < 1e-9, s"${c.name} ts=$gt")
        assert((ga, ea) match {
          case (None, None) => true
          case (Some(x), Some(y)) => math.abs(x - y) < 1e-9
          case _ => false
        }, s"${c.name} ts=$gt asof $ga vs $ea")
      }
    }
  }

  test("pearson correlation matches the closed-form on planted data") {
    // two series sampled on the same daily grid: b = 2a + noise-free
    // linear map -> corr exactly 1; anti-correlated map -> -1
    val T0 = 1704067200000L; val DAY = 86400000L
    val a = (0 until 30).map(i => ("s0", T0 + i * DAY + 1000L, i.toDouble))
    val b = (0 until 30).map(i => ("s1", T0 + i * DAY + 2000L, 2.0 * i + 5))
    val c = (0 until 30).map(i => ("s2", T0 + i * DAY + 3000L, -3.0 * i))
    val df = (a ++ b ++ c).toDF("series", "ts", "value")
    val pos = AsOf.pearson(df, "s0", "s1", DAY).collect().head.getDouble(0)
    val neg = AsOf.pearson(df, "s0", "s2", DAY).collect().head.getDouble(0)
    assert(math.abs(pos - 1.0) < 1e-12 && math.abs(neg + 1.0) < 1e-12, s"$pos $neg")
  }
}
