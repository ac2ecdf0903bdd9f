package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.ts.Tsbs

/**
 * Randomized TSBS differential: the devops parity queries at RANDOM
 * parameterizations (hosts, metric counts, windows, buckets,
 * thresholds) against DuckDB re-deriving the same devops view from
 * the raw events parquet — the fixed-parameter tsbs_* oracle rows'
 * randomized sweep, same discipline as [[RandomizedOracleSpec]].
 * One python3+duckdb subprocess runs every combo's SQL.
 */
class RandomizedTsbsSpec extends AnyFunSuite {
  import SparkTest._

  private val T0 = 1704067200000L
  private val DAY = 86400000L
  private val HOUR = 3600000L

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c    => c.toString
  } + "\""

  private def closeEnough(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-7 * math.max(1.0, math.abs(y))

  test("randomized devops sweep: single/double/high-cpu/orderby-limit == DuckDB") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")
    val rnd = new Random(20260815L)
    // the tiny smoke SF carries hosts 0..14 (user_id < 150) and the
    // even-index metrics; random combos may also name absent
    // hosts/metrics — both engines must agree on the empty slices too
    sealed trait Kind
    case object Single extends Kind
    case object DoubleG extends Kind
    case object HighCpu extends Kind
    case object Gol extends Kind
    case class Combo(name: String, kind: Kind, hosts: Seq[String],
      nMetrics: Int, from: Long, to: Long, bucket: Long, thr: Double, k: Int)
    val combos = (0 until 28).map { i =>
      val kind = Seq(Single, DoubleG, HighCpu, Gol)(i % 4)
      val nH = 1 + rnd.nextInt(8)
      val hosts = rnd.shuffle((0 to 16).toList).take(nH).map(h => s"host_$h")
      val from = T0 + rnd.nextInt(10) * DAY
      val to = from + (1 + rnd.nextInt(20)) * DAY - 1
      val bucket = Seq(HOUR, DAY, 2 * DAY)(rnd.nextInt(3))
      Combo(f"tsbs_$i%02d", kind, hosts, 1 + rnd.nextInt(Tsbs.Metrics.size),
        from, to, bucket, Seq(50.0, 75.0, 90.0)(rnd.nextInt(3)),
        1 + rnd.nextInt(7))
    }
    def oracle(c: Combo): String = {
      val base = c.kind match {
        case Single if c.hosts.size == 1 =>
          Tsbs.maxAggSql(c.hosts, c.nMetrics, c.from, c.to, c.bucket)
        case Single =>
          Tsbs.groupbyMaxSql(Some(c.hosts), c.nMetrics, Some(c.from), c.to, c.bucket)
        case DoubleG =>
          Tsbs.doubleGroupbySql(c.nMetrics, c.from, c.to, c.bucket)
        case HighCpu =>
          s"""${Tsbs.cpuCte}
             |SELECT series, ts, value FROM samples
             |WHERE metric = 'usage_user' AND ${c.hosts.map(h => s"'$h'")
               .mkString("hostname IN (", ", ", ")")}
             |  AND value >= ${c.thr} AND value <= 100.0
             |  AND ts >= ${c.from} AND ts <= ${c.to}""".stripMargin
        case Gol =>
          s"""${Tsbs.groupbyMaxSql(None, 1, None, c.to, c.bucket)}
             |ORDER BY ts DESC LIMIT ${c.k}""".stripMargin
      }
      base.replace("FROM events",
        s"FROM read_parquet('${SparkTest.sf}/events.parquet')")
    }
    val dir = java.nio.file.Files.createTempDirectory("rand_tsbs")
    val in = dir.resolve("sqls.json"); val out = dir.resolve("rows.tsv")
    java.nio.file.Files.writeString(in,
      combos.map(c => s"${jq(c.name)}: ${jq(oracle(c))}").mkString("{", ",", "}"))
    import scala.sys.process._
    val log = new StringBuilder
    val rc = Seq("python3", py.toAbsolutePath.toString, in.toString, out.toString)
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, s"oracle batch runner failed (rc=$rc):\n$log")
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(out)).asScala.toSeq
    val errs = lines.filter(_.split("\t", -1).lift(1).contains("__ERROR__"))
    assert(errs.isEmpty, s"DuckDB rejected generated SQL:\n${errs.mkString("\n")}")
    val expected = lines.filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
      .map(_.split("\t", -1)).groupBy(_.head)
      .map { case (n, rs) =>
        n -> rs.map(f => (f(1), f(2).toLong, f(3).toDouble))
          .sortBy(r => (r._1, r._2)).toSeq
      }
    var checked = 0
    combos.foreach { c =>
      val df = c.kind match {
        case Single  => Tsbs.singleGroupby(spark, sf, c.nMetrics, c.hosts,
          c.from, c.to, c.bucket)
        case DoubleG => Tsbs.doubleGroupby(spark, sf, c.nMetrics,
          c.from, c.to, c.bucket)
        case HighCpu => Tsbs.highCpu(spark, sf, Some(c.hosts), c.thr, c.from, c.to)
        case Gol     => Tsbs.groupbyOrderbyLimit(spark, sf, c.to, c.bucket, c.k)
      }
      val got = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(r => (r._1, r._2)).toSeq
      val want = expected.getOrElse(c.name, Nil)
      assert(got.size == want.size,
        s"${c.name} ($c): ${got.size} rows vs oracle ${want.size}")
      got.zip(want).foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2 && closeEnough(g._3, w._3),
          s"${c.name} ($c): $g vs $w")
      }
      checked += got.size
    }
    info(s"${combos.size} randomized devops combos, $checked rows compared")
    assert(checked > 100, s"sweep must exercise real rows, got $checked")
  }
}
