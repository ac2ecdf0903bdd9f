package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PQ
import scala.util.Random

/** Randomized DuckDB differential for the product-quantization
  * pipeline: random integer-valued corpora (integer components make
  * every Lloyd mean an exact rational and every assignment score
  * bit-identical across engines — the LTTB determinism trick), random
  * (m, ksub, iters), codes compared EXACTLY and ADC rankings
  * (query_id, rank, neighbor_id) exactly with adist under tolerance. */
class RandomizedPQOracleSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("randomized PQ codes + ADC rankings match DuckDB (25 combos)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")
    val rnd = new Random(20260814L)
    val dim = 8

    case class Combo(
        name: String, vecs: Seq[(Long, Seq[Double])],
        m: Int, ksub: Int, iters: Int, queryIds: Seq[Long], k: Int,
        adc: Boolean) {
      def corpusSql: String =
        "SELECT * FROM (VALUES " + vecs.map { case (id, v) =>
          s"($id, [${v.mkString(", ")}]::DOUBLE[])"
        }.mkString(", ") + ") t(vec_id, v)"
      def sql: String =
        if (adc) PQ.adcTopKSql(queryIds, k, m, dim / m, ksub, iters, corpusSql)
        else PQ.codesSql(m, dim / m, ksub, iters, corpusSql)
    }

    val combos = (0 until 25).map { iter =>
      val m = Seq(2, 4)(rnd.nextInt(2))
      val ksub = Seq(2, 3, 4)(rnd.nextInt(3))
      val n = ksub + 2 + rnd.nextInt(30)
      // sparse id space (gaps) so id==row-position bugs can't hide
      val ids = rnd.shuffle((0L until n * 3L).toList).take(n).sorted
      val vecs = ids.map { id =>
        (id, Seq.fill(dim)((rnd.nextInt(17) - 8).toDouble))
      }
      val queryIds = rnd.shuffle(ids).take(1 + rnd.nextInt(2))
      Combo(f"pq_$iter%02d", vecs, m, ksub, 1 + rnd.nextInt(2),
        queryIds, 1 + rnd.nextInt(4), adc = iter % 2 == 0)
    }

    val dir = java.nio.file.Files.createTempDirectory("rand_pq_oracle")
    val sqlJson = combos.map(c => s"${jq(c.name)}: ${jq(c.sql)}").mkString("{", ",", "}")
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
    assert(errs.isEmpty, s"DuckDB rejected generated SQL:\n${errs.mkString("\n")}")
    val expected: Map[String, Seq[Array[String]]] = lines
      .filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
      .map(_.split("\t", -1)).groupBy(_.head)
      .view.mapValues(_.map(_.drop(1)).toSeq).toMap

    var checked = 0
    combos.foreach { c =>
      val df = c.vecs.toDF("vec_id", "embedding")
      def ctx = s"${c.name} m=${c.m} ksub=${c.ksub} iters=${c.iters} " +
        s"q=${c.queryIds} k=${c.k}\nsql=\n${c.sql}"
      if (c.adc) {
        val got = PQ.adcTopK(df, c.queryIds, c.k, c.m, c.ksub, c.iters)
          .collect()
          .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
          .sortBy(t => (t._1, t._2))
        val exp = expected.getOrElse(c.name, Nil)
          .map(f => (f(0).toLong, f(3).toInt, f(1).toLong, f(2).toDouble))
          .sortBy(t => (t._1, t._2))
        assert(got.length == exp.length, s"row count: ${got.length} vs ${exp.length}\n$ctx")
        got.zip(exp).foreach { case (g, e) =>
          assert((g._1, g._2, g._3) == ((e._1, e._2, e._3)),
            s"ranking differs: $g vs $e\n$ctx")
          assert(math.abs(g._4 - e._4) <= 1e-9 * math.max(1.0, math.abs(e._4)),
            s"adist differs: $g vs $e\n$ctx")
        }
      } else {
        val got = PQ.codes(df, c.m, c.ksub, c.iters).collect()
          .map(r => r.toSeq.map(_.toString)).sortBy(_.head.toLong).toSeq
        val exp = expected.getOrElse(c.name, Nil)
          .map(_.toSeq).sortBy(_.head.toLong)
        assert(got == exp, s"codes differ\ngot=$got\nexp=$exp\n$ctx")
      }
      checked += expected.getOrElse(c.name, Nil).size
    }
    assert(checked > 100, s"only $checked rows compared — generator too weak")
  }
}
