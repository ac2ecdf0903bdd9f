package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.StreamDedup
import scala.util.Random

/**
 * Randomized DuckDB differential for the streaming MinHash admission
 * gate: random small-vocab corpora (organic shingle collisions) with
 * PLANTED exact and near copies, replayed through
 * [[StreamDedup.documentsMinhashGateOnce]] at random chunk counts,
 * compared row-for-row against [[StreamDedup.minhashGateSql]] executed
 * in an actual DuckDB process over the same docs inlined as a VALUES
 * CTE — the fixture oracle run at spec time over corpora neither
 * engine's author picked.
 */
class RandomizedGateSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("randomized corpora: stream gate == DuckDB replay (>=20 combos)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")

    val rnd = new Random(20260814L)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    case class Combo(name: String, docs: Seq[(Long, String)], nChunks: Int)
    val combos = (0 until 22).map { iter =>
      val n = 8 + rnd.nextInt(25)
      val base = (0 until n).map { i =>
        val len = 3 + rnd.nextInt(10)
        (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // plant exact copies and one-token-appended near copies of
      // random earlier docs at higher ids
      val planted = (0 until 2 + rnd.nextInt(3)).map { j =>
        val src = base(rnd.nextInt(base.size))._2
        val txt = if (rnd.nextBoolean()) src
                  else src + " " + vocab(rnd.nextInt(vocab.size))
        ((1000 + j).toLong, txt)
      }
      Combo(f"gate_$iter%03d", base ++ planted, 2 + rnd.nextInt(5))
    }

    // DuckDB side: one subprocess over every combo's SQL
    val dir = java.nio.file.Files.createTempDirectory("rand_gate")
    val sqlJson = combos.map { c =>
      val values = c.docs.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
      val cte = s"docs(doc_id, text) AS (SELECT * FROM (VALUES $values))"
      s"${jq(c.name)}: ${jq(StreamDedup.minhashGateSql(docsCte = Some(cte)))}"
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
    assert(errs.isEmpty, s"DuckDB rejected gate SQL:\n${errs.mkString("\n")}")
    val expected: Map[String, Set[(Long, Long, Boolean)]] = lines
      .filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
      .map(_.split("\t", -1)).groupBy(_.head)
      .map { case (name, rows) =>
        name -> rows.map(f =>
          (f(1).toLong, f(2).toLong, f(3) == "True")).toSet
      }

    // Spark side: stage each corpus as documents.parquet, replay
    var interesting = 0
    combos.foreach { c =>
      val stage = java.nio.file.Files
        .createTempDirectory(s"rand_gate_${c.name}_").toString
      c.docs.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$stage/documents.parquet")
      val got = StreamDedup.documentsMinhashGateOnce(spark, stage,
          nChunks = c.nChunks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(got == expected(c.name),
        s"${c.name} (nChunks=${c.nChunks}): stream ${got.size} rows vs " +
          s"oracle ${expected(c.name).size};\n" +
          s"only-stream=${got -- expected(c.name)}\n" +
          s"only-oracle=${expected(c.name) -- got}")
      if (got.exists(!_._3)) interesting += 1
    }
    // the differential is vacuous if nothing ever gets rejected
    assert(interesting >= combos.size / 2,
      s"only $interesting/${combos.size} combos rejected anything")
  }
}
