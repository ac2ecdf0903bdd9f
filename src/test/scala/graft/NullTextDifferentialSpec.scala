package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Randomized engine/DuckDB differential for the classifier surfaces on
 * the ONE input class the fixtures never carry: NULL-text documents
 * (ADVICE r17 / VERDICT r17 "What's wrong" #3). The engine's no-union
 * feature build drops a NULL-text doc entirely (explode of a NULL
 * split yields no rows); the oracle SQL's bias-row union and doc count
 * are restricted to `text IS NOT NULL` to match. This spec proves the
 * agreement by replaying [[graft.pipeline.QualityClassifier.trainSql]]
 * and [[graft.pipeline.QualityClassifier.scoreWithWeightsSql]] in an
 * actual DuckDB process over randomized corpora that mix NULL, empty,
 * whitespace-only and normal text, and comparing against the engine
 * row-for-row at the driver gate's round-6 tolerance.
 */
class NullTextDifferentialSpec extends AnyFunSuite {
  import SparkTest._
  import graft.pipeline.QualityClassifier

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def sqlLit(t: Option[String]): String = t match {
    case None    => "NULL::VARCHAR"
    case Some(s) => "'" + s.replace("'", "''") + "'"
  }

  private def runDuck(sqls: Map[String, String]): Map[String, Seq[Array[String]]] = {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")
    val dir = java.nio.file.Files.createTempDirectory("nulltext_oracle")
    val in = dir.resolve("sqls.json"); val out = dir.resolve("rows.tsv")
    java.nio.file.Files.writeString(in,
      sqls.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}"))
    import scala.sys.process._
    val log = new StringBuilder
    val rc = Seq("python3", py.toAbsolutePath.toString, in.toString, out.toString)
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(rc == 0, s"oracle batch runner failed (rc=$rc):\n$log")
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(out)).asScala.toSeq
    val errs = lines.filter(_.split("\t", -1).lift(1).contains("__ERROR__"))
    assert(errs.isEmpty, s"DuckDB rejected oracle SQL:\n${errs.mkString("\n")}")
    lines.filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
      .map(_.split("\t", -1)).groupBy(_.head)
      .map { case (k, rows) => k -> rows.map(_.drop(1)) }
  }

  /** Same keys, values within the driver gate's round-6 magnitude. */
  private def mapsClose(a: Map[Long, Double], b: Map[Long, Double]): Boolean =
    a.keySet == b.keySet && a.forall { case (k, v) => math.abs(v - b(k)) <= 1e-6 }

  test("NULL-text documents: engine and DuckDB agree on weights and scores") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    var nullDocsSeen = 0
    (0 until 5).foreach { iter =>
      val docs = (0L until 12L).map { id =>
        val text: Option[String] = rnd.nextInt(4) match {
          case 0 if id % 3 == 0 => None                      // the class under test
          case 1 if id % 4 == 1 => Some("")                  // empty still tokenizes
          case 2 if id % 5 == 2 => Some("   ")               // whitespace-only too
          case _ => Some(Seq.fill(1 + rnd.nextInt(6))(
            words(rnd.nextInt(words.size))).mkString(" "))
        }
        (id, text, if (rnd.nextBoolean()) "en" else "fr")
      }
      val df = docs.map { case (id, t, l) => (id, t.orNull, l) }
        .toDF("doc_id", "text", "lang")
      val cte = "documents(doc_id, text, lang) AS (VALUES " +
        docs.map { case (id, t, l) =>
          s"(${id}::BIGINT, ${sqlLit(t)}, '$l')" }.mkString(", ") + ")"
      def splice(oracle: String): String =
        oracle.replaceFirst("^WITH ", s"WITH $cte, ")

      // surface 1: trained weights
      val w = QualityClassifier.trainedWeights(
        df, labelPred = col("lang") === "en", nBuckets = 8, iters = 2, lr = 4.0)
      // surface 2: serving scores with those weights
      val engineS = QualityClassifier.scoreWithWeights(df, w, nBuckets = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      val duck = runDuck(Map(
        s"w_$iter" -> splice(QualityClassifier.trainSql(
          "lang = 'en'", nBuckets = 8, iters = 2, lr = 4.0)),
        s"s_$iter" -> splice(QualityClassifier.scoreWithWeightsSql(w, nBuckets = 8))))
      val duckW = duck(s"w_$iter")
        .map(f => f(0).toLong -> f(1).toDouble).toMap
      val duckS = duck(s"s_$iter")
        .map(f => f(0).toLong -> f(1).toDouble).toMap

      assert(mapsClose(duckW, w), s"iter $iter: weights diverge on $docs")
      assert(mapsClose(duckS, engineS), s"iter $iter: scores diverge on $docs")
      // the NULL-text docs are absent from BOTH engines' score rows
      val nullIds = docs.collect { case (id, None, _) => id }.toSet
      nullDocsSeen += nullIds.size
      assert(nullIds.intersect(engineS.keySet).isEmpty)
      assert(nullIds.intersect(duckS.keySet).isEmpty)
    }
    assert(nullDocsSeen > 0, "seed never produced a NULL-text doc — test is vacuous")
  }
}
