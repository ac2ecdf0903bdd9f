package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Clustering, Dedup, Similarity, Text}
import graft.ts.{Sliding, TSModel}

/** Round-9 additions: boilerplate-segment removal, distributed Lloyd
  * k-means, sliding-window TS aggregation. Each gets a driver-side
  * brute-force differential on the real fixture plus planted-input
  * behavioral checks. */
class ClusteringBoilerplateSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private lazy val docs = Text.loadDocuments(spark, sf)
  private lazy val embs = Similarity.loadEmbeddings(spark, sf)

  // ---------------- boilerplate ----------------

  test("planted boilerplate segment is detected and stripped everywhere") {
    // plant the same 3-word header into 20 docs — PREpended, so it
    // always occupies segment 0 exactly (segments are w-aligned from 0)
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") < 20, concat(lit("zqx wvy kjt "), col("text")))
        .otherwise(col("text")).as("text"))
    val bp = Dedup.boilerplateSegments(planted, w = 3, minDocs = 5)
      .filter(col("seg") === "zqx wvy kjt").collect()
    assert(bp.length == 1 && bp.head.getLong(1) == 20, bp.mkString)
    val cleaned = Dedup.removeBoilerplate(planted, w = 3, minDocs = 5)
    val leftovers = cleaned.filter(col("clean_text").contains("zqx")).count()
    assert(leftovers == 0)
    // planted docs lose exactly the header segment (their remaining
    // token stream re-segments identically to a 3-token shift)
    assert(cleaned.filter(col("doc_id") < 20 && col("n_dropped") === 0).count() == 0)
  }

  test("removeBoilerplate preserves order and accounts every segment") {
    val out = Dedup.removeBoilerplate(docs, w = 3, minDocs = 5)
    val totals = out.select(sum(col("n_kept") + col("n_dropped"))).as[Long].head()
    val expected = docs.select(
      sum(expr("(size(split(lower(trim(text)), '\\\\s+')) - 1) DIV 3 + 1")))
      .as[Long].head()
    assert(totals == expected)
    // a doc with no boilerplate round-trips verbatim (modulo lowercase)
    val bpSegs = Dedup.boilerplateSegments(docs, 3, 5).select("seg")
      .as[String].collect().toSet
    val untouched = docs.limit(50).collect().filter { r =>
      val toks = r.getAs[String]("text").trim.toLowerCase.split("\\s+")
      toks.grouped(3).map(_.mkString(" ")).forall(s => !bpSegs.contains(s))
    }
    assert(untouched.nonEmpty)
    val cleanMap = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    untouched.foreach { r =>
      val want = r.getAs[String]("text").trim.toLowerCase.split("\\s+").mkString(" ")
      assert(cleanMap(r.getAs[Long]("doc_id")) == want)
    }
  }

  // ---------------- k-means ----------------

  private def localKmeans(
      vecs: Array[(Long, Array[Double])], k: Int, iters: Int): Map[Long, Int] = {
    def norm(v: Array[Double]): Array[Double] = {
      val n = math.max(math.sqrt(v.map(x => x * x).sum), 1e-12)
      v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    var cents = vecs.sortBy(_._1).take(k).map(v => norm(v._2))
    def assign(): Map[Long, Int] = vecs.map { case (id, v) =>
      id -> cents.zipWithIndex.maxBy { case (c, i) => (dot(v, c), -i) }._2
    }.toMap
    for (_ <- 0 until iters) {
      val a = assign()
      val next = cents.clone()
      for (c <- cents.indices) {
        val members = vecs.filter(v => a(v._1) == c).map(_._2)
        if (members.nonEmpty) {
          val dim = members.head.length
          val mean = Array.tabulate(dim)(d => members.map(_(d)).sum / members.length)
          next(c) = norm(mean)
        }
      }
      cents = next
    }
    assign()
  }

  test("distributed Lloyd matches the driver-side brute force exactly") {
    val vecs = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val want = localKmeans(vecs, k = 10, iters = 2)
    val got = Clustering.kmeansAssign(embs, k = 10, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
  }

  test("k-means is deterministic and occupancy sums to the corpus") {
    val a = Clustering.kmeansAssign(embs).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Clustering.kmeansAssign(embs).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
    val sizes = Clustering.kmeansSizes(embs).collect()
    assert(sizes.map(_.getLong(1)).sum == embs.count())
    assert(sizes.length == 10)
  }

  // ---------------- sliding windows ----------------

  test("sliding windows: brute-force check on one series") {
    val win = 86400000L
    val hop = win / 4
    val all = TSModel.samples(spark, sf).filter(col("series") === "click_7")
      .select("ts", "value").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.nonEmpty)
    val got = Sliding.slidingRange(
      TSModel.samples(spark, sf).filter(col("series") === "click_7"),
      "avg", win, hop)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // expected: every hop-grid start with >= 1 sample in [w, w+win)
    val starts = all.flatMap { case (ts, _) =>
      val wmax = graft.ts.TSModel.bucketStartLong(ts, hop)
      (0 until (win / hop).toInt).map(i => wmax - i * hop)
    }.distinct
    val want = starts.flatMap { w =>
      val in = all.filter { case (ts, _) => ts >= w && ts < w + win }
      if (in.isEmpty) None else Some(w -> in.map(_._2).sum / in.length)
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (w, v) => assert(math.abs(got(w) - v) < 1e-9, s"window $w") }
  }

  test("sliding count: every sample lands in exactly window/hop windows") {
    val win = 86400000L
    val hop = win / 4
    val samples = TSModel.samples(spark, sf)
    val total = Sliding.slidingRange(samples, "count", win, hop)
      .select(sum("count_value")).as[Long].head()
    assert(total == samples.count() * (win / hop))
  }
}
