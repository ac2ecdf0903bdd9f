package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.RangeQuery
import graft.ts.RangeQuery.RangeArgs
import scala.util.Random

/** Randomized differential for TWA (with and without EMPTY) against an
  * independent in-memory model of the reference's trapezoid/boundary
  * semantics (reference: src/compaction.c:302-459,
  * src/filter_iterator.c:307-386). */
class RandomizedTwaSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def bkt(ts: Long, dur: Long, align: Long): Long =
    ts - java.lang.Math.floorMod(ts - align, dur)

  /** Model over the value-filtered, NaN-free, ts-sorted series. */
  private def model(
      series: Seq[(Long, Double)], dur: Long, align: Long,
      from: Option[Long], to: Option[Long], empty: Boolean): Seq[(Long, Double)] = {
    val s = series.sortBy(_._1)
    val inRange = s.filter(r => from.forall(r._1 >= _) && to.forall(r._1 <= _))
    def ta(b: Long) = from.map(f => math.max(b, f)).getOrElse(b).toDouble
    def tb(b: Long) = to.map(t => math.min(b + dur, t + 1)).getOrElse(b + dur).toDouble

    val nonEmpty = inRange.groupBy(r => bkt(r._1, dur, align)).toSeq.map { case (b, rows0) =>
      val rows = rows0.sortBy(_._1)
      val first = rows.head; val last = rows.last
      val prev = s.takeWhile(_._1 < first._1).lastOption
      val next = s.dropWhile(_._1 <= last._1).headOption
      val prevOut = prev.exists(p => bkt(p._1, dur, align) < b || from.exists(p._1 < _))
      val nextOut = next.exists(n => bkt(n._1, dur, align) > b || to.exists(n._1 > _))
      var res = rows.sliding(2).collect { case Seq((t1, v1), (t2, v2)) =>
        (v1 + v2) * (t2 - t1) / 2.0
      }.sum
      val firstTs = if (prevOut) {
        val p = prev.get
        val vab = p._2 + (ta(b) - p._1) * (first._2 - p._2) / (first._1 - p._1)
        res += (vab + first._2) * (first._1 - ta(b)) / 2.0
        ta(b)
      } else first._1.toDouble
      val lastTs = if (nextOut) {
        val n = next.get
        val vab = last._2 + (tb(b) - last._1) * (n._2 - last._2) / (n._1 - last._1)
        res += (last._2 + vab) * (tb(b) - last._1) / 2.0
        tb(b)
      } else last._1.toDouble
      val v = if (lastTs == firstTs) last._2 else res / (lastTs - firstTs)
      (b, v)
    }

    val out = if (!empty || s.isEmpty) nonEmpty else {
      val lo0 = bkt(s.map(_._1).min, dur, align)
      val hi0 = bkt(s.map(_._1).max, dur, align)
      val lo = from.map(f => math.max(lo0, bkt(f, dur, align))).getOrElse(lo0)
      val hi = to.map(t => math.min(hi0, bkt(t, dur, align))).getOrElse(hi0)
      val byB = nonEmpty.toMap
      if (lo > hi) Seq.empty
      else (lo to hi by dur).map { b =>
        byB.get(b) match {
          case Some(v) => (b, v)
          case None =>
            val bef = s.filter(_._1 < ta(b)).last
            val aft = s.find(_._1 > ta(b)).get
            val slope = (aft._2 - bef._2) / (aft._1 - bef._1)
            val va = bef._2 + (ta(b) - bef._1) * slope
            val vb = bef._2 + (tb(b) - bef._1) * slope
            (b, (va + vb) / 2.0)
        }
      }
    }
    out.sortBy(_._1)
  }

  test("randomized differential: twa matches the reference model") {
    val rnd = new Random(7)
    var checked = 0
    for (iter <- 0 until 50) {
      val n = 2 + rnd.nextInt(20)
      val series = (0 until n).map { _ =>
        (rnd.nextInt(1000).toLong, rnd.nextInt(400) / 10.0 - 20.0)
      }.groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
      val dur = Seq(7L, 10L, 50L, 100L)(rnd.nextInt(4))
      val align = Seq(0L, 3L, -5L)(rnd.nextInt(3))
      val from0 = if (rnd.nextBoolean()) Some(rnd.nextInt(600).toLong) else None
      val to0 = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      // an inverted range is a parse error in the engine (reference
      // parity) — keep the generator on the valid-input side
      val (from, to) = (from0, to0) match {
        case (Some(f), Some(t)) if f > t => (Some(t), Some(f))
        case other                       => other
      }
      val empty = rnd.nextBoolean()
      val args = RangeArgs(from = from, to = to, aggs = Seq("twa"),
        bucketMs = dur, alignMs = align, empty = empty)
      val df = series.map { case (t, v) => ("k", t, v) }.toDF("series", "ts", "value")
      val got = RangeQuery.range(df, args)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
      val exp = model(series, dur, align, from, to, empty)
      assert(got.map(_._1) == exp.map(_._1),
        s"iter $iter buckets differ\nargs=$args\nseries=$series\ngot=$got\nexp=$exp")
      got.zip(exp).foreach { case ((b, g), (_, e)) =>
        assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"iter $iter bucket $b: got $g expected $e\nargs=$args\nseries=$series")
      }
      checked += got.size
    }
    assert(checked > 100)
  }
}
