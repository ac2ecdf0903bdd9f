package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Aggs, RangeQuery}
import graft.ts.RangeQuery.RangeArgs
import scala.util.Random

/**
 * Randomized differential test: RangeQuery vs an independent in-memory
 * model of the reference's range semantics (bucketing, NaN validity,
 * NaN-only-bucket drop, EMPTY lifetime bounds, LOCF seeding,
 * BUCKETTIMESTAMP, reverse, COUNT). Mirrors the reference's own stress
 * approach (reference: tests/flow/test_ts_range_empty_filter_stress.py)
 * with a fixed seed for reproducibility.
 */
class RandomizedRangeSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  // ---- executable model (plain Scala, no Spark) ----------------------

  private def bkt(ts: Long, dur: Long, align: Long): Long =
    ts - java.lang.Math.floorMod(ts - align, dur)

  private def aggModel(agg: String, rows: Seq[(Long, Double)]): Option[Double] = {
    val valid = rows.filter(!_._2.isNaN)
    def vs = valid.map(_._2)
    agg match {
      case "count"    => Some(valid.size.toDouble)
      case "countnan" => Some(rows.count(_._2.isNaN).toDouble)
      case "countall" => Some(rows.size.toDouble)
      case _ if valid.isEmpty => None
      case "min"   => Some(vs.min)
      case "max"   => Some(vs.max)
      case "sum"   => Some(vs.sum)
      case "avg"   => Some(vs.sum / vs.size)
      case "first" => Some(valid.min._2)
      case "last"  => Some(valid.max._2)
      case "range" => Some(vs.max - vs.min)
      case "std.p" | "std.s" | "var.p" | "var.s" =>
        val n = vs.size
        val mean = vs.sum / n
        val m2 = vs.map(v => (v - mean) * (v - mean)).sum
        agg match {
          case "std.p" => Some(math.sqrt(m2 / n))
          case "var.p" => Some(m2 / n)
          case "std.s" => Some(if (n == 1) 0.0 else math.sqrt(m2 / (n - 1)))
          case "var.s" => Some(if (n == 1) 0.0 else m2 / (n - 1))
        }
    }
  }

  /** The model: returns (reported_ts, per-agg Option value) ordered. */
  private def model(samples: Seq[(Long, Double)], args: RangeArgs): Seq[(Long, Seq[Option[Double]])] = {
    var s = samples
    if (args.filterByTs.nonEmpty) s = s.filter(r => args.filterByTs.contains(r._1))
    args.filterByValue.foreach { case (lo, hi) => s = s.filter(r => r._2 >= lo && r._2 <= hi) }
    val inRange = s.filter(r => args.from.forall(r._1 >= _) && args.to.forall(r._1 <= _))
    val dur = args.bucketMs; val al = args.alignMs
    val grouped = inRange.groupBy(r => bkt(r._1, dur, al))
    // NaN-only buckets are dropped unless countnan/countall asked —
    // plain count's validity class is nonNaN (aggCount.isValueValid =
    // nonNaNValueValid), so count does NOT keep such buckets
    val keepAll = args.aggs.exists(a => a == "countnan" || a == "countall")
    val kept = grouped.filter { case (_, rows) =>
      rows.exists(!_._2.isNaN) || keepAll
    }
    var buckets: Seq[(Long, Seq[Option[Double]])] =
      kept.toSeq.map { case (b, rows) => (b, args.aggs.map(a => aggModel(a, rows))) }
    if (!args.empty) {
      // finalizeEmpty in kept buckets whose agg saw no valid sample
      // (mixed countnan/countall + classic agg over a NaN-only bucket):
      // sum -> 0, last -> running in-range carry (unseeded -> NaN),
      // other value classes -> NaN
      var carry: Option[Double] = None
      buckets = buckets.sortBy(_._1).map { case (b, vals) =>
        val filled = args.aggs.zip(vals).map {
          case (_, Some(v))   => Some(v)
          case ("sum", None)  => Some(0.0)
          case ("last", None) => Some(carry.getOrElse(Double.NaN))
          case (_, None)      => Some(Double.NaN)
        }
        args.aggs.indexOf("last") match {
          case i if i >= 0 && vals(i).isDefined => carry = vals(i)
          case _ =>
        }
        (b, filled)
      }
    }
    if (args.empty && s.nonEmpty) {
      val lo0 = bkt(s.map(_._1).min, dur, al)
      val hi0 = bkt(s.map(_._1).max, dur, al)
      val lo = args.from.map(f => math.max(lo0, bkt(f, dur, al))).getOrElse(lo0)
      val hi = args.to.map(t => math.min(hi0, bkt(t, dur, al))).getOrElse(hi0)
      if (lo <= hi) {
        val byB = buckets.toMap
        var seed: Option[Double] = args.from.flatMap { f =>
          val before = s.filter(r => r._1 < f && !r._2.isNaN)
          if (before.isEmpty) None else Some(before.max._2)
        }
        buckets = (lo to hi by dur).map { b =>
          byB.get(b) match {
            case Some(vals) =>
              // a kept bucket may still have null agg values (NaN-only
              // bucket retained by a count-family agg): EMPTY fills
              // apply to those too (reference finalizeBucket w/ empty)
              val filled = args.aggs.zip(vals).map { case (a, v) =>
                if (v.isDefined) v
                else Aggs.emptyFill(a) match {
                  case Some(fill) => Some(fill)
                  case None if a == "last" => seed
                  case None => None
                }
              }
              args.aggs.indexOf("last") match {
                case i if i >= 0 && vals(i).isDefined => seed = vals(i)
                case _ =>
              }
              (b, filled)
            case None =>
              (b, args.aggs.map { a =>
                Aggs.emptyFill(a) match {
                  case Some(fill) => Some(fill)
                  case None if a == "last" => seed
                  case None => None
                }
              })
          }
        }
      } else buckets = Seq.empty
    }
    val reported = buckets.map { case (b, vals) =>
      val ts = args.bucketTs match {
        case "~" => b + dur / 2
        case "+" => b + dur
        case _   => b
      }
      (ts, vals)
    }
    val sorted = if (args.reverse) reported.sortBy(-_._1) else reported.sortBy(_._1)
    args.count.map(sorted.take).getOrElse(sorted)
  }

  // ---- comparison ----------------------------------------------------

  private def closeEnough(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
    case (None, None) => true
    case (Some(x), Some(y)) =>
      (x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y))
    case _ => false
  }

  test("randomized differential: RangeQuery matches the reference model") {
    val rnd = new Random(42)
    val aggsPool = Aggs.names
    var checked = 0
    for (iter <- 0 until 60) {
      val n = rnd.nextInt(25)
      val samples = (0 until n).map { _ =>
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(10) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
        (ts, v)
      }.groupBy(_._1).map { case (t, rows) => (t, rows.head._2) }.toSeq // unique ts
      val dur = Seq(7L, 10L, 50L, 100L)(rnd.nextInt(4))
      val align = Seq(0L, 3L, 10L, -5L)(rnd.nextInt(4))
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(500).toLong) else None
      val to = if (rnd.nextBoolean()) Some(500L + rnd.nextInt(600)) else None
      val nAggs = 1 + rnd.nextInt(3)
      val aggs = rnd.shuffle(aggsPool).take(nAggs)
      val filterTs =
        if (rnd.nextInt(4) == 0 && samples.nonEmpty)
          rnd.shuffle(samples.map(_._1)).take(1 + rnd.nextInt(samples.size))
        else Nil
      val args = RangeArgs(
        from = from, to = to, aggs = aggs, bucketMs = dur, alignMs = align,
        bucketTs = Seq("-", "~", "+")(rnd.nextInt(3)),
        empty = rnd.nextInt(3) == 0,
        filterByTs = filterTs,
        filterByValue = if (rnd.nextInt(4) == 0) Some((-5.0, 5.0)) else None,
        count = if (rnd.nextInt(5) == 0) Some(1 + rnd.nextInt(5)) else None,
        reverse = rnd.nextBoolean())
      val df = samples.map { case (t, v) => ("k", t, v) }.toDF("series", "ts", "value")
      val got = RangeQuery.range(df, args).collect().map { r =>
        (r.getLong(1), args.aggs.indices.map { i =>
          if (r.isNullAt(i + 2)) None
          else r.get(i + 2) match {
            case l: java.lang.Long   => Some(l.toDouble) // count-family
            case d: java.lang.Double => Some(d.doubleValue)
          }
        })
      }.toSeq
      val exp = model(samples, args)
      assert(got.map(_._1) == exp.map(_._1),
        s"iter $iter: buckets differ\nargs=$args\nsamples=${samples.sortBy(_._1)}\ngot=$got\nexp=$exp")
      got.zip(exp).foreach { case ((ts, gv), (_, ev)) =>
        gv.zip(ev).zipWithIndex.foreach { case ((g, e), i) =>
          assert(closeEnough(g, e),
            s"iter $iter ts=$ts agg=${args.aggs(i)}: got $g expected $e\nargs=$args\nsamples=${samples.sortBy(_._1)}")
        }
      }
      checked += got.size
    }
    assert(checked > 100, s"only $checked rows compared — generator too weak")
  }
}
