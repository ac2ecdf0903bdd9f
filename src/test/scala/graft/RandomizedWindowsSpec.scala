package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Aggs, Anomaly, AsOf, Changepoint, Histogram, Lttb, Quantiles, Rates, Resample, Rolling, Seasonal, Sessions, Sliding, Smoothing, Trend}
import scala.util.Random

/** Randomized differential for the round-9 window extensions (sliding
  * hop windows, gap sessions) vs DuckDB — same harness as
  * RandomizedOracleSpec (one python3 subprocess over all combos). */
class RandomizedWindowsSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  // always ::DOUBLE — a bare decimal literal types as DECIMAL(18,..)
  // in DuckDB and the rate multiplication then overflows the decimal
  private def dLit(d: Double): String =
    if (d.isNaN) "'NaN'::DOUBLE" else s"(${d})::DOUBLE"

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

  private def closeEnough(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
    case (None, None) => true
    case (Some(x), Some(y)) =>
      (x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-7 * math.max(1.0, math.abs(y))
    case _ => false
  }

  test("randomized sliding/session combos match DuckDB (>=80 combos)") {
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")
    val rnd = new Random(20260814L)

    sealed trait Combo { def name: String; def samples: Seq[(String, Long, Double)]; def sql: String }
    case class Slide(name: String, samples: Seq[(String, Long, Double)],
        agg: String, win: Long, hop: Long, align: Long,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String =
        Sliding.slidingRangeSql(agg, win, hop, align, from, to, valuesCte(samples))
    }
    case class Sess(name: String, samples: Seq[(String, Long, Double)],
        agg: String, gap: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String =
        Sessions.sessionRangeSql(agg, gap, from, to, valuesCte(samples))
    }
    case class DRate(name: String, samples: Seq[(String, Long, Double)],
        bucket: Long, align: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Rates.deltaRateSql(bucket, align, from, to, valuesCte(samples))
    }
    case class Incr(name: String, samples: Seq[(String, Long, Double)],
        bucket: Long, align: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Rates.increaseSql(bucket, align, from, to, valuesCte(samples))
    }
    case class Quant(name: String, samples: Seq[(String, Long, Double)],
        qs: Seq[Double], bucket: Long, align: Long,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Quantiles.bucketQuantilesSql(qs, bucket, align, from, to, valuesCte(samples))
    }
    case class Zs(name: String, samples: Seq[(String, Long, Double)],
        thr: Double, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Anomaly.zscoreSql(thr, from, to, valuesCte(samples))
    }
    case class Rsmp(name: String, samples: Seq[(String, Long, Double)],
        step: Long, align: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Resample.linearSql(step, align, from, to, valuesCte(samples))
    }
    case class Mad(name: String, samples: Seq[(String, Long, Double)],
        thr: Double, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Anomaly.madSql(thr, from, to, valuesCte(samples))
    }
    case class Tr(name: String, samples: Seq[(String, Long, Double)],
        predictAt: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Trend.fitSql(predictAt, from, to, valuesCte(samples))
    }
    case class Hist(name: String, samples: Seq[(String, Long, Double)],
        lo: Double, hi: Double, nbins: Int,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Histogram.valueHistogramSql(lo, hi, nbins, from, to, valuesCte(samples))
    }
    // LTTB combos floor the values to integers: the argmax selection
    // compares triangle areas for exact equality across engines, and
    // integer-valued doubles make every avg/area step bit-identical in
    // any summation order (ties then break on ts identically). With
    // arbitrary doubles an ulp difference in a bucket centroid could
    // legitimately flip a near-tied argmax — not a correctness bug,
    // but not differentiable row-by-row either.
    case class Lt(name: String, samples: Seq[(String, Long, Double)],
        bucket: Long, align: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Lttb.downsampleSql(bucket, align, from, to, valuesCte(samples))
    }
    case class Ew(name: String, samples: Seq[(String, Long, Double)],
        alpha: Double, span: Int, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Smoothing.ewmaSql(alpha, span, from, to, valuesCte(samples))
    }
    // threshold 0 emits every scored row: the differential compares
    // score VALUES under tolerance; a random gate would turn ulp-level
    // engine differences at the threshold into row-set mismatches
    case class Cs(name: String, samples: Seq[(String, Long, Double)],
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Changepoint.cusumSql(0.0, from, to, valuesCte(samples))
    }
    case class Rq(name: String, samples: Seq[(String, Long, Double)],
        q: Double, span: Int, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Rolling.rollingQuantileSql(q, span, from, to, valuesCte(samples))
    }
    case class Wz(name: String, samples: Seq[(String, Long, Double)],
        qLo: Double, qHi: Double, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Rolling.winsorizeSql(qLo, qHi, from, to, valuesCte(samples))
    }
    // threshold 0 again (sigma>0 and count gates are exact in both
    // engines; the score gate would not be)
    case class Seas(name: String, samples: Seq[(String, Long, Double)],
        mode: String, minN: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Seasonal.anomalySql(0.0, mode, minN, from, to, valuesCte(samples))
    }

    // round-10 additions (appended AFTER the 272 so their seeds stay
    // stable): Holt (bit-exact recurrence), topk/bottomk (round-9
    // value-tie classes), SAX (round-9 symbol boundaries). TopK's
    // output is re-ordered to (series, bucket, ...) on both sides so
    // the harness's (string, long) sort key applies.
    case class Ho(name: String, samples: Seq[(String, Long, Double)],
        sf: Double, tf: Double, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Smoothing.holtSql(sf, tf, from, to, valuesCte(samples))
    }
    case class Tk(name: String, samples: Seq[(String, Long, Double)],
        k: Int, agg: String, bucket: Long, align: Long, bottom: Boolean,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String =
        s"""SELECT series, bucket, agg_value, rnk FROM (
           |${graft.ts.TopK.topkSeriesSql(k, agg, bucket, align, bottom,
                from, to, valuesCte(samples))})""".stripMargin
    }
    case class Sx(name: String, samples: Seq[(String, Long, Double)],
        bucket: Long, align: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = graft.ts.Sax.saxWordsSql(bucket, align, from, to,
        valuesCte(samples))
    }
    // appended after 332 (stable seeds): Holt-Winters — the recursive
    // list-state oracle vs the seasonal-slot fold
    case class Hw(name: String, samples: Seq[(String, Long, Double)],
        a: Double, b: Double, g: Double, m: Int,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Smoothing.holtWintersSql(a, b, g, m, from, to,
        valuesCte(samples))
    }
    // appended after 356 (stable seeds): instant-rate family, gap
    // report, seasonal decomposition
    case class Ir(name: String, samples: Seq[(String, Long, Double)],
        bucket: Long, align: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Rates.instantSql(bucket, align, from, to, valuesCte(samples))
    }
    case class Gp(name: String, samples: Seq[(String, Long, Double)],
        thr: Long, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Sessions.gapsSql(thr, from, to, valuesCte(samples))
    }
    case class Dc(name: String, samples: Seq[(String, Long, Double)],
        bucket: Long, period: Int, from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Seasonal.decomposeSql(bucket, period, from, to, valuesCte(samples))
    }
    // appended after 392 (stable seeds): holt forecast, CCF
    case class Fc(name: String, samples: Seq[(String, Long, Double)],
        sf: Double, tf: Double, h: Int, step: Long,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = Smoothing.holtForecastSql(sf, tf, h, step, from, to,
        valuesCte(samples))
    }
    case class Cf(name: String, samples: Seq[(String, Long, Double)],
        bucket: Long, maxLag: Int, align: Long,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = AsOf.ccfSql("s0", "s1", bucket, maxLag, align,
        from, to, valuesCte(samples))
    }
    // appended after 428 (stable seeds): rolling correlation
    case class Rc(name: String, samples: Seq[(String, Long, Double)],
        bucket: Long, span: Int, align: Long,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String = AsOf.rollingCorrSql("s0", "s1", bucket, span, align,
        from, to, valuesCte(samples))
    }
    // round-14b families. These combos use INTEGER-valued samples and
    // bucket = 1 (one sample per grid cell) — the LTTB discipline: all
    // engine-side sums are then exact integers in ANY accumulation
    // order, so the round-9 argmax/median/threshold verdicts are
    // bit-identical by construction, not by tolerance.
    case class Bs(name: String, samples: Seq[(String, Long, Double)],
        levels: Int, minSize: Int, from: Option[Long], to: Option[Long])
        extends Combo {
      def sql: String =
        s"""SELECT series, cp_ts, level, seg, gain, n_left, n_right FROM (
           |${Changepoint.binsegSql(1L, levels, minSize, 0L, from, to, valuesCte(samples))})""".stripMargin
    }
    case class Th(name: String, samples: Seq[(String, Long, Double)],
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String =
        s"""SELECT series, n_grid, slope, intercept, n_pairs FROM (
           |${Trend.theilSenSql(1L, 0L, from, to, valuesCte(samples))})""".stripMargin
    }
    case class Hp(name: String, samples: Seq[(String, Long, Double)],
        span: Int, k: Double, from: Option[Long], to: Option[Long])
        extends Combo {
      def sql: String = Rolling.hampelSql(span, k, from, to, valuesCte(samples))
    }
    case class Br(name: String, samples: Seq[(String, Long, Double)],
        short: Long, long: Long, hop: Long, budget: Double, thr: Double,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String =
        Rates.burnRateSql(short, long, hop, budget, thr, 0L, from, to,
          valuesCte(samples))
    }
    case class Hq(name: String, samples: Seq[(String, Long, Double)],
        lo: Double, hi: Double, nbins: Int, q: Double,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String =
        Histogram.histogramQuantileSql(lo, hi, nbins, q, from, to,
          valuesCte(samples))
    }
    case class Dq(name: String, samples: Seq[(String, Long, Double)],
        gamma: Double, q: Double,
        from: Option[Long], to: Option[Long]) extends Combo {
      def sql: String =
        Histogram.ddsketchQuantileSql(gamma, q, from, to, valuesCte(samples))
    }

    val combos: Seq[Combo] = (0 until 272).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(40)
      val samples = (0 until n).map { _ =>
        val s = s"s${rnd.nextInt(nSeries)}"
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
        (s, ts, v)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val agg = Aggs.names(rnd.nextInt(Aggs.names.size))
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(400).toLong) else None
      val to = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      val bucket = Seq(7L, 25L, 100L)(rnd.nextInt(3))
      val align = Seq(0L, 3L, -5L)(rnd.nextInt(3))
      iter % 16 match {
        case 0 =>
          val hop = Seq(5L, 10L, 25L)(rnd.nextInt(3))
          val ratio = 1 + rnd.nextInt(4)
          Slide(f"slide_$iter%03d", samples, agg, hop * ratio, hop, align, from, to)
        case 1 =>
          val gap = Seq(5L, 20L, 100L)(rnd.nextInt(3))
          Sess(f"sess_$iter%03d", samples, agg, gap, from, to)
        case 2 => DRate(f"drate_$iter%03d", samples, bucket, align, from, to)
        case 3 => Incr(f"incr_$iter%03d", samples, bucket, align, from, to)
        case 4 =>
          val qs = Seq(Seq(0.5), Seq(0.5, 0.9), Seq(0.01, 0.25, 0.5, 0.75, 0.99))(rnd.nextInt(3))
          Quant(f"quant_$iter%03d", samples, qs, bucket, align, from, to)
        case 5 =>
          // thresholds chosen OFF the structural z-boundaries: a
          // 2-sample series has z = ±1 exactly, where the two engines'
          // stddev rounding can land on opposite sides of a 1.0 gate
          Zs(f"zs_$iter%03d", samples, Seq(0.43, 1.17, 1.91)(rnd.nextInt(3)), from, to)
        case 6 =>
          Rsmp(f"rsmp_$iter%03d", samples, bucket, align, from, to)
        case 7 =>
          // thresholds off the structural modified-z boundaries (the
          // 0.6745 factor makes small-n scores land near 0.67/1.35)
          Mad(f"mad_$iter%03d", samples, Seq(0.41, 1.13, 2.21)(rnd.nextInt(3)), from, to)
        case 8 =>
          Tr(f"trend_$iter%03d", samples, 1000L + rnd.nextInt(2000), from, to)
        case 9 =>
          val lo = -12.0 + rnd.nextInt(5)
          val nb = 1 + rnd.nextInt(12)
          Hist(f"hist_$iter%03d", samples, lo, lo + 1 + rnd.nextInt(30), nb, from, to)
        case 10 =>
          Lt(f"lttb_$iter%03d", samples.map(r => (r._1, r._2, r._3.floor)),
            bucket, align, from, to)
        case 11 =>
          // span 1 degenerates to ewma == value; alpha 1.0 to newest-only
          Ew(f"ewma_$iter%03d", samples,
            Seq(0.2, 0.55, 1.0)(rnd.nextInt(3)), Seq(1, 4, 16)(rnd.nextInt(3)),
            from, to)
        case 12 =>
          Cs(f"cusum_$iter%03d", samples, from, to)
        case 13 =>
          Rq(f"rq_$iter%03d", samples,
            Seq(0.0, 0.5, 0.9, 1.0)(rnd.nextInt(4)), Seq(1, 4, 16)(rnd.nextInt(3)),
            from, to)
        case 14 =>
          val lo = Seq(0.0, 0.1, 0.25)(rnd.nextInt(3))
          Wz(f"wz_$iter%03d", samples, lo, lo + 0.5 + rnd.nextInt(3) * 0.08, from, to)
        case _ =>
          // ts stays < 1000 in this generator, so hod/dow cohorts are
          // degenerate (single-key) — that still exercises the minN
          // and sigma gates plus the key arithmetic on both engines
          Seas(f"seas_$iter%03d", samples,
            Seq("hod", "dow")(rnd.nextInt(2)), 1L + rnd.nextInt(4), from, to)
      }
    } ++ (272 until 332).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(40)
      val samples = (0 until n).map { _ =>
        val s = s"s${rnd.nextInt(nSeries)}"
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
        (s, ts, v)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(400).toLong) else None
      val to = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      val bucket = Seq(7L, 25L, 100L)(rnd.nextInt(3))
      val align = Seq(0L, 3L, -5L)(rnd.nextInt(3))
      iter % 3 match {
        case 0 =>
          Ho(f"holt_$iter%03d", samples,
            Seq(0.2, 0.5, 0.8)(rnd.nextInt(3)), Seq(0.1, 0.5, 0.9)(rnd.nextInt(3)),
            from, to)
        case 1 =>
          Tk(f"topk_$iter%03d", samples, 1 + rnd.nextInt(3),
            Seq("avg", "sum", "min", "max", "count")(rnd.nextInt(5)),
            bucket, align, rnd.nextBoolean(), from, to)
        case _ =>
          Sx(f"sax_$iter%03d", samples, bucket, align, from, to)
      }
    } ++ (332 until 356).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(40)
      val samples = (0 until n).map { _ =>
        val s = s"s${rnd.nextInt(nSeries)}"
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
        (s, ts, v)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(400).toLong) else None
      val to = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      Hw(f"hw_$iter%03d", samples,
        Seq(0.2, 0.5, 0.8)(rnd.nextInt(3)), Seq(0.1, 0.5, 0.9)(rnd.nextInt(3)),
        Seq(0.3, 0.6)(rnd.nextInt(2)), 1 + rnd.nextInt(5), from, to)
    } ++ (356 until 392).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(40)
      val samples = (0 until n).map { _ =>
        val s = s"s${rnd.nextInt(nSeries)}"
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
        (s, ts, v)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(400).toLong) else None
      val to = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      val bucket = Seq(7L, 25L, 100L)(rnd.nextInt(3))
      val align = Seq(0L, 3L, -5L)(rnd.nextInt(3))
      iter % 3 match {
        case 0 => Ir(f"irate_$iter%03d", samples, bucket, align, from, to)
        case 1 => Gp(f"gaps_$iter%03d", samples,
          Seq(5L, 20L, 100L)(rnd.nextInt(3)), from, to)
        case _ => Dc(f"dcmp_$iter%03d", samples, bucket,
          Seq(3, 5, 7)(rnd.nextInt(3)), from, to)
      }
    } ++ (392 until 428).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(40)
      val samples = (0 until n).map { _ =>
        val s = s"s${rnd.nextInt(nSeries)}"
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
        (s, ts, v)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(400).toLong) else None
      val to = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      val bucket = Seq(7L, 25L, 100L)(rnd.nextInt(3))
      val align = Seq(0L, 3L, -5L)(rnd.nextInt(3))
      iter % 2 match {
        case 0 => Fc(f"fcst_$iter%03d", samples,
          Seq(0.2, 0.5, 0.8)(rnd.nextInt(3)), Seq(0.1, 0.5, 0.9)(rnd.nextInt(3)),
          1 + rnd.nextInt(6), Seq(5L, 20L, 100L)(rnd.nextInt(3)), from, to)
        case _ => Cf(f"ccf_$iter%03d", samples, bucket,
          rnd.nextInt(4), align, from, to)
      }
    } ++ (428 until 446).map { iter =>
      val n = 1 + rnd.nextInt(40)
      val samples = (0 until n).map { _ =>
        val s = s"s${rnd.nextInt(2)}"
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 10.0
        (s, ts, v)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(400).toLong) else None
      val to = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      Rc(f"rcorr_$iter%03d", samples, Seq(7L, 25L, 100L)(rnd.nextInt(3)),
        2 + rnd.nextInt(4), Seq(0L, 3L, -5L)(rnd.nextInt(3)), from, to)
    } ++ (446 until 496).map { iter =>
      val nSeries = 1 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(40)
      // integer-valued samples (see the round-14b combo note above)
      val samples = (0 until n).map { _ =>
        val s = s"s${rnd.nextInt(nSeries)}"
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(10) == 0) Double.NaN
                else (rnd.nextInt(40) - 10).toDouble
        (s, ts, v)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(400).toLong) else None
      val to = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      iter % 5 match {
        case 0 =>
          Bs(f"binseg_$iter%03d", samples, 1 + rnd.nextInt(3),
            2 + rnd.nextInt(2), from, to)
        case 1 =>
          Th(f"theil_$iter%03d", samples, from, to)
        case 2 =>
          Hp(f"hampel_$iter%03d", samples, 1 + rnd.nextInt(5),
            Seq(1.0, 2.0, 3.0)(rnd.nextInt(3)), from, to)
        case 3 =>
          val hop = Seq(7L, 25L)(rnd.nextInt(2))
          val long = (2 + rnd.nextInt(5)).toLong * hop
          val short = (1 + rnd.nextInt(2)).toLong * hop
          Br(f"burn_$iter%03d", samples, short, long, hop,
            Seq(50.0, 200.0)(rnd.nextInt(2)), Seq(1.0, 1.5)(rnd.nextInt(2)),
            from, to)
        case _ =>
          Hq(f"hq_$iter%03d", samples, -10.0, 30.0, 1 + rnd.nextInt(8),
            Seq(0.25, 0.5, 0.9, 1.0)(rnd.nextInt(4)), from, to)
      }
    } ++ (496 until 514).map { iter =>
      // DDSketch quantile (round 15): positive-store semantics — the
      // generator keeps NaNs and non-positive values so the drop rule
      // is exercised; all-nonpositive combos are empty on both sides
      val nSeries = 1 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(40)
      val samples = (0 until n).map { _ =>
        val s = s"s${rnd.nextInt(nSeries)}"
        val ts = rnd.nextInt(1000).toLong
        val v = if (rnd.nextInt(8) == 0) Double.NaN else rnd.nextInt(200) / 10.0 - 3.0
        (s, ts, v)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val from = if (rnd.nextBoolean()) Some(rnd.nextInt(400).toLong) else None
      val to = if (rnd.nextBoolean()) Some(400L + rnd.nextInt(700)) else None
      Dq(f"ddq_$iter%03d", samples, Seq(1.02, 1.1, 1.7)(rnd.nextInt(3)),
        Seq(0.25, 0.5, 0.9, 1.0)(rnd.nextInt(4)), from, to)
    }

    val dir = java.nio.file.Files.createTempDirectory("rand_win_oracle")
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
    // expected rows keyed by (name, series, first numeric col)
    val expected: Map[String, Seq[Seq[String]]] = lines
      .filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
      .map(_.split("\t", -1).toSeq).groupBy(_.head)
      .view.mapValues(_.map(_.drop(1)).sortBy(r => (r.head, r(1).toLong)).toSeq).toMap

    def numOpt(s: String): Option[Double] = s match {
      case ""    => None
      case "NaN" => Some(Double.NaN)
      case x     => Some(x.toDouble)
    }
    // non-numeric columns (SAX words) compare by exact string equality
    def colMatch(g: String, e: String): Boolean =
      try closeEnough(numOpt(g), numOpt(e))
      catch { case _: NumberFormatException => g == e }

    var checked = 0
    combos.foreach { c =>
      val df = c.samples.toDF("series", "ts", "value")
      val gotDf = c match {
        case s: Slide => Sliding.slidingRange(df, s.agg, s.win, s.hop, s.align, s.from, s.to)
        case s: Sess  => Sessions.sessionRange(df, s.agg, s.gap, s.from, s.to)
        case s: DRate => Rates.deltaRate(df, s.bucket, s.align, s.from, s.to)
        case s: Incr  => Rates.increase(df, s.bucket, s.align, s.from, s.to)
        case s: Quant => Quantiles.bucketQuantiles(df, s.qs, s.bucket, s.align, s.from, s.to)
        case s: Zs    => Anomaly.zscore(df, s.thr, s.from, s.to)
        case s: Rsmp  => Resample.linear(df, s.step, s.align, s.from, s.to)
        case s: Mad   => Anomaly.mad(df, s.thr, s.from, s.to)
        case s: Tr    => Trend.fit(df, s.predictAt, s.from, s.to)
        case s: Hist  => Histogram.valueHistogram(df, s.lo, s.hi, s.nbins, s.from, s.to)
        case s: Lt    => Lttb.downsample(df, s.bucket, s.align, s.from, s.to)
        case s: Ew    => Smoothing.ewma(df, s.alpha, s.span, s.from, s.to)
        case s: Cs    => Changepoint.cusum(df, 0.0, s.from, s.to)
        case s: Rq    => Rolling.rollingQuantile(df, s.q, s.span, s.from, s.to)
        case s: Wz    => Rolling.winsorize(df, s.qLo, s.qHi, s.from, s.to)
        case s: Seas  => Seasonal.anomaly(df, 0.0, s.mode, s.minN, s.from, s.to)
        case s: Ho    => Smoothing.holt(df, s.sf, s.tf, s.from, s.to)
        case s: Tk    =>
          graft.ts.TopK.topkSeries(df, s.k, s.agg, s.bucket, s.align,
            s.bottom, s.from, s.to)
            .select(col("series"), col("bucket"), col("agg_value"), col("rnk"))
        case s: Sx    => graft.ts.Sax.saxWords(df, s.bucket, s.align, s.from, s.to)
        case s: Hw    =>
          Smoothing.holtWinters(df, s.a, s.b, s.g, s.m, s.from, s.to)
        case s: Ir    => Rates.instant(df, s.bucket, s.align, s.from, s.to)
        case s: Gp    => Sessions.gaps(df, s.thr, s.from, s.to)
        case s: Dc    => Seasonal.decompose(df, s.bucket, s.period, s.from, s.to)
        case s: Fc    => Smoothing.holtForecast(df, s.sf, s.tf, s.h, s.step, s.from, s.to)
        case s: Cf    => AsOf.ccf(df, "s0", "s1", s.bucket, s.maxLag, s.align, s.from, s.to)
        case s: Rc    => AsOf.rollingCorr(df, "s0", "s1", s.bucket, s.span, s.align, s.from, s.to)
        case s: Bs    =>
          Changepoint.binseg(df, 1L, s.levels, s.minSize, 0L, s.from, s.to)
            .select(col("series"), col("cp_ts"), col("level"), col("seg"),
              col("gain"), col("n_left"), col("n_right"))
        case s: Th    =>
          Trend.theilSen(df, 1L, 0L, s.from, s.to)
            .select(col("series"), col("n_grid"), col("slope"),
              col("intercept"), col("n_pairs"))
        case s: Hp    => Rolling.hampel(df, s.span, s.k, s.from, s.to)
        case s: Br    =>
          Rates.burnRate(df, s.short, s.long, s.hop, s.budget, s.thr, 0L,
            s.from, s.to)
        case s: Hq    =>
          Histogram.histogramQuantile(df, s.lo, s.hi, s.nbins, s.q, s.from, s.to)
        case s: Dq    =>
          Histogram.ddsketchQuantile(df, s.gamma, s.q, s.from, s.to)
      }
      val got = gotDf.collect().map { r =>
        (0 until r.length).map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString)
      }.sortBy(r => (r.head, r(1).toLong)).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name}\nsamples=${c.samples.sortBy(r => (r._1, r._2))}\n" +
        s"got=$got\nexp=$exp\nsql=\n${c.sql}"
      assert(got.size == exp.size, s"row count ${got.size} vs ${exp.size}: $ctx")
      got.zip(exp).foreach { case (g, e) =>
        assert(g.head == e.head, s"series differ: $g vs $e\n$ctx")
        // every numeric column with relative tolerance (exact longs
        // pass trivially; all values < 2^53 so doubles are exact)
        g.drop(1).zip(e.drop(1)).zipWithIndex.foreach { case ((gv, ev), i) =>
          assert(colMatch(gv, ev), s"col $i: $gv vs $ev\n$ctx")
        }
      }
      checked += got.size
    }
    assert(checked > 400, s"only $checked rows compared — generator too weak")
  }

  test("randomized source-divergence scores match DuckDB with tolerance (>=12 combos)") {
    // The driver-hashed carrier for this operator is the integer
    // moments grid (log-sums can't be bit-stable across engines); this
    // differential keeps the DERIVED kl/js scores users actually read
    // under an executable cross-check — tolerance-based, like the
    // sketch margins — over random (corpus, topN, alpha) combos.
    val py = java.nio.file.Paths.get("tools/run_oracle_batch.py")
    assume(java.nio.file.Files.exists(py), "tools/run_oracle_batch.py missing")
    val rnd = new Random(20260816L)

    case class DivCombo(name: String, docs: Seq[(String, String)],
        topN: Int, alpha: Double) {
      def docsRel: String =
        "(VALUES " + docs.map { case (s, t) => s"('$s', '$t')" }
          .mkString(", ") + ") AS documents(source, text)"
      def sql: String =
        graft.pipeline.Text.sourceDivergenceSql(topN, alpha, docsRel)
    }
    val combos = (0 until 14).map { iter =>
      val nSources = 2 + rnd.nextInt(3)
      val nDocs = 5 + rnd.nextInt(20)
      // zipf-ish draw: low word ids dominate, so the top-N cut and its
      // (count desc, word asc) tie-break are both exercised
      val docs = (0 until nDocs).map { _ =>
        val src = s"src${rnd.nextInt(nSources)}"
        val len = 3 + rnd.nextInt(18)
        val text = (0 until len)
          .map(_ => s"w${rnd.nextInt(rnd.nextInt(14) + 1)}").mkString(" ")
        (src, text)
      }
      DivCombo(f"div_$iter%03d", docs,
        topN = 3 + rnd.nextInt(10),
        alpha = Seq(0.1, 0.5, 1.0, 2.0)(rnd.nextInt(4)))
    }

    val dir = java.nio.file.Files.createTempDirectory("rand_div_oracle")
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
    val expected: Map[String, Seq[Seq[String]]] = lines
      .filterNot(_.split("\t", -1).lift(1).contains("__DONE__"))
      .map(_.split("\t", -1).toSeq).groupBy(_.head)
      .view.mapValues(_.map(_.drop(1)).sortBy(_.head).toSeq).toMap

    var checked = 0
    combos.foreach { c =>
      val df = c.docs.toDF("source", "text")
      val got = graft.pipeline.Text.sourceDivergence(df, c.topN, c.alpha)
        .collect().map(r => Seq(r.getString(0), r.getLong(1).toString,
          r.getDouble(2).toString, r.getDouble(3).toString))
        .sortBy(_.head).toSeq
      val exp = expected.getOrElse(c.name, Nil)
      def ctx = s"${c.name} topN=${c.topN} alpha=${c.alpha}\n" +
        s"got=$got\nexp=$exp\nsql=\n${c.sql}"
      assert(got.size == exp.size, s"row count ${got.size} vs ${exp.size}: $ctx")
      got.zip(exp).foreach { case (g, e) =>
        assert(g.head == e.head, s"source differs: $g vs $e\n$ctx")
        assert(g(1) == e(1), s"n_tokens differs (exact long): $g vs $e\n$ctx")
        Seq(2, 3).foreach { i =>
          assert(closeEnough(Some(g(i).toDouble), Some(e(i).toDouble)),
            s"col $i: ${g(i)} vs ${e(i)}\n$ctx")
        }
      }
      checked += got.size
    }
    assert(checked >= 12 * 2, s"only $checked rows compared — generator too weak")
  }
}
