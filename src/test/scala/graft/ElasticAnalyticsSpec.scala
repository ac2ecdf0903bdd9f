package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Dtw, Rates, Seasonal, Sessions}
import org.apache.spark.sql.functions.col

/** Round-11 TS additions: DTW pair distances, classical seasonal
  * decomposition, gap report, instant-rate family — closed forms and
  * a brute-force DTW reference (cross-engine parity lives in the
  * ts_dtw_pair / ts_range_decompose / ts_range_gaps / ts_range_irate
  * oracle entries plus the RandomizedWindowsSpec combos). */
class ElasticAnalyticsSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private val DAY = 86400000L

  // ---- DTW ----------------------------------------------------------

  /** Exponential-recursion reference DTW — obviously correct, usable
    * only on tiny inputs; the rolling-row DP must agree exactly. */
  private def dtwRef(a: Seq[Double], b: Seq[Double]): Double = {
    def d(i: Int, j: Int): Double = {
      val c = math.abs(a(i) - b(j))
      if (i == 0 && j == 0) c
      else if (i == 0) c + d(0, j - 1)
      else if (j == 0) c + d(i - 1, 0)
      else c + math.min(math.min(d(i - 1, j), d(i, j - 1)), d(i - 1, j - 1))
    }
    d(a.length - 1, b.length - 1)
  }

  test("dtw kernel: hand-computed 3x2 case") {
    // a=[0,1,2], b=[0,2]: D32 = 0 + min(D22=1, D31=3, D21=1) = 1
    assert(Dtw.dtw(Seq(0.0, 1.0, 2.0), Seq(0.0, 2.0)) == 1.0)
  }

  test("dtw kernel: identical profiles have distance 0; elasticity absorbs a shift") {
    val p = Seq(3.0, 1.0, 4.0, 1.0, 5.0)
    assert(Dtw.dtw(p, p) == 0.0)
    // a shifted impulse costs 0 under DTW (Euclidean would pay 2)
    assert(Dtw.dtw(Seq(0.0, 0.0, 1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0, 0.0)) == 0.0)
    // degenerate lengths
    assert(Dtw.dtw(Seq(2.0), Seq(5.0)) == 3.0)
    assert(Dtw.dtw(Seq(2.0), Seq(1.0, 4.0)) == 1.0 + 2.0)
  }

  test("dtw kernel == exponential reference on random tiny profiles") {
    val rnd = new scala.util.Random(20260815L)
    (0 until 200).foreach { _ =>
      val a = Seq.fill(1 + rnd.nextInt(7))(rnd.nextInt(20) / 2.0)
      val b = Seq.fill(1 + rnd.nextInt(7))(rnd.nextInt(20) / 2.0)
      assert(Dtw.dtw(a, b) == dtwRef(a, b), s"a=$a b=$b")
    }
  }

  test("pairwise: unordered pairs over daily profiles, NaN dropped") {
    // two identical-profile series + one offset one; NaN must not
    // poison a bucket mean
    val rows =
      (0 until 4).map(i => ("a", i * DAY + 100, 10.0 + i)) ++
      (0 until 4).map(i => ("b", i * DAY + 999, 10.0 + i)) ++
      Seq(("b", 2 * DAY + 5, Double.NaN)) ++
      (0 until 4).map(i => ("c", i * DAY + 50, 20.0 + i))
    val out = Dtw.pairwise(rows.toDF("series", "ts", "value"),
        bucketMs = DAY, seriesSet = Seq("a", "b", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b")) == 0.0)
    // constant offset 10 over 4 aligned points: monotone path pays 10
    // per diagonal step plus nothing extra = 40
    assert(out(("a", "c")) == 40.0 && out(("b", "c")) == 40.0)
  }

  test("pairwise: series absent from the range produce no pairs rows") {
    val rows = (0 until 3).map(i => ("a", i * DAY + 1, 1.0 * i))
    val out = Dtw.pairwise(rows.toDF("series", "ts", "value"),
      bucketMs = DAY, seriesSet = Seq("a", "zz"))
    assert(out.count() == 0)
  }

  test("nearest: ranks candidates by DTW to the probe; probe excluded; absent probe empty") {
    // probe p; a == p (dist 0), b = p shifted (small), c = offset 10 (40)
    val p = Seq(0.0, 0.0, 1.0, 0.0)
    val rows =
      p.zipWithIndex.map { case (v, i) => ("p", i * DAY + 1L, v) } ++
      p.zipWithIndex.map { case (v, i) => ("a", i * DAY + 2L, v) } ++
      Seq(0.0, 1.0, 0.0, 0.0).zipWithIndex.map { case (v, i) => ("b", i * DAY + 3L, v) } ++
      p.zipWithIndex.map { case (v, i) => ("c", i * DAY + 4L, v + 10.0) }
    val out = Dtw.nearest(rows.toDF("series", "ts", "value"),
        bucketMs = DAY, probe = "p", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getInt(3))).toSeq
    assert(out == Seq(("a", 0.0, 1), ("b", 0.0, 2)))   // shift is free under DTW
    assert(Dtw.nearest(rows.toDF("series", "ts", "value"),
      bucketMs = DAY, probe = "zz", k = 2).count() == 0)
  }

  test("nearestPruned == nearest, and the envelope bound actually prunes") {
    // probe oscillates in [0, 2]; 3 close series + 12 far ones
    // (offset 50): every far candidate's LB exceeds any close DTW,
    // so the DP must only run on the close cluster + seeds
    val rnd = new scala.util.Random(42L)
    def mk(s: String, off: Double) =
      (0 until 8).map(i => (s, i * DAY + 1L, off + rnd.nextInt(20) / 10.0))
    val rows = mk("p", 0.0) ++
      (1 to 3).flatMap(i => mk(s"near_$i", 0.0)) ++
      (1 to 12).flatMap(i => mk(s"far_$i", 50.0))
    val df = rows.toDF("series", "ts", "value")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
        .sortBy(_._4)
    val exactRes = canon(Dtw.nearest(df, DAY, "p", k = 3))
    val stats = new Dtw.PruneStatsRef(null)
    val prunedRes =
      canon(Dtw.nearestPruned(df, DAY, "p", k = 3, pruneStats = Some(stats)))
    assert(prunedRes == exactRes)
    assert(exactRes.map(_._1).toSet == Set("near_1", "near_2", "near_3"))
    val (survivors, candidates) = stats.get
    assert(candidates == 15L)
    assert(survivors <= 3L, s"far cluster must be pruned, got $survivors")
    // absent probe: empty, and an opted-in ref reports zero candidates
    val absent = new Dtw.PruneStatsRef(null)
    assert(Dtw.nearestPruned(df, DAY, "zz", k = 3,
      pruneStats = Some(absent)).count() == 0)
    assert(absent.get == ((0L, 0L)))
    // instrumentation is OPT-IN per call: the default (no-stats) path
    // returns identical results, and pays no extra count() jobs —
    // PlanShapeSpec pins the job-count delta
    assert(canon(Dtw.nearestPruned(df, DAY, "p", k = 3)) == exactRes)
  }

  test("forecast backtest: exact-linear series scores zero error, knife is bucket-clean") {
    // holt is EXACT on a linear grid (level/trend lock onto the line
    // from the first two points), so the backtest must report 0 error
    val lin = (0 until 14).map(i => ("lin", i * DAY + 1L, 10.0 + 3.0 * i))
      .toDF("series", "ts", "value")
    val bt = graft.ts.Backtest.holtBacktest(lin, sf = 0.5, tf = 0.2,
      splitMs = 7 * DAY, horizon = 4, bucketMs = DAY)
      .collect()
    assert(bt.length == 1)
    val r = bt.head
    assert(r.getLong(1) == 4L, s"4 forecast buckets exist in test: $r")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0, r.toString)
    // test gaps drop (n_eval reports coverage): remove 2 of the 4
    // evaluated days
    val gappy = lin.filter(!org.apache.spark.sql.functions.col("ts")
      .isin(9 * DAY + 1L, 11 * DAY + 1L))
    val bt2 = graft.ts.Backtest.holtBacktest(gappy, sf = 0.5, tf = 0.2,
      splitMs = 7 * DAY, horizon = 4, bucketMs = DAY).collect().head
    assert(bt2.getLong(1) == 2L, bt2.toString)
    // the bucket containing the split belongs wholly to TRAIN: a knife
    // mid-bucket must not shear it into partial averages
    val bt3 = graft.ts.Backtest.holtBacktest(lin, sf = 0.5, tf = 0.2,
      splitMs = 7 * DAY + 3600L, horizon = 4, bucketMs = DAY).collect().head
    assert(bt3.getLong(1) == 4L && bt3.getDouble(2) == 0.0, bt3.toString)
    // degenerate guards
    intercept[IllegalArgumentException] {
      graft.ts.Backtest.holtBacktest(lin, 0.5, 0.2,
        splitMs = 20 * DAY, horizon = 2, bucketMs = DAY, toMs = Some(15 * DAY))
    }
  }

  test("label-filtered matrix == explicit-list matrix on the resolved set; in-plan guard fires") {
    val T0 = 1704067200000L; val T31 = 1706745599999L
    val samples = graft.ts.TSModel.samples(spark, SparkTest.sf)
    val labels = graft.ts.TSModel.labels(spark, SparkTest.sf)
    val preds = Seq(graft.ts.Multi.parsePred("user=(7,34)"))
    // resolve the set the way the operator does, then run the
    // explicit-list variant on it — the two routes must coincide
    val resolved = graft.ts.Multi.queryIndex(labels, preds)
      .collect().map(_.getString(0)).toSeq.sorted
    assert(resolved.size >= 2 && resolved.size <= 12, resolved.toString)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    assert(
      canon(graft.ts.AsOf.pearsonMatrixByFilter(samples, labels, preds,
        86400000L, fromMs = Some(T0), toMs = Some(T31))) ==
      canon(graft.ts.AsOf.pearsonMatrix(samples, resolved,
        86400000L, fromMs = Some(T0), toMs = Some(T31))))
    // a broad filter over the matched-count cap fails EXECUTION loudly
    // (the guard lives in the plan, not in a driver pre-count)
    val e = intercept[Throwable] {
      graft.ts.AsOf.pearsonMatrixByFilter(samples, labels,
        Seq(graft.ts.Multi.parsePred("type=view")), 86400000L,
        fromMs = Some(T0), toMs = Some(T31), maxSeries = 5).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("maxSeries")), chain(e).toString)
  }

  test("seasonal-adjusted anomaly flags the planted shock, not the rush hour or the drift") {
    // strong period-5 pattern + linear drift: a plain z-score flags
    // the pattern peaks; the remainder path must flag ONLY the shock
    val pattern = Seq(0.0, 10.0, 2.0, 14.0, 4.0)
    val n = 30
    val base = (0 until n).map(i => pattern(i % 5) + 0.5 * i)
    val shocked = base.updated(17, base(17) + 40.0)
    val df = shocked.zipWithIndex
      .map { case (v, i) => ("s", i * DAY + 1L, v) }
      .toDF("series", "ts", "value")
    val flagged = graft.ts.Seasonal.remainderAnomaly(df, DAY, period = 5,
        threshold = 3.0)
      .collect().map(r => (r.getLong(1) / DAY).toInt).toSet
    assert(flagged.contains(17), s"the shock bucket must be flagged: $flagged")
    // the shock leaks into its phase's seasonal index and the MA
    // around it, so a neighbour can score moderately — but the
    // pattern's own peaks (phase 3: buckets 3, 8, 13, 23, 28) must
    // never page at this threshold
    assert(flagged.intersect(Set(3, 8, 13, 23, 28)).isEmpty,
      s"periodic peaks must not be flagged: $flagged")
    // the clean series flags nothing at the same threshold
    val clean = base.zipWithIndex.map { case (v, i) => ("s", i * DAY + 1L, v) }
      .toDF("series", "ts", "value")
    assert(graft.ts.Seasonal.remainderAnomaly(clean, DAY, 5, 3.0).count() == 0)
    // MA edge buckets have NULL remainder and can never be flagged
    assert(!flagged.exists(b => b < 2 || b > n - 3), flagged.toString)
    intercept[IllegalArgumentException] {
      graft.ts.Seasonal.remainderAnomaly(df, DAY, 5, threshold = 0.0)
    }
  }

  test("correlation matrix: signs on planted lines, NULL degenerates, pair parity with pearson, guards") {
    import org.apache.spark.sql.functions.{col => c}
    // up: 1..10; down: 20-(1..10) -> r(up,down) = -1, r(up,up2) = +1
    // (affine); flat: constant -> NULL against everything
    val rows = (0 until 10).flatMap { i =>
      Seq(("up", i * DAY + 1L, 1.0 + i), ("up2", i * DAY + 1L, 5.0 + 2 * i),
        ("down", i * DAY + 1L, 20.0 - i), ("flat", i * DAY + 1L, 3.0))
    }
    val df = rows.toDF("series", "ts", "value")
    val got = graft.ts.AsOf.pearsonMatrix(df, Seq("up", "up2", "down", "flat"), DAY)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got.size == 6) // 4 choose 2
    assert(got(("up", "up2"))._2.contains(1.0))
    assert(got(("down", "up"))._2.contains(-1.0))
    assert(got(("down", "up2"))._2.contains(-1.0))
    Seq(("down", "flat"), ("flat", "up"), ("flat", "up2")).foreach { p =>
      assert(got(p)._2.isEmpty, s"constant side must be NULL: $p -> ${got(p)}")
    }
    assert(got.values.forall(_._1 == 10L))
    // each matrix cell equals the single-pair pearson operator's value
    val single = graft.ts.AsOf.pearson(df, "up", "down", DAY)
      .collect().head.getDouble(0)
    assert(got(("down", "up"))._2.contains(single))
    // guards: < 2 series, duplicates, over the numkeys cap
    intercept[IllegalArgumentException] {
      graft.ts.AsOf.pearsonMatrix(df, Seq("up"), DAY)
    }
    intercept[IllegalArgumentException] {
      graft.ts.AsOf.pearsonMatrix(df, Seq("up", "up"), DAY)
    }
    intercept[IllegalArgumentException] {
      graft.ts.AsOf.pearsonMatrix(df,
        (1 to graft.ts.AsOf.MaxMatrixSeries + 1).map("s" + _), DAY)
    }
  }

  test("multi-origin backtest: per-origin rows == single-origin backtests, pooled row pools") {
    val rnd = new scala.util.Random(1234L)
    val rows = Seq("a", "b").flatMap { s =>
      (0 until 20).map(i => (s, i * DAY + 1L, 10.0 + rnd.nextInt(100) / 10.0))
    }
    val df = rows.toDF("series", "ts", "value")
    val origins = Seq(10 * DAY, 14 * DAY)
    val got = graft.ts.Backtest.holtBacktestRolling(df, sf = 0.5, tf = 0.2,
      origins, horizon = 4, bucketMs = DAY)
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // per-origin slices equal the k=1 operator exactly
    for (o <- origins) {
      val single = graft.ts.Backtest.holtBacktest(df, sf = 0.5, tf = 0.2,
        splitMs = o, horizon = 4, bucketMs = DAY)
        .collect()
        .map(r => (r.getString(0), Some(o), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSet
      assert(got.filter(_._2 == Some(o)).toSet == single, s"origin $o")
    }
    // the pooled row (origin NULL): n_eval sums the per-origin counts,
    // mae is a weighted mean of the per-origin maes (so it lies inside
    // their hull) — the exact cross-engine check is the oracle's job
    for (s <- Seq("a", "b")) {
      val perOrigin = got.filter(g => g._1 == s && g._2.isDefined)
      val pooled = got.find(g => g._1 == s && g._2.isEmpty).get
      assert(pooled._3 == perOrigin.map(_._3).sum, s"series $s n_eval")
      val maes = perOrigin.map(_._4)
      assert(pooled._4 >= maes.min - 1e-9 && pooled._4 <= maes.max + 1e-9,
        s"series $s pooled mae ${pooled._4} outside ${maes.mkString(",")}")
    }
    // duplicate origins are a caller bug, loudly
    intercept[IllegalArgumentException] {
      graft.ts.Backtest.holtBacktestRolling(df, 0.5, 0.2,
        Seq(10 * DAY, 10 * DAY), 4, DAY)
    }
  }

  test("matrix profile: planted motif pair scores ~0, discord is the maximum") {
    // 16 buckets of a period-4 pattern with ONE spike at bucket 7 (a
    // pattern trough): every window not touching the spike has an
    // exact period-shifted partner (mp = 0, the motifs); the four
    // windows containing the spike (4..7) match nothing (the discord
    // must be one of them)
    val pattern = Seq(1.0, 5.0, 2.0, 8.0)
    val vals = (0 until 16).map(i => pattern(i % 4)).updated(6, 50.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i * DAY + 1L, v) }
      .toDF("series", "ts", "value")
    val mp = graft.ts.MatrixProfile.profile(df, DAY, m = 4)
      .collect().map(r => r.getInt(1) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(mp.size == 13)
    val spikeWindows = (4 to 7).toSet
    mp.foreach { case (i, (j, d)) =>
      // exclusion zone first: never a neighbor closer than ceil(m/2)
      assert(math.abs(i - j) >= 2, s"($i,$j)")
      if (!spikeWindows(i))
        assert(d <= 1e-9, s"periodic window $i must have an exact partner: $mp")
      else
        assert(d > 0.5, s"spike window $i must match nothing: $mp")
    }
    val discordIdx = mp.maxBy(_._2._2)._1
    assert(spikeWindows.contains(discordIdx),
      s"discord $discordIdx must contain the spike: $mp")
  }

  test("matrix profile == independent naive reference on random data") {
    // the DuckDB oracle shares the moments formula; this reference
    // z-normalizes EXPLICITLY and brute-forces the argmin — a
    // formula-level bug (wrong identity, off-by-one window, broken
    // exclusion zone) cannot hide in both
    def naiveMp(vals: Array[Double], m: Int): Map[Int, (Int, Double)] = {
      val excl = (m + 1) / 2
      val n = vals.length - m + 1
      def z(i: Int): Array[Double] = {
        val w = vals.slice(i - 1, i - 1 + m)
        val mu = w.sum / m
        val sd = math.sqrt(w.map(x => (x - mu) * (x - mu)).sum / m)
        if (sd == 0) Array.fill(m)(0.0) else w.map(x => (x - mu) / sd)
      }
      (1 to n).flatMap { i =>
        val cands = (1 to n).filter(j => math.abs(i - j) >= excl).map { j =>
          val (a, b) = (z(i), z(j))
          val aConst = a.forall(_ == 0.0); val bConst = b.forall(_ == 0.0)
          val d =
            if (aConst && bConst) 0.0
            else if (aConst || bConst) math.sqrt(2.0 * m)
            else math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
          (math.rint(d * 1e9) / 1e9, j)
        }
        if (cands.isEmpty) None else Some(i -> cands.min.swap)
      }.toMap
    }
    val rnd = new scala.util.Random(77L)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(10)
      val m = 2 + rnd.nextInt(3)
      val vals = Array.fill(n)(rnd.nextInt(40) / 4.0)
      val df = vals.zipWithIndex.map { case (v, i) => ("r", i * DAY + 1L, v) }
        .toSeq.toDF("series", "ts", "value")
      val got = graft.ts.MatrixProfile.profile(df, DAY, m)
        .collect().map(r => r.getInt(1) -> ((r.getInt(2), r.getDouble(3)))).toMap
      val want = naiveMp(vals, m)
      assert(got.keySet == want.keySet, s"trial $trial n=$n m=$m")
      got.foreach { case (i, (j, d)) =>
        val (wj, wd) = want(i)
        // distances must agree to float tolerance; the neighbor index
        // must agree whenever the distance gap is decisive
        assert(math.abs(d - wd) <= 1e-6, s"trial $trial i=$i: $d vs $wd")
        if (j != wj) {
          // tie at the rounded distance is the only legal divergence
          assert(math.abs(d - wd) <= 1e-9, s"trial $trial i=$i: ($j,$d) vs ($wj,$wd)")
        }
      }
    }
  }

  test("matrix profile: constant series and short series degrade cleanly") {
    // constant series: every window pair has r=1 -> distance 0
    val const = (0 until 10).map(i => ("c", i * DAY + 1L, 5.0))
      .toDF("series", "ts", "value")
    val mpC = graft.ts.MatrixProfile.profile(const, DAY, m = 4).collect()
    assert(mpC.nonEmpty && mpC.forall(_.getDouble(3) == 0.0))
    // series shorter than m: no windows, empty output (not an error)
    val short = Seq(("x", 1L, 1.0), ("x", DAY + 1, 2.0)).toDF("series", "ts", "value")
    assert(graft.ts.MatrixProfile.profile(short, DAY, m = 4).count() == 0)
    // m=2 with exactly 3 buckets: windows 1,2 — |1-2| = 1 < ceil(2/2)=1?
    // excl = 1, so |i-j| >= 1 admits the pair; both windows get a nn
    val three = Seq(("y", 1L, 1.0), ("y", DAY + 1, 4.0), ("y", 2 * DAY + 1, 2.0))
      .toDF("series", "ts", "value")
    assert(graft.ts.MatrixProfile.profile(three, DAY, m = 2).count() == 2)
  }

  test("STOMP rolling-dot path == the Pearson pairs path, bit-for-bit") {
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    // randomized series with long diagonals and MANY exact-duplicate
    // windows (small discrete value set): drift from the rolling
    // recurrence accumulates along a diagonal and d≈0 ties maximally
    // amplify it through the sqrt — the certified-rounding recompute
    // must resolve every ambiguous cell to the pairs path's exact value
    val rnd = new scala.util.Random(99L)
    val rows = (1 to 6).flatMap { s =>
      val n = 70 + rnd.nextInt(40)
      (0 until n).map(i => (s"s$s", i * DAY + 1L, rnd.nextInt(4000) / 10.0))
    }
    val df = rows.toDF("series", "ts", "value")
    for (m <- Seq(2, 4, 7)) {
      val pairs = canon(graft.ts.MatrixProfile.profile(df, DAY, m))
      val stomp = canon(graft.ts.MatrixProfile.profileStomp(df, DAY, m))
      assert(stomp == pairs, s"m=$m")
    }
    // the fixture month at the query's parameters
    val T0 = 1704067200000L; val T31 = 1706745599999L
    val samples = graft.ts.TSModel.samples(spark, SparkTest.sf)
    assert(
      canon(graft.ts.MatrixProfile.profileStomp(samples, DAY, 7, Some(T0), Some(T31))) ==
      canon(graft.ts.MatrixProfile.profile(samples, DAY, 7, Some(T0), Some(T31))))
  }

  test("MP discords/motifs rank the planted spike and the periodic partners") {
    // same construction as the planted-motif test: a period-4 pattern
    // with ONE spike — discord k=1 must be a spike window; motif
    // windows must all be exact-partner (mp = 0) windows
    val pattern = Seq(1.0, 5.0, 2.0, 8.0)
    val vals = (0 until 16).map(i => pattern(i % 4)).updated(6, 50.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i * DAY + 1L, v) }
      .toDF("series", "ts", "value")
    val disc = graft.ts.MatrixProfile.discords(df, DAY, m = 4, k = 1).collect()
    assert(disc.length == 1 && (4 to 7).contains(disc.head.getInt(1)),
      s"discord must contain the spike: ${disc.toSeq}")
    val mot = graft.ts.MatrixProfile.motifWindows(df, DAY, m = 4, k = 3).collect()
    assert(mot.length == 3 && mot.forall(_.getDouble(3) == 0.0),
      s"motif windows must be exact partners: ${mot.toSeq}")
    // rank is dense 1..k on the round-9 (mp, idx) total order
    assert(mot.map(_.getInt(4)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("AB-join profile finds A's shape in B, no exclusion zone, a==b rejected") {
    // B carries A's pattern shifted by one period: every A window has
    // an exact z-normalized match in B (mp = 0); C is flat noise far
    // from A's shape
    val pat = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 7.0, 4.0, 6.0)
    val a = pat.zipWithIndex.map { case (v, i) => ("a", i * DAY + 1L, v) }
    val b = (pat.drop(2) ++ pat.take(2)).zipWithIndex
      .map { case (v, i) => ("b", i * DAY + 1L, 10.0 + 2.0 * v) } // affine copy
    val df = (a ++ b).toDF("series", "ts", "value")
    val jp = graft.ts.MatrixProfile.joinProfile(df, DAY, m = 4, a = "a", b = "b")
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(jp.size == 5, jp.toString) // 8 buckets, m=4 -> 5 windows
    // z-normalization kills the affine transform: the shifted window
    // aligns exactly (A window i matches B window i-2 mod, where in
    // range) — at least the in-range shifts must be exact hits
    (3 to 5).foreach { i =>
      val (j, d) = jp(i)
      assert(d == 0.0 && j == i - 2, s"window $i: ($j, $d)")
    }
    // identical-index pairing is allowed (no exclusion zone): join of
    // a series with an exact copy is all-zeros at the SAME index
    val df2 = (a ++ a.map { case (_, t, v) => ("c", t, v) })
      .toDF("series", "ts", "value")
    val self = graft.ts.MatrixProfile.joinProfile(df2, DAY, m = 4, a = "a", b = "c")
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(self.values.forall(_._2 == 0.0))
    assert(self.forall { case (i, (j, _)) => j == i },
      s"ties break to the lowest j — the identical index: $self")
    intercept[IllegalArgumentException] {
      graft.ts.MatrixProfile.joinProfile(df, DAY, 4, a = "a", b = "a")
    }
  }

  test("pairs path loud-rejects window counts over maxWindows; STOMP carries them") {
    val long = (0 until 40).map(i => ("L", i * DAY + 1L, (i % 7).toDouble))
      .toDF("series", "ts", "value")
    val e = intercept[Throwable] {
      graft.ts.MatrixProfile.profile(long, DAY, m = 4, maxWindows = 10).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("maxWindows")),
      s"guard must name the cap: ${chain(e)}")
    // STOMP is the long-profile route: same series, full profile
    assert(graft.ts.MatrixProfile.profileStomp(long, DAY, 4).count() == 37)
  }

  test("long-route: maxWindows past the cap swaps extrema/join onto STOMP, results identical") {
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    val over = graft.ts.MatrixProfile.MaxPairWindows + 1
    // cancellation-heavy randomized fixture: a huge common offset makes
    // m·dot − s1a·s1b cancel catastrophically, stressing the certified
    // bound (ADVICE r13: the bound must dominate the target fold's own
    // ~m·u·Σ|p| naive-summation drift, not just the rolling residue)
    val rnd = new scala.util.Random(1234L)
    val rows = (1 to 4).flatMap { s =>
      (0 until 60 + rnd.nextInt(30)).map(i =>
        (s"s$s", i * DAY + 1L, 1.0e7 + rnd.nextInt(4000) / 10.0))
    }
    val df = rows.toDF("series", "ts", "value")
    for (m <- Seq(3, 7)) {
      assert(canon(graft.ts.MatrixProfile.profileStomp(df, DAY, m)) ==
        canon(graft.ts.MatrixProfile.profile(df, DAY, m)), s"self m=$m")
      // extrema through the long route == extrema through the pairs path
      assert(canon(graft.ts.MatrixProfile.discords(df, DAY, m, k = 3, maxWindows = over)) ==
        canon(graft.ts.MatrixProfile.discords(df, DAY, m, k = 3)), s"discords m=$m")
      assert(canon(graft.ts.MatrixProfile.motifWindows(df, DAY, m, k = 3, maxWindows = over)) ==
        canon(graft.ts.MatrixProfile.motifWindows(df, DAY, m, k = 3)), s"motifs m=$m")
      // AB-join: STOMP diagonals == pairs cross join, bit-for-bit
      assert(canon(graft.ts.MatrixProfile.joinProfile(df, DAY, m, "s1", "s2", maxWindows = over)) ==
        canon(graft.ts.MatrixProfile.joinProfile(df, DAY, m, "s1", "s2")), s"join m=$m")
    }
    // past the pairs cap the long route is the ONLY path — and it works:
    // 1100 daily points (1097 windows > 1024) with one planted spike
    val longRows = (0 until 1100).map(i =>
      ("L", i * DAY + 1L, if (i == 700) 900.0 else (i % 9).toDouble))
    val longDf = longRows.toDF("series", "ts", "value")
    intercept[Throwable] { // default pairs route loud-rejects
      graft.ts.MatrixProfile.discords(longDf, DAY, m = 4, k = 2).collect()
    }
    val d = graft.ts.MatrixProfile.discords(longDf, DAY, m = 4, k = 2,
      maxWindows = 2048).collect()
    assert(d.length == 2 && d.exists(r => (697 to 701).contains(r.getInt(1))),
      s"discord must contain the spike: ${d.toSeq}")
    // AB long route at the same length: join vs an exact copy is all
    // zeros (every window has an exact partner); the period-9 base
    // pattern means ties at d=0 break to the LOWEST matching j, and
    // the spike windows — unique shapes — must match their own copy
    val copyDf = (longRows ++ longRows.map { case (_, t, v) => ("C", t, v) })
      .toDF("series", "ts", "value")
    val jp = graft.ts.MatrixProfile.joinProfile(copyDf, DAY, m = 4, a = "L", b = "C",
      maxWindows = 2048)
    assert(jp.filter(col("mp_value") =!= 0.0).count() == 0)
    assert(jp.filter(col("nn_idx") > col("idx")).count() == 0,
      "d=0 ties must break to the lowest j")
    assert(jp.filter(col("idx") === 699 && col("nn_idx") === 699).count() == 1,
      "a spike window's only exact partner is its own copy")
    assert(jp.count() == 1097)
  }

  test("banded DP: wide band == unconstrained dtw; band clips the warp") {
    val a = Seq(1.0, 5.0, 2.0, 8.0, 3.0)
    val b = Seq(1.5, 4.0, 2.5, 7.0, 2.0)
    // band >= n + m admits every path — must equal the unconstrained DP
    assert(Dtw.dtwBanded(a, b, band = 10) == Dtw.dtw(a, b))
    assert(Dtw.dtwBanded(a, b, band = 4) == Dtw.dtw(a, b)) // |i-j|<=4 covers 5x5
    // a tight band can only RAISE the distance (fewer admissible paths)
    val shifted = Seq(0.0, 1.0, 5.0, 2.0, 8.0) // a delayed one step
    assert(Dtw.dtwBanded(a, shifted, band = 0) >= Dtw.dtw(a, shifted))
    // infeasible band vs length gap rejected loudly
    intercept[IllegalArgumentException](Dtw.dtwBanded(a, Seq(1.0), band = 2))
  }

  test("nearestPrunedBanded == nearestBanded, and LB_Keogh actually prunes") {
    val rnd = new scala.util.Random(43L)
    def mk(s: String, off: Double) =
      (0 until 8).map(i => (s, i * DAY + 1L, off + rnd.nextInt(20) / 10.0))
    val rows = mk("p", 0.0) ++
      (1 to 3).flatMap(i => mk(s"near_$i", 0.0)) ++
      (1 to 12).flatMap(i => mk(s"far_$i", 50.0))
    val df = rows.toDF("series", "ts", "value")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
        .sortBy(_._4)
    val brute = canon(Dtw.nearestBanded(df, DAY, "p", k = 3, band = 2))
    val stats = new Dtw.PruneStatsRef(null)
    val pruned = canon(Dtw.nearestPrunedBanded(df, DAY, "p", k = 3, band = 2,
      pruneStats = Some(stats)))
    assert(pruned == brute)
    assert(brute.map(_._1).toSet == Set("near_1", "near_2", "near_3"))
    val (survivors, candidates) = stats.get
    assert(candidates == 15L)
    assert(survivors <= 3L,
      s"sliding envelope must prune the far cluster, got $survivors")
    // absent probe: empty
    assert(Dtw.nearestPrunedBanded(df, DAY, "zz", k = 3, band = 2).count() == 0)
  }

  test("banded search excludes candidates the band makes infeasible") {
    // probe has 6 buckets; 'short' has 2 — |6-2| > band=2, so it must
    // be excluded even though its values sit on the probe exactly
    val rows =
      (0 until 6).map(i => ("p", i * DAY + 1L, i.toDouble)) ++
      (0 until 2).map(i => ("short", i * DAY + 1L, i.toDouble)) ++
      (0 until 6).map(i => ("full", i * DAY + 1L, i + 1.0))
    val df = rows.toDF("series", "ts", "value")
    val brute = Dtw.nearestBanded(df, DAY, "p", k = 5, band = 2)
      .collect().map(_.getString(0)).toSeq
    val pruned = Dtw.nearestPrunedBanded(df, DAY, "p", k = 5, band = 2)
      .collect().map(_.getString(0)).toSeq
    assert(brute == Seq("full"), brute.toString)
    assert(pruned == Seq("full"), pruned.toString)
  }

  test("randomized banded search: pruned == brute across bands/k/lengths") {
    for (seed <- 31 to 34) {
      val rnd = new scala.util.Random(seed.toLong * 104729L)
      // series of VARYING length (some outside band feasibility) and
      // varying offset (some prunable, some not)
      val rows = (0 until 12).flatMap { s =>
        val len = 5 + rnd.nextInt(6) // 5..10 buckets
        val off = rnd.nextInt(4) * 10.0
        (0 until len).map(i =>
          (s"s$s", i * DAY + 1L, off + rnd.nextInt(30) / 10.0))
      } ++ (0 until 8).map(i => ("probe", i * DAY + 1L, rnd.nextInt(30) / 10.0))
      val df = rows.toDF("series", "ts", "value")
      val band = 1 + rnd.nextInt(4)
      val k = 1 + rnd.nextInt(5)
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r =>
          (r.getString(0), r.getLong(1),
            math.rint(r.getDouble(2) * 1e9) / 1e9, r.getInt(3))).toSeq.sortBy(_._4)
      assert(
        canon(Dtw.nearestPrunedBanded(df, DAY, "probe", k, band)) ==
        canon(Dtw.nearestBanded(df, DAY, "probe", k, band)),
        s"seed=$seed band=$band k=$k")
    }
  }

  test("nearestPrunedBanded == nearestBanded on the fixture month") {
    val T0 = 1704067200000L; val T31 = 1706745599999L
    val samples = graft.ts.TSModel.samples(spark, SparkTest.sf)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        (r.getString(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9) / 1e9, r.getInt(3))).toSeq.sortBy(_._4)
    assert(
      canon(Dtw.nearestPrunedBanded(samples, DAY, "click_7", 10, band = 3,
        Some(T0), Some(T31))) ==
      canon(Dtw.nearestBanded(samples, DAY, "click_7", 10, band = 3,
        Some(T0), Some(T31))))
  }

  test("nearestPruned == nearest on the fixture month (no pruning assumptions)") {
    val T0 = 1704067200000L; val T31 = 1706745599999L
    val samples = graft.ts.TSModel.samples(spark, SparkTest.sf)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        (r.getString(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9) / 1e9, r.getInt(3))).toSeq.sortBy(_._4)
    assert(
      canon(Dtw.nearestPruned(samples, DAY, "click_7", 10, Some(T0), Some(T31))) ==
      canon(Dtw.nearest(samples, DAY, "click_7", 10, Some(T0), Some(T31))))
  }

  test("nearest distances agree with pairwise on the same profiles") {
    val rnd = new scala.util.Random(11L)
    val rows = Seq("p", "x", "y", "z").flatMap { s =>
      (0 until 6).map(i => (s, i * DAY + 5L, rnd.nextInt(100) / 10.0))
    }
    val df = rows.toDF("series", "ts", "value")
    val near = Dtw.nearest(df, DAY, "p", k = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val pair = Dtw.pairwise(df, DAY, Seq("p", "x", "y", "z")).collect()
      .filter(r => r.getString(0) == "p" || r.getString(1) == "p")
      .map(r => (if (r.getString(0) == "p") r.getString(1) else r.getString(0))
        -> r.getDouble(4)).toMap
    assert(near == pair)
  }

  // ---- seasonal decomposition --------------------------------------

  test("decompose recovers planted trend + zero-sum weekly seasonality exactly (interior)") {
    // value = 10 + 0.5*day + s[day%7], sum(s) == 0 — the centered
    // 7-bucket MA is exact on a line + zero-sum season, so interior
    // trend/seasonal/remainder recover the construction
    val s = Seq(3.0, -1.0, 2.0, -4.0, 1.0, 0.5, -1.5)
    assert(math.abs(s.sum) < 1e-12)
    val rows = (0 until 28).map(i => ("k", i * DAY + 7, 10.0 + 0.5 * i + s(i % 7)))
    val out = Seasonal.decompose(rows.toDF("series", "ts", "value"),
        bucketMs = DAY, period = 7)
      .orderBy("bucket").collect()
    assert(out.length == 28)
    out.zipWithIndex.foreach { case (r, i) =>
      val trend = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      if (i < 3 || i > 24) assert(trend.isEmpty, s"edge row $i must have NULL trend")
      else {
        assert(math.abs(trend.get - (10.0 + 0.5 * i)) < 1e-9, s"row $i trend")
        assert(math.abs(r.getDouble(6)) < 1e-9, s"row $i remainder")
      }
      assert(math.abs(r.getDouble(5) - s(i % 7)) < 1e-9, s"row $i seasonal")
    }
  }

  test("decompose: seasonal indices sum to ~0 per series; even/short periods rejected") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 40).map(i => ("k", i * DAY + 1, rnd.nextDouble() * 50))
    val out = Seasonal.decompose(rows.toDF("series", "ts", "value"),
      bucketMs = DAY, period = 5).collect()
    val byPhase = out.map(r => r.getLong(2) -> r.getDouble(5)).toMap
    assert(byPhase.size == 5)
    assert(math.abs(byPhase.values.sum) < 1e-9)
    intercept[IllegalArgumentException](
      Seasonal.decompose(rows.toDF("series", "ts", "value"), DAY, period = 4))
    intercept[IllegalArgumentException](
      Seasonal.decompose(rows.toDF("series", "ts", "value"), DAY, period = 1))
  }

  // ---- gap report ---------------------------------------------------

  test("gaps: presence semantics — NaN arrivals close gaps, duplicates are one arrival") {
    val rows = Seq(
      ("a", 0L, 1.0), ("a", 10L, 2.0),
      ("a", 100L, Double.NaN),        // an arrival: splits the 10->200 gap
      ("a", 200L, 3.0), ("a", 200L, 9.0), // duplicate ts: one arrival
      ("b", 0L, 1.0), ("b", 500L, 1.0))
    val out = Sessions.gaps(rows.toDF("series", "ts", "value"), thresholdMs = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("a", 10L, 100L, 90L), ("a", 100L, 200L, 100L),
      ("b", 0L, 500L, 500L)))
  }

  // ---- instant rate -------------------------------------------------

  test("irate/idelta: last pair per bucket; a reset uses the post-reset level") {
    // bucket [0,100): pairs (1->3) d=+2 dt=10, (3->2) d=-1 dt=20 — the
    // LAST pair wins: idelta=-1; reset => irate = 2 (level) / 20ms
    // bucket [100,200): single pair d=+5 dt=70
    val rows = Seq(
      ("k", 10L, 1.0), ("k", 20L, 3.0), ("k", 40L, 2.0),
      ("k", 110L, 7.0))
    val out = Rates.instant(rows.toDF("series", "ts", "value"), bucketMs = 100)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(out == Seq(
      (0L, -1.0, 2.0 * 1000.0 / 20.0),
      (100L, 5.0, 5.0 * 1000.0 / 70.0)))
  }

  test("irate: a series' first sample emits no pair; zero-width pair rates NULL") {
    val rows = Seq(("k", 5L, 1.0), ("z", 7L, 9.0), ("z", 7L, 11.0))
    val out = Rates.instant(rows.toDF("series", "ts", "value"), bucketMs = 100)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.isNullAt(3))).toSeq
    // 'k' has one sample -> nothing; 'z' has an equal-ts pair: idelta
    // = 2 by the (ts, value) order, irate NULL (dt = 0)
    assert(out == Seq(("z", 2.0, true)))
  }

  // ---- cross-correlation ---------------------------------------------

  test("ccf: a planted 2-bucket lead peaks at lag +2 with corr 1") {
    // b(t) = a(t-2 buckets): correlating a[t] with b[t+lag] is perfect
    // at lag = +2 ("b follows a by 2 days")
    val base = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0)
    val rows =
      base.zipWithIndex.map { case (v, i) => ("a", i * DAY + 10, v) } ++
      base.zipWithIndex.map { case (v, i) => ("b", (i + 2) * DAY + 20, v) }
    val out = graft.ts.AsOf.ccf(rows.toDF("series", "ts", "value"),
        "a", "b", bucketMs = DAY, maxLag = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == (-3L to 3L).toSet)
    assert(out(2L)._1 == 8 && math.abs(out(2L)._2 - 1.0) < 1e-12)
    // off-peak lags overlap fewer buckets and correlate imperfectly
    assert(out(0L)._1 == 6 && math.abs(out(0L)._2) < 0.999)
  }

  test("ccf: degenerate overlaps yield NULL (not NaN), matching the oracle") {
    // constant series: corr undefined at every lag -> NULL normalized
    val rows =
      (0 until 5).map(i => ("a", i * DAY + 1, 4.0)) ++
      (0 until 5).map(i => ("b", i * DAY + 2, i * 1.0))
    val out = graft.ts.AsOf.ccf(rows.toDF("series", "ts", "value"),
        "a", "b", bucketMs = DAY, maxLag = 1).collect()
    assert(out.nonEmpty && out.forall(_.isNullAt(2)))
  }

  test("rollingCorr: perfect linear windows hit ±1; constant side NULL; n_window ramps") {
    // b = 2a + 1 over 6 aligned days: every trailing window is
    // perfectly correlated; c is constant: degenerate -> NULL
    val rows = (0 until 6).flatMap { i =>
      Seq(("a", i * DAY + 1L, i * 1.0), ("b", i * DAY + 2L, 2.0 * i + 1.0),
        ("c", i * DAY + 3L, 5.0))
    }
    val df = rows.toDF("series", "ts", "value")
    val ab = graft.ts.AsOf.rollingCorr(df, "a", "b", DAY, span = 3)
      .orderBy("bucket").collect()
    assert(ab.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 3L, 3L, 3L))
    assert(ab.head.isNullAt(2))                       // n = 1: undefined
    ab.drop(1).foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-12))
    // anti-correlated: negate one side
    import org.apache.spark.sql.functions.{when => fWhen, col => fCol}
    val neg = df.withColumn("value",
      fWhen(fCol("series") === "b", -fCol("value")).otherwise(fCol("value")))
    val abNeg = graft.ts.AsOf.rollingCorr(neg, "a", "b", DAY, span = 3)
      .orderBy("bucket").collect().drop(1)
    abNeg.foreach(r => assert(math.abs(r.getDouble(2) + 1.0) < 1e-12))
    // constant side: every window NULL
    val ac = graft.ts.AsOf.rollingCorr(df, "a", "c", DAY, span = 3).collect()
    assert(ac.length == 6 && ac.forall(_.isNullAt(2)))
  }

  // ---- holt forecast --------------------------------------------------

  test("holtForecast: projections are last (level, trend) + h*trend on the daily grid") {
    val rows = Seq(
      ("k", 0L, 10.0), ("k", 100L, 12.0), ("k", 250L, 11.0), ("k", 400L, 15.0))
    val fit = graft.ts.Smoothing.holt(rows.toDF("series", "ts", "value"),
        sf = 0.4, tf = 0.3)
      .orderBy("ts").collect()
    val (lvl, tr) = (fit.last.getDouble(2), fit.last.getDouble(3))
    val fc = graft.ts.Smoothing.holtForecast(rows.toDF("series", "ts", "value"),
        sf = 0.4, tf = 0.3, horizon = 3, stepMs = 50L)
      .orderBy("step").collect()
    assert(fc.map(_.getLong(1)).toSeq == Seq(450L, 500L, 550L))
    fc.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      // forecast folds the recursion state directly; the collected
      // fit rows are the same raw doubles since r15 (no rounding),
      // keep a small slack for the fold-vs-recompute association
      assert(math.abs(r.getDouble(3) - (lvl + h * tr)) < 1e-6,
        s"step $h: ${r.getDouble(3)} vs ${lvl + h * tr}")
    }
  }

  test("holtForecast: a single-sample series projects a flat line (trend 0)") {
    val rows = Seq(("solo", 100L, 42.0))
    val fc = graft.ts.Smoothing.holtForecast(rows.toDF("series", "ts", "value"),
        sf = 0.5, tf = 0.5, horizon = 2, stepMs = 10L)
      .orderBy("step").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(fc == Seq((110L, 1L, 42.0), (120L, 2L, 42.0)))
  }

  // ---- zipf fit --------------------------------------------------------

  test("zipfFit: an exact freq = C/rank corpus fits slope -1, r2 1") {
    // counts 12/rank for ranks 1..4: ln(n) = ln 12 - 1*ln(rank) exactly
    val words = Seq("w1" -> 12, "w2" -> 6, "w3" -> 4, "w4" -> 3)
    val text = words.flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = graft.pipeline.Text.zipfFit(docs, topN = 4).collect()(0)
    // 1e-9 tolerance: the outputs ship round-9 quantized (the
    // cross-engine oracle convention), so sub-ulp exactness is gone
    assert(math.abs(r.getDouble(0) - (-1.0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - math.log(12.0)) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    assert(r.getLong(3) == 4L)
  }

  test("zipfFit: topN caps the head even when the vocabulary is larger") {
    val docs = Seq((1L, "a a a b b c d e f g")).toDF("doc_id", "text")
    val r = graft.pipeline.Text.zipfFit(docs, topN = 3).collect()(0)
    assert(r.getLong(3) == 3L)
  }

  // ---- binary-segmentation changepoint ------------------------------

  private def binsegRows(rows: Seq[(String, Long, Double)], levels: Int,
      minSize: Int = 2) =
    graft.ts.Changepoint.binseg(rows.toDF("series", "ts", "value"),
        bucketMs = DAY, levels = levels, minSize = minSize)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6)))

  test("binseg: a single planted step splits exactly at the boundary") {
    // 5 buckets at 1.0 then 5 at 9.0: mu=5, total SSE = 10*16 = 160,
    // the boundary split zeroes both sides
    val rows = (0 until 10).map(i =>
      ("a", i * DAY + 7L, if (i < 5) 1.0 else 9.0))
    val out = binsegRows(rows, levels = 1)
    assert(out.toSeq == Seq(("a", 0L, "", 5 * DAY, 160.0, 5L, 5L)))
  }

  test("binseg: level 2 recovers both shifts of a three-regime series") {
    // 5x0, 5x10, 5x20: the two candidate boundary splits tie at gain
    // 750 (symmetry) -- the earliest-bucket tiebreak picks t=5; the
    // right child then splits at its own boundary with gain 250, the
    // constant left child picks a 0-gain split deterministically
    val rows = (0 until 15).map(i => ("a", i * DAY + 3L, (i / 5) * 10.0))
    val out = binsegRows(rows, levels = 2)
    val byKey = out.map(r => (r._2, r._3) -> r).toMap
    assert(byKey((0L, "")) == ("a", 0L, "", 5 * DAY, 750.0, 5L, 10L))
    assert(byKey((1L, "r")) == ("a", 1L, "r", 10 * DAY, 250.0, 5L, 5L))
    assert(byKey((1L, "l"))._5 == 0.0 && out.length == 3)
  }

  test("binseg: segments shorter than 2*minSize emit nothing and drop out") {
    val rows = (0 until 3).map(i => ("a", i * DAY + 1L, 1.0 * i))
    assert(binsegRows(rows, levels = 2).isEmpty)
    // 10 rows, minSize 4: root candidates i in 4..6 exist, but the
    // ~5-row children cannot host a second split
    val rows2 = (0 until 10).map(i =>
      ("a", i * DAY + 1L, if (i < 5) 0.0 else 8.0))
    val out = binsegRows(rows2, levels = 2, minSize = 4)
    assert(out.length == 1 && out.head._2 == 0L)
  }

  test("binseg: NaN samples are dropped, multi-series independent") {
    val rows = (0 until 10).map(i =>
      ("a", i * DAY + 7L, if (i < 5) 1.0 else 9.0)) ++
      Seq(("a", 2 * DAY + 8L, Double.NaN)) ++
      (0 until 10).map(i => ("b", i * DAY + 7L, if (i < 3) 4.0 else 0.0))
    val out = binsegRows(rows, levels = 1)
    val m = out.map(r => r._1 -> r).toMap
    assert(m("a")._4 == 5 * DAY && m("a")._5 == 160.0)
    assert(m("b")._4 == 3 * DAY && m("b")._6 == 3L && m("b")._7 == 7L)
  }

  // ---- multi-window burn rate ----------------------------------------

  private val HOUR = 3600000L

  test("burnRate: steady burn at exactly budget alerts at threshold 1.0 on full windows only") {
    // one sample of 3.6 per hour = 0.001/s; budget 0.001/s, long 24h,
    // short 6h, hop 12h: the three fully-covered windows burn exactly
    // 1.0 on both horizons; partial edge windows stay below
    val rows = (0 until 48).map(i => ("a", i * HOUR, 3.6))
      .toDF("series", "ts", "value")
    val out = graft.ts.Rates.burnRate(rows, shortMs = 6 * HOUR,
        longMs = 24 * HOUR, hopMs = 12 * HOUR,
        budgetPerSec = 0.001, threshold = 1.0)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((0L, 1.0, 1.0), (12 * HOUR, 1.0, 1.0),
      (24 * HOUR, 1.0, 1.0)))
  }

  test("burnRate: a resolved incident stops alerting once the short tail is quiet") {
    // 12h burst at 10x budget, then 36h of zeros: the window whose
    // short tail still covers the burst alerts; the [0,24h) window's
    // long burn is 5x but its tail [18h,24h) burned 0 -> NO alert (the
    // multiwindow rule's whole point); all-quiet windows burn 0
    val rows = ((0 until 12).map(i => ("b", i * HOUR, 36.0)) ++
      (12 until 48).map(i => ("b", i * HOUR, 0.0)))
      .toDF("series", "ts", "value")
    val out = graft.ts.Rates.burnRate(rows, shortMs = 6 * HOUR,
        longMs = 24 * HOUR, hopMs = 12 * HOUR,
        budgetPerSec = 0.001, threshold = 1.0)
      .collect().map(r => r.getLong(1)).sorted
    assert(out.toSeq == Seq(-12 * HOUR),
      s"only the during-burst window may alert, got ${out.toSeq}")
  }

  test("burnRate: guards") {
    val df = Seq(("a", 0L, 1.0)).toDF("series", "ts", "value")
    intercept[IllegalArgumentException] {
      graft.ts.Rates.burnRate(df, 2L, 10L, 3L, 1.0, 1.0) // long % hop != 0
    }
    intercept[IllegalArgumentException] {
      graft.ts.Rates.burnRate(df, 20L, 10L, 5L, 1.0, 1.0) // short > long
    }
    intercept[IllegalArgumentException] {
      graft.ts.Rates.burnRate(df, 2L, 10L, 5L, 0.0, 1.0) // zero budget
    }
  }

  // ---- Theil-Sen robust trend ----------------------------------------

  test("theilSen: exact line recovered, outlier bucket cannot drag it") {
    // v = 2 + 3x over 10 daily buckets, except x=5 spikes to 1000: 36
    // of 45 pair slopes are exactly 3, the median holds; residual
    // median holds the intercept at 2. OLS on the same data is dragged
    // far off -- the robustness differential this operator exists for.
    val rows = (0 until 10).map(i =>
      ("a", i * DAY + 11L, if (i == 5) 1000.0 else 2.0 + 3.0 * i))
    val df = rows.toDF("series", "ts", "value")
    val r = graft.ts.Trend.theilSen(df, bucketMs = DAY).collect()(0)
    assert(r.getString(0) == "a")
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == 2.0)
    assert(r.getLong(3) == 10L && r.getLong(4) == 45L)
    val ols = graft.ts.Trend.fit(df, predictAtMs = 0L).collect()(0)
    assert(math.abs(ols.getAs[Double]("slope") * DAY - 3.0) > 1.0)
  }

  test("theilSen: clean line is exact; single-bucket series drop") {
    val rows = (0 until 6).map(i => ("a", i * DAY + 1L, -1.0 + 0.5 * i)) ++
      Seq(("solo", 3 * DAY + 2L, 7.0))
    val out = graft.ts.Trend.theilSen(
      rows.toDF("series", "ts", "value"), bucketMs = DAY).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "a" && r.getDouble(1) == 0.5 &&
      r.getDouble(2) == -1.0 && r.getLong(4) == 15L)
  }
}
