package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Matrix profile — the z-normalized nearest-neighbor distance profile
 * of each series against itself (Yeh et al., "Matrix Profile I",
 * ICDM 2016 — public literature): for every length-`m` subsequence of
 * a series' bucket profile, the distance to its closest OTHER
 * subsequence (an exclusion zone around `i` suppresses trivial
 * self-matches). Low values = motifs (repeated shapes), the global
 * maximum = the discord (the series' most anomalous window) — the
 * modern mining primitive that complements [[Sax.motifs]] (symbolic,
 * corpus-wide counts) with exact per-window distances, and
 * [[Dtw]] (cross-series elastic search) with the self-join view.
 *
 * Semantics:
 *  - series are first regularized to per-bucket mean profiles (the
 *    family's downsample-first contract: profile length is a QUERY
 *    choice, so the per-series subsequence count is bounded by
 *    buckets − m + 1, never by raw samples);
 *  - distance is the classic z-normalized Euclidean via the Pearson
 *    identity d(i,j) = sqrt(2m(1 − r(i,j))), r clamped to [−1, 1]
 *    against float drift;
 *  - constant (σ = 0) subsequences: r := 1 when BOTH sides are
 *    constant (two flat lines match perfectly), 0 when one side is
 *    (no linear relationship exists) — a deterministic rule both
 *    engines express identically;
 *  - exclusion zone |i − j| < ceil(m/2), the standard default;
 *  - output `(series, idx, nn_idx, mp_value)`, round-9 (the
 *    chained-float convention — distances are O(sqrt(m)), well inside
 *    the convention's magnitude range), nearest neighbor resolved by
 *    (rounded distance, j) so the argmin is a cross-engine total
 *    order. Windows with no admissible neighbor (short series) emit
 *    nothing.
 *
 * Plan shape: ONE hash agg raw→grid (the only pass over data); the
 * subsequence frame is an explode bounded at series×(buckets−m+1);
 * per-window moments are codegen'd array folds (no UDFs); the
 * self-join is per-series and quadratic ONLY in the bounded
 * subsequence count (the declared profile-fits-a-task contract —
 * ≤ (31−m+1)² pairs per series on a monthly daily grid); the argmin
 * is one map-side-combinable min(struct) per window. Parallelism is
 * across series; nothing shuffles raw samples twice.
 */
object MatrixProfile {

  /** Default cap on the PAIRS path's per-series window count: the
    * self-join is O(windows²) pairs with an O(m) dot each — at 1024
    * windows that is ~1M pairs/series (a task-sized bill under the
    * declared profile-fits-a-task contract); past it the silent blowup
    * the guard exists for (a minute grid over a year is ~525k windows
    * → 2.7e11 pairs). The NRANGE numkeys-guard analog
    * (reference module.c:744-752): loud reject, with [[profileStomp]]
    * named as the long-profile path. */
  val MaxPairWindows = 1024

  /** Single-quote escape for series names interpolated into oracle
    * SQL (the [[AsOf.pearsonMatrixSql]] discipline). */
  private def q(s: String): String = s.replace("'", "''")

  /** Ordered length-m window folds: sum, sum of squares, and the
    * window array itself for the cross dot product. */
  private def fold(arr: Column)(f: (Column, Column) => Column): Column =
    aggregate(arr, lit(0.0), f)

  /** Shared raw→grid→per-series ordered value arrays derivation (ONE
    * hash agg over raw samples — the only pass over data). */
  private def seriesArrays(
      samples: DataFrame, bucketMs: Long, m: Int,
      fromMs: Option[Long], toMs: Option[Long]): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
    grid.groupBy(col("series"))
      .agg(transform(
        array_sort(collect_list(struct(col("bucket").as("b"), col("v").as("v")))),
        x => x.getField("v")).as("vals"))
      .filter(size(col("vals")) >= m)
  }

  def profile(
      samples: DataFrame, bucketMs: Long, m: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      maxWindows: Int = MaxPairWindows): DataFrame = {
    require(m >= 2, s"matrix profile window m must be >= 2, got $m")
    require(maxWindows >= 1, s"maxWindows must be >= 1, got $maxWindows")
    val excl = (m + 1) / 2 // ceil(m/2)
    val subs = guardedWindows(samples, bucketMs, m, fromMs, toMs, maxWindows)
    val a = subs.select(col("series"), col("idx").as("i"),
      col("sub").as("sa"), col("s1").as("s1a"), col("s2").as("s2a"))
    val b = subs.select(col("series"), col("idx").as("j"),
      col("sub").as("sb"), col("s1").as("s1b"), col("s2").as("s2b"))
    a.join(b, Seq("series"))
      .filter(abs(col("i") - col("j")) >= excl)
      .select(col("series"), col("i").as("idx"), col("j"), pairDist(m).as("d"))
      .groupBy(col("series"), col("idx"))
      .agg(min(struct(col("d"), col("j"))).as("nn"))
      .select(col("series"), col("idx"),
        col("nn.j").as("nn_idx"), col("nn.d").as("mp_value"))
  }

  /** One row per (series, window index): the window slice + its
    * sequential-fold moments, behind the LAZY window-count guard. The
    * guard is an assert_true filter (passes emit null → row kept),
    * not an eager agg: the TVF route splices these plans at analysis
    * time, where a driver-side count() would be an action the splice
    * must not take. Executed before the explode, so an over-long
    * series fails loudly instead of materializing w² pairs. */
  private def guardedWindows(
      samples: DataFrame, bucketMs: Long, m: Int,
      fromMs: Option[Long], toMs: Option[Long], maxWindows: Int): DataFrame =
    seriesArrays(samples, bucketMs, m, fromMs, toMs)
      .filter(assert_true(size(col("vals")) - m + 1 <= maxWindows,
        concat(lit("matrix profile: series "), col("series"),
          lit(s" has "), (size(col("vals")) - m + 1).cast("string"),
          lit(s" windows > maxWindows=$maxWindows — the pairs path is " +
            "O(windows²) join rows; pass maxWindows > MaxPairWindows " +
            "to route through the STOMP recurrence (profile/discords/" +
            "motifWindows/joinProfile all long-route), or call " +
            "profileStomp directly"))).isNull)
      .select(col("series"),
        explode(sequence(lit(1), size(col("vals")) - m + 1)).as("idx"),
        col("vals"))
      .select(col("series"), col("idx"),
        slice(col("vals"), col("idx"), lit(m)).as("sub"))
      .withColumn("s1", fold(col("sub"))((acc, x) => acc + x))
      .withColumn("s2", fold(col("sub"))((acc, x) => acc + x * x))

  /** The round-9 z-normalized distance of the joined window pair
    * (columns sa/s1a/s2a vs sb/s1b/s2b) — the Pearson identity with
    * the deterministic constant-window rules. */
  private def pairDist(m: Int): Column = {
    val mD = lit(m.toDouble)
    val dot = aggregate(zip_with(col("sa"), col("sb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    // population variance × m: m·Σx² − (Σx)² ; zero ⇔ constant window
    val varA = mD * col("s2a") - col("s1a") * col("s1a")
    val varB = mD * col("s2b") - col("s1b") * col("s1b")
    val r0 = (mD * dot - col("s1a") * col("s1b")) / sqrt(varA * varB)
    val r = when(varA <= 0 && varB <= 0, lit(1.0))
      .when(varA <= 0 || varB <= 0, lit(0.0))
      .otherwise(least(lit(1.0), greatest(lit(-1.0), r0)))
    round(sqrt(lit(2.0) * mD * (lit(1.0) - r)), 9)
  }

  /** DuckDB twin — the same grid/windows/moments/argmin relationally
    * (list slices + ordered list folds, so the float op order matches
    * the engine's sequential array folds; round-9 before the argmin
    * makes the (distance, j) order cross-engine total). */
  def profileSql(
      bucketMs: Long, m: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(m >= 2, s"matrix profile window m must be >= 2, got $m")
    val excl = (m + 1) / 2
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), grid AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS v
       |  FROM f GROUP BY series, $bkt
       |), arrs AS (
       |  SELECT series, list(v ORDER BY bucket) AS vals
       |  FROM grid GROUP BY series HAVING count(*) >= $m
       |), subs AS (
       |  SELECT series, CAST(i AS INT) AS idx, vals[i : i + $m - 1] AS sub
       |  FROM arrs, unnest(range(1, len(vals) - $m + 2)) AS t(i)
       |), mom AS (
       |  SELECT series, idx, sub,
       |    list_aggregate(sub, 'sum') AS s1,
       |    list_aggregate(list_transform(sub, x -> x * x), 'sum') AS s2
       |  FROM subs
       |), pairs AS (
       |  SELECT a.series, a.idx, b.idx AS j,
       |    round(sqrt(2.0 * $m * (1.0 - (
       |      CASE
       |        WHEN ($m * a.s2 - a.s1 * a.s1) <= 0 AND ($m * b.s2 - b.s1 * b.s1) <= 0 THEN 1.0
       |        WHEN ($m * a.s2 - a.s1 * a.s1) <= 0 OR  ($m * b.s2 - b.s1 * b.s1) <= 0 THEN 0.0
       |        ELSE least(1.0, greatest(-1.0,
       |          ($m * list_aggregate(list_transform(range(1, $m + 1),
       |             k -> a.sub[k] * b.sub[k]), 'sum') - a.s1 * b.s1)
       |          / sqrt(($m * a.s2 - a.s1 * a.s1) * ($m * b.s2 - b.s1 * b.s1))))
       |      END))), 9) AS d
       |  FROM mom a JOIN mom b
       |    ON a.series = b.series AND abs(a.idx - b.idx) >= $excl
       |)
       |SELECT series, idx,
       |  (min(struct_pack(d := d, j := j))).j AS nn_idx,
       |  (min(struct_pack(d := d, j := j))).d AS mp_value
       |FROM pairs GROUP BY series, idx""".stripMargin
  }

  /**
   * STOMP long-profile path (Zhu et al., "Matrix Profile II", ICDM
   * 2016 — public literature): the SAME distance profile as
   * [[profile]] computed with the rolling-dot recurrence
   * `QT(i+1, j+1) = QT(i, j) − x_i·x_j + x_{i+m}·x_{j+m}` walked along
   * each admissible diagonal — O(1) per cell instead of the pairs
   * path's O(m) zip_with dot, and NO w²-row join materializes: each
   * series' profile is one typed task (the holt/DTW
   * profile-fits-a-task contract; parallelism across series), so the
   * per-series bill drops from O(w²·m) join rows to O(w²) arithmetic
   * in place. Above [[MaxPairWindows]] this is the only admissible
   * route — [[profile]] loud-rejects.
   *
   * Numerics — CERTIFIED rounding, so STOMP == pairs bit-for-bit:
   * window moments use the pairs path's exact sequential fold order;
   * the rolling dot carries Neumaier compensation plus a running
   * error bound ((m+2)·2ε·Σ|terms| since the last exact refresh —
   * sized to dominate BOTH the compensated rolling residue AND the
   * ~m·u·Σ|p| naive-summation drift of the sequential fold it
   * certifies against, since every product of the target window is
   * counted in Σ|terms|). Each cell's distance is evaluated at both
   * ends of dot±bound — the Pearson r is monotone in the dot, so the
   * certified fold value lies in that interval — and when both ends
   * round-9 to the same value the rolling result matches the pairs
   * path's fold. Only cells whose interval straddles a rounding
   * boundary (ties at d≈0, where the sqrt amplifies ulp drift;
   * measured ~1e-4 of cells on random data, up to ~m·u-proportional
   * on adversarially cancellation-heavy data) recompute the O(m)
   * exact fold, which is also the refresh point for the diagonal.
   * Hence the same values as the pairs path on every cell — the
   * identical DuckDB oracle carries — at O(1) amortized per cell
   * (spec-pinned equality; the recompute worst case degrades to the
   * pairs path's own O(m), never past it).
   */
  def profileStomp(
      samples: DataFrame, bucketMs: Long, m: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(m >= 2, s"matrix profile window m must be >= 2, got $m")
    val excl = (m + 1) / 2
    val spark = samples.sparkSession
    import spark.implicits._
    seriesArrays(samples, bucketMs, m, fromMs, toMs)
      .select(col("series"), col("vals"))
      .as[(String, Seq[Double])]
      .flatMap { case (series, vals) =>
        stompSeries(vals.toArray, m, excl)
          .map { case (i, j, d) => (series, i, j, d) }
      }
      .toDF("series", "idx", "nn_idx", "mp_value")
  }

  /** Spark round(x, 9)'s exact arithmetic (catalyst Round on doubles:
    * BigDecimal HALF_UP) — the typed path must round IDENTICALLY
    * before the argmin so the (d, j) order matches the pairs path. */
  private def round9(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One series' full profile: (idx, nn_idx, mp_value) per window with
    * an admissible neighbor, 1-based idx (the pairs path's explode
    * convention). Every emitted value is BIT-IDENTICAL to the pairs
    * path's — rolling-dot results are used only when their certified
    * round-9 interval is unambiguous; ambiguous cells recompute the
    * exact fold. */
  private[ts] def stompSeries(
      x: Array[Double], m: Int, excl: Int): Iterator[(Int, Int, Double)] = {
    val w = x.length - m + 1
    if (w < 1) return Iterator.empty
    // window moments in the pairs path's sequential fold order
    val s1 = new Array[Double](w)
    val s2 = new Array[Double](w)
    var i = 0
    while (i < w) {
      var a = 0.0; var b = 0.0; var t = 0
      while (t < m) { val v = x(i + t); a += v; b += v * v; t += 1 }
      s1(i) = a; s2(i) = b; i += 1
    }
    val vr = Array.tabulate(w)(k => m * s2(k) - s1(k) * s1(k))
    val bestD = Array.fill(w)(Double.PositiveInfinity)
    val bestJ = Array.fill(w)(Int.MaxValue)
    def offer(a: Int, j: Int, d: Double): Unit =
      if (d < bestD(a) || (d == bestD(a) && j < bestJ(a))) {
        bestD(a) = d; bestJ(a) = j
      }
    // raw (un-rounded) distance at a given dot value; monotone
    // DECREASING in dot (r is monotone increasing; the clamp and the
    // constant-window branches preserve monotonicity)
    def rawDist(a: Int, b: Int, dot: Double): Double = {
      val va = vr(a); val vb = vr(b)
      val r =
        if (va <= 0 && vb <= 0) 1.0
        else if (va <= 0 || vb <= 0) 0.0
        else math.min(1.0, math.max(-1.0,
          (m * dot - s1(a) * s1(b)) / math.sqrt(va * vb)))
      math.sqrt(2.0 * m * (1.0 - r))
    }
    // exact fold dot + Σ|terms| (the Neumaier error-bound base)
    def exactDot(a: Int, b: Int): (Double, Double) = {
      var s = 0.0; var abs = 0.0; var t = 0
      while (t < m) {
        val p = x(a + t) * x(b + t); s += p; abs += math.abs(p); t += 1
      }
      (s, abs)
    }
    // Certification bound coefficient. The interval must contain not
    // the TRUE real dot but the value the UNCOMPENSATED sequential
    // folds round to — both the refresh-point exactDot and the pairs
    // path's fresh fold at this cell — whose worst-case naive-summation
    // error is ~m·u·Σ|p|. Every product of the cell's window was
    // either in the refresh window or arrived as a rolling update
    // term, so Σ|p|(cell) ≤ absAcc; (m+2)·2ε·absAcc therefore
    // dominates the rolling Neumaier residue (≲2ε·absAcc) PLUS the
    // target fold's own ~m·u·Σ|p| rounding drift, with slack.
    val TwoEps = 4.44e-16 // 2ε (≈4u for binary64)
    val errCoef = (m + 2) * TwoEps
    // each diagonal d = j − i ≥ excl; pair (i, i+d) scores both ends
    var d = excl
    while (d < w) {
      var (dot, absAcc) = exactDot(0, d)
      var comp = 0.0 // Neumaier compensation on the rolling updates
      var a = 0
      while (a + d < w) {
        if (a > 0) {
          // dot += (−x_{a−1}·x_{a+d−1} + x_{a+m−1}·x_{a+d+m−1})
          var y = -x(a - 1) * x(a + d - 1)
          var t = dot + y
          comp += (if (math.abs(dot) >= math.abs(y)) (dot - t) + y else (y - t) + dot)
          dot = t
          absAcc += math.abs(y)
          y = x(a + m - 1) * x(a + d + m - 1)
          t = dot + y
          comp += (if (math.abs(dot) >= math.abs(y)) (dot - t) + y else (y - t) + dot)
          dot = t
          absAcc += math.abs(y)
        }
        val b = a + d
        val approx = dot + comp
        val err = errCoef * absAcc
        // true dist ∈ [rawDist(approx+err), rawDist(approx−err)]
        val lo = round9(rawDist(a, b, approx + err))
        val hi = round9(rawDist(a, b, approx - err))
        val dd =
          if (lo == hi) lo // certified: equals the exact fold's value
          else { // ambiguous cell: take the exact fold (also a refresh)
            val (ed, eabs) = exactDot(a, b)
            dot = ed; comp = 0.0; absAcc = eabs
            round9(rawDist(a, b, ed))
          }
        offer(a, b + 1, dd) // 1-based neighbor index
        offer(b, a + 1, dd)
        a += 1
      }
      d += 1
    }
    (0 until w).iterator.filter(bestJ(_) != Int.MaxValue)
      .map(k => (k + 1, bestJ(k), bestD(k)))
  }

  /** The long-profile ROUTE: a caller that raises `maxWindows` past
    * [[MaxPairWindows]] has explicitly accepted the quadratic window
    * count, so the plan switches from the pairs join (O(windows²·m)
    * join rows — the thing the guard exists to prevent) to
    * [[profileStomp]] (O(1) arithmetic per cell, no join rows, same
    * relation bit-for-bit). Below the cap the declarative pairs plan
    * is kept: it codegens, broadcasts nothing, and its per-series
    * bill is task-sized by the guard. */
  def profileAuto(
      samples: DataFrame, bucketMs: Long, m: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      maxWindows: Int = MaxPairWindows): DataFrame =
    if (maxWindows > MaxPairWindows) profileStomp(samples, bucketMs, m, fromMs, toMs)
    else profile(samples, bucketMs, m, fromMs, toMs, maxWindows)

  /**
   * Top-k DISCORDS per series — the operability layer over [[profile]]
   * (a user asks "what are my most anomalous windows", not "give me
   * the whole profile"): the k windows with the LARGEST
   * nearest-neighbor distance, ranked on the round-9 (−mp, idx) total
   * order. Compiles to a rank window over the profile — per-series
   * partial top-k before the shuffle (the [[TopK]] WindowGroupLimit
   * discipline), so the full profile never leaves the executors.
   * Passing `maxWindows > MaxPairWindows` routes the underlying
   * profile through [[profileStomp]] (identical relation, no w² join),
   * so "top discords on a year of minutes" is one call, not an error.
   */
  def discords(
      samples: DataFrame, bucketMs: Long, m: Int, k: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      maxWindows: Int = MaxPairWindows): DataFrame = {
    require(k >= 1, s"discords needs k >= 1, got $k")
    profileAuto(samples, bucketMs, m, fromMs, toMs, maxWindows)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("series"))
          .orderBy(col("mp_value").desc, col("idx").asc)))
      .filter(col("rnk") <= k)
  }

  /** Top-k MOTIF windows per series — the dual of [[discords]]: the k
    * windows with the SMALLEST nearest-neighbor distance (repeated
    * shapes), same rank-window shape, same STOMP route past the cap. */
  def motifWindows(
      samples: DataFrame, bucketMs: Long, m: Int, k: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      maxWindows: Int = MaxPairWindows): DataFrame = {
    require(k >= 1, s"motifWindows needs k >= 1, got $k")
    profileAuto(samples, bucketMs, m, fromMs, toMs, maxWindows)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("series"))
          .orderBy(col("mp_value").asc, col("idx").asc)))
      .filter(col("rnk") <= k)
  }

  /** Shared SQL twin for [[discords]] / [[motifWindows]]: the full
    * [[profileSql]] derivation wrapped in the same rank window. */
  def extremaSql(
      bucketMs: Long, m: Int, k: Int, discord: Boolean,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val dir = if (discord) "DESC" else "ASC"
    s"""SELECT * FROM (
       |  SELECT series, idx, nn_idx, mp_value,
       |    CAST(row_number() OVER (PARTITION BY series
       |      ORDER BY mp_value $dir, idx ASC) AS INT) AS rnk
       |  FROM (
       |${profileSql(bucketMs, m, fromMs, toMs, cte).replace("\n", "\n  ")}
       |  )
       |) WHERE rnk <= $k""".stripMargin
  }

  /**
   * AB-JOIN profile (the cross-series variant from the same paper
   * family — "Matrix Profile II"'s join formulation): for every
   * length-m window of series `a`, the z-normalized distance to its
   * nearest window of series `b` — "where does A's shape occur in B".
   * No exclusion zone (the trivial-match hazard is a SELF-join
   * artifact). Output `(idx, nn_idx, mp_value)`: A-window index,
   * best B-window index, round-9 distance on the (d, j) total order.
   *
   * Plan shape: the same one raw→grid agg (both series' windows come
   * out of one [[guardedWindows]] pass with the series filter pushed
   * into the scan); the cross join is bounded at w_a × w_b by the
   * same lazy maxWindows guard as [[profile]].
   */
  def joinProfile(
      samples: DataFrame, bucketMs: Long, m: Int, a: String, b: String,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      maxWindows: Int = MaxPairWindows): DataFrame = {
    require(a != b, s"joinProfile needs two distinct series, got '$a' twice" +
      " — the self-join variant is profile()")
    if (maxWindows > MaxPairWindows)
      return joinProfileStomp(samples, bucketMs, m, a, b, fromMs, toMs)
    val subs = guardedWindows(
      samples.filter(col("series").isin(a, b)), bucketMs, m,
      fromMs, toMs, maxWindows)
    val wa = subs.filter(col("series") === a).select(col("idx").as("i"),
      col("sub").as("sa"), col("s1").as("s1a"), col("s2").as("s2a"))
    val wb = subs.filter(col("series") === b).select(col("idx").as("j"),
      col("sub").as("sb"), col("s1").as("s1b"), col("s2").as("s2b"))
    wa.crossJoin(wb)
      .select(col("i").as("idx"), col("j"), pairDist(m).as("d"))
      .groupBy(col("idx"))
      .agg(min(struct(col("d"), col("j"))).as("nn"))
      .select(col("idx"), col("nn.j").as("nn_idx"), col("nn.d").as("mp_value"))
  }

  /**
   * STOMP AB-JOIN — [[joinProfile]]'s long-profile route: the same
   * rolling-dot recurrence as [[profileStomp]] walked along the A×B
   * diagonals (offset j−i spans −(w_a−1)…w_b−1; no exclusion zone —
   * the trivial-match hazard is a self-join artifact), O(1) amortized
   * per cell instead of w_a×w_b join rows with an O(m) dot each.
   * Same certified rounding, so the output is BIT-IDENTICAL to
   * [[joinProfile]]'s pairs path and shares [[joinProfileSql]].
   *
   * Plan shape: the one raw→grid agg with the two-series filter
   * pushed to the scan; the pair of bounded grid arrays meets in a
   * single task via a constant-key flatMapGroups (two rows — nothing
   * that scales with raw data moves), and the recurrence runs in
   * place. [[joinProfile]] routes here when maxWindows >
   * [[MaxPairWindows]].
   */
  def joinProfileStomp(
      samples: DataFrame, bucketMs: Long, m: Int, a: String, b: String,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(a != b, s"joinProfileStomp needs two distinct series, got '$a'" +
      " twice — the self-join variant is profileStomp()")
    require(m >= 2, s"matrix profile window m must be >= 2, got $m")
    val spark = samples.sparkSession
    import spark.implicits._
    seriesArrays(samples.filter(col("series").isin(a, b)), bucketMs, m,
        fromMs, toMs)
      .select(col("series"), col("vals"))
      .as[(String, Seq[Double])]
      .groupByKey(_ => 0)
      .flatMapGroups { (_, it) =>
        val arrs = it.toMap
        (for { va <- arrs.get(a); vb <- arrs.get(b) }
          yield stompJoinSeries(va.toArray, vb.toArray, m))
          .getOrElse(Iterator.empty)
      }
      .toDF("idx", "nn_idx", "mp_value")
  }

  /** One A×B join profile: (idx, nn_idx, mp_value) per A-window,
    * 1-based indices, every value certified bit-identical to the
    * pairs path's fold (the [[stompSeries]] discipline, minus the
    * exclusion zone and the symmetric offer). */
  private[ts] def stompJoinSeries(
      xa: Array[Double], xb: Array[Double], m: Int): Iterator[(Int, Int, Double)] = {
    val wa = xa.length - m + 1
    val wb = xb.length - m + 1
    if (wa < 1 || wb < 1) return Iterator.empty
    def moments(x: Array[Double], w: Int): (Array[Double], Array[Double]) = {
      val s1 = new Array[Double](w); val s2 = new Array[Double](w)
      var i = 0
      while (i < w) {
        var p = 0.0; var q = 0.0; var t = 0
        while (t < m) { val v = x(i + t); p += v; q += v * v; t += 1 }
        s1(i) = p; s2(i) = q; i += 1
      }
      (s1, s2)
    }
    val (s1a, s2a) = moments(xa, wa)
    val (s1b, s2b) = moments(xb, wb)
    val vra = Array.tabulate(wa)(k => m * s2a(k) - s1a(k) * s1a(k))
    val vrb = Array.tabulate(wb)(k => m * s2b(k) - s1b(k) * s1b(k))
    val bestD = Array.fill(wa)(Double.PositiveInfinity)
    val bestJ = Array.fill(wa)(Int.MaxValue)
    def rawDist(i: Int, j: Int, dot: Double): Double = {
      val va = vra(i); val vb = vrb(j)
      val r =
        if (va <= 0 && vb <= 0) 1.0
        else if (va <= 0 || vb <= 0) 0.0
        else math.min(1.0, math.max(-1.0,
          (m * dot - s1a(i) * s1b(j)) / math.sqrt(va * vb)))
      math.sqrt(2.0 * m * (1.0 - r))
    }
    def exactDot(i: Int, j: Int): (Double, Double) = {
      var s = 0.0; var abs = 0.0; var t = 0
      while (t < m) {
        val p = xa(i + t) * xb(j + t); s += p; abs += math.abs(p); t += 1
      }
      (s, abs)
    }
    val TwoEps = 4.44e-16
    val errCoef = (m + 2) * TwoEps // same certification bound as stompSeries
    var off = -(wa - 1) // diagonal offset j − i
    while (off < wb) {
      val i0 = math.max(0, -off)
      var (dot, absAcc) = exactDot(i0, i0 + off)
      var comp = 0.0
      var i = i0
      while (i < wa && i + off < wb) {
        val j = i + off
        if (i > i0) {
          var y = -xa(i - 1) * xb(j - 1)
          var t = dot + y
          comp += (if (math.abs(dot) >= math.abs(y)) (dot - t) + y else (y - t) + dot)
          dot = t
          absAcc += math.abs(y)
          y = xa(i + m - 1) * xb(j + m - 1)
          t = dot + y
          comp += (if (math.abs(dot) >= math.abs(y)) (dot - t) + y else (y - t) + dot)
          dot = t
          absAcc += math.abs(y)
        }
        val approx = dot + comp
        val err = errCoef * absAcc
        val lo = round9(rawDist(i, j, approx + err))
        val hi = round9(rawDist(i, j, approx - err))
        val dd =
          if (lo == hi) lo
          else {
            val (ed, eabs) = exactDot(i, j)
            dot = ed; comp = 0.0; absAcc = eabs
            round9(rawDist(i, j, ed))
          }
        val jj = j + 1 // 1-based B index, the pairs path's (d, j) order
        if (dd < bestD(i) || (dd == bestD(i) && jj < bestJ(i))) {
          bestD(i) = dd; bestJ(i) = jj
        }
        i += 1
      }
      off += 1
    }
    (0 until wa).iterator.filter(bestJ(_) != Int.MaxValue)
      .map(i => (i + 1, bestJ(i), bestD(i)))
  }

  /** DuckDB twin of [[joinProfile]] — the [[profileSql]] skeleton with
    * the two-series slice and the A×B join instead of the self-join. */
  def joinProfileSql(
      bucketMs: Long, m: Int, a: String, b: String,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(m >= 2, s"matrix profile window m must be >= 2, got $m")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)", s"series IN ('${q(a)}', '${q(b)}')") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), grid AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS v
       |  FROM f GROUP BY series, $bkt
       |), arrs AS (
       |  SELECT series, list(v ORDER BY bucket) AS vals
       |  FROM grid GROUP BY series HAVING count(*) >= $m
       |), subs AS (
       |  SELECT series, CAST(i AS INT) AS idx, vals[i : i + $m - 1] AS sub
       |  FROM arrs, unnest(range(1, len(vals) - $m + 2)) AS t(i)
       |), mom AS (
       |  SELECT series, idx, sub,
       |    list_aggregate(sub, 'sum') AS s1,
       |    list_aggregate(list_transform(sub, x -> x * x), 'sum') AS s2
       |  FROM subs
       |), pairs AS (
       |  SELECT a.idx, b.idx AS j,
       |    round(sqrt(2.0 * $m * (1.0 - (
       |      CASE
       |        WHEN ($m * a.s2 - a.s1 * a.s1) <= 0 AND ($m * b.s2 - b.s1 * b.s1) <= 0 THEN 1.0
       |        WHEN ($m * a.s2 - a.s1 * a.s1) <= 0 OR  ($m * b.s2 - b.s1 * b.s1) <= 0 THEN 0.0
       |        ELSE least(1.0, greatest(-1.0,
       |          ($m * list_aggregate(list_transform(range(1, $m + 1),
       |             k -> a.sub[k] * b.sub[k]), 'sum') - a.s1 * b.s1)
       |          / sqrt(($m * a.s2 - a.s1 * a.s1) * ($m * b.s2 - b.s1 * b.s1))))
       |      END))), 9) AS d
       |  FROM (SELECT * FROM mom WHERE series = '${q(a)}') a
       |  CROSS JOIN (SELECT * FROM mom WHERE series = '${q(b)}') b
       |)
       |SELECT idx,
       |  (min(struct_pack(d := d, j := j))).j AS nn_idx,
       |  (min(struct_pack(d := d, j := j))).d AS mp_value
       |FROM pairs GROUP BY idx""".stripMargin
  }
}
