package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dynamic Time Warping distance between series pairs — beyond-the-
 * reference extension: the classic elastic similarity measure for
 * shape matching ("which metrics moved like THIS one, allowing for
 * phase shift"), the primitive under TS clustering / nearest-profile
 * search that plain Euclidean distance gets wrong on lagged data.
 *
 * Semantics: series are first regularized to per-bucket mean profiles
 * (the documented downsample-first contract — DTW is O(n·m) per pair,
 * so the profile length is a QUERY choice, e.g. 31 daily points, not
 * a data property); the unconstrained DTW recurrence
 * `D(i,j) = |a_i − b_j| + min(D(i−1,j), D(i,j−1), D(i−1,j−1))` runs
 * over each requested pair's profiles.
 *
 * Plan shape (Spark-first):
 *  - ONE hash agg raw-samples → bucket grid (the only pass over data);
 *  - per-series ordered profile arrays via collect_list+array_sort —
 *    bounded by the grid (series × buckets), the declared
 *    profile-fits-an-executor contract;
 *  - the pair frame is |series set|² rows of array pairs (a query
 *    literal, broadcast-sized by construction);
 *  - the DP itself is an irreducible double recurrence, so it runs as
 *    a typed per-pair map with TWO rolling rows of O(min(n,m)) memory
 *    — the [[Smoothing.holt]] precedent: parallelism is ACROSS pairs,
 *    each pair is one executor task.
 *
 * The DuckDB oracle replays the DP end-to-end as a recursive-CTE
 * anti-diagonal wavefront (cells on diagonal k depend only on
 * diagonals k−1 and k−2, carried as two list columns — no self-joins,
 * single recursive reference), so the distances themselves
 * hash-check, not just the plumbing.
 */
object Dtw {

  /** `(series_a, series_b, n_a, n_b, dtw_distance)` for every
    * unordered pair (a < b) of `seriesSet` present in the range. */
  def pairwise(
      samples: DataFrame, bucketMs: Long, seriesSet: Seq[String],
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(seriesSet.nonEmpty, "dtw needs a non-empty series set")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
      .filter(col("series").isin(seriesSet: _*))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
    // bucket is unique per series, so the struct sort is a total order
    val arrs = grid.groupBy(col("series"))
      .agg(transform(
        array_sort(collect_list(struct(col("bucket").as("b"), col("v").as("v")))),
        x => x.getField("v")).as("vals"))
    val pairs = arrs.select(col("series").as("series_a"), col("vals").as("va"))
      .join(arrs.select(col("series").as("series_b"), col("vals").as("vb")),
        col("series_a") < col("series_b"))
    pairs.as[(String, Seq[Double], String, Seq[Double])]
      .map { case (sa, va, sb, vb) =>
        (sa, sb, va.length.toLong, vb.length.toLong, dtw(va, vb))
      }
      .toDF("series_a", "series_b", "n_a", "n_b", "dtw_distance")
  }

  /** The rolling-row DP: O(n·m) time, O(m) memory. Identical
    * per-cell operation tree (abs-diff + 3-way min + one add) to the
    * oracle's wavefront, so results agree to the ulp. */
  private[graft] def dtw(a: Seq[Double], b: Seq[Double]): Double = {
    val n = a.length; val m = b.length
    require(n > 0 && m > 0, "dtw over empty profile")
    val prev = new Array[Double](m)
    val cur = new Array[Double](m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val c = math.abs(a(i) - b(j))
        cur(j) =
          if (i == 0 && j == 0) c
          else if (i == 0) c + cur(j - 1)
          else if (j == 0) c + prev(j)
          else c + math.min(math.min(prev(j), cur(j - 1)), prev(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }

  /** Sakoe-Chiba BANDED DP: cells restricted to |i − j| <= band, the
    * classic warping constraint that (a) keeps alignments physically
    * plausible and (b) makes the sliding-envelope LB_Keogh lower bound
    * SOUND (see [[nearestPrunedBanded]]). Requires
    * `band >= |n − m|` — a narrower band admits no monotone path from
    * (0,0) to (n−1,m−1); search callers filter such candidates out
    * (their banded distance is +∞ by convention). Out-of-band cells
    * carry +∞; in-band arithmetic is the identical op tree to [[dtw]]
    * and to the oracle's band-guarded wavefront. */
  private[graft] def dtwBanded(a: Seq[Double], b: Seq[Double], band: Int): Double = {
    val n = a.length; val m = b.length
    require(n > 0 && m > 0, "dtw over empty profile")
    require(band >= math.abs(n - m),
      s"band $band narrower than length gap ${math.abs(n - m)} — no warping path exists")
    val INF = Double.PositiveInfinity
    val prev = Array.fill(m)(INF)
    val cur = Array.fill(m)(INF)
    var i = 0
    while (i < n) {
      java.util.Arrays.fill(cur, INF)
      val jLo = math.max(0, i - band)
      val jHi = math.min(m - 1, i + band)
      var j = jLo
      while (j <= jHi) {
        val c = math.abs(a(i) - b(j))
        val best =
          if (i == 0 && j == 0) 0.0
          else if (i == 0) cur(j - 1)
          else if (j == 0) prev(j)
          else math.min(math.min(prev(j), cur(j - 1)), prev(j - 1))
        cur(j) = c + best
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }

  /**
   * Nearest-profile search — DTW as a SEARCH primitive, not just a
   * pair metric: the `k` series whose bucket profiles are most
   * similar to `probe`'s under DTW ("which metrics moved like THIS
   * one, phase shifts allowed"), `(series, n, dtw_distance, rank)`.
   *
   * Plan shape: ONE full-corpus grid agg feeds the candidate profiles;
   * the probe branch's `series = probe` filter pushes through the
   * aggregate into its own PRUNED scan, and the single probe profile
   * rides a broadcast crossJoin onto every candidate (the
   * [[graft.pipeline.Similarity]] broadcast-query discipline). The DP
   * runs per candidate (parallel across series), and the global top-k
   * is a distributed TakeOrderedAndProject on (distance, series) — a
   * total order, so the cut is deterministic. A probe absent from the
   * range yields an empty result (both engines).
   */
  def nearest(
      samples: DataFrame, bucketMs: Long, probe: String, k: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(k >= 1, s"nearest needs k >= 1, got $k")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
    val arrs = grid.groupBy(col("series"))
      .agg(transform(
        array_sort(collect_list(struct(col("bucket").as("b"), col("v").as("v")))),
        x => x.getField("v")).as("vals"))
    val pa = arrs.filter(col("series") === probe).select(col("vals").as("pv"))
    val scored = arrs.filter(col("series") =!= probe)
      .crossJoin(broadcast(pa))
      .as[(String, Seq[Double], Seq[Double])]
      .map { case (sb, vals, pv) => (sb, vals.length.toLong, dtw(pv, vals)) }
      .toDF("series", "n", "dtw_distance")
    val topk = scored
      .orderBy(col("dtw_distance").asc, col("series").asc).limit(k)
    topk.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("dtw_distance").asc, col("series").asc)))
  }

  /**
   * [[nearest]] with ENVELOPE PRUNING — the 100-TB search path: most
   * candidates never pay the O(n·m) DP. The lower bound is the
   * probe's global envelope [L, U] = [min(probe), max(probe)]:
   *
   *   LB(c) = Σ_i max(0, c_i − U, L − c_i)  ≤  DTW(probe, c)
   *
   * SOUND for UNCONSTRAINED DTW and for unequal lengths — every
   * warping path visits every candidate column i at least once, and
   * the cell it pays there costs |c_i − a_j| ≥ dist(c_i, [L, U]).
   * (The classic LB_Keogh sliding envelope is only valid under a
   * Sakoe-Chiba band; with no band the sound envelope is the global
   * one.) Three passes over the CHECKPOINTED profile frame (bounded
   * at series × buckets — the [[graft.pipeline.PQ]] discipline, so
   * the raw-sample scan happens once):
   *
   *   1. LB per candidate — a codegen'd `aggregate` fold, no DP;
   *   2. seed: exact DTW for the k lowest-LB candidates → τ = their
   *      k-th smallest exact distance (an upper bound on the true
   *      k-th best, so any candidate with LB > τ cannot place);
   *   3. exact DTW only for survivors (LB ≤ τ), global top-k.
   *
   * Returns exactly [[nearest]]'s result (same oracle); prune
   * effectiveness is reported through the per-call `pruneStats` ref
   * (survivors vs candidates) and measured in ScaleProbe.
   */
  def nearestPruned(
      samples: DataFrame, bucketMs: Long, probe: String, k: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      pruneStats: Option[PruneStatsRef] = None): DataFrame = {
    require(k >= 1, s"nearestPruned needs k >= 1, got $k")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val arrs = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
      .groupBy(col("series"))
      .agg(transform(
        array_sort(collect_list(struct(col("bucket").as("b"), col("v").as("v")))),
        x => x.getField("v")).as("vals"))
      .localCheckpoint()
    val pv = arrs.filter(col("series") === probe)
      .select(col("vals")).collect()
    if (pv.isEmpty) {
      // absent probe: empty result, the [[nearest]] contract
      pruneStats.foreach(_.set((0L, 0L)))
      return emptyResult(spark)
    }
    val probeVals = pv(0).getSeq[Double](0)
    val (lo, hi) = (probeVals.min, probeVals.max)
    val cands = arrs.filter(col("series") =!= probe)
    // pass 1: the envelope fold — pure codegen, no DP
    val lbCol = aggregate(col("vals"), lit(0.0),
      (acc, x) => acc + greatest(lit(0.0), x - hi, lit(lo) - x))
    val withLb = cands.select(col("series"), col("vals"), lbCol.as("lb"))
    def exact(df: DataFrame): DataFrame =
      df.select(col("series"), col("vals"))
        .as[(String, Seq[Double])]
        .map { case (sb, vals) => (sb, vals.length.toLong, dtw(probeVals, vals)) }
        .toDF("series", "n", "dtw_distance")
    // pass 2: seed the cutoff from the k lowest-LB candidates
    val seeds = withLb.orderBy(col("lb").asc, col("series").asc).limit(k)
    val seedDists = exact(seeds).select(col("dtw_distance"))
      .collect().map(_.getDouble(0)).sorted
    if (seedDists.isEmpty) {
      // probe is the only series in range
      pruneStats.foreach(_.set((0L, 0L)))
      return emptyResult(spark)
    }
    val tau = seedDists.last // k-th smallest among the seeds
    // pass 3: DP only for survivors
    val survivors = withLb.filter(col("lb") <= tau)
    // the two count() actions are probe/spec instrumentation — opt-in
    // per call (pruneStats ref), so the production/TVF route splices a
    // plan with no extra jobs over the checkpointed profile frame
    pruneStats.foreach(_.set((survivors.count(), cands.count())))
    val topk = exact(survivors)
      .orderBy(col("dtw_distance").asc, col("series").asc).limit(k)
    topk.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("dtw_distance").asc, col("series").asc)))
  }

  /**
   * BANDED nearest-profile search, brute force: [[nearest]] under the
   * Sakoe-Chiba constraint. Candidates whose profile length differs
   * from the probe's by more than `band` are excluded (no warping path
   * exists inside the band — banded distance +∞ by convention, and
   * both engines apply the same length filter). The production path is
   * [[nearestPrunedBanded]]; this is its equality oracle.
   */
  def nearestBanded(
      samples: DataFrame, bucketMs: Long, probe: String, k: Int, band: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(k >= 1, s"nearestBanded needs k >= 1, got $k")
    require(band >= 0, s"band $band must be >= 0")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val arrs = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
      .groupBy(col("series"))
      .agg(transform(
        array_sort(collect_list(struct(col("bucket").as("b"), col("v").as("v")))),
        x => x.getField("v")).as("vals"))
    val pa = arrs.filter(col("series") === probe).select(col("vals").as("pv"))
    val scored = arrs.filter(col("series") =!= probe)
      .crossJoin(broadcast(pa))
      .filter(abs(size(col("vals")) - size(col("pv"))) <= band)
      .as[(String, Seq[Double], Seq[Double])]
      .map { case (sb, vals, pv) => (sb, vals.length.toLong, dtwBanded(pv, vals, band)) }
      .toDF("series", "n", "dtw_distance")
    val topk = scored
      .orderBy(col("dtw_distance").asc, col("series").asc).limit(k)
    topk.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("dtw_distance").asc, col("series").asc)))
  }

  /**
   * [[nearestBanded]] with LB_Keogh sliding-envelope pruning — the
   * production banded search: the band makes the CLASSIC per-position
   * envelope sound (which the unconstrained path's global envelope in
   * [[nearestPruned]] is the fallback for — see its scaladoc on why
   * LB_Keogh needs a band):
   *
   *   U_j = max(probe[j−band .. j+band]),  L_j = min(·)   (clamped)
   *   LB(c) = Σ_j max(0, c_j − U_j, L_j − c_j)  ≤  DTW_band(probe, c)
   *
   * Soundness under the band: every warping path visits every candidate
   * column j at least once, paired with a probe index in
   * [j−band, j+band] — the window [L_j, U_j] bounds — so the cell paid
   * there costs at least dist(c_j, [L_j, U_j]). The envelope is tighter
   * than the global one wherever the probe trends, which is what makes
   * the banded path the 100-TB search shape.
   *
   * Same three-pass skeleton as [[nearestPruned]] (LB fold → k-seed
   * cutoff τ → DP only for survivors), same per-call opt-in
   * `pruneStats` ref; returns exactly [[nearestBanded]]'s result.
   */
  def nearestPrunedBanded(
      samples: DataFrame, bucketMs: Long, probe: String, k: Int, band: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      pruneStats: Option[PruneStatsRef] = None): DataFrame = {
    require(k >= 1, s"nearestPrunedBanded needs k >= 1, got $k")
    require(band >= 0, s"band $band must be >= 0")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val arrs = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
      .groupBy(col("series"))
      .agg(transform(
        array_sort(collect_list(struct(col("bucket").as("b"), col("v").as("v")))),
        x => x.getField("v")).as("vals"))
      .localCheckpoint()
    val pv = arrs.filter(col("series") === probe)
      .select(col("vals")).collect()
    if (pv.isEmpty) {
      pruneStats.foreach(_.set((0L, 0L)))
      return emptyResult(spark)
    }
    val probeVals = pv(0).getSeq[Double](0)
    val n = probeVals.length
    // sliding envelope over [j−band, j+band] ∩ [0, n−1], extended to
    // j < n + band (the longest admissible candidate; the window is
    // never empty there since j − band <= n − 1)
    val envLen = n + band
    val upperEnv = Array.tabulate(envLen) { j =>
      var mx = Double.NegativeInfinity
      var t = math.max(0, j - band)
      val hi = math.min(n - 1, j + band)
      while (t <= hi) { mx = math.max(mx, probeVals(t)); t += 1 }
      mx
    }
    val lowerEnv = Array.tabulate(envLen) { j =>
      var mn = Double.PositiveInfinity
      var t = math.max(0, j - band)
      val hi = math.min(n - 1, j + band)
      while (t <= hi) { mn = math.min(mn, probeVals(t)); t += 1 }
      mn
    }
    val uLit = array(upperEnv.map(lit).toIndexedSeq: _*)
    val lLit = array(lowerEnv.map(lit).toIndexedSeq: _*)
    val cands = arrs.filter(col("series") =!= probe)
      .filter(abs(size(col("vals")) - n) <= band)
    // pass 1: the per-position envelope fold — pure codegen, no DP
    val contribs = transform(col("vals"), (x, j) =>
      greatest(lit(0.0), x - element_at(uLit, (j + 1).cast("int")),
        element_at(lLit, (j + 1).cast("int")) - x))
    val lbCol = aggregate(contribs, lit(0.0), (acc, x) => acc + x)
    val withLb = cands.select(col("series"), col("vals"), lbCol.as("lb"))
    def exact(df: DataFrame): DataFrame =
      df.select(col("series"), col("vals"))
        .as[(String, Seq[Double])]
        .map { case (sb, vals) =>
          (sb, vals.length.toLong, dtwBanded(probeVals, vals, band)) }
        .toDF("series", "n", "dtw_distance")
    // pass 2: seed the cutoff from the k lowest-LB candidates
    val seeds = withLb.orderBy(col("lb").asc, col("series").asc).limit(k)
    val seedDists = exact(seeds).select(col("dtw_distance"))
      .collect().map(_.getDouble(0)).sorted
    if (seedDists.isEmpty) {
      pruneStats.foreach(_.set((0L, 0L)))
      return emptyResult(spark)
    }
    val tau = seedDists.last
    // pass 3: DP only for survivors
    val survivors = withLb.filter(col("lb") <= tau)
    pruneStats.foreach(_.set((survivors.count(), cands.count())))
    val topk = exact(survivors)
      .orderBy(col("dtw_distance").asc, col("series").asc).limit(k)
    topk.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("dtw_distance").asc, col("series").asc)))
  }

  /** Per-call opt-in sink for the (survivors, candidates) prune-rate
    * counts of [[nearestPruned]] / [[nearestPrunedBanded]] —
    * probe/spec instrumentation, not part of the result. Passing a
    * ref pays two extra count() jobs over the checkpointed profile
    * frame; the default (None) path launches none. A per-call ref
    * (ADVICE r12) cannot be clobbered by a concurrent query on the
    * same JVM the way the former global toggle could. */
  type PruneStatsRef = java.util.concurrent.atomic.AtomicReference[(Long, Long)]

  private def emptyResult(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("series",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dtw_distance",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false))))

  /** DuckDB oracle: the same distances via a recursive anti-diagonal
    * wavefront. Each recursion step carries diagonal k (`cur`) and
    * k−1 (`prev`) as lists ordered by i; cell lookups are guarded
    * list indexes (DuckDB's negative indices wrap from the end, so an
    * out-of-range predecessor must resolve to NULL explicitly, then
    * coalesce to +inf for the min). */
  def pairwiseSql(
      bucketMs: Long, seriesSet: Seq[String],
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(seriesSet.nonEmpty, "dtw needs a non-empty series set")
    val inList = seriesSet.map(s => s"'${s.replace("'", "''")}'").mkString(", ")
    dpSql(
      extraWhere = Some(s"series IN ($inList)"),
      pairsJoin = "FROM arrs a JOIN arrs b ON a.series < b.series",
      finalSelect =
        """SELECT sa AS series_a, sb AS series_b,
          |       CAST(la AS BIGINT) AS n_a, CAST(lb AS BIGINT) AS n_b,
          |       cur[1] AS dtw_distance
          |FROM dp WHERE k = la + lb""".stripMargin,
      bucketMs, fromMs, toMs, cte)
  }

  /** DuckDB twin of [[nearest]]: the probe row joins every other
    * series through the same wavefront, then the ranked head. */
  def nearestSql(
      bucketMs: Long, probe: String, k: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val p = probe.replace("'", "''")
    dpSql(
      extraWhere = None,
      pairsJoin =
        s"FROM arrs a JOIN arrs b ON a.series = '$p' AND b.series <> '$p'",
      finalSelect =
        s"""SELECT series, n, dtw_distance, rank FROM (
           |  SELECT sb AS series, CAST(lb AS BIGINT) AS n,
           |         cur[1] AS dtw_distance,
           |         row_number() OVER (ORDER BY cur[1] ASC, sb ASC) AS rank
           |  FROM dp WHERE k = la + lb)
           |WHERE rank <= $k""".stripMargin,
      bucketMs, fromMs, toMs, cte)
  }

  /** DuckDB twin of [[nearestBanded]] / [[nearestPrunedBanded]]: the
    * same wavefront with the Sakoe-Chiba guard — out-of-band cells pin
    * to the 1e308 pseudo-∞ (the same sentinel the unbanded skeleton
    * uses for out-of-range predecessors), and the pairs join applies
    * the `|len(a) − len(b)| <= band` feasibility filter. */
  def nearestBandedSql(
      bucketMs: Long, probe: String, k: Int, band: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(band >= 0, s"band $band must be >= 0")
    val p = probe.replace("'", "''")
    dpSql(
      extraWhere = None,
      pairsJoin =
        s"""FROM arrs a JOIN arrs b ON a.series = '$p' AND b.series <> '$p'
           |    AND abs(len(a.vals) - len(b.vals)) <= $band""".stripMargin,
      finalSelect =
        s"""SELECT series, n, dtw_distance, rank FROM (
           |  SELECT sb AS series, CAST(lb AS BIGINT) AS n,
           |         cur[1] AS dtw_distance,
           |         row_number() OVER (ORDER BY cur[1] ASC, sb ASC) AS rank
           |  FROM dp WHERE k = la + lb)
           |WHERE rank <= $k""".stripMargin,
      bucketMs, fromMs, toMs, cte, band = Some(band))
  }

  /** Shared wavefront skeleton: samples filter → bucket grid → profile
    * arrays → a caller-chosen `pairs` join → the recursive DP → a
    * caller-chosen projection over the finished diagonals. `band`
    * splices the Sakoe-Chiba cell guard (None = unconstrained,
    * byte-identical to the original skeleton). */
  private def dpSql(
      extraWhere: Option[String], pairsJoin: String, finalSelect: String,
      bucketMs: Long, fromMs: Option[Long], toMs: Option[Long],
      cte: String, band: Option[Int] = None): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ extraWhere ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs)
    // guarded 1-based list index: NULL outside [1, len(lst)]
    def at(lst: String, idx: String) =
      s"(CASE WHEN ($idx) BETWEEN 1 AND len($lst) THEN $lst[$idx] END)"
    // iLo of diagonal d is greatest(1, d - m); index of cell x on d
    def ix(x: String, d: String) = s"(($x) - greatest(1, ($d) - lb) + 1)"
    val up = at("cur", ix("i - 1", "k"))
    val left = at("cur", ix("i", "k"))
    val diag = at("prev", ix("i - 1", "k - 1"))
    // cell on diagonal k+1 pairs (i, k+1−i); the Sakoe-Chiba guard is
    // |i − (k+1−i)| <= band, out-of-band cells pinned to pseudo-∞ so
    // no path routes through them
    val cellBody =
      s"""abs(va[i] - vb[k + 1 - i]) +
         |           least(coalesce($up, 1e308),
         |                 coalesce($left, 1e308),
         |                 coalesce($diag, 1e308))""".stripMargin
    val cell = band match {
      case Some(r) =>
        s"CASE WHEN abs(2 * i - (k + 1)) <= $r THEN $cellBody ELSE 1e308 END"
      case None => cellBody
    }
    s"""WITH RECURSIVE g AS (
       |$cte SELECT * FROM samples
       |), f AS (
       |  SELECT * FROM g $where
       |), grid AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS v
       |  FROM f GROUP BY series, $bkt
       |), arrs AS (
       |  SELECT series, list(v ORDER BY bucket) AS vals
       |  FROM grid GROUP BY series
       |), pairs AS (
       |  SELECT a.series AS sa, b.series AS sb, a.vals AS va, b.vals AS vb,
       |         len(a.vals) AS la, len(b.vals) AS lb
       |  $pairsJoin
       |), dp AS (
       |  SELECT sa, sb, 2 AS k,
       |         [abs(va[1] - vb[1])] AS cur,
       |         CAST(NULL AS DOUBLE[]) AS prev,
       |         va, vb, la, lb
       |  FROM pairs
       |  UNION ALL
       |  SELECT sa, sb, k + 1,
       |    list_transform(
       |      generate_series(greatest(1, k + 1 - lb), least(la, k)),
       |      i -> $cell),
       |    cur, va, vb, la, lb
       |  FROM dp WHERE k < la + lb
       |)
       |$finalSelect""".stripMargin
  }
}
