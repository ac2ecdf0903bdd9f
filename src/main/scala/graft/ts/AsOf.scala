package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cross-series alignment operators — beyond-the-reference extensions
 * (the reference has no joins at all, SURVEY §2.8; aligning a metric
 * against a reference series is the bread-and-butter of kdb/TSDB
 * analytics):
 *
 *  - [[asofJoin]]: for every sample of the LEFT series, the latest
 *    RIGHT-series value with `r.ts <= l.ts` (optionally within a
 *    staleness tolerance). Implemented with the union + backward
 *    window trick — ONE shuffle, no range join, no per-row probe:
 *    tag right rows to sort BEFORE left rows at equal ts, then
 *    `last(value ignoreNulls)` over the backward frame is exactly
 *    the as-of lookup. The DuckDB oracle uses the engine's NATIVE
 *    `ASOF LEFT JOIN` — two genuinely different algorithms must
 *    agree.
 *
 *  - [[pearson]]: bucket-aligned Pearson correlation of two series
 *    (bucket averages joined on the bucket grid, then one `corr`
 *    aggregate). Spark `corr` and DuckDB `corr` are both the sample
 *    Pearson coefficient.
 */
object AsOf {

  // SQL string-literal escape ('' doubling) for interpolated series
  // keys — same convention as Dtw's SQL builders.
  private def q(s: String): String = s.replace("'", "''")

  /** `(ts, value, asof_value)` for every left-series sample; the
    * as-of match is NULL when nothing precedes (or the match is
    * older than `toleranceMs`). */
  def asofJoin(
      samples: DataFrame, leftKey: String, rightKey: String,
      toleranceMs: Option[Long] = None,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val l = s.filter(col("series") === leftKey)
      .select(col("ts"), col("value"), lit(1).as("is_left"))
    val r = s.filter(col("series") === rightKey)
      .select(col("ts"), col("value"), lit(0).as("is_left"))
    // right rows sort first at equal ts: an exactly-simultaneous right
    // sample IS visible to the left row (ASOF's <= contract)
    val back = Window.orderBy(col("ts"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightVal = when(col("is_left") === 0, col("value"))
    val rightTs = when(col("is_left") === 0, col("ts"))
    val joined = l.unionByName(r)
      .withColumn("rv", last(rightVal, ignoreNulls = true).over(back))
      .withColumn("rt", last(rightTs, ignoreNulls = true).over(back))
      .filter(col("is_left") === 1)
    val fresh = toleranceMs match {
      case Some(tol) => col("rt") >= col("ts") - tol
      case None      => col("rt").isNotNull
    }
    joined.select(col("ts"), col("value"),
      when(fresh, col("rv")).as("asof_value"))
  }

  /** Oracle: DuckDB's native ASOF LEFT JOIN — an independent
    * algorithm for the same contract. */
  def asofJoinSql(
      leftKey: String, rightKey: String,
      toleranceMs: Option[Long] = None,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val freshness = toleranceMs
      .map(tol => s"CASE WHEN r.ts >= l.ts - $tol THEN r.value END")
      .getOrElse("r.value")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), l AS (
       |  SELECT ts, value FROM f WHERE series = '${q(leftKey)}'
       |), r AS (
       |  SELECT ts, value FROM f WHERE series = '${q(rightKey)}'
       |)
       |SELECT l.ts, l.value, $freshness AS asof_value
       |FROM l ASOF LEFT JOIN r ON l.ts >= r.ts""".stripMargin
  }

  /** One-row `(corr_value)` Pearson correlation of the two series'
    * bucket averages over the shared bucket grid. */
  def pearson(
      samples: DataFrame, keyA: String, keyB: String,
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    def bucketed(key: String, out: String) =
      s.filter(col("series") === key)
        .groupBy(TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
        .agg(avg(col("value")).as(out))
    bucketed(keyA, "va").join(bucketed(keyB, "vb"), Seq("bucket"))
      .agg(round(corr(col("va"), col("vb")), 9).as("corr_value"))
  }

  /**
   * Cross-correlation function — [[pearson]] swept over bucket lags:
   * one `(lag, n_pairs, ccf_value)` row per lag in [−maxLag, maxLag],
   * where lag ℓ correlates A's bucket t with B's bucket t+ℓ ("does B
   * follow A by ℓ buckets" peaks at positive ℓ). The lead/lag
   * diagnostic behind "errors spike N minutes after deploys" —
   * [[Trend.acf]]'s cross-series twin.
   *
   * Plan shape: the per-series bucket grids are derived once from a
   * `series IN (a,b)` pushed scan (two grid branches reuse the shared
   * aggregated grid, which is at most (range/bucket) rows per series —
   * a QUERY-bounded frame, not a data-sized one); the lag sweep is a
   * crossJoin of grid A against the 2·maxLag+1 literal lag frame
   * (broadcast by construction) joined to grid B on the shifted
   * bucket, then ONE corr aggregate per lag. Nothing in the plan
   * scales with raw sample count except the initial bucket agg, which
   * is a map-side-combined single pass.
   *
   * n_pairs counts the overlapping buckets so a spuriously-high corr
   * over a thin overlap is visible to the caller; lags with fewer
   * than 2 overlapping buckets emit NULL ccf (corr undefined).
   */
  def ccf(
      samples: DataFrame, keyA: String, keyB: String,
      bucketMs: Long, maxLag: Int, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(maxLag >= 0, s"maxLag $maxLag must be >= 0")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
      .filter(col("series").isin(keyA, keyB))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
    val ga = grid.filter(col("series") === keyA)
      .select(col("bucket"), col("v").as("va"))
    val gb = grid.filter(col("series") === keyB)
      .select(col("bucket").as("bucket_b"), col("v").as("vb"))
    val lags = (-maxLag to maxLag).map(_.toLong).toDF("lag")
    // Pearson from explicit moments via try_divide, not corr(): under
    // ANSI mode both corr() and a plain `/` THROW on a zero divisor
    // (n = 1 or a constant side); try_divide yields NULL there, which
    // is exactly DuckDB corr's verdict on degenerate input. |cov| <=
    // sd_a*sd_b, so a zero divisor is the only degenerate case.
    // round-9 on the output (family convention): the quotient stacks
    // three float reductions whose accumulation order differs between
    // engines, so unrounded values carry latent last-ulp hash risk.
    val c = round(try_divide(covar_pop(col("va"), col("vb")),
      stddev_pop(col("va")) * stddev_pop(col("vb"))), 9)
    ga.crossJoin(broadcast(lags))
      .join(gb, col("bucket_b") === col("bucket") + col("lag") * bucketMs)
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), c.as("ccf_value"))
  }

  /** NRANGE-style guard on the pair sweep: (n choose 2) pairs × the
    * bucket grid is a QUERY cost the caller sets — loud-reject sets
    * big enough that they stop being "a dashboard's series list"
    * (the reference's numkeys discipline, module.c:744-752). */
  val MaxMatrixSeries = 64

  /**
   * Pairwise correlation MATRIX over a bounded series set — the fleet
   * diagnostic ("which of these services move together") generalizing
   * [[pearson]] from one pair to all n·(n−1)/2: one row per unordered
   * pair (series_a < series_b) with the Pearson r of their ALIGNED
   * bucket grids and the overlap count (a spuriously-high r over a
   * thin overlap is visible, the [[ccf]] n_pairs discipline).
   *
   * Plan shape: ONE `series IN`-pushed scan → ONE grid agg; the pair
   * sweep is a grid SELF-JOIN on bucket (series_a < series_b) + one
   * moments agg per pair — no per-pair rescans, nothing quadratic in
   * raw samples. Pairs are quadratic only in the QUERY's series list,
   * guarded at [[MaxMatrixSeries]]. Degenerate pairs (overlap < 2 or
   * a constant side) emit NULL via try_divide — DuckDB corr's verdict.
   */
  def pearsonMatrix(
      samples: DataFrame, seriesSet: Seq[String],
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(seriesSet.size >= 2,
      s"pearsonMatrix needs >= 2 series, got ${seriesSet.size}")
    require(seriesSet.distinct.size == seriesSet.size,
      s"duplicate series in ${seriesSet.mkString(",")}")
    require(seriesSet.size <= MaxMatrixSeries,
      s"pearsonMatrix over ${seriesSet.size} series is " +
        s"${seriesSet.size.toLong * (seriesSet.size - 1) / 2} pairs — " +
        s"cap is $MaxMatrixSeries (the NRANGE numkeys discipline); " +
        "narrow the set or sweep label groups")
    var s = samples.filter(!isnan(col("value")))
      .filter(col("series").isInCollection(seriesSet))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    matrixOfGrid(s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(avg(col("value")).as("v")))
  }

  /** The shared pair sweep: grid self-join on bucket + one moments agg
    * per unordered pair (the ccf try_divide/round-9 convention — NULL
    * on degenerates, the DuckDB corr verdict under ANSI). */
  private def matrixOfGrid(grid: DataFrame): DataFrame = {
    val a = grid.select(col("series").as("series_a"),
      col("bucket"), col("v").as("va"))
    val b = grid.select(col("series").as("series_b"),
      col("bucket"), col("v").as("vb"))
    val c = round(try_divide(covar_pop(col("va"), col("vb")),
      stddev_pop(col("va")) * stddev_pop(col("vb"))), 9)
    a.join(b, Seq("bucket"))
      .filter(col("series_a") < col("series_b"))
      .groupBy(col("series_a"), col("series_b"))
      .agg(count(lit(1)).as("n_buckets"), c.as("corr_value"))
  }

  /**
   * [[pearsonMatrix]] over a LABEL-FILTERED series set — the MRANGE
   * composition: the set resolves through the label index
   * ([[Multi.filterSeries]]'s broadcast semi-join, zero extra corpus
   * passes) instead of an explicit list. Because the matched count is
   * data-dependent, the numkeys guard moves INTO the plan: a lazy
   * assert over the grid's distinct-series count (an agg on the
   * bounded grid, crossJoined back broadcast) fails execution loudly
   * when the filter matches more than `maxSeries` — the TVF-splice
   * discipline, no driver count at analysis time.
   */
  def pearsonMatrixByFilter(
      samples: DataFrame, labels: DataFrame, preds: Seq[Multi.LabelPred],
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      maxSeries: Int = MaxMatrixSeries): DataFrame = {
    require(preds.nonEmpty, "pearsonMatrixByFilter needs >= 1 label predicate")
    require(maxSeries >= 2 && maxSeries <= MaxMatrixSeries,
      s"maxSeries $maxSeries outside [2, $MaxMatrixSeries]")
    var s = Multi.filterSeries(samples, labels, preds)
      .filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
    val n = grid.agg(countDistinct(col("series")).as("__n"))
    val guarded = grid.crossJoin(broadcast(n))
      .filter(assert_true(col("__n") <= maxSeries,
        concat(lit("ts_corr_matrix filter matched "), col("__n").cast("string"),
          lit(s" series > maxSeries=$maxSeries — narrow the label filter " +
            "or sweep label groups"))).isNull)
      .select(col("series"), col("bucket"), col("v"))
    matrixOfGrid(guarded)
  }

  /** Oracle twin of [[pearsonMatrixByFilter]]: the labels CTE resolves
    * the predicate relationally, then the same grid/self-join/moments. */
  def pearsonMatrixByFilterSql(
      preds: Seq[Multi.LabelPred], bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, ${Multi.labelsCte}, matched AS (
       |  SELECT series FROM series_labels WHERE ${Multi.predsSql(preds)}
       |), f AS (
       |  SELECT s.* FROM samples s JOIN matched USING (series) $where
       |), grid AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS v
       |  FROM f GROUP BY series, $bkt
       |)
       |SELECT a.series AS series_a, b.series AS series_b,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  round(CASE WHEN stddev_pop(a.v) * stddev_pop(b.v) > 0
       |    THEN covar_pop(a.v, b.v) / (stddev_pop(a.v) * stddev_pop(b.v))
       |  END, 9) AS corr_value
       |FROM grid a JOIN grid b
       |  ON a.bucket = b.bucket AND a.series < b.series
       |GROUP BY 1, 2""".stripMargin
  }

  /** Oracle twin of [[pearsonMatrix]] — same grid, same self-join,
    * same moments. */
  def pearsonMatrixSql(
      seriesSet: Seq[String], bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val inList = seriesSet.map(k => s"'${q(k)}'").mkString(", ")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)", s"series IN ($inList)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), grid AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS v
       |  FROM f GROUP BY series, $bkt
       |)
       |SELECT a.series AS series_a, b.series AS series_b,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  round(CASE WHEN stddev_pop(a.v) * stddev_pop(b.v) > 0
       |    THEN covar_pop(a.v, b.v) / (stddev_pop(a.v) * stddev_pop(b.v))
       |  END, 9) AS corr_value
       |FROM grid a JOIN grid b
       |  ON a.bucket = b.bucket AND a.series < b.series
       |GROUP BY 1, 2""".stripMargin
  }

  /** Oracle twin of [[ccf]] — the same grid/lag-shift/corr pipeline. */
  def ccfSql(
      keyA: String, keyB: String, bucketMs: Long, maxLag: Int,
      alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)",
      s"series IN ('${q(keyA)}', '${q(keyB)}')") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), grid AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS v
       |  FROM f GROUP BY series, $bkt
       |), a AS (
       |  SELECT bucket, v AS va FROM grid WHERE series = '${q(keyA)}'
       |), b AS (
       |  SELECT bucket AS bucket_b, v AS vb FROM grid WHERE series = '${q(keyB)}'
       |), lags AS (
       |  SELECT CAST(unnest(generate_series(-$maxLag, $maxLag)) AS BIGINT) AS lag
       |)
       |SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |       round(CASE WHEN stddev_pop(va) * stddev_pop(vb) > 0
       |         THEN covar_pop(va, vb) / (stddev_pop(va) * stddev_pop(vb))
       |       END, 9) AS ccf_value
       |FROM a CROSS JOIN lags
       |JOIN b ON bucket_b = bucket + lag * $bucketMs
       |GROUP BY lag""".stripMargin
  }

  /**
   * Rolling correlation — [[pearson]] over a trailing window of the
   * shared bucket grid: one row per grid bucket with the Pearson r of
   * the last `span` ALIGNED buckets (current included), the
   * canary/pairs-trading primitive ("are these two still moving
   * together RIGHT NOW"). `n_window` counts the window's aligned
   * buckets so a thin early window is visible; r is NULL while
   * n < 2 or either side is constant (the [[ccf]] degenerate rule,
   * matching DuckDB's corr).
   *
   * Plan shape: the aligned grid is ONE inner join of the two
   * per-series bucket aggregates (each from a `series IN` pushed
   * scan); the five moment sums share ONE window over the joined
   * frame. The frame is range/bucket rows — a QUERY-bounded single
   * partition (an empty PARTITION BY, same contract as the per-pair
   * [[graft.ts.Trend.acf]] family), so no data-sized sort exists
   * anywhere in the plan.
   */
  def rollingCorr(
      samples: DataFrame, keyA: String, keyB: String,
      bucketMs: Long, span: Int, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(span >= 2, s"rolling corr needs span >= 2, got $span")
    var s = samples.filter(!isnan(col("value")))
      .filter(col("series").isin(keyA, keyB))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(avg(col("value")).as("v"))
    val ga = grid.filter(col("series") === keyA)
      .select(col("bucket"), col("v").as("va"))
    val gb = grid.filter(col("series") === keyB)
      .select(col("bucket"), col("v").as("vb"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(-(span - 1).toLong, Window.currentRow)
    val n = count(lit(1)).over(w).cast("double")
    val sx = sum(col("va")).over(w)
    val sy = sum(col("vb")).over(w)
    val sxx = sum(col("va") * col("va")).over(w)
    val syy = sum(col("vb") * col("vb")).over(w)
    val sxy = sum(col("va") * col("vb")).over(w)
    val r = try_divide(n * sxy - sx * sy,
      sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    ga.join(gb, Seq("bucket"))
      .select(col("bucket"),
        count(lit(1)).over(w).as("n_window"),
        when(isnan(r), lit(null)).otherwise(round(r, 9)).as("corr_value"))
  }

  /** DuckDB twin of [[rollingCorr]] — the same five windowed moment
    * sums (NOT corr() over a frame: its n=1/constant verdicts match
    * the moments form anyway, but the explicit sums pin the exact
    * arithmetic on both engines). */
  def rollingCorrSql(
      keyA: String, keyB: String, bucketMs: Long, span: Int,
      alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)",
      s"series IN ('${q(keyA)}', '${q(keyB)}')") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    val frame = s"OVER (ORDER BY bucket ROWS BETWEEN ${span - 1} PRECEDING AND CURRENT ROW)"
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), grid AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS v
       |  FROM f GROUP BY series, $bkt
       |), j AS (
       |  SELECT a.bucket, a.v AS va, b.v AS vb
       |  FROM (SELECT bucket, v FROM grid WHERE series = '${q(keyA)}') a
       |  JOIN (SELECT bucket, v FROM grid WHERE series = '${q(keyB)}') b USING (bucket)
       |), m AS (
       |  SELECT bucket,
       |    CAST(count(*) $frame AS DOUBLE) AS n,
       |    sum(va) $frame AS sx, sum(vb) $frame AS sy,
       |    sum(va * va) $frame AS sxx, sum(vb * vb) $frame AS syy,
       |    sum(va * vb) $frame AS sxy
       |  FROM j
       |)
       |SELECT bucket, CAST(n AS BIGINT) AS n_window,
       |  round(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
       |    (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
       |  END, 9) AS corr_value
       |FROM m""".stripMargin
  }

  def pearsonSql(
      keyA: String, keyB: String, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), a AS (
       |  SELECT $bkt AS bucket, avg(value) AS va FROM f
       |  WHERE series = '${q(keyA)}' GROUP BY 1
       |), b AS (
       |  SELECT $bkt AS bucket, avg(value) AS vb FROM f
       |  WHERE series = '${q(keyB)}' GROUP BY 1
       |)
       |SELECT round(corr(va, vb), 9) AS corr_value FROM a JOIN b USING (bucket)""".stripMargin
  }
}
