package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-series fixed-width value histograms — beyond-the-reference
 * extension (the value-distribution surface behind latency heatmaps;
 * the reference's aggregator vtable has no histogram, SURVEY §2.4).
 *
 * One hash aggregation by (series, bin) with map-side combine: each
 * partition collapses to at most series×nbins partial counts before
 * the shuffle, so shuffle volume is bounded by the histogram size —
 * independent of sample count. That is the canonical 100-TB shape for
 * distribution sketches (same reasoning as the bounded-histogram
 * quality percentile in CorpusPipeline).
 *
 * Binning: `bin = floor((value - lo) / width)` over [lo, hi), values
 * outside the range are dropped (no clamp — a clamped edge bin lies
 * about the distribution's tails; callers widen the range instead).
 * Empty bins are not emitted (downstream gap-fill can densify with a
 * `sequence` spine, the [[TSModel.bucketSpine]] pattern). The
 * bin bounds are reported as columns so the result is self-describing.
 */
object Histogram {

  /** `(series, bin, bin_lo, bin_hi, n)` per non-empty bin. */
  def valueHistogram(
      samples: DataFrame, lo: Double, hi: Double, nbins: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(nbins > 0 && hi > lo, s"bad histogram spec [$lo,$hi)/$nbins")
    val width = (hi - lo) / nbins
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    s.filter(col("value") >= lo && col("value") < hi)
      .groupBy(col("series"),
        floor((col("value") - lo) / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("series"), col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * width).as("bin_hi"),
        col("n"))
  }

  /**
   * Quantile ESTIMATION from the histogram — the PromQL
   * `histogram_quantile` shape: per series, walk the cumulative bin
   * counts to the bin containing rank `q·total` and interpolate
   * linearly inside it. This is the 100-TB quantile path when the
   * exact per-series quantile is too expensive: the full pass only
   * ever shuffles the bounded (series × nbins) histogram, and the
   * estimate's error is bounded by the bin width the CALLER chose —
   * self-describing precision, unlike a sketch's probabilistic bound.
   * The quantile is of the histogram-captured distribution (values
   * outside [lo, hi) were dropped by [[valueHistogram]]'s no-clamp
   * contract).
   *
   * Plan: the histogram agg, then one ordered cumulative window and
   * one rank pick over the HISTOGRAM-sized frame. Output `(series,
   * bin, quantile_value, n_total, cum, n)` — the exact integer
   * moments of the pick bin PLUS the interpolated value.
   *
   * Hash stability (the round-12 explicit-moments convention): the
   * moments `bin/cum/n/n_total` are integers, bit-stable by
   * construction. `quantile_value` is emitted UNROUNDED: it is a
   * fixed-shape chain of IEEE-754 `+ - * /` (all correctly-rounded
   * and therefore engine-independent) over those integers and the
   * literal `lo/width/q` doubles, evaluated in the same association
   * order on both engines — so the double is bit-identical by
   * construction. A trailing `round(x, 9)` would UNDO that guarantee:
   * decimal rounding of a binary double is implementation-defined at
   * half-way points (Spark rounds via exact BigDecimal HALF_UP,
   * DuckDB via a float multiply), and interpolated quantiles hit
   * exact decimal halves often (fractions with small denominators
   * `n`), so this operator must never decimal-round its output.
   * (Post-mortem: the r14/r15 driver hash-reds on this carrier were
   * NOT float wobble — the oracle twin's `sum(n)` windows widened to
   * DuckDB HUGEINT, which the driver canonicalizes differently from
   * Spark's BIGINT; [[histogramQuantileSql]] now CASTs them back and
   * OracleTypeLintSpec guards the whole oracle surface.)
   */
  def histogramQuantile(
      samples: DataFrame, lo: Double, hi: Double, nbins: Int, q: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(q > 0 && q <= 1, s"q $q must be in (0, 1]")
    val width = (hi - lo) / nbins
    val w = org.apache.spark.sql.expressions.Window
    val wCum = w.partitionBy(col("series")).orderBy(col("bin"))
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val wAll = w.partitionBy(col("series"))
    valueHistogram(samples, lo, hi, nbins, fromMs, toMs)
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("n_total", sum(col("n")).over(wAll))
      .withColumn("rnk", lit(q) * col("n_total"))
      .filter(col("cum") >= col("rnk"))
      .withColumn("pick", row_number().over(
        w.partitionBy(col("series")).orderBy(col("bin"))))
      .filter(col("pick") === 1)
      .select(col("series"), col("bin"),
        (col("bin_lo")
          + (col("rnk") - (col("cum") - col("n"))) / col("n") * width)
          .as("quantile_value"),
        col("n_total"), col("cum"), col("n"))
  }

  /** DuckDB oracle twin of [[histogramQuantile]] ([[valueHistogramSql]]
    * wrapped in the same cumulative walk + interpolation). */
  def histogramQuantileSql(
      lo: Double, hi: Double, nbins: Int, q: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(q > 0 && q <= 1, s"q $q must be in (0, 1]")
    val width = (hi - lo) / nbins
    s"""WITH h AS (
       |${valueHistogramSql(lo, hi, nbins, fromMs, toMs, cte).replace("\n", "\n  ")}
       |), walked AS (
       |  SELECT series, bin, bin_lo, n,
       |    CAST(sum(n) OVER (PARTITION BY series ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(n) OVER (PARTITION BY series) AS BIGINT) AS n_total
       |  FROM h
       |)
       |SELECT series, bin,
       |  bin_lo + (($q)::DOUBLE * n_total - (cum - n)) / n * ($width)::DOUBLE
       |    AS quantile_value,
       |  n_total, cum, n
       |FROM walked
       |WHERE cum >= ($q)::DOUBLE * n_total
       |QUALIFY row_number() OVER (PARTITION BY series ORDER BY bin) = 1""".stripMargin
  }

  /**
   * DDSketch-style LOG-bucketed histogram (Masson/Rim/Lee, "DDSketch:
   * a fast and fully-mergeable quantile sketch with relative-error
   * guarantees", VLDB 2019): bucket `⌈log_γ v⌉`-family indexing via
   * `floor(ln v / ln γ)`, so any value in bucket b lies in
   * [γ^b, γ^(b+1)) and a quantile read off the bucket walk has
   * RELATIVE error ≤ (γ−1) — the production quantile-sketch contract
   * (a fixed-width histogram's error is absolute, useless when values
   * span decades). Positive store only: v ≤ 0 is dropped (the
   * paper's negative/zero stores are symmetric copies callers add).
   *
   * Same 100-TB shape as [[valueHistogram]]: ONE hash agg by
   * (series, bucket) with map-side combine — shuffle bounded by
   * series × occupied buckets (≤ log_γ(vmax/vmin)), independent of
   * sample count, and trivially mergeable across partitions/stores
   * because the buckets are fixed by γ alone.
   *
   * Hash stability: `ln` is not correctly rounded across engines, so
   * the log-ratio is round-9 PINNED before the floor (PLANS.md rule 3
   * — both engines then take the same bucket except within 5e-10 of a
   * bucket edge, measure ~1e-6 of generic values); all emitted
   * columns are integers. +Infinity is filtered with NaN (r16 ADVICE:
   * Spark's floor(+inf) cast saturates to Long.MaxValue where DuckDB
   * raises — both engines must agree by construction, and an infinite
   * sample has no log bucket).
   */
  def ddsketchHistogram(
      samples: DataFrame, gamma: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    var s = samples.filter(!isnan(col("value")) && col("value") > 0.0 &&
      col("value") < Double.PositiveInfinity)
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    s.groupBy(col("series"),
        floor(round(log(col("value")) / math.log(gamma), 9)).cast("long")
          .as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * THREE-STORE DDSketch — the paper's FULL value-domain contract
   * (VLDB'19 §2.2: a positive store, a symmetric negative store, and
   * a zero count), where [[ddsketchHistogram]] keeps only the
   * positive store. Output `(series, store, bucket, n)` with
   * store ∈ {-1, 0, 1}: store 1 buckets by `floor(round9(ln v/ln γ))`
   * as before; store −1 buckets by the MAGNITUDE (`ln(−v)`), so a
   * value in (−γ^(b+1), −γ^b] lands in negative bucket b and the
   * relative-error guarantee holds on |v|; store 0 is one bucket-0
   * row counting exact zeros. NaN and ±Infinity are dropped (r16
   * ADVICE: Spark's floor(±inf) cast saturates to Long.Max/MinValue
   * where DuckDB raises — agree by construction).
   *
   * Same bounded shape: ONE map-side-combined hash agg, shuffle
   * bounded by series × (occupied buckets over both signs + 1), and
   * mergeable by adding counts — the (store, bucket) key space is
   * fixed by γ alone.
   */
  def ddsketchHistogramSigned(
      samples: DataFrame, gamma: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    var s = samples.filter(!isnan(col("value")) &&
      col("value") > Double.NegativeInfinity &&
      col("value") < Double.PositiveInfinity)
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val store = when(col("value") > 0.0, 1L)
      .when(col("value") < 0.0, -1L).otherwise(0L)
    val bucket = when(col("value") === 0.0, 0L).otherwise(
      floor(round(log(abs(col("value"))) / math.log(gamma), 9)).cast("long"))
    s.groupBy(col("series"), store.as("store"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** DuckDB oracle twin of [[ddsketchHistogramSigned]]. */
  def ddsketchHistogramSignedSql(
      gamma: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)", "isfinite(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    val lnG = math.log(gamma)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |)
       |SELECT series,
       |  CAST(CASE WHEN value > 0.0 THEN 1 WHEN value < 0.0 THEN -1
       |       ELSE 0 END AS BIGINT) AS store,
       |  CASE WHEN value = 0.0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(floor(round(ln(abs(value)) / ($lnG)::DOUBLE, 9)) AS BIGINT)
       |  END AS bucket,
       |  count(*) AS n
       |FROM f GROUP BY 1, 2, 3""".stripMargin
  }

  /**
   * Quantile from the THREE-STORE sketch: one cumulative walk in
   * value order — negative buckets by DESCENDING bucket index (larger
   * magnitude first), then zeros, then positive buckets ascending —
   * expressed as `ORDER BY store, store·bucket`. Output `(series,
   * store, bucket, cum, n, n_total, q_lo, q_hi)` where the bracket is
   * `[γ^b, γ^(b+1))` for store 1, `(−γ^(b+1), −γ^b]` for store −1
   * (emitted as the closed ends: q_lo = −γ^(b+1) rounds the open
   * bound, the relative-width statement is on |v|), and `[0, 0]` for
   * the zero store. Bounds round-9 (libm pow; PLANS.md rule 4);
   * everything else integers.
   */
  def ddsketchQuantileSigned(
      samples: DataFrame, gamma: Double, q: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame =
    ddsketchQuantileSignedFromBuckets(
      ddsketchHistogramSigned(samples, gamma, fromMs, toMs), gamma, q)

  /** The signed quantile walk of [[ddsketchQuantileSigned]] over an
    * ALREADY-BUILT `(series, store, bucket, n)` sketch frame — the
    * read path shared by the one-shot operator and [[SketchStore]]'s
    * persisted signed state (same factoring as
    * [[ddsketchQuantileFromBuckets]] for the positive-only store). */
  def ddsketchQuantileSignedFromBuckets(
      sketch: DataFrame, gamma: Double, q: Double): DataFrame = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    require(q > 0 && q <= 1, s"q $q must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
    val orderCols = Seq(col("store"), (col("store") * col("bucket")).as("ord"))
    val wCum = w.partitionBy(col("series"))
      .orderBy(orderCols.map(_.asc): _*)
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val wAll = w.partitionBy(col("series"))
    sketch
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("n_total", sum(col("n")).over(wAll))
      .filter(col("cum") >= lit(q) * col("n_total"))
      .withColumn("pick", row_number().over(
        w.partitionBy(col("series")).orderBy(orderCols.map(_.asc): _*)))
      .filter(col("pick") === 1)
      .select(col("series"), col("store"), col("bucket"), col("cum"),
        col("n"), col("n_total"),
        when(col("store") === 1L, round(pow(lit(gamma), col("bucket")), 9))
          .when(col("store") === -1L,
            -round(pow(lit(gamma), col("bucket") + 1), 9))
          .otherwise(lit(0.0)).as("q_lo"),
        when(col("store") === 1L,
            round(pow(lit(gamma), col("bucket") + 1), 9))
          .when(col("store") === -1L,
            -round(pow(lit(gamma), col("bucket")), 9))
          .otherwise(lit(0.0)).as("q_hi"))
  }

  /** DuckDB oracle twin of [[ddsketchQuantileSigned]]. */
  def ddsketchQuantileSignedSql(
      gamma: Double, q: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(q > 0 && q <= 1, s"q $q must be in (0, 1]")
    s"""WITH h AS (
       |${ddsketchHistogramSignedSql(gamma, fromMs, toMs, cte).replace("\n", "\n  ")}
       |), walked AS (
       |  SELECT series, store, bucket, n,
       |    CAST(sum(n) OVER (PARTITION BY series
       |      ORDER BY store, store * bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(n) OVER (PARTITION BY series) AS BIGINT) AS n_total
       |  FROM h
       |)
       |SELECT series, store, bucket, cum, n, n_total,
       |  CASE WHEN store = 1 THEN round(power(($gamma)::DOUBLE, bucket), 9)
       |       WHEN store = -1 THEN -round(power(($gamma)::DOUBLE, bucket + 1), 9)
       |       ELSE 0.0::DOUBLE END AS q_lo,
       |  CASE WHEN store = 1 THEN round(power(($gamma)::DOUBLE, bucket + 1), 9)
       |       WHEN store = -1 THEN -round(power(($gamma)::DOUBLE, bucket), 9)
       |       ELSE 0.0::DOUBLE END AS q_hi
       |FROM walked
       |WHERE cum >= ($q)::DOUBLE * n_total
       |QUALIFY row_number() OVER (PARTITION BY series
       |  ORDER BY store, store * bucket) = 1""".stripMargin
  }

  /**
   * Quantile from the DDSketch buckets: walk the cumulative counts to
   * the bucket containing rank `q·total`. Output `(series, bucket,
   * cum, n, n_total, q_lo, q_hi)` — the exact integer moments plus the
   * bucket's value bounds `[γ^b, γ^(b+1))`, which bracket the true
   * quantile of the positive store with relative width γ (the sketch's
   * accuracy statement, self-describing in the row). The bounds are
   * round-9 (pow is libm; generic magnitudes — PLANS.md rule 4).
   */
  def ddsketchQuantile(
      samples: DataFrame, gamma: Double, q: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame =
    ddsketchQuantileFromBuckets(
      ddsketchHistogram(samples, gamma, fromMs, toMs), gamma, q)

  /** The quantile walk of [[ddsketchQuantile]] over an ALREADY-BUILT
    * `(series, bucket, n)` sketch frame — the read path shared by the
    * one-shot operator and [[SketchStore]]'s persisted state (the
    * whole point of a mergeable sketch: quantiles come off the
    * maintained buckets, not the raw samples). */
  def ddsketchQuantileFromBuckets(
      sketch: DataFrame, gamma: Double, q: Double): DataFrame = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    require(q > 0 && q <= 1, s"q $q must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
    val wCum = w.partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val wAll = w.partitionBy(col("series"))
    sketch
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("n_total", sum(col("n")).over(wAll))
      .filter(col("cum") >= lit(q) * col("n_total"))
      .withColumn("pick", row_number().over(
        w.partitionBy(col("series")).orderBy(col("bucket"))))
      .filter(col("pick") === 1)
      .select(col("series"), col("bucket"), col("cum"), col("n"),
        col("n_total"),
        round(pow(lit(gamma), col("bucket")), 9).as("q_lo"),
        round(pow(lit(gamma), col("bucket") + 1), 9).as("q_hi"))
  }

  /** DuckDB oracle twin of [[ddsketchHistogram]]. */
  def ddsketchHistogramSql(
      gamma: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)", "value > 0.0", "isfinite(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    val lnG = math.log(gamma)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |)
       |SELECT series,
       |  CAST(floor(round(ln(value) / ($lnG)::DOUBLE, 9)) AS BIGINT) AS bucket,
       |  count(*) AS n
       |FROM f GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB oracle twin of [[ddsketchQuantile]]. */
  def ddsketchQuantileSql(
      gamma: Double, q: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(q > 0 && q <= 1, s"q $q must be in (0, 1]")
    s"""WITH h AS (
       |${ddsketchHistogramSql(gamma, fromMs, toMs, cte).replace("\n", "\n  ")}
       |), walked AS (
       |  SELECT series, bucket, n,
       |    CAST(sum(n) OVER (PARTITION BY series ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(n) OVER (PARTITION BY series) AS BIGINT) AS n_total
       |  FROM h
       |)
       |SELECT series, bucket, cum, n, n_total,
       |  round(power(($gamma)::DOUBLE, bucket), 9) AS q_lo,
       |  round(power(($gamma)::DOUBLE, bucket + 1), 9) AS q_hi
       |FROM walked
       |WHERE cum >= ($q)::DOUBLE * n_total
       |QUALIFY row_number() OVER (PARTITION BY series ORDER BY bucket) = 1""".stripMargin
  }

  /**
   * WINDOWED DDSketch — one sketch per (series, tumbling `windowMs`
   * window): the per-interval quantile-sketch table a monitoring
   * store actually materializes ("p99 per minute"), and the batch
   * twin of the shared stream pass's sketch monitor
   * ([[StreamMonitors]] op `d`). Output `(series, wstart, bucket, n)`
   * — all integers/strings, bit-stable by construction.
   *
   * Same bounded shape as [[ddsketchHistogram]] with the window key
   * folded in: ONE map-side-combined hash agg whose result is
   * series × windows × occupied buckets — never sample-sized.
   */
  def ddsketchWindowed(
      samples: DataFrame, gamma: Double, windowMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    require(windowMs > 0, s"windowMs $windowMs must be positive")
    var s = samples.filter(!isnan(col("value")) && col("value") > 0.0)
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), windowMs).as("wstart"),
        floor(round(log(col("value")) / math.log(gamma), 9)).cast("long")
          .as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** DuckDB oracle twin of [[ddsketchWindowed]]. `closedOnly = true`
    * restricts to windows the stream replay CLOSED — `wstart +
    * windowMs ≤ max(ts)` per series over the sketch's own filtered
    * rows (positive, non-NaN) — matching [[StreamMonitors]]'
    * closed-only emit discipline for op `d`. */
  def ddsketchWindowedSql(
      gamma: Double, windowMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte, closedOnly: Boolean = false): String = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    require(windowMs > 0, s"windowMs $windowMs must be positive")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)", "value > 0.0", "isfinite(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    val lnG = math.log(gamma)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), sk AS (
       |  SELECT series,
       |    ${TSModel.bucketStartSql("ts", windowMs)} AS wstart,
       |    CAST(floor(round(ln(value) / ($lnG)::DOUBLE, 9)) AS BIGINT) AS bucket,
       |    count(*) AS n
       |  FROM f GROUP BY 1, 2, 3
       |)
       |SELECT sk.series, wstart, bucket, n FROM sk
       |${if (closedOnly)
          s"JOIN (SELECT series, max(ts) AS mx FROM f GROUP BY 1) m ON sk.series = m.series\n" +
          s"WHERE wstart + $windowMs <= m.mx"
        else ""}""".stripMargin
  }

  /**
   * WINDOWED THREE-STORE DDSketch — [[ddsketchWindowed]] with the
   * full signed value-domain of [[ddsketchHistogramSigned]]: one
   * sketch per (series, tumbling window) with negative/zero/positive
   * stores. Output `(series, wstart, store, bucket, n)` — integers
   * and strings only, bit-stable by construction. Same bounded shape:
   * ONE map-side-combined hash agg, result is series × windows ×
   * (occupied buckets over both signs + 1).
   */
  def ddsketchWindowedSigned(
      samples: DataFrame, gamma: Double, windowMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    require(windowMs > 0, s"windowMs $windowMs must be positive")
    var s = samples.filter(!isnan(col("value")) &&
      col("value") > Double.NegativeInfinity &&
      col("value") < Double.PositiveInfinity)
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val store = when(col("value") > 0.0, 1L)
      .when(col("value") < 0.0, -1L).otherwise(0L)
    val bucket = when(col("value") === 0.0, 0L).otherwise(
      floor(round(log(abs(col("value"))) / math.log(gamma), 9)).cast("long"))
    s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), windowMs).as("wstart"),
        store.as("store"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** DuckDB oracle twin of [[ddsketchWindowedSigned]]. */
  def ddsketchWindowedSignedSql(
      gamma: Double, windowMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(gamma > 1.0, s"gamma $gamma must be > 1 (relative accuracy γ−1)")
    require(windowMs > 0, s"windowMs $windowMs must be positive")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)", "isfinite(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    val lnG = math.log(gamma)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |)
       |SELECT series,
       |  ${TSModel.bucketStartSql("ts", windowMs)} AS wstart,
       |  CAST(CASE WHEN value > 0.0 THEN 1 WHEN value < 0.0 THEN -1
       |       ELSE 0 END AS BIGINT) AS store,
       |  CASE WHEN value = 0.0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(floor(round(ln(abs(value)) / ($lnG)::DOUBLE, 9)) AS BIGINT)
       |  END AS bucket,
       |  count(*) AS n
       |FROM f GROUP BY 1, 2, 3, 4""".stripMargin
  }

  /**
   * BOUNDED-SIZE collapsing store (DDSketch VLDB'19 §2.4) — the
   * memory contract a production sketch advertises: at most
   * `maxBuckets` buckets per series, enforced by DETERMINISTICALLY
   * folding every bucket below the `maxBuckets`-th largest index into
   * that floor bucket (the paper's repeated lowest-pair merge reaches
   * exactly this fixed point, so one set-oriented pass replaces the
   * loop — and determinism makes the collapse oracle-replayable in
   * SQL). [[ddsketchHistogram]]'s bucket count is bounded only by
   * log_γ(vmax/vmin): fine for telemetry, unbounded on adversarial
   * value ranges.
   *
   * Error statement under collapse (the paper's): quantiles whose
   * rank lands STRICTLY ABOVE the floor bucket are untouched — their
   * buckets are identical to the uncollapsed sketch's, so the γ−1
   * relative bound holds exactly; a quantile landing in the floor
   * bucket is only upper-bounded (its q_hi) because the floor bucket
   * absorbed smaller-valued mass. SketchStoreSpec pins both halves.
   *
   * `strict = true` (the loud-reject default, mirroring the
   * matrix-profile window cap): exceeding the budget RAISES at
   * execution via `raise_error` instead of silently collapsing —
   * callers opt into lossy collapse explicitly with `strict = false`.
   * Output when collapsing: `(series, bucket, n, collapsed)` where
   * `collapsed` marks the floor bucket that absorbed lower mass.
   *
   * Shape: two window functions + one re-agg over the MODEL-SIZED
   * bucket table (series × ≤maxBuckets rows) — the samples were
   * already collapsed to buckets by the one map-side-combined agg.
   */
  def ddsketchCollapse(
      sketch: DataFrame, maxBuckets: Int, strict: Boolean = true): DataFrame = {
    require(maxBuckets >= 2,
      s"maxBuckets $maxBuckets must be >= 2 (one floor + one live bucket)")
    val w = org.apache.spark.sql.expressions.Window
    val wDesc = w.partitionBy(col("series")).orderBy(col("bucket").desc)
    val wSer = w.partitionBy(col("series"))
    val rk = sketch
      .withColumn("rk", row_number().over(wDesc))
      .withColumn("floor_b",
        max(when(col("rk") === maxBuckets, col("bucket"))).over(wSer))
      .withColumn("nb", max(col("rk")).over(wSer))
    if (strict)
      // loud reject: the budget is a contract, not a hint — the error
      // fires lazily at execution (action-free plan) on the first
      // over-budget series
      rk.select(col("series"), col("bucket"),
        when(col("nb") > maxBuckets,
          raise_error(concat(lit("ddsketch bucket budget exceeded: "),
            col("nb").cast("string"), lit(s" > $maxBuckets buckets for series "),
            col("series"), lit(" — pass strict=false to collapse")))
            .cast("long"))
          .otherwise(col("n")).as("n"))
    else
      rk.groupBy(col("series"),
          when(col("floor_b").isNotNull && col("bucket") < col("floor_b"),
            col("floor_b")).otherwise(col("bucket")).as("bucket"))
        .agg(sum(col("n")).as("n"),
          max(col("nb")).as("nb_max"), max(col("floor_b")).as("floor_b_max"))
        .select(col("series"), col("bucket"), col("n"),
          coalesce(col("nb_max") > maxBuckets &&
            col("bucket") === col("floor_b_max"), lit(false)).as("collapsed"))
  }

  /** [[ddsketchHistogram]] under the [[ddsketchCollapse]] budget —
    * the bounded-memory one-shot sketch. */
  def ddsketchHistogramCollapsed(
      samples: DataFrame, gamma: Double, maxBuckets: Int,
      strict: Boolean = true,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame =
    ddsketchCollapse(
      ddsketchHistogram(samples, gamma, fromMs, toMs), maxBuckets, strict)

  /** DuckDB oracle twin of [[ddsketchHistogramCollapsed]] with
    * `strict = false` (the collapsing form — the strict form's only
    * observable is an error). */
  def ddsketchHistogramCollapsedSql(
      gamma: Double, maxBuckets: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(maxBuckets >= 2,
      s"maxBuckets $maxBuckets must be >= 2 (one floor + one live bucket)")
    s"""WITH h AS (
       |${ddsketchHistogramSql(gamma, fromMs, toMs, cte).replace("\n", "\n  ")}
       |), rk AS (
       |  SELECT series, bucket, n,
       |    CAST(row_number() OVER (PARTITION BY series ORDER BY bucket DESC)
       |      AS BIGINT) AS rk
       |  FROM h
       |), fl AS (
       |  SELECT series,
       |    max(CASE WHEN rk = $maxBuckets THEN bucket END) AS floor_b,
       |    max(rk) AS nb
       |  FROM rk GROUP BY 1
       |), mapped AS (
       |  SELECT rk.series,
       |    CASE WHEN fl.floor_b IS NOT NULL AND rk.bucket < fl.floor_b
       |         THEN fl.floor_b ELSE rk.bucket END AS bucket,
       |    rk.n, fl.floor_b, fl.nb
       |  FROM rk JOIN fl ON rk.series = fl.series
       |)
       |SELECT series, bucket, CAST(sum(n) AS BIGINT) AS n,
       |  COALESCE(max(nb) > $maxBuckets AND bucket = max(floor_b), false)
       |    AS collapsed
       |FROM mapped GROUP BY 1, 2""".stripMargin
  }

  def valueHistogramSql(
      lo: Double, hi: Double, nbins: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(nbins > 0 && hi > lo, s"bad histogram spec [$lo,$hi)/$nbins")
    val width = (hi - lo) / nbins
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)",
      s"value >= ($lo)::DOUBLE", s"value < ($hi)::DOUBLE") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), binned AS (
       |  SELECT series,
       |    CAST(floor((value - ($lo)::DOUBLE) / ($width)::DOUBLE) AS BIGINT) AS bin,
       |    count(*) AS n
       |  FROM f GROUP BY 1, 2
       |)
       |SELECT series, bin,
       |  ($lo)::DOUBLE + bin * ($width)::DOUBLE AS bin_lo,
       |  ($lo)::DOUBLE + (bin + 1) * ($width)::DOUBLE AS bin_hi,
       |  n
       |FROM binned""".stripMargin
  }
}
