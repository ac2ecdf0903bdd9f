package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CUSUM change detection — beyond-the-reference extension: the
 * normalized cumulative sum of deviations from the series mean,
 * `S_t = Σ_{i≤t}(x_i − μ) / (σ·√N)`, whose maximum excursion is the
 * classic level-shift statistic (a series with a mean shift at time c
 * ramps |S| up to the shift point and back down; |S| stays near 0
 * under no change). Points with `|S_t| ≥ threshold` localize the
 * shift region.
 *
 * Plan shape: μ, σ and N are UNORDERED analytic windows by series and
 * the running sum is an ordered cumulative frame — all four windows
 * resolve over ONE exchange by series (the unordered windows first,
 * the sort feeds the cumulative one), no groupBy+join rescan, no
 * self-join. Deterministic: the cumulative order is (ts, value), a
 * total order up to interchangeable duplicates.
 */
object Changepoint {

  /** `(series, ts, value, cusum_score)` for |S| ≥ threshold (pass 0
    * to emit every scored point, e.g. for plotting the excursion). */
  def cusum(
      samples: DataFrame, threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val wAll = Window.partitionBy(col("series"))
    val wCum = Window.partitionBy(col("series"))
      .orderBy(col("ts"), col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.withColumn("mu", avg(col("value")).over(wAll))
      .withColumn("sigma", stddev_pop(col("value")).over(wAll))
      .withColumn("nn", count(lit(1)).over(wAll))
      .filter(col("sigma") > 0)
      .withColumn("cusum_score",
        sum(col("value") - col("mu")).over(wCum) /
          (col("sigma") * sqrt(col("nn"))))
      .filter(abs(col("cusum_score")) >= threshold)
      .select(col("series"), col("ts"), col("value"), col("cusum_score"))
  }

  /**
   * Offline changepoint LOCALIZATION by binary segmentation (Scott &
   * Knott 1974 lineage; the standard greedy complement of the online
   * [[cusum]] excursion): per series, over the bucket grid, pick the
   * split that maximally reduces the summed squared error of a
   * piecewise-constant fit, then recurse into each child segment for
   * `levels` rounds — the answer to "WHEN did the mean shift, and how
   * much did each shift explain", where cusum only flags the region.
   *
   * Cost model: for a segment of rows 1..n with prefix sums
   * `S_t = Σ v_i`, `Q_t = Σ v_i²`, the SSE of a constant fit over
   * l..r is `Q − S²/len`, so the gain of splitting after row t is
   * `SSE(1..n) − SSE(1..t) − SSE(t+1..n)` — O(1) per candidate from
   * two cumulative windows. The split is the round-9 argmax (earliest
   * bucket breaks ties, the matrix-profile total-order convention).
   *
   * Plan shape (action-free, TVF-spliceable): ONE scan → ONE grid agg
   * (bucket averages round-9 so both engines fold bit-identical
   * inputs) → per level: the cumulative/unordered window family over
   * ONE exchange by (series, segment), with the winning split
   * attached to every grid row by one more window over the SAME
   * exchange (first candidate bucket in (gain DESC, bucket) order —
   * r17: the previous broadcast-join of the rank-1 picks re-planned
   * each level's window family as its own sequential broadcast-build
   * job). Segments shorter than 2·minSize emit no candidate, get a
   * NULL split, and their rows drop out — exactly the recursion's
   * stopping rule. Nothing here scales with raw sample count beyond
   * the grid agg; the window family is grid-bounded (range/bucket
   * rows per series — a query cost the caller sets), and identical
   * per-level exchanges dedupe at runtime (exchange reuse).
   *
   * Output: `(series, level, seg, cp_ts, gain, n_left, n_right)` —
   * one row per executed split; `seg` is the split segment's `l`/`r`
   * path from the root (`''`), `cp_ts` the first bucket of the new
   * regime, `gain` the round-9 SSE reduction.
   */
  def binseg(
      samples: DataFrame, bucketMs: Long, levels: Int = 2,
      minSize: Int = 2, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(levels >= 1 && levels <= 4, s"levels $levels out of 1..4")
    require(minSize >= 2, s"minSize $minSize must be >= 2 (segment variance)")
    require(bucketMs > 0, s"bucketMs $bucketMs must be positive")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    // The grid is a few hundred KB, so AQE coalesces the (series, seg)
    // window exchange to ONE partition and every level's whole window
    // family runs as sequential single-task stages (the theilSen
    // finding, r18; guide §2.5). A PINNED keyed repartition by series
    // (REPARTITION_BY_NUM is exempt from AQE coalescing) satisfies
    // every level's ClusteredDistribution(series, seg) — series is a
    // prefix of each window key — so ONE exchange, spread across the
    // session's slots at every scale, feeds all `levels` rounds; no
    // level adds an exchange the windows did not already require.
    val slots = samples.sparkSession.sparkContext.defaultParallelism
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(round(avg(col("value")), 9).as("v"))
      .repartition(slots, col("series"))

    var seg = grid.withColumn("seg", lit(""))
    var out: Option[DataFrame] = None
    for (lvl <- 0 until levels) {
      val wOrd = Window.partitionBy(col("series"), col("seg"))
        .orderBy(col("bucket"))
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("series"), col("seg"))
      val sseTot = col("q_tot") - col("s_tot") * col("s_tot") / col("n")
      val sseL = col("q_cum") - col("s_cum") * col("s_cum") / col("i")
      val sR = col("s_tot") - col("s_cum")
      val sseR = (col("q_tot") - col("q_cum")) - sR * sR / (col("n") - col("i"))
      // The winning split is attached to EVERY grid row of its segment
      // by one more window over the SAME (series, seg) exchange —
      // first non-null candidate bucket in (gain DESC, bucket) order,
      // i.e. exactly the old rank-1 row (r17; the previous shape
      // broadcast-joined the rank-1 picks back onto the grid, which
      // re-planned each level's whole window family as a separate
      // sequential broadcast-build job — measured 0.2-0.6 s apiece at
      // sf0.1 with levels=3). Non-candidate rows (outside the minSize
      // bounds) carry a NULL gain and sort last, so a segment with no
      // legal split gets a NULL __split and its rows drop out below —
      // the recursion's stopping rule, as before.
      val scored = seg
        .withColumn("i", row_number().over(wOrd).cast("long"))
        .withColumn("next_bucket", lead(col("bucket"), 1).over(wOrd))
        .withColumn("s_cum", sum(col("v")).over(wCum))
        .withColumn("q_cum", sum(col("v") * col("v")).over(wCum))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s_tot", sum(col("v")).over(wAll))
        .withColumn("q_tot", sum(col("v") * col("v")).over(wAll))
        .withColumn("gain",
          when(col("i") >= minSize && col("i") <= col("n") - minSize,
            round(sseTot - sseL - sseR, 9)))
        .withColumn("__split",
          first(when(col("gain").isNotNull, col("bucket")), ignoreNulls = true)
            .over(wAll.orderBy(col("gain").desc, col("bucket"))))
      val lvlRows = scored.filter(col("bucket") === col("__split")).select(
        col("series"), lit(lvl.toLong).as("level"), col("seg"),
        col("next_bucket").as("cp_ts"), col("gain"),
        col("i").as("n_left"), (col("n") - col("i")).as("n_right"))
      out = Some(out.fold(lvlRows)(_.unionByName(lvlRows)))
      if (lvl < levels - 1)
        seg = scored.filter(col("__split").isNotNull)
          .select(col("series"),
            concat(col("seg"),
              when(col("bucket") <= col("__split"), lit("l")).otherwise(lit("r")))
              .as("seg"),
            col("bucket"), col("v"))
    }
    out.get
  }

  /** DuckDB oracle twin of [[binseg]]: the same per-level
    * window/QUALIFY round, unrolled as CTE pairs. */
  def binsegSql(
      bucketMs: Long, levels: Int = 2, minSize: Int = 2, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    // guard parity with the Column twin [[binseg]]: minSize <= 1 would
    // admit i = n candidates whose (s_tot-s_cum)^2/(n-i) divides by
    // zero, and a looser SQL domain breaks differential comparability
    require(levels >= 1 && levels <= 4, s"levels $levels out of 1..4")
    require(minSize >= 2, s"minSize $minSize must be >= 2 (segment variance)")
    require(bucketMs > 0, s"bucketMs $bucketMs must be positive")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    // gain rides OUT of the QUALIFY subquery (the moment columns are
    // consumed inside it), so p$lvl carries it explicitly:
    val lvlsWithGain = (0 until levels).map { lvl =>
      s"""p$lvl AS (
         |  SELECT series, seg, bucket, next_bucket,
         |    round((q_tot - s_tot*s_tot/n) - (q_cum - s_cum*s_cum/i)
         |      - ((q_tot - q_cum) - (s_tot - s_cum)*(s_tot - s_cum)/(n - i)), 9) AS gain,
         |    i, n FROM (
         |    SELECT series, seg, bucket,
         |      lead(bucket) OVER w AS next_bucket,
         |      CAST(row_number() OVER w AS BIGINT) AS i,
         |      sum(v)   OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_cum,
         |      sum(v*v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_cum,
         |      count(*) OVER wp AS n,
         |      sum(v)   OVER wp AS s_tot,
         |      sum(v*v) OVER wp AS q_tot
         |    FROM g$lvl
         |    WINDOW w AS (PARTITION BY series, seg ORDER BY bucket),
         |           wp AS (PARTITION BY series, seg)
         |  ) WHERE i >= $minSize AND i <= n - $minSize
         |  QUALIFY row_number() OVER (PARTITION BY series, seg
         |    ORDER BY gain DESC, bucket) = 1
         |)""".stripMargin + (if (lvl < levels - 1)
        s""", g${lvl + 1} AS (
           |  SELECT g.series,
           |    g.seg || CASE WHEN g.bucket <= p.bucket THEN 'l' ELSE 'r' END AS seg,
           |    g.bucket, g.v
           |  FROM g$lvl g JOIN p$lvl p ON g.series = p.series AND g.seg = p.seg
           |)""".stripMargin else "")
    }.mkString(", ")
    val unionWithGain = (0 until levels).map { lvl =>
      s"""SELECT series, CAST($lvl AS BIGINT) AS level, seg,
         |  next_bucket AS cp_ts, gain, i AS n_left, n - i AS n_right
         |FROM p$lvl""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), g0 AS (
       |  SELECT series, '' AS seg,
       |    ${TSModel.bucketStartSql("ts", bucketMs, alignMs)} AS bucket,
       |    round(avg(value), 9) AS v
       |  FROM f GROUP BY 1, 2, 3
       |), $lvlsWithGain
       |$unionWithGain""".stripMargin
  }

  def cusumSql(
      threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), stats AS (
       |  SELECT series, ts, value,
       |    avg(value)        OVER (PARTITION BY series) AS mu,
       |    stddev_pop(value) OVER (PARTITION BY series) AS sigma,
       |    count(*)          OVER (PARTITION BY series) AS nn
       |  FROM f
       |), scored AS (
       |  SELECT series, ts, value,
       |    sum(value - mu) OVER (PARTITION BY series ORDER BY ts, value
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      / (sigma * sqrt(nn)) AS cusum_score
       |  FROM stats WHERE sigma > 0
       |)
       |SELECT series, ts, value, cusum_score FROM scored
       |WHERE abs(cusum_score) >= $threshold""".stripMargin
  }
}
