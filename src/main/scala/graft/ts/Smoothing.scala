package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Windowed exponentially-weighted moving average — beyond-the-reference
 * extension (the PromQL/pandas smoothing surface; the reference's
 * aggregator vtable has no EWM, SURVEY §2.4).
 *
 * Semantics: pandas `ewm(alpha, adjust=True)` truncated to the last
 * `span` samples —
 *   `ewma_t = Σ_{i=0..span-1} (1-α)^i · x_{t-i} / Σ_{i} (1-α)^i`
 * (missing leading samples simply shorten the sum; no NaN seeding).
 *
 * A true infinite-history EWMA is a sequential recurrence — the one
 * shape a declarative plan cannot express without a quadratic blowup
 * or numeric overflow tricks. The WINDOWED form is the scale-correct
 * reformulation: `collect_list` over a ROWS frame (bounded to `span`
 * values per row, constant memory) + one `aggregate` fold, all inside
 * a single shuffle by series. The truncation error is bounded by
 * `(1-α)^span` (< 1e-5 for the default span 32 at α = 0.3) — the
 * standard streaming-systems trade, stated rather than hidden.
 *
 * The fold iterates the frame NEWEST-first with multiplicative weight
 * decay, so each row's result is independent of partition boundaries
 * and deterministic.
 */
object Smoothing {

  /** `(series, ts, value, ewma)` for every in-range sample. */
  def ewma(
      samples: DataFrame, alpha: Double, span: Int = 32,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha outside (0, 1]")
    require(span > 0, s"span $span must be positive")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    // (ts, value) order — the family-wide determinism contract; ts
    // alone leaves the ROWS frame nondeterministic on duplicate ts.
    val w = Window.partitionBy(col("series")).orderBy(col("ts"), col("value"))
      .rowsBetween(-(span - 1).toLong, Window.currentRow)
    val decay = 1.0 - alpha
    val fold: Column = aggregate(
      reverse(collect_list(col("value")).over(w)),
      struct(lit(0.0).as("num"), lit(0.0).as("den"), lit(1.0).as("wt")),
      (acc, x) => struct(
        (acc("num") + acc("wt") * x).as("num"),
        (acc("den") + acc("wt")).as("den"),
        (acc("wt") * decay).as("wt")),
      acc => acc("num") / acc("den"))
    s.select(col("series"), col("ts"), col("value"), fold.as("ewma"))
  }

  /** Oracle twin: the same truncated-weight sum as an O(span)
    * self-join on per-series row numbers (no list fold needed in
    * SQL; `power` vs the fold's running product agree well inside
    * the compare tolerance). */
  def ewmaSql(
      alpha: Double, span: Int = 32,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val decay = 1.0 - alpha
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), rn AS (
       |  SELECT series, ts, value,
       |    row_number() OVER (PARTITION BY series ORDER BY ts, value) AS rn
       |  FROM f
       |)
       |SELECT a.series, a.ts, a.value,
       |  sum(power(($decay)::DOUBLE, a.rn - b.rn) * b.value)
       |    / sum(power(($decay)::DOUBLE, a.rn - b.rn)) AS ewma
       |FROM rn a JOIN rn b
       |  ON a.series = b.series AND b.rn <= a.rn AND b.rn > a.rn - $span
       |GROUP BY a.series, a.ts, a.value""".stripMargin
  }
}
