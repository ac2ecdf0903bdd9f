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

  /** Ordered length-m window folds: sum, sum of squares, and the
    * window array itself for the cross dot product. */
  private def fold(arr: Column)(f: (Column, Column) => Column): Column =
    aggregate(arr, lit(0.0), f)

  def profile(
      samples: DataFrame, bucketMs: Long, m: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(m >= 2, s"matrix profile window m must be >= 2, got $m")
    val excl = (m + 1) / 2 // ceil(m/2)
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
      .filter(size(col("vals")) >= m)
    // one row per (series, window index): the window slice + moments
    val subs = arrs
      .select(col("series"),
        explode(sequence(lit(1), size(col("vals")) - m + 1)).as("idx"),
        col("vals"))
      .select(col("series"), col("idx"),
        slice(col("vals"), col("idx"), lit(m)).as("sub"))
      .withColumn("s1", fold(col("sub"))((acc, x) => acc + x))
      .withColumn("s2", fold(col("sub"))((acc, x) => acc + x * x))
      .drop("vals")
    val a = subs.select(col("series"), col("idx").as("i"),
      col("sub").as("sa"), col("s1").as("s1a"), col("s2").as("s2a"))
    val b = subs.select(col("series"), col("idx").as("j"),
      col("sub").as("sb"), col("s1").as("s1b"), col("s2").as("s2b"))
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
    val dist = round(sqrt(lit(2.0) * mD * (lit(1.0) - r)), 9)
    a.join(b, Seq("series"))
      .filter(abs(col("i") - col("j")) >= excl)
      .select(col("series"), col("i").as("idx"), col("j"), dist.as("d"))
      .groupBy(col("series"), col("idx"))
      .agg(min(struct(col("d"), col("j"))).as("nn"))
      .select(col("series"), col("idx"),
        col("nn.j").as("nn_idx"), col("nn.d").as("mp_value"))
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
}
