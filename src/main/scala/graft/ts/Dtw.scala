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
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)", s"series IN ($inList)") ++
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
       |  FROM arrs a JOIN arrs b ON a.series < b.series
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
       |      i -> abs(va[i] - vb[k + 1 - i]) +
       |           least(coalesce($up, 1e308),
       |                 coalesce($left, 1e308),
       |                 coalesce($diag, 1e308))),
       |    cur, va, vb, la, lb
       |  FROM dp WHERE k < la + lb
       |)
       |SELECT sa AS series_a, sb AS series_b,
       |       CAST(la AS BIGINT) AS n_a, CAST(lb AS BIGINT) AS n_b,
       |       cur[1] AS dtw_distance
       |FROM dp WHERE k = la + lb""".stripMargin
  }
}
