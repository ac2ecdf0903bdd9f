package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * LTTB-style downsampling (Largest-Triangle-Three-Buckets,
 * Steinarsson 2013) — beyond-the-reference extension: pick ONE
 * visually-representative point per time bucket, the standard
 * reduction behind plotting 100M-point series at screen resolution.
 *
 * Classic LTTB is inherently sequential (each bucket's choice anchors
 * the next triangle). This is the PARALLEL variant used by large-scale
 * implementations: the anchor on each side is the neighbouring
 * bucket's centroid (avg ts, avg value) instead of its selected point,
 * which removes the cross-bucket dependency entirely — every bucket
 * then selects its max-triangle-area point independently, and the
 * whole operator is two declarative passes:
 *
 *  1. bucket centroids: one hash agg by (series, bucket), map-side
 *     combined;
 *  2. per-point area against the lag/lead centroids (a window over the
 *     TINY centroid frame, O(#buckets) rows) joined back to the
 *     points on (series, bucket) — both sides hash-partition on the
 *     same key, and AQE broadcasts the centroid side when small —
 *     then one `row_number` argmax per bucket.
 *
 * Selection contract (deterministic in both engines): first bucket of
 * a series keeps its FIRST point, last bucket its LAST point (the
 * classic algorithm pins the series endpoints); interior buckets take
 * the point maximizing `|(xA-xC)(yP-yA) - (xA-xP)(yC-yA)|` (twice the
 * triangle area; A = previous centroid, C = next centroid), ties to
 * the earliest ts.
 */
object Lttb {

  /** `(series, bucket, ts, value)` — one selected point per non-empty
    * bucket. */
  def downsample(
      samples: DataFrame, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val pts = s.withColumn("bucket",
      TSModel.bucketStart(col("ts"), bucketMs, alignMs))

    val wB = Window.partitionBy(col("series")).orderBy(col("bucket"))
    val anchors = pts.groupBy(col("series"), col("bucket"))
      .agg(avg(col("ts")).as("ats"), avg(col("value")).as("av"))
      .select(col("series"), col("bucket"),
        lag(col("ats"), 1).over(wB).as("pa_ts"),
        lag(col("av"), 1).over(wB).as("pa_v"),
        lead(col("ats"), 1).over(wB).as("na_ts"),
        lead(col("av"), 1).over(wB).as("na_v"))

    val j = pts.join(anchors, Seq("series", "bucket"))
    // twice the triangle area; NULL on edge buckets (no anchor)
    val area: Column = abs(
      (col("pa_ts") - col("na_ts")) * (col("value") - col("pa_v")) -
        (col("pa_ts") - col("ts")) * (col("na_v") - col("pa_v")))
    // first bucket -> min ts, last bucket -> max ts, else max area
    val key: Column =
      when(col("pa_ts").isNull, col("ts").cast("double"))
        .when(col("na_ts").isNull, -col("ts").cast("double"))
        .otherwise(-area)
    val wPick = Window.partitionBy(col("series"), col("bucket"))
      .orderBy(key.asc, col("ts").asc)
    j.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("series"), col("bucket"), col("ts"), col("value"))
  }

  def downsampleSql(
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, pts AS (
       |  SELECT series, ts, value, $bkt AS bucket FROM samples $where
       |), anchors AS (
       |  SELECT series, bucket,
       |    lag(ats)  OVER (PARTITION BY series ORDER BY bucket) AS pa_ts,
       |    lag(av)   OVER (PARTITION BY series ORDER BY bucket) AS pa_v,
       |    lead(ats) OVER (PARTITION BY series ORDER BY bucket) AS na_ts,
       |    lead(av)  OVER (PARTITION BY series ORDER BY bucket) AS na_v
       |  FROM (
       |    SELECT series, bucket, avg(ts) AS ats, avg(value) AS av
       |    FROM pts GROUP BY series, bucket)
       |), ranked AS (
       |  SELECT p.series, p.bucket, p.ts, p.value,
       |    row_number() OVER (PARTITION BY p.series, p.bucket ORDER BY
       |      CASE
       |        WHEN a.pa_ts IS NULL THEN CAST(p.ts AS DOUBLE)
       |        WHEN a.na_ts IS NULL THEN -CAST(p.ts AS DOUBLE)
       |        ELSE -abs((a.pa_ts - a.na_ts) * (p.value - a.pa_v)
       |                  - (a.pa_ts - p.ts) * (a.na_v - a.pa_v))
       |      END ASC, p.ts ASC) AS rn
       |  FROM pts p JOIN anchors a
       |    ON p.series = a.series AND p.bucket = a.bucket
       |)
       |SELECT series, bucket, ts, value FROM ranked WHERE rn = 1""".stripMargin
  }
}
