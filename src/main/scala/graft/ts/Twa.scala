package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * TWA — time-weighted average over aligned buckets, with boundary
 * interpolation from the neighbouring samples (reference semantics:
 * src/compaction.c:302-459; bucket wiring src/filter_iterator.c:968-1028).
 *
 * Reference behaviour reproduced:
 *  - trapezoidal integration between consecutive samples inside a bucket;
 *  - if the series has a sample before the bucket, the value is linearly
 *    interpolated at the bucket start `ta` and the covered interval
 *    starts at `ta` (first_ts = ta); otherwise it starts at the first
 *    sample's timestamp;
 *  - symmetrically at the bucket end `tb` using the next sample;
 *  - result = integral / (last_ts - first_ts); a single-sample bucket
 *    with no neighbours returns that sample's value
 *    (reference: TwaFinalize, src/compaction.c:409-420);
 *  - bucket edges are clipped to the query range.
 *
 * Spark-first design: no custom UDAF — `lag`/`lead` over a
 * per-series window give each sample its neighbours, per-sample
 * trapezoid contributions are plain column arithmetic (whole-stage
 * codegen), and one `groupBy(series, bucket)` sums them. Exactly one
 * shuffle (by series) for the window + a partial-aggregated groupBy;
 * scales linearly in samples with no driver-side work.
 */
object Twa {

  /**
   * IMPORTANT range semantics (reference golden tests,
   * tests/flow/test_ts_range.py:278-470): boundary interpolation uses
   * the neighbouring samples even when they lie OUTSIDE [from, to] —
   * the reference seeds the boundary from a direct series lookup, not
   * from the range-clipped iterator. So `samples` here must be the
   * series WITHOUT the time-range filter; lag/lead run first, then
   * out-of-range rows are dropped, keeping their values visible as
   * neighbours. A neighbour outside the range is treated as
   * bucket-external even if it falls in the same bucket (the covered
   * interval is clipped at ta/tb).
   */
  def bucketTwa(
      samples: DataFrame,
      bucketMs: Long,
      alignMs: Long = 0L,
      from: Option[Long] = None,
      to: Option[Long] = None): DataFrame = {

    val w = Window.partitionBy(col("series")).orderBy(col("ts"))
    var df = samples
      .filter(!isnan(col("value"))) // NaN samples are invalid for twa
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("prev_v", lag(col("value"), 1).over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("next_v", lead(col("value"), 1).over(w))
      .withColumn("bucket", TSModel.bucketStart(col("ts"), bucketMs, alignMs))
    from.foreach(f => df = df.filter(col("ts") >= f))
    to.foreach(t => df = df.filter(col("ts") <= t))

    // clipped bucket edges [ta, tb): the covered interval never extends
    // past the query range (inclusive `to` treated as exclusive to+1).
    val ta0 = col("bucket")
    val tb0 = col("bucket") + bucketMs
    val ta = from.map(f => greatest(ta0, lit(f))).getOrElse(ta0).cast("double")
    val tb = to.map(t => least(tb0, lit(t + 1))).getOrElse(tb0).cast("double")

    val ts = col("ts").cast("double")
    val v = col("value")
    val pTs = col("prev_ts").cast("double")
    val pV = col("prev_v")
    val nTs = col("next_ts").cast("double")
    val nV = col("next_v")
    val prevOutside = col("prev_ts").isNotNull &&
      (TSModel.bucketStart(col("prev_ts"), bucketMs, alignMs) < col("bucket") ||
        from.map(f => col("prev_ts") < f).getOrElse(lit(false)))
    val prevInside = col("prev_ts").isNotNull && !prevOutside
    val nextOutside = col("next_ts").isNotNull &&
      (TSModel.bucketStart(col("next_ts"), bucketMs, alignMs) > col("bucket") ||
        to.map(t => col("next_ts") > t).getOrElse(lit(false)))

    val interior = when(prevInside, (pV + v) * (ts - pTs) / 2.0).otherwise(0.0)
    val vHead = pV + (ta - pTs) * (v - pV) / (ts - pTs)
    val head = when(prevOutside, (vHead + v) * (ts - ta) / 2.0).otherwise(0.0)
    val vTail = v + (tb - ts) * (nV - v) / (nTs - ts)
    val tail = when(nextOutside, (v + vTail) * (tb - ts) / 2.0).otherwise(0.0)

    val contrib = df
      .withColumn("contrib", interior + head + tail)
      .withColumn("ta", ta)
      .withColumn("tb", tb)
      .withColumn("prev_outside", prevOutside.cast("int"))
      .withColumn("next_outside", nextOutside.cast("int"))

    contrib.groupBy(col("series"), col("bucket"))
      .agg(
        sum(col("contrib")).as("res"),
        max(col("prev_outside")).as("has_prev"),
        max(col("next_outside")).as("has_next"),
        min(col("ts")).cast("double").as("ts_first"),
        max(col("ts")).cast("double").as("ts_last"),
        max(struct(col("ts"), col("value"))).getField("value").as("last_v"),
        first(col("ta")).as("ta"),
        first(col("tb")).as("tb"))
      .select(
        col("series"), col("bucket"),
        {
          val firstTs = when(col("has_prev") === 1, col("ta")).otherwise(col("ts_first"))
          val lastTs = when(col("has_next") === 1, col("tb")).otherwise(col("ts_last"))
          when(lastTs === firstTs, col("last_v"))
            .otherwise(col("res") / (lastTs - firstTs))
            .as("twa_value")
        })
  }

  /**
   * EMPTY + TWA: emit the interior empty buckets too, valued by linear
   * interpolation between the nearest valid sample before the bucket
   * and after it, averaged over the bucket span:
   * value = (line(ta) + line(tb)) / 2 (reference:
   * twa_calc_empty_bucket_val, src/filter_iterator.c:307-359).
   *
   * The reference also has one-sided carry branches with a sample-cadence
   * heuristic, but those are unreachable here: the batch EMPTY spine is
   * interior-only (edge gaps dropped, reference:
   * src/filter_iterator.c:723-746), so every empty bucket has a valid
   * sample on both sides. NaN-only buckets are "empty" for twa as well
   * (they hold no valid sample), which the NaN pre-filter gives us for
   * free.
   *
   * Implemented as a union of real samples with one probe row per empty
   * bucket, and an as-of lookup in both directions via
   * last/first(ignoreNulls) windows — no join against raw samples per
   * bucket, one shuffle by series.
   */
  def bucketTwaWithEmpty(
      samples: DataFrame,
      bucketMs: Long,
      alignMs: Long = 0L,
      from: Option[Long] = None,
      to: Option[Long] = None): DataFrame = {

    val nonEmpty = bucketTwa(samples, bucketMs, alignMs, from, to)
    // spine = query range ∩ series lifetime over VALID samples only
    // (NaN-only buckets are invisible to TWA) — the shared emission
    // rule with the generic gap fill (TSModel.bucketSpine)
    val spine = TSModel.bucketSpine(
      samples.filter(!isnan(col("value"))), bucketMs, alignMs, from, to)
    val emptyB = spine.join(nonEmpty.select("series", "bucket"), Seq("series", "bucket"), "left_anti")

    val valid = samples.filter(!isnan(col("value")))
      .select(col("series"), col("ts"), col("value"), lit(null).cast("long").as("bucket"))
    val probes = emptyB.select(col("series"),
      // probe at the clipped bucket start; the bucket holds no samples,
      // so ordering by ts puts the probe exactly between its neighbours
      from.map(f => greatest(col("bucket"), lit(f))).getOrElse(col("bucket")).as("ts"),
      lit(null).cast("double").as("value"),
      col("bucket"))

    val w = Window.partitionBy(col("series")).orderBy(col("ts"))
    val sampleStruct = when(col("bucket").isNull, struct(col("ts").as("t"), col("value").as("v")))
    val withNb = valid.unionByName(probes)
      .withColumn("before", last(sampleStruct, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("after", first(sampleStruct, ignoreNulls = true)
        .over(w.rowsBetween(1, Window.unboundedFollowing)))

    val ta = from.map(f => greatest(col("bucket"), lit(f))).getOrElse(col("bucket")).cast("double")
    val tb = {
      val t0 = col("bucket") + bucketMs
      to.map(t => least(t0, lit(t + 1))).getOrElse(t0).cast("double")
    }
    val bTs = col("before.t").cast("double"); val bV = col("before.v")
    val aTs = col("after.t").cast("double"); val aV = col("after.v")
    val slope = (aV - bV) / (aTs - bTs)
    val interp = (bV + (ta - bTs) * slope + bV + (tb - bTs) * slope) / 2.0

    val filled = withNb.filter(col("bucket").isNotNull)
      .select(col("series"), col("bucket"), interp.as("twa_value"))
    nonEmpty.unionByName(filled)
  }

  /** DuckDB oracle for [[bucketTwaWithEmpty]]'s gap-filled rows.
    * `extraPred`/`cte` as in [[sql]] — the filter applies before the
    * spine bounds and the neighbour windows, so filtered-out samples
    * are invisible to lifetime and interpolation alike. */
  def emptySql(
      bucketMs: Long,
      alignMs: Long,
      from: Option[Long],
      to: Option[Long],
      seriesPred: Option[String],
      extraPred: Option[String] = None,
      cte: String = TSModel.samplesCte): String = {
    val base = sql(bucketMs, alignMs, from, to, seriesPred, extraPred, cte)
    // neighbours for empty-bucket interpolation may lie outside the
    // query range (same direct-lookup semantics as non-empty twa)
    val cl = Seq.newBuilder[String]
    seriesPred.foreach(cl += _)
    extraPred.foreach(cl += _)
    cl += "NOT isnan(value)"
    val where = cl.result().mkString("WHERE ", " AND ", "")
    val taP = from.map(f => s"greatest(bucket, $f)").getOrElse("bucket")
    val tbE = s"bucket + $bucketMs"
    val tb = to.map(t => s"least($tbE, ${t + 1})").getOrElse(tbE)
    val loB = "(" + TSModel.bucketStartSql("min(ts)", bucketMs, alignMs) + ")"
    val hiB = "(" + TSModel.bucketStartSql("max(ts)", bucketMs, alignMs) + ")"
    val loClip = from.map(f => s"greatest($loB, ${TSModel.bucketStartLong(f, bucketMs, alignMs)})").getOrElse(loB)
    val hiClip = to.map(t => s"least($hiB, ${TSModel.bucketStartLong(t, bucketMs, alignMs)})").getOrElse(hiB)
    s"""WITH ne AS ($base), sp AS (
       |  SELECT series, unnest(generate_series($loClip, $hiClip, $bucketMs)) AS bucket
       |  FROM ($cte SELECT * FROM samples $where) GROUP BY series
       |), eb AS (
       |  SELECT sp.series, sp.bucket FROM sp LEFT JOIN ne USING (series, bucket)
       |  WHERE ne.twa_value IS NULL
       |), u AS (
       |  SELECT series, ts, value, NULL::BIGINT AS bucket
       |  FROM ($cte SELECT * FROM samples $where)
       |  UNION ALL BY NAME
       |  SELECT series, $taP AS ts, NULL::DOUBLE AS value, bucket FROM eb
       |), nb AS (
       |  SELECT series, bucket, ts,
       |    last_value(CASE WHEN bucket IS NULL THEN struct_pack(t := ts, v := value) END IGNORE NULLS)
       |      OVER (PARTITION BY series ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bef,
       |    first_value(CASE WHEN bucket IS NULL THEN struct_pack(t := ts, v := value) END IGNORE NULLS)
       |      OVER (PARTITION BY series ORDER BY ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS aft
       |  FROM u
       |)
       |SELECT series, bucket,
       |  (bef.v + (CAST($taP AS DOUBLE) - bef.t) * (aft.v - bef.v) / (aft.t - bef.t)
       | + bef.v + (CAST($tb  AS DOUBLE) - bef.t) * (aft.v - bef.v) / (aft.t - bef.t)) / 2.0 AS twa_value
       |FROM nb WHERE bucket IS NOT NULL
       |UNION ALL BY NAME
       |SELECT series, bucket, twa_value FROM ne""".stripMargin
  }

  /** DuckDB oracle for [[bucketTwa]] — the same formula spelled in SQL
    * window functions, independently executed by DuckDB. `extraPred`
    * mirrors FILTER_BY_VALUE/TS: it applies BEFORE the neighbour
    * windows, so filtered-out samples are invisible to boundary
    * interpolation (same order as the Spark pipeline). */
  def sql(
      bucketMs: Long,
      alignMs: Long,
      from: Option[Long],
      to: Option[Long],
      seriesPred: Option[String],
      extraPred: Option[String] = None,
      cte: String = TSModel.samplesCte): String = {
    def bkt(c: String) = TSModel.bucketStartSql(c, bucketMs, alignMs)
    val cl = Seq.newBuilder[String]
    seriesPred.foreach(cl += _)
    extraPred.foreach(cl += _)
    cl += "NOT isnan(value)"
    val where = cl.result().mkString("WHERE ", " AND ", "")
    val rangeCl = (from.map(f => s"ts >= $f").toSeq ++ to.map(t => s"ts <= $t")) match {
      case Nil => "TRUE"; case cs => cs.mkString(" AND ")
    }
    val taRaw = "CAST(bucket AS DOUBLE)"
    val tbRaw = s"CAST(bucket + $bucketMs AS DOUBLE)"
    val taC = from.map(f => s"greatest($taRaw, $f)").getOrElse(taRaw)
    val tbC = to.map(t => s"least($tbRaw, ${t + 1})").getOrElse(tbRaw)
    val pOutRange = from.map(f => s" OR prev_ts < $f").getOrElse("")
    val nOutRange = to.map(t => s" OR next_ts > $t").getOrElse("")
    s"""$cte, nb AS (
       |  SELECT series, ts, value,
       |         lag(ts)    OVER w AS prev_ts,  lag(value)  OVER w AS prev_v,
       |         lead(ts)   OVER w AS next_ts,  lead(value) OVER w AS next_v,
       |         ${bkt("ts")} AS bucket
       |  FROM samples $where
       |  WINDOW w AS (PARTITION BY series ORDER BY ts)
       |), c AS (
       |  SELECT series, bucket, ts, value,
       |         $taC AS ta, $tbC AS tb,
       |         (prev_ts IS NOT NULL AND (${bkt("prev_ts")} < bucket$pOutRange)) AS p_out,
       |         (prev_ts IS NOT NULL AND NOT (${bkt("prev_ts")} < bucket$pOutRange)) AS p_in,
       |         (next_ts IS NOT NULL AND (${bkt("next_ts")} > bucket$nOutRange)) AS n_out,
       |         prev_ts, prev_v, next_ts, next_v
       |  FROM nb WHERE $rangeCl
       |), k AS (
       |  SELECT series, bucket, ts, value, ta, tb, p_out, n_out,
       |    (CASE WHEN p_in THEN (prev_v + value) * (ts - prev_ts) / 2.0 ELSE 0 END)
       |    + (CASE WHEN p_out THEN
       |        ((prev_v + (ta - prev_ts) * (value - prev_v) / (ts - prev_ts)) + value) * (ts - ta) / 2.0
       |       ELSE 0 END)
       |    + (CASE WHEN n_out THEN
       |        (value + (value + (tb - ts) * (next_v - value) / (next_ts - ts))) * (tb - ts) / 2.0
       |       ELSE 0 END) AS contrib
       |  FROM c
       |)
       |SELECT series, bucket,
       |  CASE WHEN (CASE WHEN bool_or(n_out) THEN any_value(tb) ELSE CAST(max(ts) AS DOUBLE) END)
       |          = (CASE WHEN bool_or(p_out) THEN any_value(ta) ELSE CAST(min(ts) AS DOUBLE) END)
       |       THEN (max(struct_pack(t := ts, v := value))).v
       |       ELSE sum(contrib) /
       |            ((CASE WHEN bool_or(n_out) THEN any_value(tb) ELSE CAST(max(ts) AS DOUBLE) END)
       |           - (CASE WHEN bool_or(p_out) THEN any_value(ta) ELSE CAST(min(ts) AS DOUBLE) END))
       |  END AS twa_value
       |FROM k GROUP BY 1, 2""".stripMargin
  }
}
