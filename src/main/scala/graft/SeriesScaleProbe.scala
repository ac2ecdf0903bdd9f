package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.{Multi, RangeQuery, TSModel}

/**
 * Series-COUNT scaling probe (VERDICT r14 missing #3): the reference's
 * comparative scaling suite varies the SERIES population, not the
 * per-series sample count — TS.MGET at 1K/10K/100K/1M series,
 * TS.MRANGE raw/max/avg/twa at 100/1K/10K series, TS.QUERYINDEX at
 * 1K..1M (/root/reference/tests/benchmarks/scaling-*.yml, rows listed
 * in BASELINE.md). ScaleProbe replicates SAMPLES; this probe
 * synthesizes devops-topology LABEL universes (hosts × 10 metrics,
 * region/os labels riding along) and measures the label-indexed
 * operators' wall against series count.
 *
 * What must hold at 100 TB: per-series marginal cost bounded and the
 * curve sub-linear-or-explained. The operators' shapes: QUERYINDEX is
 * a filter over the O(#series) label frame; MGET is one max-struct
 * hash agg by series (map-side combined, output = series count);
 * MRANGE agg is the same grid agg the range family rides. All are one
 * scan + one bounded shuffle — series count only widens the
 * aggregation key space, which Spark absorbs with partition
 * parallelism, so the expected curve is flat-then-linear once the
 * series frame outgrows the job-launch floor.
 *
 * Fixtures are staged to parquet once per (workDir, S) so the timed
 * section measures scan+operator, not generation; P samples/series at
 * a 1 s cadence mirrors the reference specs' small per-series history
 * (their scaling suite holds samples/series fixed too).
 *
 * Usage: runMain graft.SeriesScaleProbe [workDir] [maxSeries]
 * (maxSeries caps the ladder — default 1,000,000 — so a contended
 * host can still run the smaller rungs). Prints one JSON line.
 */
object SeriesScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Devops-shaped universe: S series = S/10 hosts × 10 cpu metrics,
    * labels (hostname, metric, region, os) — the scale-topology of the
    * reference's tsbs-devops scaling fixtures. */
  def synthSamples(spark: SparkSession, nSeries: Long, perSeries: Int): DataFrame =
    spark.range(nSeries * perSeries).select(
      concat(lit("host_"), (col("id") / (10L * perSeries)).cast("long"),
        lit(".m"), (col("id") / perSeries % 10).cast("long")).as("series"),
      (col("id") % perSeries * 1000L).as("ts"),
      (pmod(col("id") * 2654435761L, lit(10000L)).cast("double") / 100.0).as("value"))

  def synthLabels(spark: SparkSession, nSeries: Long): DataFrame =
    spark.range(nSeries).select(
      concat(lit("host_"), (col("id") / 10L).cast("long"),
        lit(".m"), pmod(col("id"), lit(10L))).as("series"),
      map(
        lit("hostname"), concat(lit("host_"), (col("id") / 10L).cast("long")),
        lit("metric"), concat(lit("m"), pmod(col("id"), lit(10L))),
        lit("region"), concat(lit("r"), pmod(col("id") / 10L, lit(8L))),
        lit("os"), concat(lit("os"), pmod(col("id") / 10L, lit(3L)))).as("labels"))

  def main(args: Array[String]): Unit = {
    val work = args.lift(0).getOrElse("/tmp/graft_series_scale")
    val maxSeries = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val perSeries = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(df: DataFrame): Long = df.queryExecution.toRdd.count()
    // the reference requires >=1 inclusive matcher; metric=(m0..m9)
    // matches the whole universe while honoring that grammar
    val allMetrics = Seq(Multi.InSet("metric", (0 until 10).map(i => s"m$i")))

    def stage(s: Long): (DataFrame, DataFrame) = {
      val sDir = s"$work/s$s/samples.parquet"
      val lDir = s"$work/s$s/labels.parquet"
      // Regeneration is keyed on BOTH _SUCCESS markers: gating on one
      // directory alone would let a crash between the two writes leave
      // a half fixture that permanently skips regeneration.
      if (!new java.io.File(sDir + "/_SUCCESS").exists() ||
          !new java.io.File(lDir + "/_SUCCESS").exists()) {
        synthSamples(spark, s, perSeries)
          .repartition(32).write.mode("overwrite").parquet(sDir)
        synthLabels(spark, s)
          .repartition(8).write.mode("overwrite").parquet(lDir)
      }
      (spark.read.parquet(sDir), spark.read.parquet(lDir))
    }

    val ladder = Seq(1000L, 10000L, 100000L, 1000000L).filter(_ <= maxSeries)
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]

    // warm-up: session + codegen on the smallest rung
    locally { val (sm, lb) = stage(1000L)
      run(Multi.mget(sm, lb, allMetrics)) }

    // TS.QUERYINDEX at 1K..1M: pure label-index scan (metric=m0 →
    // S/10 matches; the reference's queryindex suite also uses a
    // selective filter so reply size stays proportional)
    ladder.foreach { s =>
      val (_, lb) = stage(s)
      val (n, t) = timed(run(Multi.queryIndex(lb, Seq(Multi.Eq("metric", "m0")))))
      rows += s""""queryindex_${s}":{"sec":${f"$t%.3f"},"rows":$n}"""
    }
    // TS.MGET at 1K..1M series: last sample of every series
    ladder.foreach { s =>
      val (sm, lb) = stage(s)
      val (n, t) = timed(run(Multi.mget(sm, lb, allMetrics)))
      rows += s""""mget_${s}":{"sec":${f"$t%.3f"},"rows":$n}"""
    }
    // TS.MRANGE raw/max/avg/twa at 100/1K/10K series (reference grid)
    Seq(100L, 1000L, 10000L).filter(_ <= maxSeries).foreach { s =>
      val (sm, lb) = stage(math.max(s, 1000L))
      // 100-series rung: restrict to single-digit hosts (10 hosts × 10
      // metrics) of the 1K fixture — numeric host ids, so a lexical <
      // would misfilter
      val capped =
        if (s < 1000L) sm.filter(col("series").rlike("^host_[0-9]\\.")) else sm
      def args(aggs: Seq[String]) = RangeQuery.RangeArgs(
        aggs = aggs, bucketMs = if (aggs.isEmpty) 0L else 5000L)
      val (nRaw, tRaw) = timed(run(Multi.mrange(capped, lb,
        allMetrics, RangeQuery.RangeArgs())))
      val (nMax, tMax) = timed(run(Multi.mrange(capped, lb,
        allMetrics, args(Seq("max")))))
      val (nAvg, tAvg) = timed(run(Multi.mrange(capped, lb,
        allMetrics, args(Seq("avg")))))
      val (nTwa, tTwa) = timed(run(Multi.mrange(capped, lb,
        allMetrics, args(Seq("twa")))))
      rows += s""""mrange_raw_${s}":{"sec":${f"$tRaw%.3f"},"rows":$nRaw}"""
      rows += s""""mrange_max_${s}":{"sec":${f"$tMax%.3f"},"rows":$nMax}"""
      rows += s""""mrange_avg_${s}":{"sec":${f"$tAvg%.3f"},"rows":$nAvg}"""
      rows += s""""mrange_twa_${s}":{"sec":${f"$tTwa%.3f"},"rows":$nTwa}"""
    }
    println(s"""{"probe":"series_scale","per_series":$perSeries,${rows.mkString(",")}}""")
    spark.stop()
  }
}
