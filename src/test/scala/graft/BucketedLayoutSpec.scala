package graft

import graft.ts.{RangeQuery, TSModel}
import graft.ts.RangeQuery.RangeArgs
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The production storage layout: samples bucketed by series and sorted
 * by (series, ts). Per-series aggregation over the bucketed table must
 * plan WITHOUT a shuffle — the bucketed scan's hash-partitioning
 * already satisfies the groupBy distribution. This is the difference
 * between "every mrange shuffles 100 TB" and "every mrange is
 * map-side only", so it gets a plan-level regression test.
 */
class BucketedLayoutSpec extends AnyFunSuite {
  import SparkTest._

  /** Data shuffles only (hash repartitioning for joins/aggregations);
    * the final presentation ORDER BY is a range-partitioning exchange
    * over already-aggregated rows and is not a scale concern. */
  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int =
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }).collect {
      case s: ShuffleExchangeExec
          if s.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => s
    }.size

  test("per-series aggregation over the bucketed table plans shuffle-free") {
    val table = "graft_bucketed_samples_spec"
    try {
      TSModel.writeBucketed(
        TSModel.samples(spark, "/root/testdata/sf0.001"), table, buckets = 8)
      val bucketed = spark.table(table)

      // (series, bucket) aggregation: bucketed on series covers it
      val agged = RangeQuery.range(bucketed,
        RangeArgs(aggs = Seq("avg", "count"), bucketMs = 86400000L))
      assert(countShuffles(agged) == 0,
        s"bucketed per-series agg should be shuffle-free:\n${agged.queryExecution.executedPlan}")

      // MGET shape: groupBy(series) max-struct — also shuffle-free
      val mget = bucketed.groupBy(col("series"))
        .agg(max(struct(col("ts"), col("value"))).as("s"))
      assert(countShuffles(mget) == 0)

      // same aggregation over the unbucketed frame DOES shuffle —
      // proving the assertion above is the layout, not the optimizer
      val flat = RangeQuery.range(TSModel.samples(spark, "/root/testdata/sf0.001"),
        RangeArgs(aggs = Seq("avg", "count"), bucketMs = 86400000L))
      assert(countShuffles(flat) >= 1)

      // and the results agree
      val a = agged.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val b = flat.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(a == b)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("analytics window family over the bucketed table plans shuffle-free") {
    // the round-10 analytics ops are all windows PARTITIONED BY series
    // (zscore/mad/cusum/ewma) — over the bucketed layout the scan's
    // hash-partitioning satisfies the window distribution, so at the
    // production layout the whole family is map-side only
    val table = "graft_bucketed_analytics_spec"
    try {
      TSModel.writeBucketed(
        TSModel.samples(spark, "/root/testdata/sf0.001"), table, buckets = 8)
      val bucketed = spark.table(table)
      val cases: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "zscore" -> graft.ts.Anomaly.zscore(bucketed, 2.0),
        "mad"    -> graft.ts.Anomaly.mad(bucketed, 2.5),
        "cusum"  -> graft.ts.Changepoint.cusum(bucketed, 0.5),
        "ewma"   -> graft.ts.Smoothing.ewma(bucketed, 0.3),
        "trend"  -> graft.ts.Trend.fit(bucketed, 0L),
        "sessions" -> graft.ts.Sessions.sessionRange(bucketed, "avg", 1000L))
      cases.foreach { case (name, df) =>
        assert(countShuffles(df) == 0,
          s"$name over the bucketed layout should be shuffle-free:\n" +
            df.queryExecution.executedPlan)
      }
      // sanity: same ops over the flat frame DO shuffle
      val flat = TSModel.samples(spark, "/root/testdata/sf0.001")
      assert(countShuffles(graft.ts.Changepoint.cusum(flat, 0.5)) >= 1)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
