package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._
import graft.ts.RangeQuery.RangeArgs

/** NRANGE differential in the reference's own style
  * (reference: tests/flow/test_ts_nrange_compare.py — ground truth is
  * per-key TS.RANGE merged/pivoted by hand, across an option
  * cross-product). */
class NrangeCompareSpec extends AnyFunSuite {
  import SparkTest._

  private val keys = Seq("click_3", "click_7", "view_3")
  private val T0 = 1704067200000L
  private val DAY = 86400000L

  test("nrange pivot equals per-key range results across option cross-product") {
    val samples = TSModel.samples(spark, sf)
    for {
      aggs <- Seq(Nil, Seq("avg"), Seq("max"), Seq("count"))
      (from, to) <- Seq((T0, T0 + 31 * DAY), (T0 + 5 * DAY, T0 + 20 * DAY))
    } {
      val args = RangeArgs(from = Some(from), to = Some(to), aggs = aggs,
        bucketMs = if (aggs.isEmpty) 0L else 2 * DAY)
      val pivot = Multi.nrange(samples, keys, args)
        .collect().map { r =>
          (r.getLong(0), keys.indices.map { i =>
            val v = r.get(i + 1)
            v match {
              case d: java.lang.Double => d.doubleValue
              case l: java.lang.Long   => l.toDouble
              case null                => Double.NaN
            }
          })
        }.toMap
      // ground truth: run each key through the single-series pipeline
      val perKey: Map[String, Map[Long, Double]] = keys.map { k =>
        val rows = RangeQuery.range(samples.filter(col("series") === k), args)
          .collect().map { r =>
            val v = r.get(2) match {
              case d: java.lang.Double => d.doubleValue
              case l: java.lang.Long   => l.toDouble
            }
            r.getLong(1) -> v
          }.toMap
        k -> rows
      }.toMap
      val allTs = perKey.values.flatMap(_.keys).toSet
      assert(pivot.keySet == allTs, s"args=$args ts sets differ")
      for (ts <- allTs; (k, i) <- keys.zipWithIndex) {
        val exp = perKey(k).getOrElse(ts, Double.NaN)
        val got = pivot(ts)(i)
        assert((exp.isNaN && got.isNaN) || math.abs(exp - got) < 1e-9,
          s"args=$args ts=$ts key=$k: got $got expected $exp")
      }
    }
  }
}
