package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ts.Tsbs

/** TSBS devops parity rows (round 14): the devops view mapping and the
  * headline query shapes. Cross-engine value parity lives in the 14
  * tsbs_* oracle entries; this spec pins the view contract and the
  * properties the oracles can't see (ordering, bounds, topology). */
class TsbsSpec extends AnyFunSuite {
  import SparkTest._

  test("ingestion precondition: no (series, ts) group mixes NaN and valid values") {
    // Policy MAX replay is arrival-order independent ONLY under this
    // property (Tsbs.ingestOnce scaladoc): the write path poisons a
    // NaN-first duplicate group to NaN while the ingestSql oracle takes
    // the max valid regardless of order. Assert it per-fixture so a
    // regenerated fixture that violates it fails here, not as a
    // flaky driver hash.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val mixed = Tsbs.cpuSamples(spark, dir)
        .groupBy(col("series"), col("ts"))
        .agg(sum(when(isnan(col("value")), 1).otherwise(0)).as("n_nan"),
          sum(when(isnan(col("value")), 0).otherwise(1)).as("n_ok"))
        .filter(col("n_nan") > 0 && col("n_ok") > 0)
        .count()
      assert(mixed == 0L, s"$dir: $mixed NaN/valid duplicate mixes — " +
        "ingestSql oracle no longer matches the arrival-order fold")
    }
  }

  test("devops view: scale100 topology, bounded usage, well-formed series keys") {
    val cpu = Tsbs.cpuSamples(spark, sf)
    val parts = cpu.select(
      substring_index(col("series"), ":", 1).as("hostname"),
      substring_index(col("series"), ":", -1).as("metric"),
      col("value")).cache()
    try {
      // host set == user_id % 100 image (100 hosts at sf0.01+ — the
      // scale100 shape; the tiny smoke SF carries a prefix subset)
      val expectedHosts = spark.read.parquet(s"$sf/events.parquet")
        .select(pmod(col("user_id"), lit(100))).distinct().count()
      val hosts = parts.select("hostname").distinct().collect().map(_.getString(0))
      assert(hosts.length == expectedHosts,
        s"expected $expectedHosts hosts, got ${hosts.length}")
      assert(hosts.forall(h => h.startsWith("host_") &&
        (0 to 99).contains(h.stripPrefix("host_").toInt)))
      val metrics = parts.select("metric").distinct().collect().map(_.getString(0)).toSet
      assert(metrics.subsetOf(Tsbs.Metrics.toSet) && metrics.nonEmpty)
      // usage = fmod(value, 100) of a positive fixture: [0, 100)
      assert(parts.filter(col("value") < 0.0 || col("value") >= 100.0).count() == 0)
      // labels frame: one row per series, hostname/metric round-trip
      val lbl = Tsbs.cpuLabels(spark, sf)
      assert(lbl.count() == cpu.select("series").distinct().count())
      assert(lbl.filter(
        element_at(col("labels"), "hostname") =!=
          substring_index(col("series"), ":", 1) ||
        element_at(col("labels"), "metric") =!=
          substring_index(col("series"), ":", -1)).count() == 0)
    } finally parts.unpersist()
  }

  test("headline query shapes: ordering, bounds, and operator-level invariants") {
    val T0 = 1704067200000L; val DAY = 86400000L
    // groupby-orderby-limit: exactly the 5 LATEST buckets, descending
    val gol = Tsbs.groupbyOrderbyLimit(spark, sf, T0 + 20 * DAY, DAY, 5).collect()
    assert(gol.length == 5)
    val ts = gol.map(_.getLong(1))
    assert(ts.sorted.reverse.sameElements(ts), "rows must arrive ts-descending")
    assert(ts.forall(_ <= T0 + 20 * DAY))
    // high-cpu: every surviving sample is inside the value filter
    val hc = Tsbs.highCpu(spark, sf, None, 90.0, T0, T0 + 31 * DAY - 1)
    assert(hc.filter(col("value") < 90.0 || col("value") > 100.0).count() == 0)
    assert(hc.count() > 0, "fixture must carry high-cpu matches")
    // lastpoint: one row per series (TS.MGET contract), no null samples
    // here (every series in the labels frame has data by construction)
    val lp = Tsbs.lastpoint(spark, sf)
    assert(lp.count() == Tsbs.cpuLabels(spark, sf).count())
    assert(lp.filter(col("ts").isNull).count() == 0)
    // single-groupby-1-8-1 reduces across hosts: one pseudo-series
    val sg8 = Tsbs.singleGroupby(spark, sf, 1, Tsbs.Hosts8, T0, T0 + 31 * DAY - 1, DAY)
    assert(sg8.select("series").distinct().collect()
      .map(_.getString(0)).toSet == Set("metric=usage_user"))
    // per-bucket reduced max >= any member host's bucketed max
    val member = Tsbs.Hosts8.head
    val single = Tsbs.singleGroupby(spark, sf, 1, Seq(member), T0, T0 + 31 * DAY - 1, DAY)
      .withColumnRenamed("max_value", "host_max")
    val joined = sg8.join(single, Seq("ts"))
    assert(joined.count() > 0, s"$member must carry buckets")
    assert(joined.filter(col("max_value") < col("host_max")).count() == 0)
  }
}
