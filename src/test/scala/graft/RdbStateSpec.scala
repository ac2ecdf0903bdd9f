package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._

/** The rule-bearing RDB fixture (VERDICT r06 #5): decoded state must
  * match the reference flow test's OWN assertions
  * (tests/flow/test_rdbs.py:75-84), and the engine's in-flight/flush
  * recompute from raw samples must equal the reference's serialized
  * running context — the one golden whose expected values come from
  * reference-produced state rather than our batch oracle. */
class RdbStateSpec extends AnyFunSuite {
  import SparkTest._

  test("decode matches the reference's own TS.INFO/TS.RANGE assertions") {
    val byKey = RdbState.series.map(s => s.key -> s).toMap
    assert(byKey.keySet == Set("ts1", "ts2"))
    val ts1 = byKey("ts1")
    assert(ts1.totalSamples == 2 && ts1.lastTs == 120 && ts1.lastValue == 5.0)
    assert(ts1.retention == 0 && ts1.srcKey.isEmpty && ts1.labels.isEmpty)
    // rules == [['ts2', 1000, 'AVG', 0]] (alignment 0)
    assert(ts1.rules.map(r => (r.dest, r.bucketMs, r.agg, r.alignMs)) ==
      Seq(("ts2", 1000L, "avg", 0L)))
    // ts.range ts1 - + == [[100, 3], [120, 5]]
    assert(ts1.samples.toSeq == Seq((100L, 3.0), (120L, 5.0)))
    val ts2 = byKey("ts2")
    assert(ts2.totalSamples == 0 && ts2.samples.isEmpty &&
      ts2.srcKey.contains("ts1") && ts2.rules.isEmpty)
    // the serialized mid-bucket running context: sum 8.0 over 2 samples
    // of the still-open bucket 0
    val rule = ts1.rules.head
    assert(rule.startBucket == 0L && rule.ctx.toSeq == Seq(8.0, 2.0))
  }

  test("engine in-flight recompute from raw samples equals the serialized context") {
    val (src, r) = RdbState.rules.head
    val latest = Compaction.latest(
        RdbState.samples(spark).filter(col("series") === src),
        Compaction.Rule(r.agg, r.bucketMs, r.alignMs))
      .collect().map(x => (x.getLong(1), x.getDouble(2))).toSeq
    // reference state: bucket startBucket, value ctx_sum / ctx_cnt
    assert(latest == Seq((r.startBucket, r.ctx(0) / r.ctx(1))))
    assert(latest == Seq((0L, 4.0))) // the flow test's literal numbers
    // and the flushed dest is EMPTY pre-add (ts.range ts2 == [])
    assert(Compaction.materialize(
      RdbState.samples(spark).filter(col("series") === src),
      Compaction.Rule(r.agg, r.bucketMs, r.alignMs)).isEmpty)
  }

  test("replaying the reference's TS.ADD flushes [[0, 4]] like the flow test") {
    val rows = SparkEntry.queries("ts_rdb_avg_ctx_flush")(spark, SparkTest.sf)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(rows == Seq(("ts2", 0L, 4.0)))
    val inflight = SparkEntry.queries("ts_rdb_avg_ctx")(spark, SparkTest.sf)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(inflight == Seq(("ts2", 0L, 4.0)))
  }
}
