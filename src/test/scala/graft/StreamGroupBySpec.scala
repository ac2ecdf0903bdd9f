package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Aggs, Multi, StreamGroupBy, RangeQuery}

/** Streaming MRANGE GROUPBY REDUCE: the continuous two-level reduction
  * must converge to the batch operator's relation for any chunking of
  * the arrival order (state partials are order-insensitive). The
  * fixture-scale hash check lives in the ts_mrange_groupby_stream
  * oracle entry, which shares the batch query's DuckDB oracle. */
class StreamGroupBySpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def randomFrame(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val grp = s"g${rnd.nextInt(3)}"
      val series = s"${grp}_s${rnd.nextInt(4)}"
      (series, rnd.nextInt(10000).toLong, rnd.nextInt(1000) / 10.0)
    }.toDF("series", "ts", "value")
  }

  private def labelsFor(samples: org.apache.spark.sql.DataFrame) =
    samples.select(col("series")).distinct()
      .select(col("series"),
        map(lit("grp"), substring(col("series"), 1, 2)).as("labels"))

  private def compare(agg: String, reducer: String, chunkCol: String,
      seed: Int): Unit = {
    val samples = randomFrame(seed, 300)
    val labels = labelsFor(samples)
    val preds = Seq(Multi.parsePred("grp=(g0,g1,g2)"))
    val batch = Multi.mrangeGroupBy(samples, labels, preds,
      RangeQuery.RangeArgs(from = Some(0L), to = Some(9000L),
        aggs = Seq(agg), bucketMs = 1000L),
      groupByLabel = "grp", reducer = reducer)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    val s2g = labels.select(col("series"),
      element_at(col("labels"), "grp").as("lv"))
    val streamed = StreamGroupBy.mrangeGroupByStreamChunks(
      spark, samples, s2g, "grp", agg, reducer, bucketMs = 1000L,
      fromMs = Some(0L), toMs = Some(9000L), nChunks = 4,
      chunkCol = col(chunkCol))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(streamed.keySet == batch.keySet,
      s"[$agg/$reducer/$chunkCol] key sets differ: " +
        s"only-stream=${streamed.keySet -- batch.keySet} " +
        s"only-batch=${batch.keySet -- streamed.keySet}")
    streamed.foreach { case (k, v) =>
      val b = batch(k)
      assert(math.abs(v - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"[$agg/$reducer/$chunkCol] $k: stream $v vs batch $b")
    }
  }

  test("streaming groupby == batch for avg/sum, time-ordered chunks") {
    compare("avg", "sum", "ts", seed = 1)
  }

  test("streaming groupby == batch for max/max, OUT-OF-ORDER chunks (by value)") {
    compare("max", "max", "value", seed = 2)
  }

  test("streaming groupby == batch for count/sum and sum/avg, OOO (by series)") {
    compare("count", "sum", "series", seed = 3)
    compare("sum", "avg", "series", seed = 4)
  }

  test("widened composable aggs: std/var via (Σv, Σv², n), OOO chunks") {
    compare("std.p", "sum", "value", seed = 6)
    compare("var.s", "max", "series", seed = 7)
    compare("avg", "std.p", "value", seed = 8)
    compare("sum", "var.p", "series", seed = 9)
  }

  test("widened composable aggs: first/last/range partial pairs, OOO chunks") {
    compare("first", "sum", "value", seed = 10)
    compare("last", "avg", "series", seed = 11)
    compare("range", "min", "value", seed = 12)
    compare("avg", "range", "series", seed = 13)
  }

  test("multi-agg lockstep: N aggregators from the same partials == batch, OOO chunks") {
    val samples = randomFrame(14, 300)
    val labels = labelsFor(samples)
    val preds = Seq(Multi.parsePred("grp=(g0,g1,g2)"))
    val aggs = Seq("min", "max", "std.p")
    val batch = Multi.mrangeGroupBy(samples, labels, preds,
      RangeQuery.RangeArgs(from = Some(0L), to = Some(9000L),
        aggs = aggs, bucketMs = 1000L),
      groupByLabel = "grp", reducer = "sum")
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val s2g = labels.select(col("series"),
      element_at(col("labels"), "grp").as("lv"))
    val streamed = StreamGroupBy.mrangeGroupByStreamChunksMulti(
      spark, samples, s2g, "grp", aggs, "sum", bucketMs = 1000L,
      fromMs = Some(0L), toMs = Some(9000L), nChunks = 4,
      chunkCol = col("value"))
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, (a, b, c)) =>
      val (x, y, z) = batch(k)
      Seq((a, x), (b, y), (c, z)).foreach { case (g, w) =>
        assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)),
          s"$k: stream ($a,$b,$c) vs batch ($x,$y,$z)")
      }
    }
  }

  test("NaN samples are dropped at the stream head (the batch isValueValid skip)") {
    val samples = Seq(
      ("g0_a", 0L, 1.0), ("g0_a", 10L, Double.NaN), ("g0_b", 20L, 3.0))
      .toDF("series", "ts", "value")
    val s2g = Seq(("g0_a", "g0"), ("g0_b", "g0")).toDF("series", "lv")
    val out = StreamGroupBy.mrangeGroupByStreamChunks(
      spark, samples, s2g, "grp", "sum", "sum", bucketMs = 1000L, nChunks = 2)
      .collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 4.0, out.head.toString)
  }

  test("unsupported aggregator/reducer rejected loudly, not silently wrong") {
    val samples = randomFrame(5, 10)
    val s2g = samples.select(col("series"), lit("g").as("lv")).distinct()
    intercept[IllegalArgumentException] {
      StreamGroupBy.mrangeGroupByStream(samples, s2g, "grp", "twa", "sum", 1000L)
    }
    intercept[IllegalArgumentException] {
      StreamGroupBy.mrangeGroupByStream(samples, s2g, "grp", "avg", "first", 1000L)
    }
  }

  private def twaCompare(reducer: String, chunkCol: String, seed: Int,
      fromMs: Option[Long], toMs: Option[Long]): Unit = {
    // dedup (series, ts): the ingest model's dup-policy resolves
    // duplicates before any reader; twa's interpolation divides by ts
    // deltas, so duplicate timestamps are outside its defined domain
    val samples = randomFrame(seed, 300)
      .groupBy(col("series"), col("ts")).agg(max(col("value")).as("value"))
    val labels = labelsFor(samples)
    val preds = Seq(Multi.parsePred("grp=(g0,g1,g2)"))
    val batch = Multi.mrangeGroupBy(samples, labels, preds,
      RangeQuery.RangeArgs(from = fromMs, to = toMs,
        aggs = Seq("twa"), bucketMs = 1000L),
      groupByLabel = "grp", reducer = reducer)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    val s2g = labels.select(col("series"),
      element_at(col("labels"), "grp").as("lv"))
    val streamed = StreamGroupBy.mrangeGroupByTwaStreamChunks(
      spark, samples, s2g, "grp", reducer, bucketMs = 1000L,
      fromMs = fromMs, toMs = toMs, nChunks = 4, chunkCol = col(chunkCol))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(streamed.keySet == batch.keySet,
      s"[twa/$reducer/$chunkCol] key sets differ: " +
        s"only-stream=${streamed.keySet -- batch.keySet} " +
        s"only-batch=${batch.keySet -- streamed.keySet}")
    streamed.foreach { case (k, v) =>
      val b = batch(k)
      assert(math.abs(v - b) <= 1e-8 * math.max(1.0, math.abs(b)),
        s"[twa/$reducer/$chunkCol] $k: stream $v vs batch $b")
    }
  }

  test("per-series TWA aggregation == batch, time-ordered chunks, unbounded range") {
    twaCompare("avg", "ts", seed = 21, fromMs = None, toMs = None)
  }

  test("per-series TWA == batch with RANGE-EDGE anchors (from/to mid-data), OOO chunks") {
    // from/to cut mid-data: samples outside the range must still anchor
    // the head/tail interpolation (Twa's direct-lookup contract), which
    // the stream routes through the per-series anchor keys
    twaCompare("avg", "value", seed = 22, fromMs = Some(1500L), toMs = Some(8200L))
    twaCompare("sum", "series", seed = 23, fromMs = Some(1000L), toMs = Some(7999L))
  }

  test("per-series TWA == batch for statistics reducers, OOO chunks") {
    twaCompare("std.p", "value", seed = 24, fromMs = Some(500L), toMs = Some(9000L))
    twaCompare("max", "series", seed = 25, fromMs = None, toMs = Some(8000L))
  }

  test("twa-as-REDUCER still rejected loudly (the reference contract)") {
    val samples = randomFrame(26, 10)
    val s2g = samples.select(col("series"), lit("g").as("lv")).distinct()
    intercept[IllegalArgumentException] {
      StreamGroupBy.mrangeGroupByTwaResolve(
        samples.withColumn("batch_id", lit(0L))
          .withColumn("bucket", col("ts"))
          .withColumn("first_ts", col("value")).withColumn("first_v", col("value"))
          .withColumn("last_ts", col("value")).withColumn("last_v", col("value"))
          .withColumn("interior", lit(0.0)),
        s2g, "grp", "twa", 1000L)
    }
  }

  test("series outside the group mapping are filtered, not misgrouped") {
    val samples = Seq(
      ("g0_a", 0L, 1.0), ("g0_b", 10L, 3.0), ("zz_x", 20L, 100.0))
      .toDF("series", "ts", "value")
    val s2g = Seq(("g0_a", "g0"), ("g0_b", "g0")).toDF("series", "lv")
    val out = StreamGroupBy.mrangeGroupByStreamChunks(
      spark, samples, s2g, "grp", "sum", "sum", bucketMs = 1000L, nChunks = 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "grp=g0" && r.getLong(1) == 0L
      && r.getDouble(2) == 4.0, r.toString)
  }
}
