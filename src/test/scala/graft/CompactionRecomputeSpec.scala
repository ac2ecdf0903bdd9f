package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._

/** Incremental dest recompute under OOO upserts and range deletes must
  * equal a full rematerialization (the reference's invariant: dest
  * always reflects src, reference: tsdb.c:621-668, 832-994). */
class CompactionRecomputeSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private val rule = Compaction.Rule("sum", 100L)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("late out-of-order sample: only its bucket recomputes, result equals full rebuild") {
    val before = Seq(("k", 10L, 1.0), ("k", 110L, 2.0), ("k", 210L, 3.0), ("k", 310L, 9.0))
      .toDF("series", "ts", "value")
    val late = Seq(("k", 120L, 5.0)).toDF("series", "ts", "value")
    val after = before.unionByName(late)
    val prevDest = Compaction.materialize(before, rule, includeLatest = true)
    val touched = late.select(col("series"), TSModel.bucketStart(col("ts"), rule.bucketMs).as("bucket"))
    val incremental = Compaction.recomputeBuckets(after, prevDest, rule, touched)
    val full = Compaction.materialize(after, rule, includeLatest = true)
    assert(asSet(incremental) == asSet(full))
    assert(asSet(incremental).contains(("k_SUM_100", 100L, 7.0)))
  }

  test("TWA rule: late sample recomputes its bucket AND both neighbours") {
    val twaRule = Compaction.Rule("twa", 100L)
    val before = Seq(("k", 10L, 1.0), ("k", 90L, 3.0), ("k", 110L, 2.0),
        ("k", 210L, 3.0), ("k", 290L, 5.0), ("k", 310L, 9.0))
      .toDF("series", "ts", "value")
    // a late sample at 199 (bucket 100) becomes sample 210's new lag,
    // shifting bucket 200's head interpolation — the naive
    // same-bucket-only recompute would leave bucket 200 stale
    val late = Seq(("k", 199L, 50.0)).toDF("series", "ts", "value")
    val after = before.unionByName(late)
    val prevDest = Compaction.materialize(before, twaRule, includeLatest = true)
    val touched = late.select(col("series"),
      TSModel.bucketStart(col("ts"), twaRule.bucketMs).as("bucket"))
    val incremental = Compaction.recomputeBuckets(after, prevDest, twaRule, touched)
    val full = Compaction.materialize(after, twaRule, includeLatest = true)
    assert(asSet(incremental) == asSet(full))
    // the neighbour bucket really did change vs prevDest
    val prev = asSet(prevDest).map(r => (r._2, r._3)).toMap
    val now = asSet(full).map(r => (r._2, r._3)).toMap
    assert(now(100L) != prev(100L) && now(200L) != prev(200L))
  }

  test("randomized: incremental recompute equals full rebuild for every rule kind") {
    def close(a: Double, b: Double): Boolean =
      (a.isNaN && b.isNaN) || math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val agg = Seq("sum", "avg", "max", "last", "twa")(rnd.nextInt(5))
      val r = Compaction.Rule(agg, 100L)
      // sparse series with real empty-bucket gaps
      val before = (0 until 2).flatMap { s =>
        (0 until 20).map { _ =>
          // NaN samples also under TWA: they are invisible to the
          // trapezoid (dropped by bucketTwa) but must not derail the
          // valid-neighbour expansion (NaN-only buckets anchor nothing)
          (s"k$s", rnd.nextInt(2000).toLong,
            if (rnd.nextInt(10) == 0) Double.NaN else rnd.nextInt(100).toDouble)
        }
      }.distinctBy(r => (r._1, r._2))
      val late = (0 until 4).map { _ =>
        (s"k${rnd.nextInt(2)}", rnd.nextInt(2400).toLong, rnd.nextInt(100).toDouble)
      }.filter(l => !before.exists(b => b._1 == l._1 && b._2 == l._2))
      val delSeries = "k0"
      val delFrom = rnd.nextInt(1000).toLong
      val delTo = delFrom + rnd.nextInt(600)
      val beforeDf = before.toDF("series", "ts", "value")
      val after = beforeDf.unionByName(late.toDF("series", "ts", "value"))
        .filter(!(col("series") === delSeries && col("ts").between(delFrom, delTo)))
      // touched = late buckets + buckets overlapping the delete range
      def bkt(ts: Long) = ts - Math.floorMod(ts, 100L)
      val touched = late.map(l => (l._1, bkt(l._2)))
        .++((bkt(delFrom) to bkt(delTo) by 100L).map((delSeries, _)))
        .distinct.toDF("series", "bucket")
      val prevDest = Compaction.materialize(beforeDf, r, includeLatest = true)
      def dump(df: org.apache.spark.sql.DataFrame) = df.collect().map { x =>
        (x.getString(0), x.getLong(1)) ->
          (if (x.isNullAt(2)) Double.NaN else x.getDouble(2))
      }.toMap
      val inc = dump(Compaction.recomputeBuckets(after, prevDest, r, touched))
      val full = dump(Compaction.materialize(after, r, includeLatest = true))
      assert(inc.keySet == full.keySet,
        s"seed=$seed agg=$agg keys differ: ${(inc.keySet diff full.keySet) ++ (full.keySet diff inc.keySet)}")
      full.foreach { case (k, v) =>
        assert(close(inc(k), v), s"seed=$seed agg=$agg $k: inc=${inc(k)} full=$v")
      }
    }
  }

  test("multi-rule single-scan materialization equals per-rule materializations") {
    val rules = Seq(Compaction.Rule("sum", 100L), Compaction.Rule("max", 200L),
      Compaction.Rule("count", 100L))
    val s = Seq(("k", 10L, 1.0), ("k", 110L, 2.0), ("k", 150L, Double.NaN),
        ("k", 210L, 3.0), ("k", 310L, 9.0), ("m", 40L, 4.0), ("m", 250L, 6.0))
      .toDF("series", "ts", "value")
    def dump(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
    }.toSet
    val one = rules.map(r => dump(Compaction.materialize(s, r))).reduce(_ ++ _)
    assert(dump(Compaction.materializeAll(s, rules)) == one)
    // TWA rules join the same single-scan plan (VERDICT r02 #10) and
    // must match the dedicated window-pipeline materialization exactly,
    // alone and mixed with plain aggregators
    val mixed = rules :+ Compaction.Rule("twa", 100L) :+ Compaction.Rule("twa", 200L)
    val oneMixed = mixed.map(r => dump(Compaction.materialize(s, r))).reduce(_ ++ _)
    assert(dump(Compaction.materializeAll(s, mixed)) == oneMixed)
    assert(dump(Compaction.materializeAll(s, Seq(Compaction.Rule("twa", 100L))))
      == dump(Compaction.materialize(s, Compaction.Rule("twa", 100L))))
  }

  test("TWA recompute removes dest rows when a series loses its last valid sample") {
    // review r04: the valid-only occupancy index yields NO rows for a
    // series whose samples are all NaN/deleted — an inner-join
    // expansion would drop its touched buckets and stale dest rows
    // would survive; the left join keeps them as removal targets
    val twaRule = Compaction.Rule("twa", 100L)
    val before = Seq(("k", 10L, 1.0), ("k", 110L, 2.0)).toDF("series", "ts", "value")
    val prevDest = Compaction.materialize(before, twaRule, includeLatest = true)
    assert(prevDest.count() == 2)
    // range-delete everything: the series has no samples left at all
    val emptied = WritePath.deleteRange(before, "k", 0L, 200L)
    val touched = Seq(("k", 0L), ("k", 100L)).toDF("series", "bucket")
    val inc = Compaction.recomputeBuckets(emptied, prevDest, twaRule, touched)
    assert(inc.isEmpty, s"stale dest rows survived: ${inc.collect().mkString(", ")}")
    // NaN-upsert variant: samples exist but none are valid
    val allNaN = Seq(("k", 10L, Double.NaN), ("k", 110L, Double.NaN))
      .toDF("series", "ts", "value")
    val inc2 = Compaction.recomputeBuckets(allNaN, prevDest, twaRule, touched)
    assert(inc2.isEmpty, s"stale dest rows survived NaN upsert: ${inc2.collect().mkString(", ")}")
  }

  test("streaming TWA rule: incremental recompute converges to the batch materialization") {
    // r03 item #7: TWA rules get a streaming path via per-micro-batch
    // recomputeBuckets — the final dest must equal the batch flushed
    // materialization no matter how the source is chopped into batches
    val dir = SparkTest.sf
    val r = Compaction.Rule("twa", 86400000L)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x =>
        (x.getString(0), x.getLong(1), math.round(x.getDouble(2) * 1e6))).toSet
    val batch = key(Compaction.materialize(TSModel.samples(spark, dir), r))
    // hash-split: every batch is late data for interior buckets; the
    // final dest must be batch-split-count independent too
    for (n <- Seq(2, 5)) {
      val work = java.nio.file.Files.createTempDirectory(s"stwa_spec_$n").toString
      val stream = key(Compaction.streamingDownsampleTwaOnce(spark, dir, r, work,
        nChunks = n, oooSplit = true))
      assert(stream == batch && stream.nonEmpty, s"nChunks=$n diverged")
    }
  }

  test("streaming TWA rule: each batch writes ONLY its own buckets' partials") {
    // VERDICT r05 #2: per-batch dest maintenance must be O(touched),
    // not O(state). The merge-on-read dest log records what every batch
    // wrote — each batch's rows must be confined to the buckets its
    // staged chunk actually contains (no neighbour fan-out, no running
    // dest rewrite riding along). Chunks are ts-ranges here, so bucket
    // sets genuinely differ per batch and the containment discriminates.
    val dir = SparkTest.sf
    val r = Compaction.Rule("twa", 86400000L)
    val work = java.nio.file.Files.createTempDirectory("stwa_bound_").toString
    Compaction.streamingDownsampleTwaOnce(spark, dir, r, work, nChunks = 3).count()
    val staged = new java.io.File(s"$work/stage").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(staged.length == 3)
    val bkt = (ts: Long) => ts - java.lang.Math.floorMod(ts, 86400000L)
    val chunkBuckets = staged.map { f =>
      spark.read.parquet(f.getPath).select("ts")
        .collect().map(x => bkt(x.getLong(0))).toSet
    }
    // chunkBuckets(batchId) relies on AvailableNow + maxFilesPerTrigger=1
    // replaying staged files in mtime order with batch ids from 0 (fresh
    // implicit temp checkpoint) — streaming-source defaults; if this
    // assert ever flakes, check those assumptions first (ADVICE r06)
    val written = spark.read.parquet(s"$work/dest")
      .select("batch_id", "bucket").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(written.size == 3, s"expected 3 batches in the dest log, got ${written.size}")
    for ((batchId, bs) <- written) {
      val allowed = chunkBuckets(batchId.toInt)
      assert(bs.subsetOf(allowed),
        s"batch $batchId wrote buckets outside its own chunk: ${(bs -- allowed).mkString(", ")}")
    }
    // and the log volume is per-batch-touched-sized, not batches×state:
    // strictly fewer rows than 3× the resolved dest cardinality
    val logRows = spark.read.parquet(s"$work/dest").count()
    val destRows = spark.read.parquet(s"$work/dest")
      .select("series", "bucket").distinct().count()
    assert(logRows < 3 * destRows,
      s"dest log ($logRows rows) looks like a per-batch full rewrite of $destRows keys")
  }

  test("streaming TWA rule: empty source fails with a clear error, not an NPE") {
    // ADVICE r04/r05: the ts-range chunker reads min/max ts from the
    // source — over an empty directory that row is null and getLong
    // would NPE; the guard must name the problem instead
    val empty = java.nio.file.Files.createTempDirectory("stwa_empty_src_").toString
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType))))
      .write.mode("overwrite").parquet(s"$empty/events.parquet")
    val work = java.nio.file.Files.createTempDirectory("stwa_empty_work_").toString
    val e = intercept[IllegalArgumentException] {
      Compaction.streamingDownsampleTwaOnce(spark, empty,
        Compaction.Rule("twa", 86400000L), work)
    }
    assert(e.getMessage.contains("empty source"), e.getMessage)
  }

  test("range delete: interior bucket disappears, partial buckets recompute") {
    val before = Seq(("k", 10L, 1.0), ("k", 110L, 2.0), ("k", 150L, 4.0), ("k", 210L, 3.0), ("k", 310L, 9.0))
      .toDF("series", "ts", "value")
    // delete [110, 130]: bucket 100 loses one of two samples (partial)
    val partial = WritePath.deleteRange(before, "k", 110L, 130L)
    val prevDest = Compaction.materialize(before, rule, includeLatest = true)
    val touched1 = Seq(("k", 100L)).toDF("series", "bucket")
    val inc1 = Compaction.recomputeBuckets(partial, prevDest, rule, touched1)
    assert(asSet(inc1) == asSet(Compaction.materialize(partial, rule, includeLatest = true)))
    assert(asSet(inc1).contains(("k_SUM_100", 100L, 4.0)))             // partial recompute

    // delete [110, 250]: buckets 100 and 200 empty out entirely
    val emptied = WritePath.deleteRange(before, "k", 110L, 250L)
    val touched2 = Seq(("k", 100L), ("k", 200L)).toDF("series", "bucket")
    val inc2 = Compaction.recomputeBuckets(emptied, prevDest, rule, touched2)
    assert(asSet(inc2) == asSet(Compaction.materialize(emptied, rule, includeLatest = true)))
    assert(!asSet(inc2).exists(r => r._2 == 100L || r._2 == 200L))     // emptied buckets gone
  }
}
