package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ts.{Histogram, SketchStore}

/** Persisted DDSketch state: the mergeability contract (bootstrap +
  * any batching of merges == the one-shot sketch, EXACT integer
  * equality), the versioned-manifest durability semantics, and the
  * quantile read off maintained state. */
class SketchStoreSpec extends AnyFunSuite {
  import SparkTest._

  private val gamma = 1.07
  private lazy val samples = graft.ts.TSModel.samples(spark, SparkTest.sf)

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq).toSet

  test("bootstrap + merges over a ts-partition == one-shot sketch, bit-exact") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_merge_").toString
    val ts = samples.select(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (ts.getLong(0), ts.getLong(1))
    val cut1 = lo + (hi - lo) / 3; val cut2 = lo + 2 * (hi - lo) / 3
    SketchStore.writeSketchVersioned(
      spark, samples.filter(col("ts") < cut1), stateDir, gamma)
    SketchStore.mergeSketch(
      spark, samples.filter(col("ts") >= cut1 && col("ts") < cut2),
      stateDir, gamma)
    SketchStore.mergeSketch(
      spark, samples.filter(col("ts") >= cut2), stateDir, gamma)
    assert(canon(SketchStore.readSketch(spark, stateDir)) ==
      canon(Histogram.ddsketchHistogram(samples, gamma)),
      "merged state must equal the one-shot sketch over the union")
    // quantile read off the maintained state == the one-shot operator
    assert(canon(SketchStore.quantile(spark, stateDir, gamma, q = 0.9)) ==
      canon(Histogram.ddsketchQuantile(samples, gamma, q = 0.9)),
      "quantile off persisted buckets must equal the one-shot walk")
  }

  test("an empty or all-invalid batch merges as a no-op") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_noop_").toString
    SketchStore.writeSketchVersioned(spark, samples, stateDir, gamma)
    val before = canon(SketchStore.readSketch(spark, stateDir))
    // NaN and non-positive values land in no bucket
    import spark.implicits._
    val junk = Seq(("j", 0L, Double.NaN), ("j", 1L, -5.0), ("j", 2L, 0.0))
      .toDF("series", "ts", "value")
    val v = SketchStore.mergeSketch(spark, junk, stateDir, gamma)
    assert(v == 2L && canon(SketchStore.readSketch(spark, stateDir)) == before)
  }

  test("crash between version write and flip: next merge sweeps orphans and converges") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_crash_").toString
    val ts = samples.select(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (ts.getLong(0), ts.getLong(1))
    val cut = lo + (hi - lo) / 2
    SketchStore.writeSketchVersioned(
      spark, samples.filter(col("ts") < cut), stateDir, gamma)
    // simulate a merge that wrote v=2 completely, then died before the
    // flip — poisoned counts so any accidental read shows
    Histogram.ddsketchHistogram(samples, gamma)
      .withColumn("n", col("n") + 1000000L)
      .write.mode("overwrite").parquet(s"$stateDir/v=2/sketch")
    // the orphan is invisible: reads still resolve v=1
    assert(graft.pipeline.IncrementalAdmit.currentVersion(spark, stateDir)
      == Some(1L))
    assert(SketchStore.readSketch(spark, stateDir)
      .filter(col("n") >= 1000000L).count() == 0)
    // recovery: the next real merge sweeps the orphan pre-write, folds
    // from the live v=1, and converges to the one-shot sketch
    val v = SketchStore.mergeSketch(
      spark, samples.filter(col("ts") >= cut), stateDir, gamma)
    assert(v == 2L)
    assert(canon(SketchStore.readSketch(spark, stateDir)) ==
      canon(Histogram.ddsketchHistogram(samples, gamma)))
  }

  test("streaming maintenance: per-micro-batch merges == one-shot sketch") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_stream_").toString
    val out = SketchStore.streamingSketchOnce(
      spark, samples, stateDir, gamma, nChunks = 4)
    assert(canon(out) == canon(Histogram.ddsketchHistogram(samples, gamma)),
      "stream-maintained state must equal the one-shot sketch")
    // 4 micro-batches: bootstrap = v1, three merges advance to v4
    assert(graft.pipeline.IncrementalAdmit.currentVersion(spark, stateDir)
      == Some(4L))
  }

  test("one-generation retention: v-1 survives the flip, v-2 does not") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_gen_").toString
    val s1 = samples.limit(100)
    SketchStore.writeSketchVersioned(spark, s1, stateDir, gamma)
    SketchStore.mergeSketch(spark, s1, stateDir, gamma) // v=2
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def versions = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
      .map(_.getPath.getName).filter(_.startsWith("v=")).sorted.toSeq
    assert(versions == Seq("v=1", "v=2"),
      "a reader that resolved v=1 just before the flip may still scan it")
    SketchStore.mergeSketch(spark, s1, stateDir, gamma) // v=3
    assert(versions == Seq("v=2", "v=3"), "v=1 past the grace is swept")
  }
}
