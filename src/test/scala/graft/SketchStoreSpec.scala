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

  test("signed state: store column folds into the merge key, == one-shot signed") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_signed_").toString
    // center so all three stores carry mass on the all-positive
    // fixture; one injected exact-zero row gives the zero store mass
    // (continuous doubles never land exactly on the center)
    import spark.implicits._
    val centered = samples.withColumn("value", col("value") - 50.0)
      .unionByName(Seq(("zero_probe", 0L, 0.0)).toDF("series", "ts", "value"))
    val ts = centered.select(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (ts.getLong(0), ts.getLong(1))
    val cut = lo + (hi - lo) / 2
    SketchStore.writeSketchVersioned(
      spark, centered.filter(col("ts") < cut), stateDir, gamma, signed = true)
    SketchStore.mergeSketch(
      spark, centered.filter(col("ts") >= cut), stateDir, gamma)
    val state = SketchStore.readSketch(spark, stateDir)
    assert(state.columns.toSeq == Seq("series", "store", "bucket", "n"))
    // all three stores present (the fixture straddles the center)
    assert(state.select(col("store")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(-1L, 0L, 1L))
    assert(canon(state) == canon(Histogram.ddsketchHistogramSigned(centered, gamma)),
      "merged signed state must equal the one-shot three-store sketch")
    // signed quantile off maintained state == the one-shot signed walk
    assert(canon(SketchStore.quantileSigned(spark, stateDir, gamma, q = 0.5)) ==
      canon(Histogram.ddsketchQuantileSigned(centered, gamma, q = 0.5)),
      "signed quantile off persisted buckets must equal the one-shot walk")
  }

  test("a lost writer race fails loudly instead of dropping a batch") {
    // single-writer contract (r16 ADVICE): writer A resolves version
    // v, stages v+1, and must detect — before the pointer flip — that
    // writer B advanced the manifest meanwhile; flipping anyway would
    // silently drop B's counts. Interleave deterministically: A's
    // batch frame flips the manifest DURING its own evaluation (i.e.
    // after A resolved v, before A's pre-flip re-read).
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_sketch_race_").toString
    SketchStore.writeSketchVersioned(spark, samples.limit(100), stateDir, gamma)
    import spark.implicits._
    val flipOnEval = samples.limit(50).as[(String, Long, Double)]
      .mapPartitions { it =>
        // drop the sidecar checksum too — a raw-NIO rewrite would
        // otherwise fail Hadoop's ChecksumFileSystem on re-read
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(stateDir, ".MANIFEST.crc"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(stateDir, "MANIFEST"),
          "5\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        it
      }.toDF("series", "ts", "value")
    val e = intercept[IllegalStateException] {
      SketchStore.mergeSketch(spark, flipOnEval, stateDir, gamma)
    }
    assert(e.getMessage.contains("lost a writer race"),
      s"wrong failure: ${e.getMessage}")
  }

  test("collapsing store: budget enforced, mass preserved, high-q untouched (VLDB'19 §2.4)") {
    val one = Histogram.ddsketchHistogram(samples, gamma)
    val nb = one.groupBy(col("series")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(nb > 6, s"fixture too narrow to exercise collapse (max $nb buckets)")
    val m = 6
    val collapsed = Histogram.ddsketchCollapse(one, maxBuckets = m, strict = false)
    // budget holds per series; total mass preserved
    assert(collapsed.groupBy(col("series")).count()
      .filter(col("count") > m).count() == 0, "bucket budget exceeded")
    assert(collapsed.agg(sum(col("n"))).head().getLong(0) ==
      one.agg(sum(col("n"))).head().getLong(0), "collapse lost mass")
    // the floor bucket (and only it) is flagged, and it absorbed all
    // lower-bucket mass for every over-budget series
    val flagged = collapsed.filter(col("collapsed")).groupBy(col("series")).count()
    assert(flagged.count() > 0, "collapse never triggered — vacuous spec")
    assert(flagged.filter(col("count") =!= 1).count() == 0)
    // error statement: a quantile whose rank lands STRICTLY ABOVE the
    // floor bucket is bit-identical to the uncollapsed walk (those
    // buckets are untouched, so the gamma-1 relative bound holds)
    val q = 0.95
    val exact = canon(Histogram.ddsketchQuantileFromBuckets(one, gamma, q))
    val fromCollapsed =
      canon(Histogram.ddsketchQuantileFromBuckets(
        collapsed.select(col("series"), col("bucket"), col("n")), gamma, q))
    assert(fromCollapsed == exact,
      "p95 above the floor bucket must be untouched by collapse")
    // a LOW quantile falls in the floor bucket: only the upper bound
    // survives — the pick bucket must be >= the uncollapsed pick (mass
    // moved UP into the floor), never below
    val lowExact = Histogram.ddsketchQuantileFromBuckets(one, gamma, 0.01)
      .select(col("series"), col("bucket")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Histogram.ddsketchQuantileFromBuckets(
        collapsed.select(col("series"), col("bucket"), col("n")), gamma, 0.01)
      .select(col("series"), col("bucket")).collect()
      .foreach { r =>
        assert(r.getLong(1) >= lowExact(r.getString(0)),
          s"collapse moved a quantile pick DOWN for ${r.getString(0)}")
      }
  }

  test("collapsing store: the strict default loud-rejects a budget overflow") {
    val one = Histogram.ddsketchHistogram(samples, gamma)
    val e = intercept[Exception] {
      Histogram.ddsketchCollapse(one, maxBuckets = 3).collect()
    }
    def rootMsg(t: Throwable): String =
      (t.getMessage + Option(t.getCause).map(rootMsg).getOrElse(""))
    assert(rootMsg(e).contains("bucket budget exceeded"), rootMsg(e).take(400))
    // within budget, strict passes the sketch through untouched
    val wide = Histogram.ddsketchCollapse(one, maxBuckets = 10000)
    assert(canon(wide) == canon(one))
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
