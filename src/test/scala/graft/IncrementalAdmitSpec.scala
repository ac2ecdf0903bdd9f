package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{IncrementalAdmit, StreamDedup, Text}

/** Incremental corpus admission: admitting a new batch against
  * materialized prior state must equal the one-shot ordered replay
  * over old ∪ new, for ANY split point and for CHAINS of batches with
  * state folded between them — the batching-independence contract that
  * makes the operator safe to run per-crawl. */
class IncrementalAdmitSpec extends AnyFunSuite {
  import SparkTest._

  private def docs = Text.loadDocuments(spark, sf)

  /** The whole-corpus ordered-replay verdicts restricted to ids >= split
    * — the gate + exact rule computed directly (no state). */
  private def replayVerdicts(split: Long): Map[Long, (Boolean, Long, Boolean)] = {
    val bands = StreamDedup.bandBucketsMd5(docs, 16, 4)
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
    val clash = bands
      .withColumn("mn", min(col("doc_id")).over(wB))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("mn") < col("doc_id"), 1L).otherwise(0L)).as("n_clash"))
    val wF = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    Text.fingerprint(docs)
      .withColumn("fp_mn", min(col("doc_id")).over(wF))
      .join(clash, Seq("doc_id"), "left")
      .select(col("doc_id"), (col("fp_mn") < col("doc_id")).as("exact_dup"),
        coalesce(col("n_clash"), lit(0L)).as("n_clash"))
      .filter(col("doc_id") >= split)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2),
          !r.getBoolean(1) && r.getLong(2) == 0L)))
      .toMap
  }

  private def admitVerdicts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getBoolean(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("admit against materialized state == one-shot replay over old ∪ new") {
    for (split <- Seq(100L, 400L)) {
      val stateDir = java.nio.file.Files
        .createTempDirectory("graft_admit_spec_").toString
      IncrementalAdmit.writeState(spark, docs.filter(col("doc_id") < split), stateDir)
      val got = admitVerdicts(IncrementalAdmit.admit(
        spark, docs.filter(col("doc_id") >= split), stateDir))
      assert(got == replayVerdicts(split), s"split=$split")
    }
  }

  test("chained batches with state folds == one big batch (batching independence)") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_admit_chain_").toString
    IncrementalAdmit.writeState(spark, docs.filter(col("doc_id") < 200L), stateDir)
    // batch 1: [200, 350) — admit, then fold into state
    val b1 = docs.filter(col("doc_id") >= 200L && col("doc_id") < 350L)
    val got1 = admitVerdicts(IncrementalAdmit.admit(spark, b1, stateDir))
    IncrementalAdmit.updateState(spark, b1, stateDir)
    // batch 2: [350, 500) — against the folded state
    val b2 = docs.filter(col("doc_id") >= 350L)
    val got2 = admitVerdicts(IncrementalAdmit.admit(spark, b2, stateDir))
    val want = replayVerdicts(200L)
    assert(got1 == want.filter(_._1 < 350L))
    assert(got2 == want.filter(_._1 >= 350L))
  }

  test("randomized corpora: admit == replay across splits and signature shapes") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 7919L)
      // 60 docs: fresh random text, exact dups of earlier docs, and
      // near-dups (one word changed) — the three admission classes
      val texts = scala.collection.mutable.ArrayBuffer[String]()
      (0 until 60).foreach { i =>
        val roll = rnd.nextInt(10)
        val t =
          if (i >= 5 && roll < 2) texts(rnd.nextInt(i)) // exact dup
          else if (i >= 5 && roll < 4) {                // near dup
            val base = texts(rnd.nextInt(i)).split(" ")
            base.updated(rnd.nextInt(base.length),
              words(rnd.nextInt(words.size))).mkString(" ")
          } else (0 until 8 + rnd.nextInt(6))
            .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
        texts += t
      }
      val all = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
      val split = 20L + rnd.nextInt(25)
      val (nh, br) = Seq((16, 4), (8, 2), (12, 3))(rnd.nextInt(3))
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"graft_admit_rnd${seed}_").toString
      IncrementalAdmit.writeState(spark,
        all.filter(col("doc_id") < split), stateDir, nh, br)
      val got = admitVerdicts(IncrementalAdmit.admit(spark,
        all.filter(col("doc_id") >= split), stateDir, nh, br))
      // replay: the same rule over the whole corpus, directly
      val bands = StreamDedup.bandBucketsMd5(all, nh, br)
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bucket"))
      val clash = bands.withColumn("mn", min(col("doc_id")).over(wB))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("mn") < col("doc_id"), 1L).otherwise(0L)).as("n_clash"))
      val wF = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      val want = Text.fingerprint(all)
        .withColumn("fp_mn", min(col("doc_id")).over(wF))
        .join(clash, Seq("doc_id"), "left")
        .filter(col("doc_id") >= split)
        .collect().map(r => r.getLong(0) -> {
          val exactDup = r.getAs[Long]("fp_mn") < r.getLong(0)
          val nc = Option(r.getAs[Any]("n_clash"))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
          (exactDup, nc, !exactDup && nc == 0L)
        }).toMap
      assert(got == want, s"seed=$seed split=$split nh=$nh br=$br")
      // the randomized corpus must exercise all three classes at least
      // once across seeds — guard against a degenerate generator
      if (seed == 1) assert(got.values.exists(!_._3) && got.values.exists(_._3))
    }
  }

  test("versioned layout: bootstrap + admit == replay; chain folds flip the manifest") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_admit_v_").toString
    IncrementalAdmit.writeStateVersioned(spark, docs.filter(col("doc_id") < 200L), stateDir)
    assert(IncrementalAdmit.currentVersion(spark, stateDir) == Some(1L))
    val want = replayVerdicts(200L)
    val b1 = docs.filter(col("doc_id") >= 200L && col("doc_id") < 350L)
    assert(admitVerdicts(IncrementalAdmit.admit(spark, b1, stateDir))
      == want.filter(_._1 < 350L))
    IncrementalAdmit.updateState(spark, b1, stateDir)
    assert(IncrementalAdmit.currentVersion(spark, stateDir) == Some(2L))
    val b2 = docs.filter(col("doc_id") >= 350L)
    assert(admitVerdicts(IncrementalAdmit.admit(spark, b2, stateDir))
      == want.filter(_._1 >= 350L))
    // one-generation grace: v=1 survives the flip to v=2 (an in-flight
    // reader may still be scanning it) and is swept by the NEXT update
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/v=1")))
    IncrementalAdmit.updateState(spark, b2, stateDir)
    assert(IncrementalAdmit.currentVersion(spark, stateDir) == Some(3L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/v=1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/v=2")))
  }

  test("versioned layout: a staged-but-unflipped version is invisible until the manifest flip") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_admit_race_").toString
    IncrementalAdmit.writeStateVersioned(spark, docs.filter(col("doc_id") < 300L), stateDir)
    val batch = docs.filter(col("doc_id") >= 300L && col("doc_id") < 400L)
    val beforeRace = admitVerdicts(IncrementalAdmit.admit(spark, batch, stateDir))
    assert(beforeRace.values.exists(_._3), "fixture batch must admit something")
    // simulate the writer mid-update: a COMPLETE v=2 whose every batch
    // fingerprint has a far-smaller witness (doc_id − 10^6), staged on
    // disk but NOT yet flipped — a reader racing the update must keep
    // resolving v=1 and return identical verdicts
    val poisoned = docs.filter(col("doc_id") < 400L)
      .select((col("doc_id") - 1000000L).as("doc_id"), col("text"))
    IncrementalAdmit.writeState(spark, poisoned, s"$stateDir/v=2")
    assert(admitVerdicts(IncrementalAdmit.admit(spark, batch, stateDir)) == beforeRace,
      "reader saw a staged version before the manifest flip")
    // the flip publishes it: now every batch doc has a smaller witness
    IncrementalAdmit.commitManifest(spark, stateDir, 2L)
    val afterFlip = admitVerdicts(IncrementalAdmit.admit(spark, batch, stateDir))
    assert(afterFlip.values.forall(v => v._1 && !v._3),
      "post-flip admit must see the new witnesses")
  }

  test("crash between version write and flip: next fold sweeps orphans and converges") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_admit_crash_").toString
    IncrementalAdmit.writeStateVersioned(spark, docs.filter(col("doc_id") < 200L), stateDir)
    val b1 = docs.filter(col("doc_id") >= 200L && col("doc_id") < 350L)
    IncrementalAdmit.updateState(spark, b1, stateDir) // v=2 live
    assert(IncrementalAdmit.currentVersion(spark, stateDir) == Some(2L))
    // simulate a fold that wrote its version COMPLETELY, then died
    // before the manifest flip — plus a deeper abandoned orphan: both
    // poisoned (far-smaller witnesses) so any accidental read shows
    val poisoned = docs.filter(col("doc_id") < 400L)
      .select((col("doc_id") - 1000000L).as("doc_id"), col("text"))
    IncrementalAdmit.writeState(spark, poisoned, s"$stateDir/v=3")
    IncrementalAdmit.writeState(spark, poisoned, s"$stateDir/v=5")
    // unflipped orphans are invisible: verdicts still come from v=2
    val want = replayVerdicts(200L)
    val b2 = docs.filter(col("doc_id") >= 350L && col("doc_id") < 420L)
    assert(admitVerdicts(IncrementalAdmit.admit(spark, b2, stateDir))
      == want.filter(k => k._1 >= 350L && k._1 < 420L))
    // recovery: the next real fold sweeps the orphans (pre-write),
    // writes ITS v=3 from the live v=2, flips, and drops v=1 (post-flip)
    IncrementalAdmit.updateState(spark, b2, stateDir)
    assert(IncrementalAdmit.currentVersion(spark, stateDir) == Some(3L))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
      .map(_.getPath.getName).filter(_.startsWith("v=")).toSet
    assert(versions == Set("v=2", "v=3"),
      s"only live + one-generation grace may remain, got $versions")
    // the recovered chain's verdicts converge to the one-shot replay
    val b3 = docs.filter(col("doc_id") >= 420L)
    assert(admitVerdicts(IncrementalAdmit.admit(spark, b3, stateDir))
      == want.filter(_._1 >= 420L),
      "post-recovery admit must equal the ordered replay — no poison leaked")
  }

  test("randomized versioned chains: any batching == one-shot replay; manifest tracks the folds") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 104729L)
      // 2-4 random cut points in (50, 450): batch boundaries the
      // verdicts must be INDEPENDENT of (the gate's whole contract)
      val cuts = (Seq.fill(1 + rnd.nextInt(3))(50L + rnd.nextInt(400))
        :+ (50L + rnd.nextInt(400))).distinct.sorted
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"graft_admit_vrnd${seed}_").toString
      IncrementalAdmit.writeStateVersioned(
        spark, docs.filter(col("doc_id") < cuts.head), stateDir)
      val bounds = cuts.zip(cuts.tail :+ Long.MaxValue)
      var folds = 0
      val got = bounds.zipWithIndex.flatMap { case ((lo, hi), i) =>
        val b = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        val v = admitVerdicts(IncrementalAdmit.admit(spark, b, stateDir))
        if (i < bounds.size - 1) {
          IncrementalAdmit.updateState(spark, b, stateDir); folds += 1
        }
        v
      }.toMap
      assert(got == replayVerdicts(cuts.head),
        s"seed=$seed cuts=${cuts.mkString(",")}")
      assert(IncrementalAdmit.currentVersion(spark, stateDir)
        == Some(1L + folds), s"seed=$seed manifest after $folds folds")
    }
  }

  test("exact dup without near-dup state entry is still rejected; clean doc admitted") {
    import spark.implicits._
    val old = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val nw = Seq(
      (10L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (11L, "zeta eta theta iota kappa"),      // clean
      (12L, "zz")                              // too short to shingle: no buckets
    ).toDF("doc_id", "text")
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_admit_tiny_").toString
    IncrementalAdmit.writeState(spark, old, stateDir)
    val got = admitVerdicts(IncrementalAdmit.admit(spark, nw, stateDir))
    assert(got(10L)._1 && !got(10L)._3, got.toString)       // exact dup, rejected
    assert(got(10L)._2 > 0L)                                // buckets clash too
    assert(got(11L) == ((false, 0L, true)))                 // admitted
    assert(got(12L) == ((false, 0L, true)))                 // bucket-less, admitted
  }
}
