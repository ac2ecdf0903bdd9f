package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Incremental corpus admission — the production crawl shape: admit a
 * NEW batch of documents against a MATERIALIZED prior kept-set without
 * recomputing anything over the old corpus. The prior state is two
 * parquet tables (the batch analogue of [[StreamDedup]]'s gate state,
 * same first-arrival-wins semantics):
 *
 *   - `fp/`      — `(fp, doc_id)`: min doc_id ever seen per exact
 *     fingerprint ([[Text.fingerprint]]'s md5 of normalized text);
 *   - `buckets/` — `(band, bucket, doc_id)`: min doc_id ever seen per
 *     MinHash band bucket ([[StreamDedup.bandBucketsMd5]]'s
 *     oracle-replayable md5 signatures). REJECTED docs poison their
 *     buckets exactly as in the streaming gate — their near-dups must
 *     not slip in because the witness was itself rejected — which is
 *     what makes the verdicts pure functions of (doc_id order, text),
 *     independent of batching.
 *
 * A new doc d is admitted iff no SEEN doc with smaller id shares its
 * fingerprint (exact) or any band bucket (near-dup, LSH confidence):
 * `kept = NOT exact_dup AND n_clash = 0`. "Seen" = prior state ∪ the
 * new batch itself (in-batch collisions resolve against the batch min,
 * the gate's rule) — so `admit(new, state(old))` equals the one-shot
 * ordered replay over old ∪ new, which is exactly what the DuckDB
 * oracle ([[admitSql]]) computes.
 *
 * Scale shape — the cost tracks the NEW batch, not the corpus:
 * shingling/md5/minhash CPU runs ONLY on new docs; the prior state is
 * consulted by two key joins (fp, (band, bucket)) whose left sides are
 * batch-sized. The state tables are O(corpus fingerprints) /
 * O(distinct buckets) rows of a few tens of bytes — at 100 TB they are
 * written bucketed by their join key ([[graft.ts.TSModel.writeBucketed]]
 * discipline) so the joins co-locate without shuffling the state; the
 * fixture-scale probe measures the CPU claim (ScaleProbe: admit wall
 * flat in corpus size for a fixed batch).
 *
 * Two state layouts: the legacy flat one (`stateDir/fp`,
 * `stateDir/buckets` — updates swap tables in place, not atomic for
 * concurrent readers) and the VERSIONED one ([[writeStateVersioned]]:
 * `stateDir/v=N` + a MANIFEST pointer flipped atomically), under which
 * a reader racing an update always sees a complete state generation.
 * [[admit]] and [[updateState]] accept either.
 */
object IncrementalAdmit {

  /** `(fp, doc_id)` — min doc_id per exact fingerprint. */
  def buildFpState(docs: DataFrame): DataFrame =
    Text.fingerprint(docs)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))

  /** `(band, bucket, doc_id)` — min doc_id per MinHash band bucket
    * (ALL seen docs, kept or not — the gate's poison rule). */
  def buildBucketState(
      docs: DataFrame, numHashes: Int = 16, bandRows: Int = 4): DataFrame =
    StreamDedup.bandBucketsMd5(docs, numHashes, bandRows)
      .groupBy(col("band"), col("bucket")).agg(min(col("doc_id")).as("doc_id"))

  /** Run two independent Spark write jobs CONCURRENTLY from a small
    * driver-side pool (guide §2.6: actions are only sequential because
    * the driver calls them sequentially — the fp and bucket tables
    * share no state, so the second job's tasks back-fill executors
    * freed by the first job's tail instead of waiting for it). Each
    * thunk is a complete, independent write; failures propagate — but
    * only after EVERY job has finished (ADVICE r17: a fail-fast
    * Future.sequence rethrows while the sibling write keeps running
    * detached, so a caller that caught and retried could race the
    * orphaned writer on the same state paths). */
  private[pipeline] def inParallel(jobs: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    import scala.util.Try
    implicit val ec: ExecutionContext = ExecutionContext.global
    val outcomes = Await.result(
      Future.sequence(jobs.map(j => Future(Try(j())))), Duration.Inf)
    outcomes.foreach(_.get) // all joined; now surface the first failure
  }

  /** One-time bootstrap: materialize the admission state for a prior
    * corpus under `stateDir` (`fp/` + `buckets/`, legacy flat layout —
    * see [[writeStateVersioned]] for the concurrent-reader-safe one).
    * The two tables are independent, so their writes overlap (r17,
    * guide §2.6). */
  def writeState(
      spark: SparkSession, docs: DataFrame, stateDir: String,
      numHashes: Int = 16, bandRows: Int = 4): Unit = inParallel(
    () => buildFpState(docs).write.mode("overwrite").parquet(s"$stateDir/fp"),
    () => buildBucketState(docs, numHashes, bandRows)
      .write.mode("overwrite").parquet(s"$stateDir/buckets"))

  // ---- versioned-manifest layout ------------------------------------
  // stateDir/MANIFEST        — a one-line pointer file holding N
  // stateDir/v=N/fp          — the live state tables
  // stateDir/v=N/buckets
  // Updates write v=N+1 COMPLETELY, then flip MANIFEST with an atomic
  // overwrite-rename (FileContext Rename.OVERWRITE — the pointer-flip
  // object-store pattern; Spark's own streaming HDFSMetadataLog commits
  // the same way). Readers resolve the pointer once per admit, so a
  // reader racing an update sees the OLD state until the flip and a
  // crash mid-update leaves the pointer — and therefore every reader —
  // on the old version with only a dead v=N+1 directory to sweep. The
  // previous version is retained one generation (a reader that resolved
  // v=N−1 just before the flip may still be scanning it) and deleted on
  // the NEXT update.

  private val ManifestFile = "MANIFEST"

  private def hadoopFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The MANIFEST pointer's current version, None for the legacy flat
    * layout (no manifest file). */
  private[graft] def currentVersion(spark: SparkSession, stateDir: String): Option[Long] = {
    val mf = new org.apache.hadoop.fs.Path(s"$stateDir/$ManifestFile")
    val fs = hadoopFs(spark, mf)
    if (!fs.exists(mf)) None
    else {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(mf), java.nio.charset.StandardCharsets.UTF_8))
      try Some(in.readLine().trim.toLong) finally in.close()
    }
  }

  /** Root directory of the LIVE state tables: the manifest-pointed
    * version dir when the versioned layout is in use, else `stateDir`
    * itself (legacy). */
  private def liveRoot(spark: SparkSession, stateDir: String): String =
    currentVersion(spark, stateDir)
      .map(v => s"$stateDir/v=$v").getOrElse(stateDir)

  /** Atomically point MANIFEST at version `v` (write a temp sibling,
    * overwrite-rename it into place). */
  private[graft] def commitManifest(spark: SparkSession, stateDir: String, v: Long): Unit = {
    val mf = new org.apache.hadoop.fs.Path(s"$stateDir/$ManifestFile")
    val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/$ManifestFile.tmp")
    val fs = hadoopFs(spark, mf)
    val out = fs.create(tmp, true)
    try out.write(s"$v\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(mf.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, mf, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Janitor for the versioned layout: delete every `v=K` directory
    * the manifest does not protect — K > `live` are crash orphans (a
    * fold died after writing its version but before the flip; the
    * manifest never pointed at them, so no reader can hold them) and
    * K < `live − 1` are generations past the one-generation grace.
    * Runs inside [[updateState]] — before the write (so a crashed
    * predecessor's half-written v=N+1 never mixes with ours beyond
    * the overwrite) and after the flip (where it subsumes the old
    * v=N−1 drop). Unparseable `v=` names are left alone — the janitor
    * only ever deletes what the naming contract proves unreferenced. */
  private[graft] def sweepOrphanVersions(
      spark: SparkSession, stateDir: String, live: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = hadoopFs(spark, root)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("v=")) {
        val v = try name.substring(2).toLong
                catch { case _: NumberFormatException => live } // live = keep
        if (v > live || v < live - 1) fs.delete(st.getPath, true)
      }
    }
  }

  /** Bootstrap the VERSIONED admission state: tables under `v=1/`,
    * then the manifest flip that makes them live. */
  def writeStateVersioned(
      spark: SparkSession, docs: DataFrame, stateDir: String,
      numHashes: Int = 16, bandRows: Int = 4): Unit = {
    writeState(spark, docs, s"$stateDir/v=1", numHashes, bandRows)
    commitManifest(spark, stateDir, 1L)
  }

  /** Admission verdicts for `newDocs` against the state under
    * `stateDir` (either layout): `(doc_id, exact_dup, n_clash, kept)`
    * — one row per new doc, state left untouched (see
    * [[updateState]]). */
  def admit(
      spark: SparkSession, newDocs: DataFrame, stateDir: String,
      numHashes: Int = 16, bandRows: Int = 4): DataFrame =
    admitFrom(spark, Text.fingerprint(newDocs),
      StreamDedup.bandBucketsMd5(newDocs, numHashes, bandRows), stateDir)

  /** [[admit]] over PRE-COMPUTED per-batch key frames — `fpFrame` =
    * [[Text.fingerprint]] rows, `bkFrame` = band-bucket rows — so a
    * caller that also folds the batch into state ([[admitAndFold]])
    * derives both surfaces from ONE evaluation of the md5/minhash
    * chains instead of two. */
  private def admitFrom(
      spark: SparkSession, fpFrame: DataFrame, bkFrame: DataFrame,
      stateDir: String): DataFrame = {
    val root = liveRoot(spark, stateDir)
    val priorFp = spark.read.parquet(s"$root/fp")
      .select(col("fp"), col("doc_id").as("prior_mn"))
    val priorBk = spark.read.parquet(s"$root/buckets")
      .select(col("band"), col("bucket"), col("doc_id").as("prior_mn"))
    // the ordered rule: d clashes iff min over (prior state, batch)
    // of its key < d — correct for any id interleaving, not just
    // append-only id growth
    def seenMin = least(coalesce(col("prior_mn"), lit(Long.MaxValue)),
      col("batch_mn"))
    val exact = fpFrame
      .withColumn("batch_mn", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .join(priorFp, Seq("fp"), "left")
      .select(col("doc_id"), (seenMin < col("doc_id")).as("exact_dup"))
    val clash = bkFrame
      .withColumn("batch_mn",
        min(col("doc_id")).over(Window.partitionBy(col("band"), col("bucket"))))
      .join(priorBk, Seq("band", "bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(when(seenMin < col("doc_id"), 1L).otherwise(0L)).as("n_clash"))
    // left join from the fp side: a doc too short to shingle has no
    // buckets — zero clashes by definition
    exact.join(clash, Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_dup"),
        coalesce(col("n_clash"), lit(0L)).as("n_clash"),
        (coalesce(col("n_clash"), lit(0L)) === 0L && !col("exact_dup")).as("kept"))
  }

  /** One chain step: verdicts for the batch, then (optionally) the
    * state fold — with the batch's fingerprint and band-bucket frames
    * computed ONCE and shared by both (r18, guide §1.2 "don't compute
    * things twice": the chain previously re-ran the md5/minhash chains
    * in [[updateState]] right after [[admit]] had evaluated the
    * identical frames). The verdicts are pinned via localCheckpoint
    * BEFORE the fold mutates the manifest — that materialization also
    * populates the persisted key frames the fold then reuses. The
    * persists are intra-call: released before returning. */
  def admitAndFold(
      spark: SparkSession, newDocs: DataFrame, stateDir: String,
      numHashes: Int = 16, bandRows: Int = 4,
      fold: Boolean = true): DataFrame = {
    val fpFrame = Text.fingerprint(newDocs).persist()
    val bkFrame = StreamDedup.bandBucketsMd5(newDocs, numHashes, bandRows).persist()
    try {
      val verdicts =
        admitFrom(spark, fpFrame, bkFrame, stateDir).localCheckpoint()
      if (fold) updateStateFrom(spark,
        fpFrame.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id")),
        bkFrame.groupBy(col("band"), col("bucket")).agg(min(col("doc_id")).as("doc_id")),
        stateDir)
      verdicts
    } finally { fpFrame.unpersist(); bkFrame.unpersist() }
  }

  /** Fold the new batch's keys into the state (min per key).
    *
    * VERSIONED layout: write the merged tables completely under
    * `v=N+1/`, flip the manifest pointer atomically, then drop `v=N−1`
    * (one-generation grace for in-flight readers). Concurrent readers
    * never see a half-swapped table, and a crash anywhere before the
    * flip leaves the old version live.
    *
    * LEGACY flat layout: staged-sibling swap
    * ([[graft.ts.Compaction.compactLog]]'s discipline — Hadoop FS API,
    * so it holds on object stores). The old table is parked at
    * `<path>__prev` for the swap instead of deleted first (ADVICE r12:
    * delete-then-rename had a crash window with NO live table), so
    * every crash point leaves a recoverable copy: staged-write failure
    * keeps the live table; a crash between the two renames leaves
    * `__prev` to restore by hand. Still not atomic for concurrent
    * readers — that is what the versioned layout is for. */
  def updateState(
      spark: SparkSession, newDocs: DataFrame, stateDir: String,
      numHashes: Int = 16, bandRows: Int = 4): Unit =
    updateStateFrom(spark, buildFpState(newDocs),
      buildBucketState(newDocs, numHashes, bandRows), stateDir)

  /** [[updateState]] over PRE-AGGREGATED state deltas (`freshFp` =
    * min doc_id per fp, `freshBk` = min doc_id per (band, bucket)) —
    * the shared-frame entry point [[admitAndFold]] uses. */
  private def updateStateFrom(
      spark: SparkSession, freshFp: DataFrame, freshBk: DataFrame,
      stateDir: String): Unit = {
    def merged(cur: String, name: String, fresh: DataFrame, keys: Seq[String]): DataFrame =
      spark.read.parquet(s"$cur/$name").unionByName(fresh)
        .groupBy(keys.map(col): _*).agg(min(col("doc_id")).as("doc_id"))
    currentVersion(spark, stateDir) match {
      case Some(v) =>
        // sweep crash orphans (an unreferenced v=N+1 from a fold that
        // died before its flip) BEFORE writing our own next version
        sweepOrphanVersions(spark, stateDir, v)
        val cur = s"$stateDir/v=$v"
        val next = s"$stateDir/v=${v + 1}"
        // both merged tables must exist before the flip; they are
        // independent, so the folds overlap (r17, guide §2.6)
        inParallel(
          () => merged(cur, "fp", freshFp, Seq("fp"))
            .write.mode("overwrite").parquet(s"$next/fp"),
          () => merged(cur, "buckets", freshBk, Seq("band", "bucket"))
            .write.mode("overwrite").parquet(s"$next/buckets"))
        commitManifest(spark, stateDir, v + 1)
        // post-flip sweep drops v=N−1 (one-generation grace retained)
        sweepOrphanVersions(spark, stateDir, v + 1)
      case None =>
        def swap(path: String, fresh: DataFrame, keys: Seq[String]): Unit = {
          val staged = new org.apache.hadoop.fs.Path(path + "__admitting")
          merged(stateDir, path.substring(path.lastIndexOf('/') + 1), fresh, keys)
            .write.mode("overwrite").parquet(staged.toString)
          val fs = staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val dst = new org.apache.hadoop.fs.Path(path)
          val bak = new org.apache.hadoop.fs.Path(path + "__prev")
          fs.delete(bak, true)
          require(fs.rename(dst, bak), s"updateState: park $dst -> $bak failed")
          if (!fs.rename(staged, dst)) {
            fs.rename(bak, dst) // restore — the fold never destroys state
            throw new IllegalStateException(
              s"updateState: rename $staged -> $dst failed; old state restored")
          }
          fs.delete(bak, true)
        }
        // the two tables' staged-write+swap sequences touch disjoint
        // paths — overlap them too (each swap stays internally ordered)
        inParallel(
          () => swap(s"$stateDir/fp", freshFp, Seq("fp")),
          () => swap(s"$stateDir/buckets", freshBk, Seq("band", "bucket")))
    }
  }

  /** DuckDB oracle: the one-shot ordered replay over old ∪ new (the
    * full `documents` table) with the same md5 fingerprint and
    * signature chains, verdicts filtered to the new batch
    * (`doc_id >= split`). Admission against materialized prior state
    * MUST equal this — that is the operator's whole contract. */
  def admitSql(split: Long, numHashes: Int = 16, bandRows: Int = 4): String = {
    s"""WITH ${StreamDedup.bandsCteSql(numHashes, bandRows, "documents")}, marked AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bucket) AS mn
       |  FROM bands
       |), clash AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN mn < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_clash
       |  FROM marked GROUP BY doc_id
       |), fpm AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS fp_mn
       |  FROM (${Text.fingerprintSql})
       |)
       |SELECT f.doc_id, f.fp_mn < f.doc_id AS exact_dup,
       |  CAST(coalesce(c.n_clash, 0) AS BIGINT) AS n_clash,
       |  (coalesce(c.n_clash, 0) = 0 AND NOT f.fp_mn < f.doc_id) AS kept
       |FROM fpm f LEFT JOIN clash c USING (doc_id)
       |WHERE f.doc_id >= $split""".stripMargin
  }
}
