package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types.ArrayType
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape regression guards for the 100 TB design properties
 * documented in PLANS.md: predicate pushdown reaching the parquet
 * scan, shuffles that never carry vector payloads, and shuffle-free
 * single-pass operators. A code change that silently breaks one of
 * these still passes value-level tests — these specs fail instead.
 */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTest._

  private val dir = "/root/testdata/sf0.001"

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] =
    physical(df).collect { case s: ShuffleExchangeExec => s }

  test("range scan pushdown: series equality and time range reach parquet") {
    val df = SparkEntry.queries("ts_range_agg_avg")(spark, dir)
    val scans = physical(df).collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(event_type,click)"), pushed)
    assert(pushed.contains("EqualTo(user_id,7)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(ts,"), pushed)
  }

  test("analytics family: the [T0,T31] bounds reach the parquet scan") {
    // the window/analytics entries read through monthSamples
    // (samplesPruned): the time bounds must appear as native-type
    // PushedFilters, not only as post-Project ms filters
    Seq("ts_range_mad", "ts_range_sliding", "ts_range_cusum",
        "ts_range_trend", "ts_downsample_lttb", "ts_range_ewma").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val scans = physical(df).collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty, q)
      val pushed = scans.map(_.metadata("PushedFilters")).mkString
      assert(pushed.contains("GreaterThanOrEqual(ts,"), s"$q: $pushed")
      assert(pushed.contains("LessThanOrEqual(ts,"), s"$q: $pushed")
    }
  }

  test("cosine LSH: no shuffle carries an embedding column") {
    val df = SparkEntry.queries("dedup_cosine_lsh")(spark, dir)
    val offenders = shuffles(df).filter(
      _.output.exists(_.dataType.isInstanceOf[ArrayType]))
    assert(offenders.isEmpty,
      s"shuffles carrying arrays:\n${offenders.map(_.output.mkString(", ")).mkString("\n")}")
  }

  test("semantic pairs: no shuffle carries an embedding column") {
    val df = SparkEntry.queries("dedup_semantic_pairs")(spark, dir)
    val offenders = shuffles(df).filter(
      _.output.exists(_.dataType.isInstanceOf[ArrayType]))
    assert(offenders.isEmpty,
      s"shuffles carrying arrays:\n${offenders.map(_.output.mkString(", ")).mkString("\n")}")
  }

  test("IVF top-k: single scalar shuffle, assignment is a projection") {
    val df = SparkEntry.queries("ann_ivf_topk")(spark, dir)
    val sh = shuffles(df)
    assert(sh.size == 1, s"expected exactly 1 shuffle, got ${sh.size}")
    assert(!sh.head.output.exists(_.dataType.isInstanceOf[ArrayType]),
      s"rank shuffle must not carry vectors: ${sh.head.output.mkString(", ")}")
  }

  test("multimodal extraction runs shuffle-free") {
    for (q <- Seq("mm_features", "mm_resize", "mm_frame_sample",
        "mm_decode_real", "mm_resize_real", "mm_audio_decode_real",
        "mm_audio_resample_real", "mm_video_frames_real")) {
      val df = SparkEntry.queries(q)(spark, dir)
      assert(shuffles(df).isEmpty, s"$q should have no shuffle")
    }
  }

  test("sampled training: the draw is a map-side TakeOrdered, not a global sort") {
    // the 100-TB contract of trainSampled/kmeansCentroidsSampled: the
    // md5-ordered sample compiles to TakeOrderedAndProject (per-partition
    // top-N + driver merge — bounded memory at any corpus size), never a
    // sort-the-world Exchange
    val embs = graft.pipeline.Similarity.loadEmbeddings(spark, dir)
    // the PRODUCTION draw plan (not a hand-copy): trainers and this
    // guard share Sampling.hashOrderedSample, so a change there is
    // what gets shape-checked here
    val draw = graft.pipeline.Sampling.hashOrderedSample(
      embs.select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("v")),
      64)
    val plan = physical(draw)
    val hasTakeOrdered = plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty
    assert(hasTakeOrdered, s"expected TakeOrderedAndProject, got:\n$plan")
    assert(shuffles(draw).isEmpty, "the draw must not shuffle full rows")
  }

  test("text analysis queries are single-pass map-side pipelines") {
    for (q <- Seq("text_tokens", "text_quality", "text_langid", "text_fingerprint")) {
      val df = SparkEntry.queries(q)(spark, dir)
      assert(shuffles(df).isEmpty, s"$q should have no shuffle")
    }
  }

  test("tfIdf: no hint-forced broadcast of corpus-sized sides") {
    // VERDICT r03 Wrong #1: `broadcast(df)` is O(vocabulary) and
    // `broadcast(docLens)` is O(#documents) — both corpus-sized, so a
    // hard hint is a guaranteed OOM at the 100 TB target. With the
    // auto-broadcast threshold disabled, ONLY a hint can still force a
    // BroadcastExchange — so any broadcast below proves a hint-forced
    // corpus-sized build side snuck back in. (At normal thresholds AQE
    // is free to pick broadcast when the measured size is small.)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = SparkEntry.queries("text_tfidf")(spark, dir)
      val bc = physical(df).collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      assert(bc.isEmpty,
        s"hint-forced broadcasts in text_tfidf:\n${bc.map(_.output.mkString(", ")).mkString("\n")}")
    } finally spark.conf.set(key, prev)
  }

  test("multi-rule compaction: one source scan for all rules") {
    val df = SparkEntry.queries("ts_compaction_multirule")(spark, dir)
    val scans = physical(df).collect { case f: FileSourceScanExec => f }
    assert(scans.size == 1, s"expected 1 scan for 3 rules, got ${scans.size}")
    // two shuffles by design: the (series, rid, bucket) aggregation
    // (map-side combined, so it moves pre-aggregated keys) and the
    // in-flight-bucket window over already-aggregated dest-sized rows
    assert(shuffles(df).size <= 2, s"unexpected shuffles: ${shuffles(df).size}")
  }

  test("retention clamp: the samples side never shuffles full rows") {
    // VERDICT r02 Wrong #3: the per-series max is an aggregate (its
    // shuffle moves (series, max_ts) partials only) broadcast-joined
    // back — a window implementation would shuffle every raw sample
    // (series, ts, value) by series.
    val df = SparkEntry.queries("ts_retention")(spark, dir)
    val offenders = shuffles(df).filter(_.output.exists(_.name == "value"))
    assert(offenders.isEmpty,
      s"retention clamp shuffles full sample rows:\n${offenders.map(_.output.mkString(", ")).mkString("\n")}")
  }

  test("madd status: both windows share one shuffle by series") {
    // the (series, ts) first-stored window's ClusteredDistribution is
    // satisfied by the running-tail window's HashPartitioning(series) —
    // a second Exchange would mean the per-item surface costs more
    // than the resolution it annotates
    val df = SparkEntry.queries("ts_madd_status")(spark, dir)
    val sh = shuffles(df)
    assert(sh.size == 1, s"expected exactly 1 shuffle, got ${sh.size}")
  }

  test("info debug chunks: grouped agg reuses the window's exchange") {
    val df = SparkEntry.queries("ts_info_debug")(spark, dir)
    val sh = shuffles(df)
    assert(sh.size == 1, s"expected exactly 1 shuffle, got ${sh.size}")
  }

  test("streaming TWA log read is partition-pruned to the support buckets") {
    // VERDICT r04 #1: per-batch recompute I/O must be O(touched
    // buckets), not O(history). prunedLogRead lists ONLY the support
    // buckets' __bkt= directories (a filter-based prune would still
    // list every partition dir — O(total buckets ever) per batch).
    // This guard fails if the read ever widens back to the whole log.
    import org.apache.spark.sql.functions.{col, lit}
    import graft.ts.{Compaction, TSModel}
    val log = java.nio.file.Files.createTempDirectory("plan_twa_log_").toString
    val rows = spark.range(0, 1000).select(
      lit("k").as("series"), col("id").as("ts"), col("id").cast("double").as("value"))
    rows.withColumn("__bkt", TSModel.bucketStart(col("ts"), 100L))
      .write.mode("append").partitionBy("__bkt").parquet(log)
    val pruned = Compaction.prunedLogRead(spark, log, Seq(200L, 300L))
    val files = pruned.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("__bkt=200") || f.contains("__bkt=300")),
      s"log read touched files outside the support buckets:\n${files.mkString("\n")}")
    assert(pruned.count() == 200)
    // empty support set degrades to an empty frame, not a full scan
    assert(Compaction.prunedLogRead(spark, log, Nil).isEmpty)
  }

  test("temperature mix: returned plan reads checkpoints, not the corpus") {
    // ADVICE r05: the starvation gate eagerly ran the survivors scan and
    // the returned plan recomputed it — three corpus-scale jobs. With
    // survivors localCheckpoint'd the returned plan ranks the pinned
    // margin×target-bounded set: ZERO parquet scans (plan-build already
    // paid the two corpus passes: counts + survivor materialization).
    val df = SparkEntry.queries("pipeline_mix_temperature")(spark, dir)
    val scans = physical(df).collect { case f: FileSourceScanExec => f }
    assert(scans.isEmpty,
      s"mix plan re-scans the corpus:\n${scans.map(_.metadata.mkString(", ")).mkString("\n")}")
  }

  test("ignore filter: one shuffle by series, then a streaming map pass") {
    val df = SparkEntry.queries("ts_ignore_filter")(spark, dir)
    val sh = shuffles(df)
    assert(sh.size == 1, s"expected exactly 1 shuffle, got ${sh.size}")
    val partCols = sh.head.outputPartitioning.toString
    assert(partCols.contains("series"), partCols)
  }

  test("session windows: the aggregation reuses the analytic window's exchange") {
    val df = SparkEntry.queries("ts_range_session")(spark, dir)
    val sh = shuffles(df)
    assert(sh.size == 1, s"expected exactly 1 shuffle, got ${sh.size}")
    assert(sh.head.outputPartitioning.toString.contains("series"))
  }

  test("sliding windows: single shuffle with map-side partial aggregation") {
    val df = SparkEntry.queries("ts_range_sliding")(spark, dir)
    val sh = shuffles(df)
    assert(sh.size == 1, s"expected exactly 1 shuffle, got ${sh.size}")
    // partial agg must sit BELOW the exchange (shuffle carries
    // (series, wstart) partials, not the exploded sample rows)
    val aggs = physical(df).collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.size == 2, s"expected partial+final agg, got ${aggs.size}")
    val partialBelow = sh.head.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(partialBelow.nonEmpty, "no partial aggregate below the exchange")
  }

  test("k-means final assignment is a pure projection over the scan") {
    val embs = graft.pipeline.Similarity.loadEmbeddings(spark, dir)
    val df = graft.pipeline.Clustering.kmeansAssign(embs)
    assert(shuffles(df).isEmpty, "assignment must not shuffle")
    val scans = physical(df).collect { case f: FileSourceScanExec => f }
    assert(scans.size == 1)
  }

  test("chunking is a shuffle-free scan -> project -> generate") {
    val df = SparkEntry.queries("pipeline_chunk_documents")(spark, dir)
    assert(shuffles(df).isEmpty, "chunking must not shuffle")
    val scans = physical(df).collect { case f: FileSourceScanExec => f }
    assert(scans.size == 1)
    // only doc_id and text leave the scan
    assert(scans.head.metadata("ReadSchema").contains("doc_id"))
    assert(!scans.head.metadata("ReadSchema").contains("lang"))
  }

  test("topk: rank<=k compiles to a WindowGroupLimit partial top-k") {
    val df = SparkEntry.queries("ts_topk_series")(spark, dir)
    val limits = physical(df).collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    // Partial (map-side, before the bucket exchange) + Final — the
    // shuffle carries at most k rows per bucket per input partition
    assert(limits.size == 2, s"expected partial+final WindowGroupLimit, " +
      s"got ${limits.size}")
  }

  test("sq8 adcTopK: ONE scan of embeddings (queries fold into one broadcast pass)") {
    val df = SparkEntry.queries("ann_sq8_topk")(spark, dir)
    val scans = physical(df).collect { case f: FileSourceScanExec => f }
    // one corpus scan total: the query side is a collected literal
    // frame, NOT another embeddings read per query (the r10 shape
    // re-scanned the raw corpus once PER query id)
    assert(scans.size == 1,
      s"expected exactly 1 embeddings scan, got ${scans.size}")
  }

  test("holt: one shuffle by series, time bounds reach the scan") {
    val df = SparkEntry.queries("ts_range_holt")(spark, dir)
    assert(shuffles(df).size == 1, "holt is one collect_list agg by series")
    val scans = physical(df).collect { case f: FileSourceScanExec => f }
    assert(scans.map(_.metadata("PushedFilters")).mkString
      .contains("GreaterThanOrEqual(ts,"))
  }

  test("forecast: the same one-shuffle typed scan as holt (horizon adds no stage)") {
    val df = SparkEntry.queries("ts_range_forecast")(spark, dir)
    assert(shuffles(df).size == 1, "forecast is one shuffle by series")
    assert(physical(df).collect { case f: FileSourceScanExec => f }.size == 1)
  }

  test("zipfFit: distributed top-N head (TakeOrderedAndProject), no global sort") {
    val df = SparkEntry.queries("text_zipf_fit")(spark, dir)
    val p = physical(df)
    assert(p.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "the vocabulary head must be a partial top-N, not a full sort")
    assert(p.collect { case s: org.apache.spark.sql.execution.SortExec => s }
      .isEmpty, "no corpus-sized global sort in the zipf plan")
  }

  test("ccf: grid sides are query-bounded broadcasts; series+time reach the scan") {
    val df = SparkEntry.queries("ts_range_ccf")(spark, dir)
    val p = physical(df)
    // lag sweep + grid join both broadcast (grids are range/bucket rows)
    assert(p.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }.size == 2, "lag frame AND one grid side must broadcast")
    val pushed = p.collect { case f: FileSourceScanExec => f }
      .map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts,"), pushed)
  }

  test("source cap: rank<=cap compiles to a WindowGroupLimit partial top-cap") {
    val df = SparkEntry.queries("pipeline_source_cap")(spark, dir)
    val p = physical(df)
    val wgl = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(wgl.nonEmpty, "per-source cap must push a partial group limit:\n" + p)
    assert(p.collect { case s: org.apache.spark.sql.execution.SortExec => s }
      .forall(_.global == false),
      "no global sort — the cap is per-source, bounded per partition")
  }

  test("pipeline TVF splices are transparent to Catalyst: outer predicates push to parquet, columns prune, chunking stays shuffle-free") {
    // the spliced plan is a first-class relation: an OUTER SQL filter
    // over corpus_langid() must reach the documents parquet scan as a
    // pushed filter, and the scan must read only the columns the
    // operator projects (not the whole documents schema)
    val df = SparkEntry.queries("pipeline_sql_tvf_langid")(spark, dir)
    val scans = physical(df).collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("LessThan(doc_id,450)"),
      s"outer predicate must push through the TVF splice: $pushed")
    val schema = scans.map(_.metadata("ReadSchema")).mkString
    assert(schema.contains("doc_id") && schema.contains("text"), schema)
    assert(!schema.contains("source"),
      s"unused document columns must prune through the TVF splice: $schema")
    // the chunker through SQL keeps its zero-shuffle scan→generate shape
    val chunk = SparkEntry.queries("pipeline_sql_tvf_chunk")(spark, dir)
    assert(shuffles(chunk).isEmpty, "TVF chunking must not shuffle")
    // exact contamination through SQL keeps the broadcast bench side
    val cont = SparkEntry.queries("pipeline_sql_tvf_contamination")(spark, dir)
    assert(physical(cont).collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, "bench side must stay a broadcast join through SQL:\n" +
      physical(cont))
  }

  test("dtw nearestPruned: prune-rate counts are opt-in — the default path pays no extra jobs") {
    import java.util.concurrent.atomic.AtomicInteger
    val T0 = 1704067200000L; val T31 = 1706745599999L; val DAY = 86400000L
    val samples = graft.ts.TSModel.samples(spark, dir)
    def countJobs(body: => Unit): Int = {
      val n = new AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      // listener events are async — drain the bus before reading the
      // counter (a fixed sleep under-reads on a loaded host, ADVICE r12)
      try { body
        org.apache.spark.sql.GraftSessionBridge.waitListenerBusEmpty(spark, 30000L) }
      finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    val off = countJobs {
      graft.ts.Dtw.nearestPruned(samples, DAY, "click_7", 5,
        Some(T0), Some(T31)).collect()
    }
    val stats = new graft.ts.Dtw.PruneStatsRef(null)
    val on = countJobs {
      graft.ts.Dtw.nearestPruned(samples, DAY, "click_7", 5,
        Some(T0), Some(T31), pruneStats = Some(stats)).collect()
    }
    assert(stats.get != null)
    // each count() action launches >= 1 job (2 under two-stage counts),
    // so the default path must be strictly cheaper by >= 2 jobs
    assert(on >= off + 2,
      s"instrumented run must pay the count() jobs on top: off=$off on=$on")
  }

  test("ddsketch windowed: single map-side-combined shuffle, bounds pushed to parquet") {
    val df = SparkEntry.queries("ts_ddsketch_windowed")(spark, dir)
    val sh = shuffles(df)
    assert(sh.size == 1, s"expected exactly 1 shuffle, got ${sh.size}")
    // the shuffle must carry (series, wstart, bucket) partial counts,
    // not sample rows: a partial HashAggregate sits below the exchange
    val partialBelow = sh.head.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(partialBelow.nonEmpty, "no partial aggregate below the exchange")
    val pushed = physical(df).collect { case f: FileSourceScanExec => f }
      .map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts,") &&
      pushed.contains("LessThanOrEqual(ts,"), pushed)
  }

  /** Skip codegen/adapter wrappers to the first real operator below a
    * node — plan-shape asserts care about operators, not fusion. */
  private def firstReal(p: SparkPlan): SparkPlan = p match {
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec => firstReal(w.child)
    case i: org.apache.spark.sql.execution.InputAdapter => firstReal(i.child)
    case p: org.apache.spark.sql.execution.ProjectExec => firstReal(p.child)
    case other => other
  }

  /** The union-fold guard (r16 VERDICT Wrong #1 — the old predicate
    * was vacuous): locate the exchange(s) whose subtree contains the
    * STATE parquet scan (that is the union-fold's shuffle; the batch
    * sketch's own exchange sees only samples) and require a partial
    * HashAggregate as the direct child — i.e. the fold shuffles
    * (series, bucket) partial counts, never raw union rows. */
  private def foldShufflesPartials(df: DataFrame, stateTag: String): Boolean = {
    val folds = shuffles(df).filter(_.collect {
      case f: FileSourceScanExec => f
    }.exists(_.metadata.get("Location").exists(_.contains(stateTag))))
    folds.nonEmpty && folds.forall(ex =>
      firstReal(ex.child)
        .isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec])
  }

  test("sketch-store merge plan: state fold is one bucket-keyed agg, no sample rescans") {
    // the merge must read ONLY the prior state parquet + the new batch
    // (the whole point: history is never rescanned) and fold with one
    // aggregation — assert on the pre-write plan of the merged frame
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_plan_sketch_").toString
    val stateTag = new java.io.File(stateDir).getName
    val samples = graft.ts.TSModel.samples(spark, dir)
    graft.ts.SketchStore.writeSketchVersioned(spark, samples, stateDir, 1.05)
    val prior = spark.read.parquet(s"$stateDir/v=1/sketch")
    def fold(union: DataFrame): DataFrame = union
      .groupBy(org.apache.spark.sql.functions.col("series"),
        org.apache.spark.sql.functions.col("bucket"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("n")).as("n"))
    val union = prior
      .unionByName(graft.ts.Histogram.ddsketchHistogram(samples.limit(50), 1.05))
    val merged = fold(union)
    assert(shuffles(merged).size <= 2,
      "merge fold must be batch-agg + union-agg shuffles only")
    assert(foldShufflesPartials(merged, stateTag),
      "no map-side partial directly below the union-fold exchange")
    // negative control: a deliberately de-optimized merge (round-robin
    // repartition between union and fold) shuffles RAW union rows —
    // the guard must fail it, or it guards nothing
    val deopt = fold(union.repartition(8))
    assert(!foldShufflesPartials(deopt, stateTag),
      "guard passed a fold whose state-carrying exchange has no partial below it")
  }

  test("sketch-store quantile read: walks the persisted state ALONE (no samples scan)") {
    // the production read path (VERDICT r16 #7): quantiles come off
    // the maintained model-sized bucket table — the plan must scan
    // only the state parquet, never the raw samples fixture
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_plan_sketch_read_").toString
    val samples = graft.ts.TSModel.samples(spark, dir)
    graft.ts.SketchStore.writeSketchVersioned(spark, samples, stateDir, 1.05)
    val q = graft.ts.SketchStore.quantile(spark, stateDir, 1.05, 0.9)
    val scans = physical(q).collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "quantile read plan has no scan at all")
    val stateTag = new java.io.File(stateDir).getName
    assert(scans.forall(_.metadata.get("Location").exists(_.contains(stateTag))),
      s"quantile read scans something besides the state table: " +
        scans.map(_.metadata.getOrElse("Location", "?")).mkString("; "))
    assert(q.collect().nonEmpty)
  }
}
