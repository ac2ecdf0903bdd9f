package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming TS.MRANGE ... GROUPBY label REDUCE — the continuous twin
 * of [[Multi.mrangeGroupBy]] for live ingest: label-matched samples
 * stream in, and every micro-batch emits the UPDATED cross-series
 * reduction for each (label value, bucket) it touched. The batch
 * operator answers "what is the per-type daily average, summed over
 * users, right now?" by re-reading history; this answers it
 * incrementally.
 *
 * Two-level semantics preserved exactly (reference order:
 * replyGroupedMultiRange module.c:467-526 — per-series AGGREGATION
 * first, then the cross-series REDUCE): state is keyed by
 * (label value, bucket) and holds each member series' running partial
 * (sum/min/max/count — enough to finalize any supported aggregator);
 * on every batch the touched keys fold their new samples into the
 * per-series partials and re-reduce across series. Late/out-of-order
 * samples just update their bucket's partials — no watermark drops
 * data, matching the reference's late-write recompute
 * (tsdb.c:621-668).
 *
 * Supported aggregators: everything partials-composable — sum/min/
 * max/count/avg plus std.p/std.s/var.p/var.s via the reference's own
 * accumulator shape (Σv, Σv², n) (reference: compaction.c:461-553),
 * range from (min, max), and first/last via (min-(ts,value),
 * max-(ts,value)) pairs with the batch path's lexicographic struct
 * tie-break (see [[Aggs]]). Only twa is rejected — it genuinely needs
 * bucket neighbours. Reducers: the same set minus first/last (the
 * batch reducer contract, reference: query_language.c:825-841).
 * NaN samples are dropped at the stream head — the same
 * `isValueValid` skip every batch aggregator applies — so a stray
 * NaN can't poison a (group, bucket) state entry.
 *
 * Scale shape: the label filter and group mapping is a stream-static
 * BROADCAST join (the index is O(#series), the same assumption every
 * batch MRANGE makes); state per key is O(series in that group), key
 * count is O(groups × open buckets) — retention-bounded in
 * production, and the update-mode log sink keeps per-batch output
 * O(touched keys), the [[Compaction.streamingDownsampleUpdateOnce]]
 * discipline.
 */
object StreamGroupBy {

  private val SupportedAggs = Set("sum", "min", "max", "count", "avg",
    "range", "std.p", "std.s", "var.p", "var.s", "first", "last")
  private val SupportedReducers = Set("sum", "min", "max", "count", "avg",
    "range", "std.p", "std.s", "var.p", "var.s")

  /** Per-series composable partial: (Σv, Σv², min, max, n,
    * first-(ts,v), last-(ts,v)) — finalizes every supported
    * aggregator. The (ts, v) pairs compare lexicographically, the
    * batch path's min/max-over-struct(t,v) duplicate-ts tie-break. */
  private type Partial =
    (Double, Double, Double, Double, Long, Long, Double, Long, Double)

  private val Zero: Partial = (0.0, 0.0, Double.PositiveInfinity,
    Double.NegativeInfinity, 0L, Long.MaxValue, Double.PositiveInfinity,
    Long.MinValue, Double.NegativeInfinity)

  private def finalize(agg: String, p: Partial): Double = {
    val (su, sq, mn, mx, n, _, fv, _, lv) = p
    agg match {
      case "sum"   => su
      case "min"   => mn
      case "max"   => mx
      case "count" => n.toDouble
      case "avg"   => su / n
      case "range" => mx - mn
      case "first" => fv
      case "last"  => lv
      case "var.p" => math.max(0.0, sq / n - (su / n) * (su / n))
      case "var.s" =>
        if (n == 1) 0.0
        else math.max(0.0, (sq - su * su / n) / (n - 1))
      case "std.p" => math.sqrt(math.max(0.0, sq / n - (su / n) * (su / n)))
      case _ => // std.s
        if (n == 1) 0.0
        else math.sqrt(math.max(0.0, (sq - su * su / n) / (n - 1)))
    }
  }

  /** Cross-series reduce over the finalized per-series values — all of
    * them in hand per (group, bucket), so std/var use the stable
    * two-pass central-moment form. */
  private def reduce(reducer: String, finals: Array[Double]): Double = {
    def m2 = { // Σ(f - mean)²
      val mean = finals.sum / finals.length
      finals.map(f => (f - mean) * (f - mean)).sum
    }
    reducer match {
      case "sum"   => finals.sum
      case "min"   => finals.min
      case "max"   => finals.max
      case "count" => finals.length.toDouble
      case "avg"   => finals.sum / finals.length
      case "range" => finals.max - finals.min
      case "var.p" => m2 / finals.length
      case "var.s" => if (finals.length == 1) 0.0 else m2 / (finals.length - 1)
      case "std.p" => math.sqrt(m2 / finals.length)
      case _ => // std.s
        if (finals.length == 1) 0.0
        else math.sqrt(m2 / (finals.length - 1))
    }
  }

  /** Multi-aggregator core: every aggregator in `aggs` finalizes from
    * the SAME per-series partials and is reduced in lockstep (the
    * batch contract — reply.c:291-358 replays N aggregators through
    * the grouped path; [[Multi.mrangeGroupBy]] reduces all its value
    * columns in one grouped pass). Emits
    * `(series="label=lv", ts=bucket, value=array<double> per agg)`
    * updates, one row per touched (group, bucket) per micro-batch. */
  def mrangeGroupByStreamMulti(
      stream: DataFrame, seriesToGroup: DataFrame, groupByLabel: String,
      aggs: Seq[String], reducer: String, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregator")
    aggs.foreach(a => require(SupportedAggs.contains(a),
      s"streaming GROUPBY aggregator $a not in $SupportedAggs (twa needs bucket neighbours — batch path)"))
    require(SupportedReducers.contains(reducer),
      s"streaming GROUPBY reducer $reducer not in $SupportedReducers (the batch reducer contract)")
    val spark = stream.sparkSession
    import spark.implicits._
    var s = stream.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val keyed = s
      .join(broadcast(seriesToGroup), Seq("series"))
      .select(col("lv"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"),
        col("series"), col("ts"), col("value"))
      .as[(String, Long, String, Long, Double)]
    keyed
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[(String, Long, String, Long, Double)],
         state: GroupState[Map[String, Partial]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, Partial])
          rows.foreach { case (_, _, series, ts, v) =>
            val (su, sq, mn, mx, n, fts, fv, lts, lv) =
              m.getOrElse(series, Zero)
            val (nfts, nfv) =
              if (ts < fts || (ts == fts && v < fv)) (ts, v) else (fts, fv)
            val (nlts, nlv) =
              if (ts > lts || (ts == lts && v > lv)) (ts, v) else (lts, lv)
            m = m.updated(series, (su + v, sq + v * v,
              math.min(mn, v), math.max(mx, v), n + 1, nfts, nfv, nlts, nlv))
          }
          state.update(m)
          val vals = aggs.map { a =>
            val finals = m.valuesIterator.map(p => finalize(a, p)).toArray
            reduce(reducer, finals)
          }
          Iterator.single((key._1, key._2, vals))
      }
      .toDF("lv", "ts", "value")
      .select(concat(lit(s"$groupByLabel="), col("lv")).as("series"),
        col("ts"), col("value"))
  }

  /** Single-aggregator form: `(series, ts, value: double)`. */
  def mrangeGroupByStream(
      stream: DataFrame, seriesToGroup: DataFrame, groupByLabel: String,
      agg: String, reducer: String, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame =
    mrangeGroupByStreamMulti(stream, seriesToGroup, groupByLabel,
      Seq(agg), reducer, bucketMs, alignMs, fromMs, toMs)
      .select(col("series"), col("ts"),
        element_at(col("value"), 1).as("value"))

  /**
   * One-shot replay against the events fixture (the shared staged
   * micro-batch discipline): update-mode log sink, merge-on-read
   * last-writer-wins, range-guarded. The final frame must hash-match
   * [[Multi.mrangeGroupBy]]'s batch answer — it shares the batch
   * query's DuckDB oracle.
   */
  def mrangeGroupByStreamOnce(
      spark: SparkSession, dir: String, preds: Seq[Multi.LabelPred],
      groupByLabel: String, agg: String, reducer: String, bucketMs: Long,
      fromMs: Option[Long], toMs: Option[Long], sinkDir: String): DataFrame =
    Compaction.withStatePartitions(spark, 8) {
      val labels = TSModel.labels(spark, dir)
      val s2g = Multi.queryIndex(labels, preds)
        .join(labels, Seq("series"))
        .select(col("series"),
          element_at(col("labels"), groupByLabel).as("lv"))
        .filter(col("lv").isNotNull)
      val streamed = mrangeGroupByStream(
        Compaction.eventsStream(spark, dir), s2g, groupByLabel,
        agg, reducer, bucketMs, 0L, fromMs, toMs)
      val log = Compaction.runToLogSink(streamed, "update", sinkDir)
      Compaction.guardStreamedRange(log, TSModel.samples(spark, dir), bucketMs)
      Compaction.lastWriterWins(log)
        .select(col("series"), col("ts"),
          col("value").cast("double").as(Aggs.colName(agg)))
    }

  /** Multi-aggregator one-shot replay ([[mrangeGroupByStreamOnce]]'s
    * discipline); the log's array value rides [[Compaction.lastWriterWins]]
    * unchanged (max over struct(batch_id, array) — lexicographic, only
    * batch_id decides) and unpacks to one named column per
    * aggregator, the batch operator's output shape. */
  def mrangeGroupByStreamMultiOnce(
      spark: SparkSession, dir: String, preds: Seq[Multi.LabelPred],
      groupByLabel: String, aggs: Seq[String], reducer: String, bucketMs: Long,
      fromMs: Option[Long], toMs: Option[Long], sinkDir: String): DataFrame =
    Compaction.withStatePartitions(spark, 8) {
      val labels = TSModel.labels(spark, dir)
      val s2g = Multi.queryIndex(labels, preds)
        .join(labels, Seq("series"))
        .select(col("series"),
          element_at(col("labels"), groupByLabel).as("lv"))
        .filter(col("lv").isNotNull)
      val streamed = mrangeGroupByStreamMulti(
        Compaction.eventsStream(spark, dir), s2g, groupByLabel,
        aggs, reducer, bucketMs, 0L, fromMs, toMs)
      val log = Compaction.runToLogSink(streamed, "update", sinkDir)
      Compaction.guardStreamedRange(log, TSModel.samples(spark, dir), bucketMs)
      Compaction.lastWriterWins(log)
        .select(col("series") +: col("ts") +:
          aggs.zipWithIndex.map { case (a, i) =>
            element_at(col("value"), i + 1).cast("double").as(Aggs.colName(a))
          }: _*)
    }

  /** Spec-facing chunked replay: stage an arbitrary samples frame as
    * `nChunks` mtime-ordered files (partitioned by `chunkCol` —
    * by something OTHER than ts to force out-of-order bucket
    * arrivals), stream one file per trigger through the same
    * pipeline, resolve the log. Must equal the batch
    * [[Multi.mrangeGroupBy]] on the same inputs for any chunking. */
  def mrangeGroupByStreamChunks(
      spark: SparkSession, samples: DataFrame, seriesToGroup: DataFrame,
      groupByLabel: String, agg: String, reducer: String, bucketMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      nChunks: Int = 4,
      chunkCol: org.apache.spark.sql.Column = col("ts")): DataFrame =
    mrangeGroupByStreamChunksMulti(spark, samples, seriesToGroup,
      groupByLabel, Seq(agg), reducer, bucketMs, fromMs, toMs,
      nChunks, chunkCol)

  /** Multi-aggregator chunked replay — the lockstep twin of
    * [[Multi.mrangeGroupBy]] with N value columns. */
  def mrangeGroupByStreamChunksMulti(
      spark: SparkSession, samples: DataFrame, seriesToGroup: DataFrame,
      groupByLabel: String, aggs: Seq[String], reducer: String, bucketMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      nChunks: Int = 4,
      chunkCol: org.apache.spark.sql.Column = col("ts")): DataFrame =
    Compaction.withStatePartitions(spark, 8) {
      val srcStage = java.nio.file.Files
        .createTempDirectory("graft_sgb_src_").resolve("stage").toString
      samples.select(col("series"), col("ts"), col("value"))
        .repartitionByRange(nChunks, chunkCol)
        .write.mode("overwrite").parquet(srcStage)
      locally {
        val files = new java.io.File(srcStage).listFiles()
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        files.zipWithIndex.foreach { case (f, i) =>
          f.setLastModified(1000000000000L + i * 60000L)
        }
      }
      val schema = samples.select(
        col("series"), col("ts"), col("value")).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcStage)
      val streamed = mrangeGroupByStreamMulti(stream, seriesToGroup,
        groupByLabel, aggs, reducer, bucketMs, 0L, fromMs, toMs)
      val sinkDir = java.nio.file.Files
        .createTempDirectory("graft_sgb_snk_").resolve("log").toString
      val log = Compaction.runToLogSink(streamed, "update", sinkDir)
      Compaction.lastWriterWins(log)
        .select(col("series") +: col("ts") +:
          aggs.zipWithIndex.map { case (a, i) =>
            element_at(col("value"), i + 1).cast("double").as(Aggs.colName(a))
          }: _*)
    }
}
