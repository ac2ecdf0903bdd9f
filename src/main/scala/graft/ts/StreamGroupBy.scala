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
 * Supported aggregator/reducer set: {sum, min, max, count, avg} both
 * levels — the partials-composable subset (first/last/twa need
 * arrival order or neighbours; std/var need a second moment — the
 * batch path covers them). Finite values only: a NaN-bearing history
 * is a batch-path concern (NaN enters reference storage only through
 * compaction fills).
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

  private val Supported = Set("sum", "min", "max", "count", "avg")

  /** `(series="label=lv", ts=bucket, value=reduced)` updates, one row
    * per touched (group, bucket) per micro-batch. */
  def mrangeGroupByStream(
      stream: DataFrame, seriesToGroup: DataFrame, groupByLabel: String,
      agg: String, reducer: String, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(Supported.contains(agg),
      s"streaming GROUPBY aggregator $agg not in $Supported (batch path covers the rest)")
    require(Supported.contains(reducer),
      s"streaming GROUPBY reducer $reducer not in $Supported (batch path covers the rest)")
    val spark = stream.sparkSession
    import spark.implicits._
    var s = stream
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val keyed = s
      .join(broadcast(seriesToGroup), Seq("series"))
      .select(col("lv"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"),
        col("series"), col("value"))
      .as[(String, Long, String, Double)]
    keyed
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[(String, Long, String, Double)],
         state: GroupState[Map[String, (Double, Double, Double, Long)]]) =>
          var m = state.getOption.getOrElse(
            Map.empty[String, (Double, Double, Double, Long)])
          rows.foreach { case (_, _, series, v) =>
            val (su, mn, mx, n) = m.getOrElse(series,
              (0.0, Double.PositiveInfinity, Double.NegativeInfinity, 0L))
            m = m.updated(series,
              (su + v, math.min(mn, v), math.max(mx, v), n + 1))
          }
          state.update(m)
          val finals = m.valuesIterator.map { case (su, mn, mx, n) =>
            agg match {
              case "sum"   => su
              case "min"   => mn
              case "max"   => mx
              case "count" => n.toDouble
              case _       => su / n
            }
          }.toArray
          val red = reducer match {
            case "sum"   => finals.sum
            case "min"   => finals.min
            case "max"   => finals.max
            case "count" => finals.length.toDouble
            case _       => finals.sum / finals.length
          }
          Iterator.single((key._1, key._2, red))
      }
      .toDF("lv", "ts", "value")
      .select(concat(lit(s"$groupByLabel="), col("lv")).as("series"),
        col("ts"), col("value"))
  }

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
      val streamed = mrangeGroupByStream(stream, seriesToGroup,
        groupByLabel, agg, reducer, bucketMs, 0L, fromMs, toMs)
      val sinkDir = java.nio.file.Files
        .createTempDirectory("graft_sgb_snk_").resolve("log").toString
      val log = Compaction.runToLogSink(streamed, "update", sinkDir)
      Compaction.lastWriterWins(log)
        .select(col("series"), col("ts"),
          col("value").cast("double").as(Aggs.colName(agg)))
    }
}
