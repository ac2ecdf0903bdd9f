package graft.ts

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * TS.ADD / TS.MADD as live Structured Streaming ingest (reference:
 * internalAdd src/module.c:1000-1055): per-series stateful processing
 * that applies, in arrival order,
 *
 *  - the IGNORE near-duplicate filter against the last ACCEPTED sample
 *    (reference: src/module.c:986-998 — only under DUPLICATE_POLICY
 *    LAST, non-NaN, in-order),
 *  - tail-duplicate resolution (a write at `ts == lastTimestamp`) by
 *    duplicate policy (reference: generic_chunk.c:62 via
 *    SeriesAddSample),
 *  - out-of-order writes as LAST-policy upserts, the same default the
 *    reference's own compaction upsert path uses (DP_LAST,
 *    src/tsdb.c:621-668); policy-exact OOO resolution against stored
 *    history belongs to the batch path ([[WritePath.applyDupPolicy]] /
 *    [[Compaction.recomputeBuckets]]), because it needs the stored
 *    value, not O(1) tail state.
 *
 * Scale shape: `flatMapGroupsWithState` keyed by series with O(1)
 * state per series — (lastTs, lastValue) — regardless of stream
 * length. Emission is an upsert stream: a row (series, ts, value)
 * SUPERSEDES any earlier row with the same key, so the sink must be
 * merge-on-read (last writer wins), exactly like
 * [[Compaction.streamingDownsampleUpdateOnce]]'s log-structured sink.
 * State persists across micro-batches, so the sequential semantics
 * match the batch [[WritePath.ignoreFilter]] no matter how the stream
 * is chopped into batches.
 */
object Ingest {

  /** O(1) per-series tail state (reference Series fields lastTimestamp
    * / lastValue, src/tsdb.h:69-70). */
  final case class TailState(lastTs: Long, lastValue: Double, hasLast: Boolean)

  /**
   * Stateful ingest transform. `stream` is a streaming DataFrame with
   * columns (series, ts, value); returns the upsert stream of accepted
   * writes. Within a micro-batch each series' rows are processed in
   * (ts, value) order — the same deterministic order as the batch
   * ignore filter — and each touched (series, ts) is emitted once with
   * its final value.
   */
  def streamingIngest(
      stream: DataFrame, dupPolicy: String,
      ignoreMaxTimeDiff: Long = 0L, ignoreMaxValDiff: Double = 0.0)
      : Dataset[(String, Long, Double)] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val policy = dupPolicy.toUpperCase
    require(Seq("LAST", "FIRST", "MIN", "MAX", "SUM", "BLOCK").contains(policy),
      s"unknown duplicate policy $dupPolicy")
    val ignoreOn = policy == "LAST" && (ignoreMaxTimeDiff > 0 || ignoreMaxValDiff > 0)
    stream
      .select(col("series"), col("ts"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Double)], state: GroupState[TailState]) =>
          var st = state.getOption.getOrElse(TailState(Long.MinValue, Double.NaN, hasLast = false))
          // batch-local upsert buffer: last value per touched ts, in
          // first-touch order; bounded by micro-batch size
          val out = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, v) =>
            if (!st.hasLast || ts > st.lastTs) {
              // in-order append: IGNORE gate, then accept
              val drop = ignoreOn && st.hasLast && !v.isNaN && !st.lastValue.isNaN &&
                ts - st.lastTs <= ignoreMaxTimeDiff &&
                math.abs(v - st.lastValue) <= ignoreMaxValDiff
              if (!drop) { out(ts) = v; st = TailState(ts, v, hasLast = true) }
            } else if (ts == st.lastTs) {
              // duplicate at the tail: resolve by policy against lastValue
              policy match {
                case "BLOCK" => throw new IllegalStateException(
                  s"duplicate timestamp $ts on $key under BLOCK policy")
                case "FIRST" => // keep the stored value
                case "LAST" => out(ts) = v; st = st.copy(lastValue = v)
                case "MIN" =>
                  val r = math.min(st.lastValue, v); out(ts) = r; st = st.copy(lastValue = r)
                case "MAX" =>
                  val r = math.max(st.lastValue, v); out(ts) = r; st = st.copy(lastValue = r)
                case "SUM" =>
                  val r = st.lastValue + v; out(ts) = r; st = st.copy(lastValue = r)
              }
            } else {
              // out-of-order: LAST-policy upsert (reference compaction
              // upsert default DP_LAST, tsdb.c:621-668)
              out(ts) = v
            }
          }
          state.update(st)
          out.iterator.map { case (ts, v) => (key, ts, v) }
      }
  }

  /** One-shot run against existing sample parquet under `srcDir`,
    * through the merge-on-read sink: every batch's emissions append to
    * `sinkDir` stamped with the batch id; the read side keeps the last
    * writer per (series, ts). `maxFilesPerTrigger=1` forces one
    * micro-batch per file so cross-batch state is really exercised. */
  def streamingIngestOnce(
      spark: SparkSession, srcDir: String, sinkDir: String, dupPolicy: String,
      ignoreMaxTimeDiff: Long = 0L, ignoreMaxValDiff: Double = 0.0): DataFrame =
      Compaction.withStatePartitions(spark, 8) {
    import org.apache.spark.sql.Row
    val src = spark.readStream
      .schema(Compaction.sampleSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = streamingIngest(src, dupPolicy, ignoreMaxTimeDiff, ignoreMaxValDiff)
      .toDF("series", "ts", "value")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(sinkDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sinkDir)
      .groupBy(col("series"), col("ts"))
      .agg(max(struct(col("batch_id").as("b"), col("value").as("v")))
        .getField("v").as("value"))
  }

  /** The events fixture replayed through the streaming ingest with the
    * IGNORE filter on — must equal the batch [[WritePath.ignoreFilter]]
    * (and its recursive-CTE oracle). */
  def eventsIngestOnce(
      spark: SparkSession, dir: String, sinkDir: String,
      maxTimeDiff: Long, maxValDiff: Double): DataFrame =
      Compaction.withStatePartitions(spark, 8) {
    import org.apache.spark.sql.Row
    val src = Compaction.eventsStream(spark, dir)
    val q = streamingIngest(src, "LAST", maxTimeDiff, maxValDiff)
      .toDF("series", "ts", "value")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(sinkDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sinkDir)
      .groupBy(col("series"), col("ts"))
      .agg(max(struct(col("batch_id").as("b"), col("value").as("v")))
        .getField("v").as("value"))
  }
}
