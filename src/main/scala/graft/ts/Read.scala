package graft.ts

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/**
 * TS.READ — cursor/tailing reads (snapshot-specific command, reference:
 * src/module.c:1609-2130): return samples with `ts >= cursor`, bounded
 * by MAX_COUNT, with sentinels `-` (series start), `+`/`$` (series
 * end); the blocking variant parks until min_count samples arrive.
 *
 * Batch shape: a pruned range scan + limit. Streaming shape: the same
 * filter over `readStream` — a trigger-driven tail that emits new
 * samples as files land, which is the Spark-native equivalent of the
 * reference's blocked-client wakeup (reference: src/module.c:2055-2071).
 */
object Read {

  /** Cursor read: samples at or after `cursor`, oldest first, at most
    * `maxCount` (0 = unbounded). */
  def cursor(samples: DataFrame, series: String, cursorTs: Long, maxCount: Int = 0): DataFrame = {
    val base = samples
      .filter(col("series") === series && col("ts") >= cursorTs)
      .orderBy(col("ts"))
      .select(col("series"), col("ts"), col("value"))
    if (maxCount > 0) base.limit(maxCount) else base
  }

  /** Resolve cursor sentinels against a series (reference sentinels
    * `-`, `+`, `$`: module.c:1609-2130): `-` -> 0, `+`/`$` -> one past
    * the newest sample (so `$` tails only future writes). */
  def resolveCursor(samples: DataFrame, series: String, sentinel: String): Long = sentinel match {
    case "-" => 0L
    case "+" | "$" =>
      samples.filter(col("series") === series).agg(max(col("ts"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r                  => r.getLong(0) + 1
      }
    case ts => ts.toLong
  }

  /** Streaming tail over a directory of long-format sample parquet:
    * emits samples with ts >= cursor as they arrive. Returns the
    * streaming DataFrame; attach a sink and trigger to run. */
  def tail(spark: SparkSession, dir: String, series: String, cursorTs: Long): DataFrame =
    spark.readStream
      .schema(Compaction.sampleSchema)
      .parquet(dir)
      .filter(col("series") === series && col("ts") >= cursorTs)

  /** Per-series blocking state: buffered not-yet-released samples (the
    * buffer never exceeds minCount-1 rows) and whether the gate opened. */
  final case class BlockState(buffer: Seq[(Long, Double)], emitted: Boolean)

  /**
   * TS.READ ... BLOCK ms min_count (reference: module.c:1612-1646,
   * default unblock at 1 sample): the client parks until at least
   * `minCount` qualifying samples exist, then receives them all.
   *
   * Streaming shape: `flatMapGroupsWithState` keyed by series buffers
   * qualifying samples and emits NOTHING until the buffered count
   * reaches `minCount`; the unblocking batch flushes the whole buffer
   * (ts order) and every later batch passes straight through — the
   * blocked-client wakeup (reference: module.c:2055-2071). State is
   * O(minCount) per series and drops to a boolean once open; a
   * watermark-free NoTimeout map, so arbitrarily-late samples still
   * count toward the gate, matching the reference's no-deadline default.
   */
  def blockTail(
      stream: DataFrame, series: String, cursorTs: Long,
      minCount: Int): Dataset[(String, Long, Double)] = {
    require(minCount >= 1, s"BLOCK min_count must be >= 1, got $minCount")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .filter(col("series") === series && col("ts") >= cursorTs)
      .select(col("series"), col("ts"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Double)], state: GroupState[BlockState]) =>
          val st = state.getOption.getOrElse(BlockState(Nil, emitted = false))
          val incoming = rows.map(r => (r._2, r._3)).toSeq
          if (st.emitted) {
            incoming.sortBy(_._1).iterator.map { case (ts, v) => (key, ts, v) }
          } else {
            val buf = st.buffer ++ incoming
            if (buf.size >= minCount) {
              state.update(BlockState(Nil, emitted = true))
              buf.sortBy(_._1).iterator.map { case (ts, v) => (key, ts, v) }
            } else {
              state.update(BlockState(buf, emitted = false))
              Iterator.empty
            }
          }
      }
  }

  /** Blocking state with a deadline (epoch-ms); `deadline == 0` means
    * not yet armed. */
  final case class BlockTimeoutState(
      buffer: Seq[(Long, Double)], emitted: Boolean, deadline: Long)

  /**
   * TS.READ ... BLOCK ms min_count WITH the timeout path (reference:
   * module.c:1889-2017 — the timeout callback unblocks the client with
   * whatever is buffered, possibly nothing, instead of waiting for
   * min_count forever). The deadline arms when the series' first batch
   * arrives; once `now >= deadline` the buffer flushes even below
   * `minCount`, and the gate stays open (later samples pass straight
   * through, like the post-unblock contract of [[blockTail]]).
   *
   * With `processingTimeTimeout=true` (production) a
   * ProcessingTimeTimeout wakes the group when the deadline passes with
   * no new data; the trigger loop spins micro-batches until it fires, so
   * deterministic tests pass `false` and drive the deadline purely from
   * arriving batches. `clock` injects a simulated time source for tests;
   * production leaves it None and uses the state store's processing
   * time.
   *
   * The queried series' group state is SEEDED (initial state), so the
   * state function runs — and the deadline arms — in the very first
   * micro-batch even if the series never receives a single sample
   * (ADVICE r03: arming on first data meant a data-less series never
   * unblocked; the reference's timeout callback, module.c:1889-2017,
   * fires after timeoutMs regardless of traffic). The timed-out flush
   * of an empty buffer emits nothing but opens the gate — the
   * reference's empty reply to the unblocked client.
   */
  def blockTailTimeout(
      stream: DataFrame, series: String, cursorTs: Long,
      minCount: Int, timeoutMs: Long,
      clock: Option[() => Long] = None,
      processingTimeTimeout: Boolean = true): Dataset[(String, Long, Double)] = {
    require(minCount >= 1, s"BLOCK min_count must be >= 1, got $minCount")
    require(timeoutMs > 0, s"BLOCK timeout must be positive, got $timeoutMs")
    val spark = stream.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (processingTimeTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    // deadline == 0 sentinel: the function invocation arms it from the
    // batch's clock, whether that invocation comes from data or from
    // this seed
    val seed = Seq((series, BlockTimeoutState(Nil, emitted = false, 0L)))
      .toDS().groupByKey(_._1).mapValues(_._2)
    stream
      .filter(col("series") === series && col("ts") >= cursorTs)
      .select(col("series"), col("ts"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf, seed) {
        (key: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[BlockTimeoutState]) =>
          val now = clock.map(_())
            .getOrElse(state.getCurrentProcessingTimeMs())
          val st0 = state.getOption.getOrElse(BlockTimeoutState(Nil, emitted = false, 0L))
          val st = if (st0.deadline == 0L) st0.copy(deadline = now + timeoutMs) else st0
          val incoming = rows.map(r => (r._2, r._3)).toSeq
          def flush(buf: Seq[(Long, Double)]) = {
            state.update(BlockTimeoutState(Nil, emitted = true, st.deadline))
            buf.sortBy(_._1).iterator.map { case (ts, v) => (key, ts, v) }
          }
          if (st.emitted) {
            incoming.sortBy(_._1).iterator.map { case (ts, v) => (key, ts, v) }
          } else {
            val buf = st.buffer ++ incoming
            if (buf.size >= minCount || now >= st.deadline || state.hasTimedOut) {
              flush(buf) // timeout unblocks with whatever is buffered
            } else {
              state.update(st.copy(buffer = buf))
              if (processingTimeTimeout)
                state.setTimeoutDuration(math.max(st.deadline - now, 1L))
              Iterator.empty
            }
          }
      }
  }

  /** One-shot tail used by tests: drain everything currently in `dir`
    * through the streaming engine and return the collected batch. */
  def tailOnce(spark: SparkSession, dir: String, series: String, cursorTs: Long,
      queryName: String): DataFrame = {
    val q = tail(spark, dir, series, cursorTs)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
