package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
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
