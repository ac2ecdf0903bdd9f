package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._

/** TS.READ BLOCK ms min_count (reference: module.c:1612-1646): the gate
  * must withhold ALL output until >= min_count qualifying samples have
  * arrived, then flush everything. Deterministic: two pre-staged parquet
  * files drained through AvailableNow micro-batches sharing a
  * checkpoint, exactly the reference flow-test shape
  * (tests/flow/test_ts_read.py:23-40 threaded harness). */
class ReadBlockSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private val emitted = new java.util.concurrent.atomic.AtomicLong(0)

  private def drain(dir: String, ckpt: String): Long = {
    emitted.set(0)
    val q = Read.blockTail(
        spark.readStream.schema(Compaction.sampleSchema).parquet(dir),
        series = "s", cursorTs = 100L, minCount = 5)
      .toDF("series", "ts", "value")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted.addAndGet(batch.count()); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    emitted.get()
  }

  test("BLOCK min_count withholds output until enough samples, then flushes all") {
    val dir = Files.createTempDirectory("blocktail").toString
    val ckpt = Files.createTempDirectory("blockckpt").toString
    // batch 1: only 3 qualifying samples (one below the cursor) -> gate shut
    Seq(("s", 50L, 0.0), ("s", 110L, 1.0), ("s", 120L, 2.0), ("s", 130L, 3.0))
      .toDF("series", "ts", "value").write.parquet(s"$dir/b1")
    assert(drain(s"$dir/*", ckpt) == 0L)
    // batch 2: 3 more -> 6 >= 5, everything buffered flushes
    Seq(("s", 140L, 4.0), ("s", 150L, 5.0), ("s", 160L, 6.0))
      .toDF("series", "ts", "value").write.parquet(s"$dir/b2")
    assert(drain(s"$dir/*", ckpt) == 6L)
    // batch 3: once open, later samples pass straight through
    Seq(("s", 170L, 7.0)).toDF("series", "ts", "value").write.parquet(s"$dir/b3")
    assert(drain(s"$dir/*", ckpt) == 1L)
  }

  private def drainTimeout(dir: String, ckpt: String, clockMs: Long): Long = {
    emitted.set(0)
    val q = Read.blockTailTimeout(
        spark.readStream.schema(Compaction.sampleSchema).parquet(dir),
        series = "s", cursorTs = 100L, minCount = 5, timeoutMs = 1000L,
        clock = Some(() => clockMs), processingTimeTimeout = false)
      .toDF("series", "ts", "value")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted.addAndGet(batch.count()); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    emitted.get()
  }

  test("BLOCK timeout unblocks with whatever is buffered (reference timeout callback)") {
    // reference: module.c:1889-2017 — the deadline fires and the client
    // receives the partial buffer instead of waiting for min_count.
    // Deterministic via an injected clock: batch 1 arms the deadline at
    // t=0+1000; batch 2 arrives at simulated t=5000, past it.
    val dir = Files.createTempDirectory("blocktmo").toString
    val ckpt = Files.createTempDirectory("blocktmockpt").toString
    Seq(("s", 110L, 1.0), ("s", 120L, 2.0))
      .toDF("series", "ts", "value").write.parquet(s"$dir/b1")
    assert(drainTimeout(s"$dir/*", ckpt, clockMs = 0L) == 0L) // 2 < 5: gate shut
    Seq(("s", 130L, 3.0)).toDF("series", "ts", "value").write.parquet(s"$dir/b2")
    // 3 < 5 but the deadline passed: flush the partial buffer
    assert(drainTimeout(s"$dir/*", ckpt, clockMs = 5000L) == 3L)
    // gate stays open afterwards
    Seq(("s", 140L, 4.0)).toDF("series", "ts", "value").write.parquet(s"$dir/b3")
    assert(drainTimeout(s"$dir/*", ckpt, clockMs = 5001L) == 1L)
  }

  test("BLOCK timeout arms at query start, not at the series' first sample") {
    // ADVICE r03: a series with no traffic must still time out — the
    // seeded initial state runs the state function in batch 1 even
    // though batch 1 holds only an UNRELATED series, arming the
    // deadline at t=0. The series' own first sample then arrives past
    // the deadline and flushes below min_count; without the seed this
    // batch would merely arm the deadline and withhold.
    val dir = Files.createTempDirectory("blockseed").toString
    val ckpt = Files.createTempDirectory("blockseedckpt").toString
    Seq(("x", 110L, 1.0)).toDF("series", "ts", "value").write.parquet(s"$dir/b1")
    assert(drainTimeout(s"$dir/*", ckpt, clockMs = 0L) == 0L)
    Seq(("s", 120L, 2.0)).toDF("series", "ts", "value").write.parquet(s"$dir/b2")
    assert(drainTimeout(s"$dir/*", ckpt, clockMs = 5000L) == 1L)
  }
}
