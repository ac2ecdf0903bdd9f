package graft

import graft.ts.{Compaction, Ingest, TSModel, WritePath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming TS.ADD ingest: per-series tail state must survive
  * micro-batch boundaries, tail duplicates resolve by policy, OOO rows
  * upsert, and a whole-fixture replay must equal the batch ignore
  * filter (reference: internalAdd src/module.c:1000-1055). */
class IngestStreamSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  /** Stage rows as one parquet file in `dir` (sequential mtimes keep
    * the file-source batch order deterministic). */
  private def stage(dir: String, rows: Seq[(String, Long, Double)]): Unit = {
    rows.toDF("series", "ts", "value").coalesce(1)
      .write.mode("append").parquet(dir)
    Thread.sleep(1050) // file-source ordering is by modification time
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("d").toString

  test("SUM tail duplicates and OOO upserts across three micro-batches") {
    val src = tmp("ing_src_")
    val sink = tmp("ing_sink_")
    stage(src, Seq(("A", 1000L, 10.0), ("A", 2000L, 100.0)))
    stage(src, Seq(("A", 2000L, 5.0), ("A", 3000L, 7.0), ("B", 500L, 1.0)))
    stage(src, Seq(("A", 1500L, 42.0), ("A", 3000L, 8.0)))
    val got = Ingest.streamingIngestOnce(spark, src, sink, "SUM")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // batch 2: 2000 is the tail -> 100+5; batch 3: 1500 is OOO (upsert
    // as-is), 3000 is the tail -> 7+8
    assert(got == Set(
      ("A", 1000L, 10.0), ("A", 1500L, 42.0), ("A", 2000L, 105.0),
      ("A", 3000L, 15.0), ("B", 500L, 1.0)))
  }

  test("IGNORE state persists across micro-batches under LAST policy") {
    val src = tmp("ign_src_")
    val sink = tmp("ign_sink_")
    stage(src, Seq(("C", 1000L, 10.0)))
    stage(src, Seq(("C", 1100L, 10.2))) // near-dup of batch-1 tail: dropped
    stage(src, Seq(("C", 1200L, 50.0))) // value moved: kept
    val got = Ingest.streamingIngestOnce(spark, src, sink, "LAST",
      ignoreMaxTimeDiff = 500L, ignoreMaxValDiff = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("C", 1000L, 10.0), ("C", 1200L, 50.0)))
  }

  test("FIRST policy keeps the stored tail value") {
    val src = tmp("fst_src_")
    val sink = tmp("fst_sink_")
    stage(src, Seq(("D", 1000L, 1.0)))
    stage(src, Seq(("D", 1000L, 99.0))) // tail dup: FIRST keeps 1.0
    val got = Ingest.streamingIngestOnce(spark, src, sink, "FIRST")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("D", 1000L, 1.0)))
  }

  test("events replay through streaming ingest equals the batch ignore filter") {
    val dir = "/root/testdata/sf0.001"
    val sink = tmp("rep_sink_")
    val streamed = Ingest.eventsIngestOnce(spark, dir, sink,
      maxTimeDiff = 12L * 3600000L, maxValDiff = 50.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = WritePath.ignoreFilter(TSModel.samples(spark, dir),
      maxTimeDiff = 12L * 3600000L, maxValDiff = 50.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
