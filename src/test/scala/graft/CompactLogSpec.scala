package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._

/** [[Compaction.compactLog]] — the merge-on-read dest logs' maintenance
  * fold (VERDICT r06 #4): rewriting a log to current winners must leave
  * every read IDENTICAL, shrink the log to dest cardinality, and be
  * idempotent, for both sink shapes (TWA partials, plain update-mode). */
class CompactLogSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private val DAY = 86400000L

  test("TWA partials log: OOO stream writes multiple versions, compaction preserves reads") {
    val r = Compaction.Rule("twa", DAY)
    val work = java.nio.file.Files.createTempDirectory("clog_twa_").toString
    // oooSplit: every batch carries late samples for interior buckets,
    // so most buckets are re-partialed by several batches — the
    // multi-version log shape compaction exists for
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x =>
        (x.getString(0), x.getLong(1), math.round(x.getDouble(2) * 1e6))).toSet
    val before = key(Compaction.streamingDownsampleTwaOnce(spark, sf, r, work,
      nChunks = 4, oooSplit = true))
    val destLog = s"$work/dest"
    val rowsBefore = spark.read.parquet(destLog).count()
    val destKeys = spark.read.parquet(destLog)
      .select("series", "bucket").distinct().count()
    assert(rowsBefore > destKeys,
      s"OOO stream should supersede versions: log=$rowsBefore keys=$destKeys")
    val compacted = Compaction.compactLog(spark, destLog, Seq("series", "bucket"))
    assert(compacted == destKeys, s"compacted to $compacted rows, expected $destKeys")
    assert(spark.read.parquet(destLog).count() == destKeys)
    val after = key(Compaction.resolveTwaPartials(spark.read.parquet(destLog), r))
    assert(after == before && after.nonEmpty, "resolution changed across compaction")
    // idempotent: a second fold is a no-op on an already-folded log
    assert(Compaction.compactLog(spark, destLog, Seq("series", "bucket")) == destKeys)
    assert(key(Compaction.resolveTwaPartials(spark.read.parquet(destLog), r)) == before)
  }

  test("mid-stream auto-compaction (compactEvery) preserves the result and bounds the log") {
    val r = Compaction.Rule("twa", DAY)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x =>
        (x.getString(0), x.getLong(1), math.round(x.getDouble(2) * 1e6))).toSet
    val plainWork = java.nio.file.Files.createTempDirectory("clog_auto0_").toString
    val autoWork = java.nio.file.Files.createTempDirectory("clog_auto2_").toString
    val plain = key(Compaction.streamingDownsampleTwaOnce(spark, sf, r, plainWork,
      nChunks = 4, oooSplit = true))
    val auto = key(Compaction.streamingDownsampleTwaOnce(spark, sf, r, autoWork,
      nChunks = 4, oooSplit = true, compactEvery = 2))
    assert(auto == plain && auto.nonEmpty,
      "mid-stream compaction changed the resolved result")
    val plainRows = spark.read.parquet(s"$plainWork/dest").count()
    val autoRows = spark.read.parquet(s"$autoWork/dest").count()
    // with oooSplit every batch re-partials most buckets: 4 batches
    // leave ~4 versions/bucket unfolded; compactEvery=2 folds twice
    // mid-stream, so only the post-fold tail of versions remains
    assert(autoRows < plainRows,
      s"auto-compacted log ($autoRows rows) not smaller than unfolded ($plainRows)")
  }

  test("update-mode agg log: last-writer-wins result survives compaction exactly") {
    val sink = java.nio.file.Files.createTempDirectory("clog_upd_")
      .resolve("log").toString
    // hand-built log with superseded versions and an interleaved key:
    // (k,0) written by batches 0 and 2, (k,100) by 1, (m,0) by 0 and 1
    Seq(("k", 0L, 1.0, 0L), ("k", 100L, 2.0, 1L), ("k", 0L, 5.0, 2L),
        ("m", 0L, 7.0, 0L), ("m", 0L, Double.NaN, 1L))
      .toDF("series", "ts", "value", "batch_id")
      .write.parquet(sink)
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getString(0), x.getLong(1)) ->
        (if (x.isNullAt(2)) Double.NaN else x.getDouble(2))).toMap
    val before = dump(Compaction.lastWriterWins(spark.read.parquet(sink)))
    assert(before(("k", 0L)) == 5.0 && before(("m", 0L)).isNaN)
    val n = Compaction.compactLog(spark, sink, Seq("series", "ts"))
    assert(n == 3, s"3 distinct keys expected, got $n")
    val log = spark.read.parquet(sink).collect()
      .map(r => (r.getString(r.fieldIndex("series")), r.getLong(r.fieldIndex("ts"))) ->
        r.getLong(r.fieldIndex("batch_id"))).toMap
    // winners keep their batch ids, so later appends still supersede
    assert(log(("k", 0L)) == 2L && log(("k", 100L)) == 1L && log(("m", 0L)) == 1L)
    val after = dump(Compaction.lastWriterWins(spark.read.parquet(sink)))
    assert(after.keySet == before.keySet &&
      after.forall { case (k, v) => v == before(k) || (v.isNaN && before(k).isNaN) })
    // appends after compaction keep superseding: batch 3 rewrites (k,0)
    Seq(("k", 0L, 9.0, 3L)).toDF("series", "ts", "value", "batch_id")
      .write.mode("append").parquet(sink)
    assert(dump(Compaction.lastWriterWins(spark.read.parquet(sink)))(("k", 0L)) == 9.0)
  }
}
