package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Dedup, StreamDedup, Text}

class StreamDedupSpec extends AnyFunSuite {
  import SparkTest._

  test("streaming dedup equals the batch canonical mapping") {
    val got = StreamDedup.documentsDedupOnce(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Dedup.exact(Text.loadDocuments(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("RocksDB state store: identical output, state metrics reported") {
    // provider choice must be semantics-free — the 100-TB config swap
    // (disk-backed state) produces the exact same canonical mapping
    val rocks = StreamDedup.documentsDedupOnce(spark, sf, useRocksDb = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val (stateRows, _) = StreamDedup.lastStateMetrics
      .getOrElse(fail("no state metrics captured"))
    val want = Dedup.exact(Text.loadDocuments(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rocks == want)
    // state cardinality = distinct fingerprints (the documented bound)
    assert(stateRows == want.size)
  }

  test("cross-batch duplicates are suppressed, not re-emitted") {
    // duplicate docs 0..4 at ids 10000.. — they land in the LAST
    // micro-batch (doc_id-range staging), several batches after their
    // originals, so suppression requires real cross-batch state
    val docs = Text.loadDocuments(spark, sf)
    val planted = docs.unionByName(
      docs.filter(col("doc_id") < 5)
        .withColumn("doc_id", col("doc_id") + 10000))
    val stage = java.nio.file.Files
      .createTempDirectory("graft_sdedup_spec_").toString
    planted.write.mode("overwrite").parquet(s"$stage/documents.parquet")
    val out = StreamDedup.documentsDedupOnce(spark, stage)
    assert(out.filter(col("doc_id") >= 10000).count() == 0)
    assert(out.count() == Dedup.exact(docs).count())
  }
}
