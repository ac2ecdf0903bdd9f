package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._
import graft.ts.Catalog._

class CatalogReadSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("catalog create/alter lifecycle with validation") {
    var cat = create(Nil, SeriesMeta("a", retentionMs = 1000L,
      labels = Map("sensor" -> "1")))
    intercept[IllegalArgumentException](create(cat, SeriesMeta("a")))
    intercept[IllegalArgumentException](create(cat, SeriesMeta("b", retentionMs = -1)))
    cat = alter(cat, "a", _.copy(duplicatePolicy = "LAST"))
    assert(cat.head.duplicatePolicy == "LAST")
    intercept[IllegalArgumentException](alter(cat, "zz", identity))
    // CHUNK_SIZE bounds and multiple-of-8 (reference: query_language.c:85-92)
    intercept[IllegalArgumentException](create(cat, SeriesMeta("c", chunkSizeBytes = 40)))
    intercept[IllegalArgumentException](create(cat, SeriesMeta("c", chunkSizeBytes = 100)))
    intercept[IllegalArgumentException](create(cat, SeriesMeta("c", chunkSizeBytes = 1048584)))
    cat = create(cat, SeriesMeta("c", chunkSizeBytes = 128, encoding = "UNCOMPRESSED"))
    intercept[IllegalArgumentException](create(cat, SeriesMeta("d", encoding = "GORILLA")))
  }

  test("compaction rule constraints: no chains, one rule per dest") {
    var cat = Seq(SeriesMeta("src"), SeriesMeta("dst"), SeriesMeta("dst2"))
    var rules = Seq.empty[RuleMeta]
    val (c1, r1) = createRule(cat, rules, RuleMeta("src", "dst", "avg", 1000L))
    cat = c1; rules = r1
    assert(cat.find(_.series == "dst").get.srcKey.contains("src"))
    // dest cannot get a second rule
    intercept[IllegalArgumentException](
      createRule(cat, rules, RuleMeta("dst2", "dst", "max", 1000L)))
    // no chains: dst cannot feed dst2
    intercept[IllegalArgumentException](
      createRule(cat, rules, RuleMeta("dst", "dst2", "max", 1000L)))
    val (c2, r2) = deleteRule(cat, rules, "src", "dst")
    assert(r2.isEmpty && c2.find(_.series == "dst").get.srcKey.isEmpty)
  }

  test("COMPACTION_POLICY spec expansion matches reference naming") {
    // reference tests/flow/test_globalconfigs.py: "max:1m:1d" creates
    // `tester_MAX_1` — lowercase 'm' is MILLISECONDS (parse_policies.c
    // lookup ['m']=1, ['M']=60000), dest keys and the aggregation
    // label carry the UPPERCASE agg name
    val out = autoRules("max:1m:1h;avg:2h:10d;avg:3d:100d:1d;min:10M:1h", "key")
    assert(out.map(_._2) == Seq(
      RuleMeta("key", "key_MAX_1", "max", 1L),
      RuleMeta("key", "key_AVG_7200000", "avg", 7200000L),
      RuleMeta("key", "key_AVG_259200000_86400000", "avg", 259200000L, 86400000L),
      RuleMeta("key", "key_MIN_600000", "min", 600000L)))
    assert(out.head._1.labels == Map("aggregation" -> "MAX", "time_bucket" -> "1"))
    assert(out(1)._1.retentionMs == 864000000L)
  }

  test("cursor read honours sentinel resolution and max count") {
    val s = Seq(("k", 10L, 1.0), ("k", 20L, 2.0), ("k", 30L, 3.0))
      .toDF("series", "ts", "value")
    assert(Read.resolveCursor(s, "k", "-") == 0L)
    assert(Read.resolveCursor(s, "k", "$") == 31L)
    val got = Read.cursor(s, "k", 20L, maxCount = 1).collect()
    assert(got.length == 1 && got(0).getLong(1) == 20L)
    assert(Read.cursor(s, "k", 31L).count() == 0)
  }

  test("streaming tail picks up late-arriving files (blocking-read analogue)") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("tail_late").toString
    val first = Seq(("k", 100L, 1.0), ("k", 200L, 2.0)).toDF("series", "ts", "value")
    first.write.mode("overwrite").parquet(tmp)
    val q = Read.tail(spark, tmp, "k", 150L)
      .writeStream.outputMode("append")
      .format("memory").queryName("spec_tail_late")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("spec_tail_late").count() == 1) // ts=200 only
      // a new "write" lands -> the tail emits it, like the reference
      // waking blocked TS.READ clients (module.c:2055-2071)
      Seq(("k", 300L, 3.0), ("x", 400L, 9.0)).toDF("series", "ts", "value")
        .write.mode("append").parquet(tmp)
      q.processAllAvailable()
      val got = spark.table("spec_tail_late").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((200L, 2.0), (300L, 3.0))) // series-filtered, cursor-filtered
    } finally q.stop()
  }

  test("streaming tail drains existing samples past the cursor") {
    // stream the events fixture through the tail (long-format filter)
    val cursor = 1704067200000L + 15L * 86400000L
    val batch = TSModel.samples(spark, sf)
      .filter(col("series") === "click_7" && col("ts") >= cursor)
      .count()
    // write long-format parquet to a temp dir for the stream source
    val tmp = java.nio.file.Files.createTempDirectory("tail_src").toString
    TSModel.samples(spark, sf).write.mode("overwrite").parquet(tmp)
    val got = Read.tailOnce(spark, tmp, "click_7", cursor, "spec_tail").count()
    assert(got == batch && got > 0)
  }
}
