package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{RangeQuery, Sources, TSModel}
import graft.ts.RangeQuery.RangeArgs

/** Source adapters: CSV / JSON-lines / arbitrary columns → the
  * canonical long format, with declared (never guessed) ts units and
  * the loud epoch-window guard. Round-trips the real fixture so the
  * normalized frames are checked against the canonical loader, not
  * synthetic expectations. */
class SourcesSpec extends AnyFunSuite {
  import SparkTest._

  private def canonical = TSModel.samples(spark, sf)
  private def asSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("csv round-trip at every declared numeric unit == canonical loader") {
    val base = canonical
    val dir = java.nio.file.Files.createTempDirectory("graft_src_csv_").toString
    for ((unit, factor) <- Seq(("ms", 1L), ("s", 1L), ("us", 1000L), ("ns", 1000000L))) {
      val out = s"$dir/$unit"
      // seconds: the fixture has sub-second timestamps, so round-trip
      // through seconds only the second-aligned subset
      val src = if (unit == "s") base.filter(col("ts") % 1000 === 0)
        .withColumn("t", col("ts") / 1000) else base.withColumn("t", col("ts") * factor)
      src.select(col("series").as("k"), col("t").cast("long").as("t"), col("value").as("v"))
        .coalesce(1).write.option("header", "true").mode("overwrite").csv(out)
      val back = Sources.fromCsv(spark, out, "k", "t", "v", Sources.parseUnit(unit))
      val expect = if (unit == "s") base.filter(col("ts") % 1000 === 0) else base
      assert(asSet(back) == asSet(expect), s"unit $unit")
    }
  }

  test("json-lines + ISO strings == canonical loader (UTC session)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_json_").toString
    canonical
      .select(col("series").as("k"),
        date_format(timestamp_millis(col("ts")), "yyyy-MM-dd HH:mm:ss.SSS").as("t"),
        col("value").as("v"))
      .coalesce(1).write.mode("overwrite").json(dir)
    val back = Sources.fromJsonLines(spark, dir, "k", "t", "v", Sources.Iso)
    assert(asSet(back) == asSet(canonical))
  }

  test("normalized sources drive the ordinary operators") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_ops_").toString
    canonical.select(col("series").as("k"), col("ts").as("t"), col("value").as("v"))
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(dir)
    val viaCsv = Sources.fromCsv(spark, dir, "k", "t", "v", Sources.Millis)
    val args = RangeArgs(from = Some(1704067200000L), to = Some(1706745599999L),
      aggs = Seq("avg", "count"), bucketMs = 86400000L)
    val a = RangeQuery.range(viaCsv.filter(col("series") === "click_7"), args)
    val b = RangeQuery.range(canonical.filter(col("series") === "click_7"), args)
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("epoch-window guard: in-window passes through, out-of-window raises") {
    import spark.implicits._
    val ok = Seq(("k", 1704067200000L, 1.0)).toDF("series", "ts", "value")
    assert(Sources.requireEpochWindow(ok, 1700000000000L, 1710000000000L)
      .collect().head.getLong(1) == 1704067200000L)
    // the r8 failure mode: microseconds misdeclared as nanoseconds
    // collapse ~1000x below the window — now a loud error
    val collapsed = Sources.fromColumns(
      Seq(("k", 1704067200000000L, 1.0)).toDF("k", "t", "v"), "k", "t", "v", Sources.Nanos)
    val guarded = Sources.requireEpochWindow(collapsed, 1700000000000L, 1710000000000L)
    val e = intercept[Exception](guarded.collect())
    assert(e.getMessage.contains("epoch window") ||
      Option(e.getCause).exists(_.getMessage.contains("epoch window")))
  }

  test("unknown unit string is rejected") {
    intercept[IllegalArgumentException](Sources.parseUnit("fortnights"))
  }
}
