package graft

import graft.ts.GltData
import org.scalatest.funsuite.AnyFunSuite

/**
 * Decoder sanity for the bundled GlobalLandTemperaturesByMajorCity RDB
 * fixture (reference tests/flow/rdbs/1.0.1.rdb): the pinned facts are
 * properties of the reference's own loader
 * (tests/flow/create_test_rdb_file.py — 100 cities × 2 metrics,
 * monthly from 1970, labels metric/city/country/latitude/longitude
 * with `metric` only on the temperature series).
 */
class GltDataSpec extends AnyFunSuite {
  import SparkTest._

  test("RDB decode: 200 labeled series, 104814 samples, stable first values") {
    val all = GltData.parse
    assert(all.size == 200)
    assert(all.map(_.samples.length).sum == 104814)
    val byKey = all.map(s => s.key -> s).toMap
    val bras = byKey("AverageTemperature:Brasília")
    assert(bras.labels.toMap == Map(
      "metric" -> "temperature", "city" -> "Brasília", "country" -> "Brazil",
      "latitude" -> "15.27S", "longitude" -> "47.50W"))
    // first sample: 1970-01-01, 22.264...; last: 2013-08-01
    assert(bras.samples.head == (0L, 22.264000000000006))
    assert(bras.samples.last._1 == 1375315200000L)
    // metric label present on exactly the 100 temperature series
    val withMetric = all.filter(_.labels.exists(_._1 == "metric"))
    assert(withMetric.size == 100 &&
      withMetric.forall(_.key.startsWith("AverageTemperature:")))
    // timestamps strictly increasing within every series (flat encver-0
    // sample stream decoded in order)
    assert(all.forall(s => s.samples.sliding(2).forall {
      case Array(a, b) => a._1 < b._1; case _ => true
    }))
  }

  test("CSV twins round-trip through the Spark readers") {
    val samples = GltData.samples(spark)
    assert(samples.count() == 104814)
    val labels = GltData.labels(spark)
    assert(labels.count() == 200)
    import org.apache.spark.sql.functions._
    val row = samples.filter(col("series") === "AverageTemperature:Brasília" &&
      col("ts") === 0L).head()
    assert(row.getDouble(2) == 22.264000000000006) // exact: shortest
    // round-trip Double.toString parses back to the identical bits
    val m = labels.filter(col("series") === "AverageTemperatureUncertainty:Abidjan")
      .select(element_at(col("labels"), "metric"),
        element_at(col("labels"), "country")).head()
    assert(m.isNullAt(0) && m.getString(1) == "Côte D'Ivoire")
  }
}
