package graft.ts

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Source adapters: normalize external telemetry files into the
 * engine's canonical long format `(series STRING, ts BIGINT epoch-ms,
 * value DOUBLE)` that every operator consumes.
 *
 * The reference ingests through RESP commands, so any client library
 * does the normalization; a lake-resident engine meets its data as
 * files written by OTHER systems. Two rules carried over from the r8
 * incident (a fixture encoding drift silently corrupted timestamps
 * 1000x):
 *
 *  - the timestamp UNIT is an explicit caller-declared contract
 *    ([[TsUnit]]), never guessed from magnitudes;
 *  - the normalized frame can be wrapped with [[requireEpochWindow]],
 *    which makes out-of-window timestamps a loud failure at first
 *    action instead of quietly wrong buckets downstream.
 *
 * All parsing is built-in column expressions (codegen'd, pushdown-
 * transparent) — no UDFs, no driver-side row handling; a 100 TB
 * directory of CSVs normalizes as one distributed projection.
 */
object Sources {

  /** Declared timestamp encodings. `Iso` parses ISO-8601 date-times
    * in UTC; the numeric units are exact integer arithmetic. */
  sealed trait TsUnit
  case object Millis extends TsUnit
  case object Seconds extends TsUnit
  case object Micros extends TsUnit
  case object Nanos extends TsUnit
  case object Iso extends TsUnit

  def parseUnit(s: String): TsUnit = s.toLowerCase match {
    case "ms" | "millis"  => Millis
    case "s" | "seconds"  => Seconds
    case "us" | "micros"  => Micros
    case "ns" | "nanos"   => Nanos
    case "iso"            => Iso
    case other => throw new IllegalArgumentException(
      s"unknown timestamp unit '$other' (ms|s|us|ns|iso)")
  }

  /**
   * Normalize any frame holding (series-like, ts-like, value-like)
   * columns. One codegen'd projection; integer-exact DIV for the
   * sub-ms numeric units. ISO strings WITHOUT a zone offset are
   * interpreted in the session timezone (the engine pins UTC —
   * Verify/Bench/specs all set spark.sql.session.timeZone=UTC);
   * offset-carrying strings are exact regardless.
   */
  def fromColumns(df: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String, unit: TsUnit): DataFrame = {
    val base = df.select(
      col(seriesCol).cast(StringType).as("series"),
      col(tsCol).as("__rawts"),
      col(valueCol).cast(DoubleType).as("value"))
    val ts = unit match {
      case Millis  => col("__rawts").cast(LongType)
      case Seconds => col("__rawts").cast(LongType) * 1000L
      case Micros  => expr("CAST(__rawts AS BIGINT) DIV 1000")
      case Nanos   => expr("CAST(__rawts AS BIGINT) DIV 1000000")
      case Iso     => unix_millis(col("__rawts").cast(TimestampType))
    }
    base.select(col("series"), ts.as("ts"), col("value"))
  }

  /** CSV files (with header) → samples. Schema is DECLARED, not
    * inferred — inference reads the data twice and can flip types
    * between files; a declared schema fails loudly on drift. */
  def fromCsv(spark: SparkSession, path: String, seriesCol: String,
      tsCol: String, valueCol: String, unit: TsUnit,
      delimiter: String = ","): DataFrame = {
    val tsType = if (unit == Iso) StringType else LongType
    val schema = StructType(Seq(
      StructField(seriesCol, StringType),
      StructField(tsCol, tsType),
      StructField(valueCol, DoubleType)))
    fromColumns(
      spark.read.option("header", "true").option("delimiter", delimiter)
        .option("mode", "FAILFAST") // a malformed row is an error, not a null
        .schema(schema).csv(path),
      seriesCol, tsCol, valueCol, unit)
  }

  /** JSON-lines files → samples, same declared-schema contract. */
  def fromJsonLines(spark: SparkSession, path: String, seriesCol: String,
      tsCol: String, valueCol: String, unit: TsUnit): DataFrame = {
    val tsType = if (unit == Iso) StringType else LongType
    val schema = StructType(Seq(
      StructField(seriesCol, StringType),
      StructField(tsCol, tsType),
      StructField(valueCol, DoubleType)))
    fromColumns(
      spark.read.option("mode", "FAILFAST").schema(schema).json(path),
      seriesCol, tsCol, valueCol, unit)
  }

  /**
   * Wrap a normalized frame with a per-row epoch-window assertion:
   * any ts outside [loMs, hiMs] raises at first action (codegen'd
   * raise_error, zero cost on the happy path). This is the per-source
   * twin of FixtureSchemaSpec's fixture guard — the defense the r8
   * unit misparse lacked.
   */
  def requireEpochWindow(samples: DataFrame, loMs: Long, hiMs: Long): DataFrame =
    samples.withColumn("ts",
      when(col("ts").between(loMs, hiMs), col("ts"))
        .otherwise(raise_error(concat(
          lit(s"sample ts outside declared epoch window [$loMs, $hiMs]: "),
          col("ts").cast(StringType)))))
}
