package graft.ts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's 15 aggregation functions (reference: src/compaction.c,
 * vtable src/compaction.h:21-48) re-expressed as native Spark aggregate
 * Columns — all codegen-friendly built-ins, no UDFs/UDAFs, so they stay
 * inside whole-stage codegen and get map-side partial aggregation for
 * free (the Catalyst partial/final split is the distributed equivalent of
 * the reference's shard-side aggregation, reference:
 * src/libmr_commands.c:672-701).
 *
 * NaN semantics: the reference stores NaN as a legal value and every
 * aggregator except countnan/countall skips NaN inputs
 * (`isValueValid`, reference: src/compaction.c:559-569). We reproduce
 * that by aggregating over `when(!isnan(v), v)` — aggregates ignore
 * NULL, so NaN rows drop out exactly like the reference's validity
 * filter.
 *
 * first/last are made deterministic under duplicate timestamps by
 * min/max over a (ts, value) struct (lexicographic), rather than
 * min_by/max_by whose tie-break is unspecified.
 *
 * TWA is the one aggregator with no Spark built-in; see [[Twa]].
 */
object Aggs {

  val names: Seq[String] = Seq(
    "min", "max", "sum", "avg", "count", "countnan", "countall",
    "first", "last", "range", "std.p", "std.s", "var.p", "var.s")
  // + "twa", implemented in Twa.scala as a window pipeline.

  private def vv(v: Column): Column = when(!isnan(v), v)

  /** Column name for an aggregator's output (dots are hostile to column
    * refs, so std.p -> std_p). */
  def colName(agg: String): String = agg.replace('.', '_') + "_value"

  /** Spark aggregate expression for one reference aggregator. */
  def expr(agg: String, v: Column, t: Column): Column = {
    val e = agg match {
      case "min"      => min(vv(v))
      case "max"      => max(vv(v))
      case "sum"      => sum(vv(v))
      case "avg"      => avg(vv(v))
      case "count"    => count(vv(v))
      case "countnan" => count(when(isnan(v), lit(1)))
      case "countall" => count(v)
      case "first"    => min(when(!isnan(v), struct(t.as("t"), v.as("v")))).getField("v")
      case "last"     => max(when(!isnan(v), struct(t.as("t"), v.as("v")))).getField("v")
      case "range"    => max(vv(v)) - min(vv(v))
      case "std.p"    => stddev_pop(vv(v))
      case "std.s"    => when(count(vv(v)) === 1, lit(0.0)).otherwise(stddev_samp(vv(v)))
      case "var.p"    => var_pop(vv(v))
      case "var.s"    => when(count(vv(v)) === 1, lit(0.0)).otherwise(var_samp(vv(v)))
      case other => throw new IllegalArgumentException(s"unknown aggregator $other")
    }
    e.as(colName(agg))
  }

  /** DuckDB-oracle SQL for the same aggregator (same NaN semantics via
    * FILTER, same deterministic first/last via struct ordering). */
  def sql(agg: String, v: String = "value", t: String = "ts"): String = {
    val f = s"FILTER (WHERE NOT isnan($v))"
    val s = agg match {
      case "min"      => s"min($v) $f"
      case "max"      => s"max($v) $f"
      case "sum"      => s"sum($v) $f"
      case "avg"      => s"avg($v) $f"
      case "count"    => s"count($v) $f"
      case "countnan" => s"count(*) FILTER (WHERE isnan($v))"
      case "countall" => s"count($v)"
      case "first"    => s"(min(struct_pack(t := $t, v := $v)) $f).v"
      case "last"     => s"(max(struct_pack(t := $t, v := $v)) $f).v"
      case "range"    => s"(max($v) $f) - (min($v) $f)"
      case "std.p"    => s"stddev_pop($v) $f"
      case "std.s"    => s"CASE WHEN (count($v) $f) = 1 THEN 0.0 ELSE stddev_samp($v) $f END"
      case "var.p"    => s"var_pop($v) $f"
      case "var.s"    => s"CASE WHEN (count($v) $f) = 1 THEN 0.0 ELSE var_samp($v) $f END"
      case other => throw new IllegalArgumentException(s"unknown aggregator $other")
    }
    s"$s AS ${colName(agg)}"
  }

  /** EMPTY-bucket fill value (reference `finalizeEmpty` per-class tables,
    * reference: src/compaction.c:73-84): count-family -> 0, sum -> 0,
    * everything else -> NaN; `last` uses LOCF and twa interpolation,
    * handled separately in the gap-fill pipeline. */
  def emptyFill(agg: String): Option[Double] = agg match {
    case "sum" | "count" | "countnan" | "countall" => Some(0.0)
    case "last" | "twa"                            => None // LOCF / interp
    case _                                         => Some(Double.NaN)
  }
}
