package graft.ts

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Series catalog: the control-plane state the reference keeps per Redis
 * key (reference: Series struct src/tsdb.h:61-81) — retention,
 * duplicate policy, IGNORE thresholds, labels, compaction rules.
 *
 * TS.CREATE/TS.ALTER/TS.CREATERULE/TS.DELETERULE become pure
 * transformations of a small `Dataset[SeriesMeta]` / `Dataset[RuleMeta]`
 * (O(#series) rows — driver-side validation, broadcastable state). The
 * data plane (samples) never rewrites on catalog change; policies are
 * applied at ingest/query time by WritePath/RangeQuery using these
 * settings.
 */
object Catalog {

  /** Per-series metadata (reference: src/tsdb.h:61-81; defaults
    * src/consts.h + config). */
  final case class SeriesMeta(
      series: String,
      retentionMs: Long = 0L,                  // 0 = keep forever
      duplicatePolicy: String = "BLOCK",
      ignoreMaxTimeDiff: Long = 0L,
      ignoreMaxValDiff: Double = 0.0,
      labels: Map[String, String] = Map.empty,
      srcKey: Option[String] = None,           // non-empty iff compaction dest
      chunkSizeBytes: Long = 4096L,            // reference default consts.h:48
      encoding: String = "COMPRESSED")         // reference default tsdb.c:188-194

  /** A compaction rule edge (reference: CompactionRule src/tsdb.h:47-59). */
  final case class RuleMeta(
      srcKey: String, destKey: String,
      agg: String, bucketMs: Long, alignMs: Long = 0L)

  /** TS.CREATE (reference: module.c:1216-1250). CHUNK_SIZE bounds and
    * the multiple-of-8 rule follow query_language.c:85-92; ENCODING is
    * the storage hint the Spark engine maps onto parquet encodings (the
    * option is validated for parity, the data plane always columnar). */
  def create(catalog: Seq[SeriesMeta], meta: SeriesMeta): Seq[SeriesMeta] = {
    require(!catalog.exists(_.series == meta.series), s"series ${meta.series} exists")
    require(meta.retentionMs >= 0 && meta.ignoreMaxTimeDiff >= 0 && meta.ignoreMaxValDiff >= 0,
      "negative retention/ignore thresholds")
    require(meta.chunkSizeBytes >= 48 && meta.chunkSizeBytes <= 1048576
        && meta.chunkSizeBytes % 8 == 0,
      s"CHUNK_SIZE ${meta.chunkSizeBytes} not in [48, 1048576] or not a multiple of 8")
    require(Seq("COMPRESSED", "UNCOMPRESSED").contains(meta.encoding.toUpperCase),
      s"unknown ENCODING ${meta.encoding}")
    // the reference rejects an unknown DUPLICATE_POLICY at TS.CREATE
    // parse time (ParseDuplicatePolicy, module.c), not first ingest
    require(Seq("BLOCK", "FIRST", "LAST", "MIN", "MAX", "SUM")
        .contains(meta.duplicatePolicy.toUpperCase),
      s"TSDB: Unknown DUPLICATE_POLICY ${meta.duplicatePolicy}")
    catalog :+ meta
  }

  /** TS.ALTER (reference: module.c:1252-1307): mutates settings; label
    * replacement triggers reindex, which here is just "the labels DF is
    * derived from the catalog". */
  def alter(catalog: Seq[SeriesMeta], series: String, f: SeriesMeta => SeriesMeta): Seq[SeriesMeta] = {
    require(catalog.exists(_.series == series), s"series $series missing")
    catalog.map(m => if (m.series == series) f(m) else m)
  }

  /** TS.CREATERULE constraints (reference: module.c:1371-1464): src and
    * dest exist, dest is not already a dest, no self-rule, no chains
    * (a dest cannot be a src; a src with a rule cannot become a dest). */
  def createRule(
      catalog: Seq[SeriesMeta], rules: Seq[RuleMeta], rule: RuleMeta): (Seq[SeriesMeta], Seq[RuleMeta]) = {
    require(rule.srcKey != rule.destKey, "rule src == dest")
    require(catalog.exists(_.series == rule.srcKey), s"src ${rule.srcKey} missing")
    require(catalog.exists(_.series == rule.destKey), s"dest ${rule.destKey} missing")
    require(!rules.exists(_.destKey == rule.destKey), s"dest ${rule.destKey} already has a rule")
    require(!rules.exists(_.srcKey == rule.destKey), "dest already a compaction src (chain)")
    require(!rules.exists(_.destKey == rule.srcKey), "src already a compaction dest (chain)")
    require(Aggs.names.contains(rule.agg) || rule.agg == "twa", s"unknown agg ${rule.agg}")
    val cat = catalog.map(m =>
      if (m.series == rule.destKey) m.copy(srcKey = Some(rule.srcKey)) else m)
    (cat, rules :+ rule)
  }

  /** TS.DELETERULE (reference: module.c:1312-1366). */
  def deleteRule(
      catalog: Seq[SeriesMeta], rules: Seq[RuleMeta], srcKey: String, destKey: String): (Seq[SeriesMeta], Seq[RuleMeta]) = {
    require(rules.exists(r => r.srcKey == srcKey && r.destKey == destKey), "rule missing")
    (catalog.map(m => if (m.series == destKey) m.copy(srcKey = None) else m),
      rules.filterNot(r => r.srcKey == srcKey && r.destKey == destKey))
  }

  /** Global COMPACTION_POLICY auto-rules (reference: parse_policies.c:22-90
    * format `agg:dur:retention[:align]`; dest naming
    * src/tsdb.c:1109-1191): expand for a newly-created series. */
  def autoRules(policy: String, srcKey: String): Seq[(SeriesMeta, RuleMeta)] =
    policy.split(";").filter(_.nonEmpty).toSeq.map { spec =>
      val parts = spec.split(":")
      val agg = parts(0).toLowerCase
      // dest key + `aggregation` label carry the UPPERCASE agg name
      // (reference: tsdb.c:1119-1133, 1162-1167 — flow test expects
      // `tester_MAX_1` and labels [aggregation, MAX])
      val aggU = agg.toUpperCase
      val dur = parseDuration(parts(1))
      val retention = parseDuration(parts(2))
      val align = if (parts.length > 3) parseDuration(parts(3)) else 0L
      val dest = if (parts.length > 3) s"${srcKey}_${aggU}_${dur}_$align"
                 else s"${srcKey}_${aggU}_$dur"
      val meta = SeriesMeta(dest, retentionMs = retention, srcKey = Some(srcKey),
        labels = Map("aggregation" -> aggU, "time_bucket" -> dur.toString))
      (meta, RuleMeta(srcKey, dest, agg, dur, align))
    }

  /** Duration units (reference: parse_policies.c:22-28 lookup table —
    * counterintuitively, lowercase 'm' is MILLISECONDS (=1) and
    * uppercase 'M' is minutes (=60000); the flow test pins it:
    * COMPACTION_POLICY "max:1m:1d" creates `tester_MAX_1`). */
  def parseDuration(s: String): Long = {
    val (num, unit) = s.span(c => c.isDigit)
    val n = if (num.isEmpty) 1L else num.toLong
    unit match {
      case ""  => n          // bare ms
      case "m" => n          // ms (reference: ['m'] = 1)
      case "s" => n * 1000L
      case "M" => n * 60000L // minutes (reference: ['M'] = 1000 * 60)
      case "h" => n * 3600000L
      case "d" => n * 86400000L
      case u   => throw new IllegalArgumentException(s"bad duration unit $u")
    }
  }

  /** The labels DataFrame is a projection of the catalog. */
  def labelsDf(spark: SparkSession, catalog: Seq[SeriesMeta]): DataFrame = {
    import spark.implicits._
    catalog.toDF().select(col("series"), col("labels"))
  }
}
