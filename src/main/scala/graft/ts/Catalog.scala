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

  /**
   * Scripted TS.CREATE → TS.ALTER → COMPACTION_POLICY → TS.CREATERULE →
   * TS.DELETERULE lifecycle over the fixture's series universe, emitted
   * as a DataFrame so the catalog semantics (validation passed, defaults
   * applied, retention/dup-policy/IGNORE mutation, full-label replacement
   * + reindex, auto-rule dest naming, rule-edge bookkeeping) are
   * oracle-checkable — the DuckDB twin ([[lifecycleSql]]) recomputes the
   * identical end state relationally from `events`.
   *
   * Script (deterministic in (event_type, user_id)):
   *  - CREATE every series (first `limit` by key order): retention
   *    `(uid%5)·1h`, dup policy rotating BLOCK/FIRST/LAST/MIN/MAX/SUM,
   *    chunk `4096+8·(uid%4)`, labels {type, user};
   *  - ALTER uid%3==0: retention→1d, IGNORE (5000, 0.5), labels
   *    REPLACED with {type, user, tier=hot} (the reindex case —
   *    reference module.c:1252-1307: RemoveIndexedMetric + re-index);
   *  - COMPACTION_POLICY "max:1M:1h" expanded for uid%4==0 (dest
   *    `<src>_MAX_60000`, labels {aggregation, time_bucket} —
   *    tsdb.c:1109-1191 naming);
   *  - explicit CREATERULE sum/10s to a fresh `<src>_sum10s` dest for
   *    uid%5==0;
   *  - DELETERULE on the key-order-first explicit rule (dest survives,
   *    src_key cleared — module.c:1312-1366).
   *
   * Scale: the catalog is control-plane state — O(#series) rows, driver
   * -resident and broadcastable by design (the reference holds it in
   * Redis keyspace memory); the only cluster work is the bounded
   * distinct-series scan.
   */
  def lifecycle(spark: SparkSession, sfDir: String, limit: Int = 64): DataFrame = {
    import spark.implicits._
    val base: Seq[(String, Long)] = TSModel.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
      .orderBy(col("event_type"), col("user_id")).limit(limit)
      .as[(String, Long)].collect().toSeq
    val policies = Vector("BLOCK", "FIRST", "LAST", "MIN", "MAX", "SUM")
    var cat = Seq.empty[SeriesMeta]
    var rules = Seq.empty[RuleMeta]
    base.foreach { case (et, uid) =>
      cat = create(cat, SeriesMeta(s"${et}_$uid",
        retentionMs = (uid % 5) * 3600000L,
        duplicatePolicy = policies((uid % 6).toInt),
        chunkSizeBytes = 4096L + 8L * (uid % 4),
        labels = Map("type" -> et, "user" -> uid.toString)))
    }
    base.filter(_._2 % 3 == 0).foreach { case (et, uid) =>
      cat = alter(cat, s"${et}_$uid", m => m.copy(
        retentionMs = 86400000L,
        ignoreMaxTimeDiff = 5000L, ignoreMaxValDiff = 0.5,
        labels = Map("type" -> et, "user" -> uid.toString, "tier" -> "hot")))
    }
    base.filter(_._2 % 4 == 0).foreach { case (et, uid) =>
      autoRules("max:1M:1h", s"${et}_$uid").foreach { case (meta, rule) =>
        cat = create(cat, meta)
        val (c2, r2) = createRule(cat, rules, rule)
        cat = c2; rules = r2
      }
    }
    base.filter(_._2 % 5 == 0).foreach { case (et, uid) =>
      val src = s"${et}_$uid"
      cat = create(cat, SeriesMeta(s"${src}_sum10s"))
      val (c2, r2) = createRule(cat, rules, RuleMeta(src, s"${src}_sum10s", "sum", 10000L))
      cat = c2; rules = r2
    }
    rules.filter(_.destKey.endsWith("_sum10s")).map(_.srcKey).sorted.headOption
      .foreach { src =>
        val (c2, r2) = deleteRule(cat, rules, src, s"${src}_sum10s")
        cat = c2; rules = r2
      }
    cat.toDF()
      .select(
        col("series"),
        col("retentionMs").as("retention_ms"),
        col("duplicatePolicy").as("duplicate_policy"),
        col("ignoreMaxTimeDiff").as("ignore_max_time_diff"),
        col("ignoreMaxValDiff").as("ignore_max_val_diff"),
        col("chunkSizeBytes").as("chunk_size"),
        col("srcKey").as("src_key"),
        col("labels")("type").as("label_type"),
        col("labels")("user").as("label_user"),
        col("labels")("tier").as("label_tier"),
        col("labels")("aggregation").as("label_aggregation"))
      .join(rules.toDF().select(col("destKey").as("series"),
          col("agg").as("rule_agg"), col("bucketMs").as("rule_bucket_ms")),
        Seq("series"), "left")
      .orderBy("series")
  }

  /** DuckDB twin of [[lifecycle]]: the end state of the script as one
    * relational recompute over `events`. */
  def lifecycleSql(limit: Int = 64): String =
    s"""WITH base AS (
       |  SELECT DISTINCT event_type AS et, user_id AS uid FROM events
       |  ORDER BY et, uid LIMIT $limit
       |), src_rows AS (
       |  SELECT et || '_' || CAST(uid AS VARCHAR) AS series,
       |    CAST(CASE WHEN uid % 3 = 0 THEN 86400000
       |              ELSE (uid % 5) * 3600000 END AS BIGINT) AS retention_ms,
       |    CASE CAST(uid % 6 AS INTEGER)
       |      WHEN 0 THEN 'BLOCK' WHEN 1 THEN 'FIRST' WHEN 2 THEN 'LAST'
       |      WHEN 3 THEN 'MIN' WHEN 4 THEN 'MAX' ELSE 'SUM'
       |    END AS duplicate_policy,
       |    CAST(CASE WHEN uid % 3 = 0 THEN 5000 ELSE 0 END AS BIGINT)
       |      AS ignore_max_time_diff,
       |    CAST(CASE WHEN uid % 3 = 0 THEN 0.5 ELSE 0.0 END AS DOUBLE)
       |      AS ignore_max_val_diff,
       |    CAST(4096 + 8 * (uid % 4) AS BIGINT) AS chunk_size,
       |    CAST(NULL AS VARCHAR) AS src_key,
       |    et AS label_type, CAST(uid AS VARCHAR) AS label_user,
       |    CASE WHEN uid % 3 = 0 THEN 'hot' END AS label_tier,
       |    CAST(NULL AS VARCHAR) AS label_aggregation,
       |    uid
       |  FROM base
       |), deleted AS (
       |  SELECT min(et || '_' || CAST(uid AS VARCHAR)) AS src
       |  FROM base WHERE uid % 5 = 0
       |), auto_rows AS (
       |  SELECT series || '_MAX_60000' AS series,
       |    CAST(3600000 AS BIGINT) AS retention_ms, 'BLOCK' AS duplicate_policy,
       |    CAST(0 AS BIGINT) AS ignore_max_time_diff,
       |    CAST(0.0 AS DOUBLE) AS ignore_max_val_diff,
       |    CAST(4096 AS BIGINT) AS chunk_size, series AS src_key,
       |    CAST(NULL AS VARCHAR) AS label_type, CAST(NULL AS VARCHAR) AS label_user,
       |    CAST(NULL AS VARCHAR) AS label_tier, 'MAX' AS label_aggregation,
       |    'max' AS rule_agg, CAST(60000 AS BIGINT) AS rule_bucket_ms
       |  FROM src_rows WHERE uid % 4 = 0
       |), manual_rows AS (
       |  SELECT s.series || '_sum10s' AS series,
       |    CAST(0 AS BIGINT) AS retention_ms, 'BLOCK' AS duplicate_policy,
       |    CAST(0 AS BIGINT) AS ignore_max_time_diff,
       |    CAST(0.0 AS DOUBLE) AS ignore_max_val_diff,
       |    CAST(4096 AS BIGINT) AS chunk_size,
       |    CASE WHEN s.series = d.src THEN NULL ELSE s.series END AS src_key,
       |    CAST(NULL AS VARCHAR) AS label_type, CAST(NULL AS VARCHAR) AS label_user,
       |    CAST(NULL AS VARCHAR) AS label_tier, CAST(NULL AS VARCHAR) AS label_aggregation,
       |    CASE WHEN s.series = d.src THEN NULL ELSE 'sum' END AS rule_agg,
       |    CAST(CASE WHEN s.series = d.src THEN NULL ELSE 10000 END AS BIGINT)
       |      AS rule_bucket_ms
       |  FROM src_rows s, deleted d WHERE s.uid % 5 = 0
       |)
       |SELECT series, retention_ms, duplicate_policy, ignore_max_time_diff,
       |       ignore_max_val_diff, chunk_size, src_key, label_type, label_user,
       |       label_tier, label_aggregation,
       |       CAST(NULL AS VARCHAR) AS rule_agg,
       |       CAST(NULL AS BIGINT) AS rule_bucket_ms
       |FROM src_rows
       |UNION ALL SELECT * FROM auto_rows
       |UNION ALL SELECT * FROM manual_rows
       |ORDER BY series""".stripMargin
}
