package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * TS.RANGE / TS.REVRANGE: the reference's core single-series dataflow
 * (reference: src/tsdb.c:1363-1426 — scan -> FilterByTS -> FilterByValue
 * -> Aggregation -> COUNT), declared as one Spark logical plan so
 * Catalyst pushes the series/ts/value predicates into the parquet scan
 * (partition pruning + row-group skipping ≙ the reference's rax chunk
 * seek, reference: src/series_iterator.c:21-138).
 *
 * The same pipeline runs unchanged over *all* series at once (MRANGE):
 * every transform keys by `series`, so one shuffle computes every
 * series' buckets — the distributed equivalent of the reference's
 * per-shard LibMR map + coordinator merge (reference:
 * src/libmr_commands.c:672-701).
 */
object RangeQuery {

  /** Parsed query IR ≙ the reference's RangeArgs
    * (reference: src/query_language.h:70-82). Timestamps epoch-ms. */
  case class RangeArgs(
      from: Option[Long] = None,            // "-" when None
      to: Option[Long] = None,              // "+" when None
      aggs: Seq[String] = Nil,              // empty = raw samples
      bucketMs: Long = 0L,
      alignMs: Long = 0L,                   // ALIGN (already resolved to a ts)
      bucketTs: String = "-",               // BUCKETTIMESTAMP - | ~ | +
      empty: Boolean = false,               // EMPTY gap fill
      filterByTs: Seq[Long] = Nil,          // FILTER_BY_TS (<=128 values)
      filterByValue: Option[(Double, Double)] = None, // FILTER_BY_VALUE min,max
      count: Option[Int] = None,            // COUNT n (per series, reference: reply.c:180-212)
      latest: Boolean = false,              // LATEST: surface the in-flight compaction bucket
      reverse: Boolean = false)

  /** ALIGN sentinel resolution (reference: src/query_language.c:531-560):
    * default 0, `start`/`-` = query start, `end`/`+` = query end, or a
    * literal timestamp. */
  def resolveAlign(spec: String, from: Option[Long], to: Option[Long]): Long = spec match {
    case "" | "0"      => 0L
    case "start" | "-" => from.getOrElse(
      throw new IllegalArgumentException("ALIGN start needs an explicit range start"))
    case "end" | "+"   => to.getOrElse(
      throw new IllegalArgumentException("ALIGN end needs an explicit range end"))
    case ts            =>
      // a non-sentinel ALIGN must be a valid non-negative timestamp
      // (reference: query_language.c:551-556 via parseTimestamp, which
      // also rejects negatives — error string parity)
      val parsed = ts.toLongOption
      require(parsed.exists(_ >= 0L), "TSDB: unknown ALIGN parameter")
      parsed.get
  }

  /** Malformed-argument rejection, matching the reference's parse-time
    * errors (reference: src/query_language.c; flow test
    * tests/flow/test_negative.py). */
  private def validate(args: RangeArgs): Unit = {
    for (f <- args.from; t <- args.to)
      require(f <= t, s"wrong fromTimestamp/toTimestamp: $f > $t")
    if (args.aggs.nonEmpty)
      require(args.bucketMs > 0,
        s"AGGREGATION needs a positive bucketDuration, got ${args.bucketMs}")
    args.count.foreach(c => require(c > 0, s"COUNT must be positive, got $c"))
    require(Seq("-", "~", "+").contains(args.bucketTs),
      s"bad BUCKETTIMESTAMP '${args.bucketTs}'")
    require(args.empty == false || args.aggs.nonEmpty,
      "EMPTY requires AGGREGATION")
    // reference: query_language.c:720 — ALIGN is parse-rejected without
    // an AGGREGATION clause (alignMs != 0 implies an explicit ALIGN;
    // `ALIGN 0` is indistinguishable from the default and is a no-op)
    require(args.alignMs == 0L || args.aggs.nonEmpty,
      "TSDB: ALIGN parameter can only be used with AGGREGATION")
    args.aggs.foreach(a => require(Aggs.names.contains(a) || a == "twa",
      s"unknown aggregator $a"))
  }

  /**
   * Parse the reference's TS.RANGE option grammar — the token stream
   * that follows `key fromTimestamp toTimestamp` in the text protocol
   * (reference: src/query_language.c parseRangeArguments) — into
   * [[RangeArgs]]. Keywords are case-insensitive (the reference parses
   * with strcasecmp); clauses accepted in any order:
   *
   *   LATEST
   *   FILTER_BY_TS ts...              (numeric run, <=128 values)
   *   FILTER_BY_VALUE min max
   *   COUNT n
   *   ALIGN <start|-|end|+|ts>
   *   AGGREGATION aggregator bucketDuration
   *   BUCKETTIMESTAMP <-|~|+|start|mid|end>
   *   EMPTY
   *   REV                             (TS.REVRANGE spelled as an option)
   *
   * Engine extension: a REPEATED AGGREGATION clause appends to the
   * multi-aggregator set (same bucketDuration required) — the text
   * form of the engine's one-pass multi-agg. Unknown tokens and
   * missing clause arguments throw, mirroring the reference's
   * parse-time errors (tests/flow/test_negative.py).
   */
  def parseOptions(options: String, from: Option[Long], to: Option[Long]): RangeArgs = {
    val toks = options.trim.split("\\s+").filter(_.nonEmpty)
    var args = RangeArgs(from = from, to = to)
    var i = 0
    def arg(n: Int, kw: String): String = {
      require(i + n < toks.length, s"TSDB: missing argument(s) for $kw")
      toks(i + n)
    }
    while (i < toks.length) {
      toks(i).toUpperCase match {
        case "LATEST" => args = args.copy(latest = true); i += 1
        case "EMPTY"  => args = args.copy(empty = true); i += 1
        case "REV"    => args = args.copy(reverse = true); i += 1
        case "COUNT"  =>
          args = args.copy(count = Some(arg(1, "COUNT").toInt)); i += 2
        case "ALIGN"  =>
          args = args.copy(alignMs = resolveAlign(arg(1, "ALIGN").toLowerCase, from, to)); i += 2
        case "AGGREGATION" =>
          val a = arg(1, "AGGREGATION").toLowerCase
          val dur = arg(2, "AGGREGATION").toLong
          require(args.aggs.isEmpty || args.bucketMs == dur,
            s"TSDB: a repeated AGGREGATION clause must keep the bucketDuration (${args.bucketMs} != $dur)")
          args = args.copy(aggs = args.aggs :+ a, bucketMs = dur); i += 3
        case "BUCKETTIMESTAMP" =>
          val bt = arg(1, "BUCKETTIMESTAMP").toLowerCase match {
            case "-" | "start" => "-"
            case "~" | "mid"   => "~"
            case "+" | "end"   => "+"
            case other => throw new IllegalArgumentException(s"bad BUCKETTIMESTAMP '$other'")
          }
          args = args.copy(bucketTs = bt); i += 2
        case "FILTER_BY_TS" =>
          var j = i + 1
          val vals = scala.collection.mutable.ArrayBuffer[Long]()
          while (j < toks.length && toks(j).matches("-?\\d+")) { vals += toks(j).toLong; j += 1 }
          require(vals.nonEmpty, "TSDB: missing argument(s) for FILTER_BY_TS")
          args = args.copy(filterByTs = args.filterByTs ++ vals); i = j
        case "FILTER_BY_VALUE" =>
          args = args.copy(filterByValue =
            Some((arg(1, "FILTER_BY_VALUE").toDouble, arg(2, "FILTER_BY_VALUE").toDouble)))
          i += 3
        case other =>
          throw new IllegalArgumentException(s"TSDB: unknown argument '$other'")
      }
    }
    args
  }

  /** FILTER_BY_TS / FILTER_BY_VALUE (no time range). */
  private def sampleFiltered(samples: DataFrame, args: RangeArgs): DataFrame = {
    var df = samples
    // reference: query_language.h:53 MAX_TS_VALUES_FILTER=128. The
    // reference's parser silently STOPS CONSUMING at the 129th value
    // (query_language.c:620-630 loop bound) and the leftover token then
    // breaks the command parse; rejecting loudly at the same boundary
    // is the honest equivalent — never silently truncate a filter.
    require(args.filterByTs.size <= 128,
      "FILTER_BY_TS accepts at most 128 timestamps")
    if (args.filterByTs.nonEmpty)
      // <=128 literals (reference: src/query_language.h:53) — stays an
      // In-predicate, pushed to the scan; never a join.
      df = df.filter(col("ts").isInCollection(args.filterByTs))
    args.filterByValue.foreach { case (lo, hi) =>
      df = df.filter(col("value") >= lo && col("value") <= hi)
    }
    df
  }

  /** Full pre-aggregation filter chain incl. the time range. */
  private def filtered(samples: DataFrame, args: RangeArgs): DataFrame = {
    var df = sampleFiltered(samples, args)
    args.from.foreach(f => df = df.filter(col("ts") >= f))
    args.to.foreach(t => df = df.filter(col("ts") <= t))
    df
  }

  /**
   * Execute a range query over a long-format samples DF
   * `(series, ts, value)`. Output: raw -> `(series, ts, value)`;
   * aggregated -> `(series, ts, <agg>_value...)` with one column per
   * aggregator (multi-agg in a single pass, like the reference's
   * values_per_sample>1 EnrichedChunks, reference:
   * src/enriched_chunk.h:17-42).
   *
   * INPUT CONTRACT (like [[Twa.bucketTwa]]): `samples` should be the
   * series' full history, NOT pre-pruned to [from, to] — the time range
   * is applied internally, and two features read OUTSIDE it: TWA's
   * boundary interpolation and EMPTY+last's pre-range LOCF seed (the
   * reference's direct series lookup before the range,
   * filter_iterator.c:473-506, covered by EmptyGoldenSpec). A caller
   * that feeds a range-pruned scan gets correct results except that
   * the LOCF seed for a leading empty bucket cannot see earlier
   * samples.
   *
   * REVRANGE note: the reference computes identical buckets in both
   * directions (bucket membership is direction-independent), so reverse
   * only affects row order; we sort descending post-agg
   * (reference: src/filter_iterator.c reverse branches).
   */
  def range(samples: DataFrame, args: RangeArgs): DataFrame = {
    validate(args)
    val df = filtered(samples, args)
    val base =
      if (args.aggs.isEmpty) {
        df.select(col("series"), col("ts"), col("value"))
      } else if (args.aggs == Seq("twa")) {
        // twa gets the time-UNfiltered samples: boundary interpolation
        // uses out-of-range neighbours (see Twa.bucketTwa scaladoc)
        val noTime = sampleFiltered(samples, args)
        if (args.empty) Twa.bucketTwaWithEmpty(noTime, args.bucketMs, args.alignMs, args.from, args.to)
        else Twa.bucketTwa(noTime, args.bucketMs, args.alignMs, args.from, args.to)
      } else {
        require(!args.aggs.contains("twa"), "twa cannot be combined in one multi-agg call here")
        val aggCols = args.aggs.map(a => Aggs.expr(a, col("value"), col("ts")))
        val hasValid = (count(when(!isnan(col("value")), lit(1))) > 0).as("__has_valid")
        var out = df
          .groupBy(col("series"), TSModel.bucketStart(col("ts"), args.bucketMs, args.alignMs))
          .agg(aggCols.head, (aggCols.tail :+ hasValid): _*)
        // Bucket emission == the reference's validSamplesInBucket
        // (finalizeBucket, filter_iterator.c:389-401): a bucket is kept
        // iff >= 1 sample is VALID under some requested aggregator's
        // validity class — nonNaN for every classic aggregator
        // INCLUDING plain count (aggCount.isValueValid =
        // nonNaNValueValid, compaction.c:866-884; a NaN-only bucket
        // with AGGREGATION count is dropped, not emitted as 0), NaN
        // for countnan, anything for countall.
        val keepAll = args.aggs.exists(a => a == "countnan" || a == "countall")
        if (!keepAll) out = out.filter(col("__has_valid"))
        else if (!args.empty) {
          // finalizeEmpty for aggregators that saw no valid sample in a
          // bucket kept alive by countnan/countall (compaction.c
          // finalize_empty_with_{ZERO,NAN}, finalize_empty_last_value):
          // sum -> 0, last -> running in-range carry (unseeded -> NaN),
          // other value classes -> NaN; count-family never yields null.
          // In EMPTY mode gapFill applies these fills (plus the
          // pre-range LOCF seed) itself, so kept-bucket nulls pass
          // through here untouched.
          val fills = args.aggs.collect {
            case "sum" => Aggs.colName("sum") -> lit(0.0)
            case a @ ("min" | "max" | "avg" | "first" | "range"
                      | "std.p" | "std.s" | "var.p" | "var.s") =>
              Aggs.colName(a) -> lit(Double.NaN)
          }
          for ((c, fill) <- fills)
            out = out.withColumn(c, coalesce(col(c), fill))
          if (args.aggs.contains("last")) {
            val w = Window.partitionBy(col("series")).orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)
            out = out.withColumn(Aggs.colName("last"),
              coalesce(col(Aggs.colName("last")),
                last(col(Aggs.colName("last")), ignoreNulls = true).over(w),
                lit(Double.NaN)))
          }
        }
        out.drop("__has_valid")
      }
    val spined =
      if (args.empty && args.aggs.nonEmpty && args.aggs != Seq("twa"))
        gapFill(base, sampleFiltered(samples, args), args)
      else base
    val reported =
      if (args.aggs.nonEmpty)
        spined.withColumn("ts", TSModel.reportTs(col("bucket"), args.bucketMs, args.bucketTs))
          .select((col("series") +: col("ts") +: args.aggs.map(a => col(Aggs.colName(a)))): _*)
      else spined
    // COUNT n applies PER SERIES (reference: reply.c:180-212 — each
    // ReplySeriesRange truncates its own sample list), not globally:
    // a row_number window keyed by series, sharing the final sort's
    // shuffle-by-series layout, never a driver-side limit.
    val counted = args.count match {
      case Some(n) =>
        val w = Window.partitionBy(col("series"))
          .orderBy(if (args.reverse) col("ts").desc else col("ts").asc)
        reported.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= n).drop("__rn")
      case None => reported
    }
    counted.orderBy(col("series"),
      if (args.reverse) col("ts").desc else col("ts").asc)
  }

  /**
   * Range read over a COMPACTION DEST series (reference applies LATEST
   * in the shared option path, query_language.c:646-651, at module.c:700
   * and :919): the dest's visible samples are its flushed buckets;
   * `args.latest` additionally surfaces each series' in-flight (newest,
   * not-yet-flushed) bucket (reference: tsdb.c:1468-1501). Without the
   * flag a dest read silently misses the freshest bucket — the exact
   * reference behavior.
   */
  def rangeOverDest(
      srcSamples: DataFrame, rule: Compaction.Rule, args: RangeArgs): DataFrame =
    range(Compaction.materialize(srcSamples, rule, includeLatest = args.latest), args)

  /**
   * EMPTY gap fill (reference: src/filter_iterator.c:389-966): emitted
   * buckets span the intersection of the query range with the SERIES'
   * lifetime [first sample, last sample] — so a query range that is
   * entirely a gap still emits (prefix/suffix/whole-range cases,
   * reference: tests/flow/test_ts_range.py
   * test_empty_gap_fill_prefix_suffix_whole_range), while buckets
   * before the first-ever / after the last-ever sample are dropped
   * (reference: src/filter_iterator.c:723-746). Fill values:
   * sum/count-family -> 0, others -> NaN; `last` carries forward (LOCF)
   * and is seeded by the newest sample before the query range — a
   * direct series lookup outside [from, to] (reference:
   * src/compaction.c:115-140, src/filter_iterator.c:473-506).
   *
   * Scale: series bounds are one partial-aggregated pass over the
   * (pruned) series scan; the spine is `sequence()` per series; the
   * LOCF seed fuses into the SAME grouped pass (r18: it used to be a
   * second samples scan plus a broadcast join — guide §6, one fewer
   * full read of the filtered samples for every EMPTY+last+from query).
   */
  private def gapFill(base: DataFrame, samplesNoTime: DataFrame, args: RangeArgs): DataFrame = {
    val needSeed = args.aggs.contains("last") && args.from.isDefined
    val spine = TSModel.bucketSpine(
      samplesNoTime, args.bucketMs, args.alignMs, args.from, args.to,
      seedBefore = if (needSeed) args.from else None)
    var out = spine.join(base, Seq("series", "bucket"), "left")
    for (a <- args.aggs) {
      val c = Aggs.colName(a)
      Aggs.emptyFill(a) match {
        case Some(fill) =>
          // cast the fill to the column's own type: count-family columns
          // are LONG and a bare 0.0 literal would silently widen them
          out = out.withColumn(c,
            coalesce(col(c), lit(fill).cast(out.schema(c).dataType)))
        case None if a == "last" =>
          val w = Window.partitionBy(col("series")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, 0)
          out = out.withColumn(c, last(col(c), ignoreNulls = true).over(w))
          if (needSeed)
            out = out.withColumn(c, coalesce(col(c), col("__seed")))
        case None => // twa interpolation handled in Twa pipeline
      }
    }
    if (needSeed) out.drop("__seed") else out
  }

  // ---------------------------------------------------------------------
  // DuckDB-oracle SQL builder: generates ANSI SQL over the same parquet
  // for the driver's differential check (pattern borrowed from the
  // reference's own oracle tests, reference:
  // tests/flow/test_ts_nrange_compare.py:8-22).
  // ---------------------------------------------------------------------

  def whereSql(args: RangeArgs, seriesPred: Option[String]): String = {
    val cl = Seq.newBuilder[String]
    seriesPred.foreach(cl += _)
    args.from.foreach(f => cl += s"ts >= $f")
    args.to.foreach(t => cl += s"ts <= $t")
    if (args.filterByTs.nonEmpty) cl += s"ts IN (${args.filterByTs.mkString(",")})"
    args.filterByValue.foreach { case (lo, hi) => cl += s"value >= $lo AND value <= $hi" }
    val cs = cl.result()
    if (cs.isEmpty) "" else cs.mkString("WHERE ", " AND ", "")
  }

  /**
   * COMPLETE oracle SQL equivalent of [[range]] — the whole option
   * cross-product (AGGREGATION × ALIGN × BUCKETTIMESTAMP × EMPTY with
   * per-class fills, LOCF + pre-range seed × FILTER_BY_TS/VALUE ×
   * COUNT × REVRANGE × raw), excluding only twa (whose oracle lives
   * with [[Twa]]). [[rangeSql]] remains the lean non-EMPTY form the
   * driver-facing queries use; this one exists so the randomized
   * stress spec (RandomizedOracleSpec, after the reference's
   * tests/flow/test_ts_range_empty_filter_stress.py) can check random
   * option combos against DuckDB — an INDEPENDENT referee — rather
   * than only against the in-memory Scala model (VERDICT r06 #3 next).
   *
   * `cte` must start with `WITH ` and define `samples(series, ts,
   * value)`. Semantics mirrored from [[range]]:
   *  - `sf` = sample filters only (FILTER_BY_TS/VALUE, series) — the
   *    EMPTY spine's lifetime bounds and the LOCF seed read this, NOT
   *    the time-filtered set (reference: filter_iterator.c:723-746 and
   *    the pre-range direct lookup :473-506);
   *  - bucket keep rule: >=1 valid sample unless countnan/countall
   *    holds the bucket open (finalizeBucket, filter_iterator.c:389);
   *  - non-EMPTY keepAll fills (finalize_empty_with_{ZERO,NAN}):
   *    sum->0, NaN-class->NaN, last->carry over kept buckets;
   *  - EMPTY fills per [[Aggs.emptyFill]] + last-LOCF seeded by the
   *    newest valid pre-range sample.
   */
  def rangeSqlFull(args: RangeArgs, seriesPred: Option[String],
      cte: String = TSModel.samplesCte): String = {
    validate(args)
    require(!args.aggs.contains("twa"), "twa has no generic SQL oracle")
    def clauses(cs: Seq[String]): String =
      if (cs.isEmpty) "" else cs.mkString("WHERE ", " AND ", "")
    val sampleW = clauses(
      seriesPred.toSeq ++
      (if (args.filterByTs.nonEmpty) Seq(s"ts IN (${args.filterByTs.mkString(",")})") else Nil) ++
      args.filterByValue.map { case (lo, hi) => s"value >= $lo AND value <= $hi" }.toSeq)
    val timeW = clauses(
      args.from.map(f => s"ts >= $f").toSeq ++ args.to.map(t => s"ts <= $t").toSeq)
    val orderDir = if (args.reverse) "DESC" else "ASC"
    // COUNT n truncates per series in report order (reference:
    // reply.c:180-212)
    def counted(rel: String, cols: Seq[String]): String = args.count match {
      case Some(n) =>
        s"""SELECT series, ts, ${cols.mkString(", ")} FROM (
           |  SELECT *, row_number() OVER (PARTITION BY series ORDER BY ts $orderDir) AS __rn
           |  FROM $rel) WHERE __rn <= $n""".stripMargin
      case None => s"SELECT series, ts, ${cols.mkString(", ")} FROM $rel"
    }
    val head =
      s"""$cte,
         |sf AS (SELECT * FROM samples $sampleW),
         |tf AS (SELECT * FROM sf $timeW)""".stripMargin
    if (args.aggs.isEmpty) return s"$head\n${counted("tf", Seq("value"))}"

    val dur = args.bucketMs; val al = args.alignMs
    val b = TSModel.bucketStartSql("ts", dur, al)
    val rts = TSModel.reportTsSql("bucket", dur, args.bucketTs)
    val cols = args.aggs.map(Aggs.colName)
    val aggSel = args.aggs.map(a => Aggs.sql(a)).mkString(",\n         ")
    val keepAll = args.aggs.exists(a => a == "countnan" || a == "countall")
    val keptRel = if (keepAll) "agg" else "kept"
    val aggCtes =
      s"""$head,
         |agg AS (
         |  SELECT series, $b AS bucket, $aggSel,
         |         count(value) FILTER (WHERE NOT isnan(value)) AS __valid
         |  FROM tf GROUP BY 1, 2),
         |kept AS (SELECT * FROM agg WHERE __valid > 0)""".stripMargin
    val nanFill = "'NaN'::DOUBLE"

    if (!args.empty) {
      // finalizeEmpty fills only apply when countnan/countall kept a
      // NaN-only bucket alive
      val sel = args.aggs.map { a =>
        val c = Aggs.colName(a)
        a match {
          case _ if !keepAll                          => c
          case "count" | "countnan" | "countall"      => c
          case "sum"  => s"coalesce($c, 0.0) AS $c"
          case "last" =>
            s"""coalesce($c,
               |      last_value($c IGNORE NULLS) OVER (PARTITION BY series ORDER BY bucket
               |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               |      $nanFill) AS $c""".stripMargin
          case _      => s"coalesce($c, $nanFill) AS $c"
        }
      }.mkString(",\n       ")
      s"""$aggCtes,
         |rep AS (
         |  SELECT series, $rts AS ts,
         |       $sel
         |  FROM $keptRel)
         |${counted("rep", cols)}""".stripMargin
    } else {
      // EMPTY: spine = query range ∩ series lifetime, bucket-aligned,
      // bounds from the SAMPLE-filtered (not time-filtered) set
      val lo0 = TSModel.bucketStartSql("min(ts)", dur, al)
      val hi0 = TSModel.bucketStartSql("max(ts)", dur, al)
      val loE = args.from.map(f =>
        s"greatest($lo0, ${TSModel.bucketStartSql(f.toString, dur, al)})").getOrElse(lo0)
      val hiE = args.to.map(t =>
        s"least($hi0, ${TSModel.bucketStartSql(t.toString, dur, al)})").getOrElse(hi0)
      val seedCte = args.from.map(f =>
        s""",
           |seed AS (
           |  SELECT series, (max(struct_pack(t := ts, v := value))
           |                  FILTER (WHERE NOT isnan(value))).v AS __seed
           |  FROM sf WHERE ts < $f GROUP BY series)""".stripMargin).getOrElse("")
      val seedJoin = if (args.from.isDefined) " LEFT JOIN seed USING (series)" else ""
      val sel = args.aggs.map { a =>
        val c = Aggs.colName(a)
        Aggs.emptyFill(a) match {
          case Some(_) if a == "sum" => s"coalesce($c, 0.0) AS $c"
          case Some(_) if a.startsWith("count") => s"coalesce($c, 0) AS $c"
          case Some(_) => s"coalesce($c, $nanFill) AS $c"
          case None => // last: LOCF over the spine, then the pre-range seed
            val locf =
              s"""last_value($c IGNORE NULLS) OVER (PARTITION BY spine.series ORDER BY spine.bucket
                 |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
            if (args.from.isDefined) s"coalesce($locf, __seed) AS $c"
            else s"$locf AS $c"
        }
      }.mkString(",\n       ")
      s"""$aggCtes,
         |bounds AS (SELECT series, $loE AS lo, $hiE AS hi FROM sf GROUP BY series),
         |spine AS (
         |  SELECT series, unnest(generate_series(lo, hi, $dur)) AS bucket
         |  FROM bounds WHERE lo <= hi)$seedCte,
         |filled AS (
         |  SELECT spine.series, spine.bucket,
         |       $sel
         |  FROM spine LEFT JOIN $keptRel USING (series, bucket)$seedJoin),
         |rep AS (SELECT series, $rts AS ts, ${cols.mkString(", ")} FROM filled)
         |${counted("rep", cols)}""".stripMargin
    }
  }

  /** Oracle SQL equivalent of [[range]] (no EMPTY / twa — those queries
    * carry their own handwritten oracle). */
  def rangeSql(args: RangeArgs, seriesPred: Option[String],
      cte: String = TSModel.samplesCte): String = {
    val where = whereSql(args, seriesPred)
    if (args.aggs.isEmpty)
      s"$cte SELECT series, ts, value FROM samples $where"
    else {
      val b = TSModel.bucketStartSql("ts", args.bucketMs, args.alignMs)
      val rts = TSModel.reportTsSql("bucket", args.bucketMs, args.bucketTs)
      val aggSel = args.aggs.map(a => Aggs.sql(a)).mkString(", ")
      val keep =
        if (args.aggs.exists(a => a == "countnan" || a == "countall")) ""
        else "WHERE " + args.aggs.map(a => s"${Aggs.colName(a)} IS NOT NULL").mkString(" OR ")
      s"""$cte, agg AS (
         |  SELECT series, $b AS bucket, $aggSel
         |  FROM samples $where
         |  GROUP BY 1, 2
         |) SELECT series, $rts AS ts, ${args.aggs.map(Aggs.colName).mkString(", ")}
         |  FROM agg $keep""".stripMargin
    }
  }
}
