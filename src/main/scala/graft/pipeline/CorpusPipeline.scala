package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The end product a training-data pipeline actually ships: one
 * declarative chain of language ID -> quality gates -> exact dedup ->
 * near-dup cluster removal. Each stage is an operator tested on its
 * own; this composes them the way a real corpus build does, and the
 * whole chain still verifies against a single DuckDB oracle.
 *
 * Scale shape: language/quality/fingerprint are per-row projections
 * (no shuffle); exact dedup is one window by fingerprint; near-dup
 * removal joins the (tiny) canonical mapping from the pair graph.
 */
object CorpusPipeline {

  /**
   * Two-char threshold for the md5-prefix keep test (`prefix < t` keeps
   * ≈ rate of a uniform prefix). Rates that round to ≥ 256 previously
   * formatted as the 3-char "100", and lexicographically
   * `substring(md5, 1, 2) < '100'` keeps only '0x'-prefixed hashes
   * (~6.25%) — a silently wrong sample in BOTH engines, so the oracle
   * could not catch it (ADVICE r02). "g" sorts after every hex pair
   * ('g' > 'f'), so rate ≈ 1.0 keeps everything; shared by the Spark
   * path and the SQL twin so they stay bit-identical.
   */
  private[pipeline] def hexThreshold(rate: Double): String = {
    val v = math.round(rate * 256).toInt
    if (v >= 256) "g" else f"$v%02x"
  }

  /**
   * Filtered, deduplicated corpus. Gates are deterministic: language
   * must be `lang`, `alpha_ratio >= minAlpha`, `n_tokens >= minTokens`.
   * Exact dedup keeps the minimum doc id per fingerprint AMONG the
   * gated docs; near-dup removal drops docs whose pair-graph component
   * canonical (min reachable id) is not themselves. `nearPairs` is the
   * verified near-dup pair set (e.g. [[Dedup.ngramJaccardPairs]] or the
   * LSH paths at scale).
   */
  def filteredCorpus(
      docs: DataFrame, nearPairs: DataFrame,
      lang: String = "en", minAlpha: Double = 0.5, minTokens: Double = 20.0): DataFrame = {
    // all gate columns in ONE projection over one corpus scan (review
    // r04: joining the three operator outputs by doc_id re-scanned the
    // corpus three times and added two corpus-wide shuffles — the
    // operators share column-expression helpers instead)
    val gated = docs.select(col("doc_id"),
        Text.langPredCol.as("lang_pred"),
        Text.nTokensCol.as("n_tokens"),
        Text.alphaRatioCol.as("alpha_ratio"),
        md5(Text.normText(col("text"))).as("fp"))
      .filter(col("lang_pred") === lang &&
        col("alpha_ratio") >= minAlpha && col("n_tokens") >= minTokens)
    val exactKept = gated
      .withColumn("__canon", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("__canon"))
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"), col("fp"))
    // the CC label frame is O(pair-graph nodes) — gated broadcast keeps
    // the gated-corpus side shuffle-free (see Dedup.maybeBroadcast)
    val cc = Dedup.maybeBroadcast(Dedup.ccCanonical(nearPairs)
      .select(col("node").as("doc_id"), col("label").as("__cc")))
    exactKept.join(cc, Seq("doc_id"), "left")
      .filter(col("__cc").isNull || col("__cc") === col("doc_id"))
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"), col("fp"))
  }

  /**
   * Per-source quality cap — the domain/source-balancing step of a
   * corpus build (CCNet/RefinedWeb shape): keep at most `cap`
   * documents per source, preferring the highest quality, so no
   * single crawl domain floods the mix. Quality here is the
   * alpha-ratio signal ([[Text.qualityMetrics]]' column — one
   * integer-count division, bit-identical cross-engine); ties break
   * on doc_id for a total order.
   *
   * Plan shape: ONE rank window per source with a `rnk <= cap` filter
   * — Spark compiles this to WindowGroupLimit (per-partition partial
   * top-cap BEFORE the shuffle, the [[graft.ts.TopK]] discipline), so
   * shuffle volume is bounded at cap rows per source per task and no
   * global sort of the corpus ever exists.
   */
  def sourceCap(docs: DataFrame, cap: Int): DataFrame = {
    require(cap >= 1, s"source cap must be >= 1, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"),
        Text.alphaRatioCol.as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= cap)
  }

  /** DuckDB twin of [[sourceCap]] — same score, same rank rule. */
  def sourceCapSql(cap: Int): String =
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    len(regexp_extract_all(text, '[A-Za-z]')) / CAST(length(text) AS DOUBLE) AS score
       |  FROM documents
       |), ranked AS (
       |  SELECT doc_id, source, score,
       |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM scored
       |)
       |SELECT doc_id, source, score, rnk FROM ranked WHERE rnk <= $cap""".stripMargin

  /**
   * Deterministic stratified sampling + split assignment — the data
   * mixing step of a corpus build. Per-language keep rates are applied
   * via an md5-prefix threshold (`md5(doc_id)` prefix is uniform in
   * [0x00, 0xff]; keep iff prefix < rate·256), and kept docs get a
   * stable train/val split from a DIFFERENT slice of the same hash.
   * Fully deterministic and engine-independent: reruns, backfills, and
   * the DuckDB oracle all select the identical document set — no RNG
   * state, no sampling drift between pipeline stages. Pure projections:
   * embarrassingly parallel at any scale.
   */
  def stratifiedSample(
      docs: DataFrame, rates: Map[String, Double], defaultRate: Double,
      valFraction: Double = 0.1): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    val keepThreshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (lang, r)) => when(col("lang_pred") === lang, lit(hexThreshold(r))).otherwise(acc)
    }
    val valThreshold = lit(hexThreshold(valFraction))
    // lang_pred computed inline: one projection, zero joins/shuffles
    // (review r04: the old docs-side join with the languageId output
    // was a corpus-wide shuffle for a semantic identity)
    docs.select(col("doc_id"), Text.langPredCol.as("lang_pred"))
      .filter(substring(h, 1, 2) < keepThreshold)
      .select(col("doc_id"), col("lang_pred"),
        when(substring(h, 3, 2) < valThreshold, lit("val"))
          .otherwise(lit("train")).as("split"))
  }

  def stratifiedSampleSql(
      rates: Map[String, Double], defaultRate: Double,
      valFraction: Double = 0.1): String = {
    val whens = rates.map { case (lang, r) =>
      s"WHEN lang_pred = '$lang' THEN '${hexThreshold(r)}'"
    }.mkString(" ")
    // a CASE with zero WHEN branches is invalid SQL (review r04): an
    // empty rates map degenerates to the bare default literal
    val threshold =
      if (rates.isEmpty) s"'${hexThreshold(defaultRate)}'"
      else s"(CASE $whens ELSE '${hexThreshold(defaultRate)}' END)"
    s"""WITH lang AS (
       |  ${Text.languageIdSql.replace("\n", "\n  ")}
       |), hashed AS (
       |  SELECT doc_id, lang_pred, md5(CAST(doc_id AS VARCHAR)) AS h FROM lang
       |)
       |SELECT doc_id, lang_pred,
       |       CASE WHEN substring(h, 3, 2) < '${hexThreshold(valFraction)}'
       |            THEN 'val' ELSE 'train' END AS split
       |FROM hashed
       |WHERE substring(h, 1, 2) < $threshold""".stripMargin
  }

  /**
   * Benchmark-contamination scan — the eval-set decontamination step of
   * a training-data build: flag every corpus document sharing at least
   * `minShared` word n-gram shingles with any benchmark item. The
   * benchmark set is O(eval items) — tiny against the corpus — so it
   * broadcasts and the corpus shingle stream makes ONE pass through a
   * broadcast hash join keyed by shingle; no shuffle of the corpus
   * side, no pairwise comparison. (The shingle width is [[Dedup.shingles]]'
   * default 3-gram — the standard n-gram-overlap decontamination rule.)
   */
  def contamination(
      docs: DataFrame, bench: DataFrame, minShared: Long = 5L): DataFrame = {
    val ds = Dedup.shingles(graft.Fanout.ifStarved(docs, col("doc_id")))
    val bs = Dedup.shingles(bench)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    ds.join(broadcast(bs), Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  /**
   * Two-phase contamination: the SCALE variant of [[contamination]]
   * for when the benchmark side outgrows a broadcast-hash join (a
   * multi-benchmark eval registry is millions of shingles — too big
   * to broadcast as strings, trivial as a Bloom filter at ~8
   * bits/item). Phase 1 drops corpus shingles map-side through a
   * driver-built Bloom of the benchmark shingles
   * ([[graft.functions.BloomMightContain]], codegen'd, BEFORE any
   * shuffle); phase 2 is the exact shuffle join + count on the
   * survivors only. Bloom filters have NO false negatives and the
   * exact join removes the false positives, so the result is
   * IDENTICAL to [[contamination]] — same oracle — while corpus-side
   * shuffle volume shrinks from every shingle to the survivors
   * (~matches + fpp of the corpus).
   */
  def contaminationBloom(
      docs: DataFrame, bench: DataFrame, minShared: Long = 5L,
      fpp: Double = 0.01): DataFrame = {
    // persist: the bench shingle frame backs three actions (distinct
    // count, Bloom construction, exact join) — without it the bench
    // shingling recomputes per action, which is exactly the waste this
    // variant exists to avoid
    val bs = Dedup.shingles(bench)
      .select(col("doc_id").as("bench_id"), col("shingle"))
      .persist()
    try {
      // distinct shingles sizes the filter; raw count oversizes it
      // when benchmark items repeat shingles across docs
      val nBench = math.max(
        bs.select(col("shingle")).distinct().count(), 1L)
      val bloom = bs.stat.bloomFilter("shingle", nBench, fpp)
      val pre = Dedup.shingles(graft.Fanout.ifStarved(docs, col("doc_id")))
        .filter(graft.functions.BloomMightContain(col("shingle"), bloom))
      // deliberately NOT broadcast: the whole point is that phase 2
      // survives a bench side too big to broadcast (AQE may still
      // choose broadcast when it happens to be small — fine)
      pre.join(bs, Seq("shingle"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("shared_ngrams"))
        .filter(col("shared_ngrams") >= minShared)
        .localCheckpoint()
    } finally bs.unpersist()
  }

  /**
   * Fractional contamination score — the graded variant of
   * [[contamination]] (the GPT-3 appendix-C / Llama decontamination
   * metric): for EVERY corpus document, the fraction of its distinct
   * word n-grams that appear anywhere in the benchmark set. Boolean
   * flags ([[contamination]]'s `>= minShared`) answer "is it dirty";
   * the fraction answers "how dirty" — the number production
   * pipelines threshold (e.g. drop > 0.8, keep-and-log > 0.1).
   *
   * Plan: benchmark shingles dedup to ONE broadcast set (O(eval
   * items), the same bound as [[contamination]]); the corpus shingle
   * stream LEFT-joins it map-side (no corpus shuffle for the match),
   * then one count-agg by doc — matched and total counted in the same
   * pass, so the whole operator is the shingle distinct + one doc-keyed
   * agg. Docs shorter than n words have no shingles and are absent, as
   * in every shingle-based operator here.
   */
  def contaminationFraction(
      docs: DataFrame, bench: DataFrame, n: Int = 5): DataFrame = {
    val ds = Dedup.shingles(graft.Fanout.ifStarved(docs, col("doc_id")), n)
    val bs = Dedup.shingles(bench, n).select(col("shingle")).distinct()
      .withColumn("hit", lit(1))
    ds.join(broadcast(bs), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg((count(col("hit")).cast("double") / count(lit(1)))
        .as("contamination_frac"))
  }

  /**
   * FUZZY decontamination — the near-dup complement of the exact
   * n-gram scan: a training document is flagged when any of its
   * MinHash band buckets ([[StreamDedup.bandBucketsMd5]]'s
   * oracle-replayable md5 signatures) collides with a BENCHMARK
   * item's bucket — i.e. the doc is near-identical to an eval item
   * with LSH confidence, even where light paraphrasing breaks the
   * exact shingle overlap below [[contamination]]'s threshold.
   * `n_bands` (collision evidence strength, 1..nBands) rides along so
   * callers can set their own confidence cut.
   *
   * Plan: signature CPU on each side independently; the benchmark
   * bucket set is O(eval items × bands) — always broadcastable — so
   * the corpus side makes ONE pass through a broadcast join keyed by
   * (band, bucket). Same scale shape as [[contamination]].
   */
  def contaminationFuzzy(
      docs: DataFrame, bench: DataFrame,
      numHashes: Int = 16, bandRows: Int = 4): DataFrame = {
    val db = StreamDedup.bandBucketsMd5(docs, numHashes, bandRows)
    val bb = StreamDedup.bandBucketsMd5(bench, numHashes, bandRows)
      .select(col("band"), col("bucket")).distinct()
    db.join(broadcast(bb), Seq("band", "bucket"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("band")).as("n_bands"))
  }

  /** DuckDB twin of [[contaminationFuzzy]]: the shared md5
    * signature/band chain over ALL documents, sliced into the train
    * (`trainPred`) and benchmark (`benchPred`) sides relationally —
    * per-doc signatures are independent, so slicing after equals
    * computing each side separately. */
  def contaminationFuzzySql(
      benchPred: String, trainPred: String,
      numHashes: Int = 16, bandRows: Int = 4): String =
    s"""WITH ${StreamDedup.bandsCteSql(numHashes, bandRows, "documents")}
       |SELECT d.doc_id, CAST(count(DISTINCT d.band) AS BIGINT) AS n_bands
       |FROM (SELECT * FROM bands WHERE $trainPred) d
       |JOIN (SELECT DISTINCT band, bucket FROM bands WHERE $benchPred) b
       |  USING (band, bucket)
       |GROUP BY d.doc_id""".stripMargin

  /** DuckDB twin of [[contaminationFraction]]. */
  def contaminationFractionSql(benchPred: String, n: Int = 5): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(${Dedup.shingleListSql(n)})) AS shingle
       |  FROM toks
       |), bench AS (
       |  SELECT DISTINCT shingle FROM sh WHERE $benchPred
       |)
       |SELECT s.doc_id,
       |  count(b.shingle) * 1.0 / count(*) AS contamination_frac
       |FROM sh s LEFT JOIN bench b USING (shingle)
       |GROUP BY s.doc_id""".stripMargin

  /**
   * The flag→DROP end product of [[contamination]]: the corpus with
   * every flagged document REMOVED — what a training run actually
   * consumes after the decontamination scan. One left_anti join
   * against the flagged id set, which is bounded by matches (tiny for
   * any sane benchmark) so AQE broadcasts it; the corpus side stays a
   * single shuffle-free pass. Benchmark documents themselves are also
   * dropped (they flag themselves at any `minShared` their own length
   * reaches — and eval items must never be trained on regardless).
   */
  def decontaminatedCorpus(
      docs: DataFrame, bench: DataFrame, minShared: Long = 5L): DataFrame =
    docs.join(
        contamination(docs, bench, minShared).select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    // no projection: the output IS the corpus a training run consumes
    // (text included), and the DocumentsView TVF contract brackets
    // source/lang as optional — a minimal (doc_id, text) view must work

  /** DuckDB twin of [[decontaminatedCorpus]]. */
  def decontaminatedCorpusSql(benchPred: String, minShared: Long = 5L): String =
    s"""WITH flagged AS (
       |${contaminationSql(benchPred, minShared).replace("\n", "\n  ")}
       |)
       |SELECT * FROM documents
       |WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM flagged)""".stripMargin

  /** DuckDB twin: same shingle sets, relational join (`benchPred`
    * selects the benchmark rows out of `documents`). */
  def contaminationSql(benchPred: String, minShared: Long = 5L): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(${Dedup.shingleListSql(3)})) AS shingle
       |  FROM toks
       |), bench AS (
       |  SELECT doc_id AS bench_id, shingle FROM sh WHERE $benchPred
       |)
       |SELECT s.doc_id, b.bench_id, count(*) AS shared_ngrams
       |FROM sh s JOIN bench b USING (shingle)
       |GROUP BY 1, 2
       |HAVING count(*) >= $minShared""".stripMargin

  /** DuckDB twin over the bounded near-dup pair SQL. */
  def filteredCorpusSql(
      pairsSql: String,
      lang: String = "en", minAlpha: Double = 0.5, minTokens: Double = 20.0): String =
    s"""WITH RECURSIVE lang AS (
       |  ${Text.languageIdSql.replace("\n", "\n  ")}
       |), quality AS (
       |  ${Text.qualityMetricsSql.replace("\n", "\n  ")}
       |), fpt AS (
       |  ${Text.fingerprintSql.replace("\n", "\n  ")}
       |), gated AS (
       |  SELECT l.doc_id, l.lang_pred, q.n_tokens, fpt.fp
       |  FROM lang l JOIN quality q USING (doc_id) JOIN fpt USING (doc_id)
       |  WHERE l.lang_pred = '$lang' AND q.alpha_ratio >= $minAlpha
       |    AND q.n_tokens >= $minTokens
       |), exact_kept AS (
       |  SELECT doc_id, lang_pred, n_tokens, fp FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canon FROM gated
       |  ) WHERE doc_id = canon
       |), pairs AS (
       |  ${pairsSql.replace("\n", "\n  ")}
       |), edges AS (
       |  SELECT i AS a, j AS b FROM pairs UNION SELECT j AS a, i AS b FROM pairs
       |), reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), comp AS (
       |  SELECT a AS doc_id, least(a, min(b)) AS cc FROM reach GROUP BY a
       |)
       |SELECT k.doc_id, k.lang_pred, k.n_tokens, k.fp
       |FROM exact_kept k LEFT JOIN comp USING (doc_id)
       |WHERE comp.cc IS NULL OR comp.cc = k.doc_id""".stripMargin

  /**
   * Sequence packing — the pretraining step that concatenates documents
   * into fixed-token-budget training sequences ("document packing"):
   * within each shard, documents fill a contiguous token stream in
   * deterministic (doc_id) order and a document's bin is where the
   * stream cursor stands when it begins (documents may straddle a
   * boundary, exactly like concat-then-chunk tokenization). Integer
   * arithmetic end-to-end, so both engines agree bit-for-bit.
   *
   * 100 TB shape: ONE shuffle by shard (`doc_id % nShards` — shards are
   * the parallelism unit, sized so a shard's running window fits a
   * task), then a per-shard running sum; no joins, no driver state.
   * Token counts ride the same whitespace tokenizer as text_tokens.
   */
  def packSequences(docs: DataFrame, budgetTokens: Long, nShards: Int): DataFrame = {
    require(budgetTokens > 0 && nShards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"),
        Text.nTokensCol.cast("long").as("n_tokens"), // the shared tokenizer
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("stream_offset"),
        expr(s"(cum - n_tokens) DIV $budgetTokens").as("bin"))
  }

  def packSequencesSql(budgetTokens: Long, nShards: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |         doc_id % $nShards AS shard
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, shard, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM toks
       |)
       |-- DuckDB widens sum(BIGINT) OVER to HUGEINT; CAST back so the
       |-- driver hashes the same LONG the Spark side produces
       |SELECT doc_id, shard, n_tokens,
       |       CAST(cum - n_tokens AS BIGINT) AS stream_offset,
       |       CAST((cum - n_tokens) // $budgetTokens AS BIGINT) AS bin
       |FROM c""".stripMargin

  /**
   * Temperature-weighted source mixing — the data-mix step that
   * up-samples small sources and down-samples large ones: source s gets
   * a quota of `floor(target * n_s^α / Σ n_t^α)` documents at the
   * classic sqrt temperature (α = 0.5, the flattening used for
   * multilingual/multi-source pretraining mixes), and the quota is
   * filled in deterministic md5(doc_id) order — a seedless uniform
   * sample both engines reproduce. Quota arithmetic uses IEEE sqrt
   * (correctly rounded in both engines) and quantizes the quotient to
   * 6 decimals before floor — equal-sized sources put the quota
   * mathematically ON an integer, where the float-sum association of z
   * would otherwise flip floor() between engines/partition layouts.
   *
   * 100 TB shape: per-source counts are O(#sources) — a broadcast-sized
   * aggregate. The naive selection ranks EVERY corpus row per source —
   * a full sort of each source partition, the dominant cost on a giant
   * source that is precisely the one being down-sampled. Instead the
   * corpus is pre-filtered on a per-source md5-prefix threshold sized
   * to keep ~`margin`× the quota: ranking by md5 means the quota
   * smallest hashes ALL lie below any prefix threshold that keeps at
   * least `quota` rows, so the pre-filter is result-TRANSPARENT (the
   * oracle runs the unfiltered formulation and must hash-match), and
   * the rank window sorts O(margin × target) rows instead of the
   * corpus. A count gate checks every source kept enough survivors and
   * falls back to the full rank otherwise — the same
   * gated-degrade contract as the broadcast gates elsewhere.
   */
  def mixByTemperature(
      docs: DataFrame, target: Long,
      margin: Double = 4.0): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val z = counts.agg(sum(sqrt(col("n_docs"))).as("z"))
    // round-to-6 BEFORE floor — the repo's literal-quantizer rule:
    // z's float-sum association can differ by ulps between engines (and
    // between partition layouts), and a quota landing mathematically ON
    // an integer (review r05: 20 equal sources put sf0.1 exactly at
    // 15.0) would flip floor() on that noise; quantizing collapses the
    // ±1e-14 band to one deterministic value in both engines.
    // localCheckpoint: the tiny quota table feeds the starvation gate
    // AND the returned plan — without it each consumer re-runs the
    // corpus counts aggregate (the maybeBroadcast precedent).
    val quotas = counts.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"),
        floor(round(lit(target.toDouble) * sqrt(col("n_docs")) / col("z"), 6)).as("quota"))
      .localCheckpoint()
    val base = docs.select(col("doc_id"), col("source"))
      .join(broadcast(quotas), Seq("source"))
    // 4-hex-digit threshold (1/65536 granularity), rounded UP so the
    // kept fraction is never below margin*quota/n; >= 1.0 keeps all
    val thr = {
      val p = least(lit(1.0), lit(margin) * col("quota").cast("double") / col("n_docs"))
      val v = least(lit(65536.0), ceil(p * 65536.0))
      // lower(): Spark's conv emits uppercase hex, md5 lowercase — a
      // mixed-case lexicographic compare would keep the wrong region
      when(v >= 65536.0, lit("g"))
        .otherwise(lower(lpad(conv(v.cast("long"), 10, 16), 4, "0")))
    }
    val h = md5(col("doc_id").cast("string"))
    // localCheckpoint: survivors is margin×target-bounded (the whole
    // point of the pre-filter), and BOTH the starvation gate and the
    // returned rank read it — without pinning, the gate's eager count
    // and the final plan each re-run the corpus-wide filter+join, three
    // corpus-scale jobs where two suffice (ADVICE r05). Trade-offs
    // (ADVICE r06): the default-eager checkpoint runs those jobs at
    // plan-CONSTRUCTION time (callers that only inspect the plan still
    // pay them), and checkpointed blocks are pinned to executors — not
    // recomputable after executor loss under dynamic allocation; a
    // deployment that cares uses reliable checkpoint() to durable
    // storage instead.
    val survivors = base.filter(substring(h, 1, 4) < thr).localCheckpoint()
    // gate from the QUOTAS side: a fully-starved source has no survivor
    // group at all, so a survivors-side groupBy would never report it
    val short = quotas.join(
        survivors.groupBy(col("source")).agg(count(lit(1)).as("kept")),
        Seq("source"), "left")
      .filter(coalesce(col("kept"), lit(0L)) < col("quota"))
    val ranked = if (short.limit(1).count() == 0) survivors else base
    val rk = row_number().over(Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
    ranked
      .withColumn("rk", rk)
      .filter(col("rk") <= col("quota"))
      .select(col("source"), col("doc_id"))
  }

  /** PLAN-ONLY [[mixByTemperature]] — the TVF route, which must splice
    * at analysis time with ZERO driver actions (no localCheckpoint, no
    * starvation-gate count): the naive formulation the eager route's
    * pre-filter is proven result-transparent against — quotas as an
    * in-plan broadcast join, the full per-source rank window. Same
    * rows bit-for-bit (the oracle and PipelineSpec pin it); the
    * trade is the full per-source sort the eager route's md5-prefix
    * pre-filter avoids on a giant down-sampled source. */
  def mixByTemperatureLazy(docs: DataFrame, target: Long): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val z = counts.agg(sum(sqrt(col("n_docs"))).as("z"))
    val quotas = counts.crossJoin(broadcast(z))
      .select(col("source"),
        floor(round(lit(target.toDouble) * sqrt(col("n_docs")) / col("z"), 6)).as("quota"))
    val rk = row_number().over(Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(quotas), Seq("source"))
      .withColumn("rk", rk)
      .filter(col("rk") <= col("quota"))
      .select(col("source"), col("doc_id"))
  }

  def mixByTemperatureSql(target: Long): String =
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
       |), z AS (
       |  SELECT sum(sqrt(n_docs)) AS z FROM counts
       |), quotas AS (
       |  SELECT source, floor(round(CAST($target AS DOUBLE) * sqrt(n_docs) / z, 6)) AS quota
       |  FROM counts, z
       |), ranked AS (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM documents
       |)
       |SELECT source, doc_id FROM ranked JOIN quotas USING (source)
       |WHERE rk <= quota""".stripMargin

  /**
   * Percentile quality gate WITHOUT a global sort — the 100 TB shape
   * for "drop the worst `dropFrac` of the corpus by quality score".
   * A `percent_rank` formulation would total-sort the corpus; instead
   * the score is quantized (`floor(stop_ratio * 1e4)` — a literal
   * quantizer, so the DuckDB oracle re-derives the exact threshold),
   * the BOUNDED histogram of quantized scores (≤ 10k rows, aggregated
   * map-side) yields the cut from its cumulative counts, and the
   * corpus is filtered with that broadcast scalar. Corpus cost: two
   * projection scans + one tiny-key shuffle; all ordering work happens
   * on the histogram. The histogram is localCheckpoint'd — the total
   * and threshold jobs read it twice and must not rescan the corpus.
   *
   * Threshold rule (exact, integer-only): with k = floor(dropFrac *
   * total), t = the largest score with cumulative count <= k; keep
   * docs with score > t. Ties never straddle the cut — a score's
   * whole bucket is dropped or kept, so at most k docs are dropped.
   */
  def qualityPercentileKeep(docs: DataFrame, dropFrac: Double): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, s"dropFrac out of range: $dropFrac")
    val scored = Text.qualityMetrics(  // compact-row fan-out (r17, §2.2)
      graft.Fanout.ifStarved(docs, col("doc_id")))
      .select(col("doc_id"), floor(col("stop_ratio") * 10000).as("qscore"))
    val hist = scored.groupBy(col("qscore")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val total = hist.agg(sum(col("c"))).head.getLong(0)
    if (total == 0L) return scored
    val k = math.floor(dropFrac * total).toLong
    // single-partition window is deliberate: it runs on the bounded
    // histogram, not the corpus
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("qscore"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val thr = cum.filter(col("cum") <= k).agg(max(col("qscore"))).head
    val t = if (thr.isNullAt(0)) Long.MinValue else thr.getLong(0)
    scored.filter(col("qscore") > t)
  }

  /**
   * PLAN-ONLY [[qualityPercentileKeep]] — identical result, zero
   * driver actions: the total and the threshold become broadcast
   * scalar subqueries (one-row aggregates crossJoined in) instead of
   * driver-side `head` reads, so the whole gate is one logical plan a
   * SQL TVF can splice at analysis time. Same integer-only threshold
   * rule; the empty-corpus and nothing-below-the-cut edges coalesce to
   * the same Long.MinValue sentinel the eager path uses. Cost parity:
   * both formulations scan the corpus twice (score histogram +
   * final filter) — the eager path's localCheckpoint pins the
   * histogram, the lazy one's histogram is ≤10k rows either way.
   */
  def qualityPercentileKeepLazy(docs: DataFrame, dropFrac: Double): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, s"dropFrac out of range: $dropFrac")
    val scored = Text.qualityMetrics(  // compact-row fan-out (r17, §2.2)
      graft.Fanout.ifStarved(docs, col("doc_id")))
      .select(col("doc_id"), floor(col("stop_ratio") * 10000).as("qscore"))
    val hist = scored.groupBy(col("qscore")).agg(count(lit(1)).as("c"))
    val total = hist.agg(coalesce(sum(col("c")), lit(0L)).as("total"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("qscore"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // k = floor(dropFrac · total); t = max qscore with cum <= k
    val thr = cum.crossJoin(broadcast(total))
      .filter(col("cum") <= floor(lit(dropFrac) * col("total")))
      .agg(max(col("qscore")).as("t")) // one row; null when nothing cut
    scored.crossJoin(broadcast(thr))
      .filter(col("qscore") > coalesce(col("t"), lit(Long.MinValue)))
      .select(col("doc_id"), col("qscore"))
  }

  def qualityPercentileKeepSql(dropFrac: Double): String =
    s"""WITH q AS (
       |${Text.qualityMetricsSql}
       |), scored AS (
       |  SELECT doc_id, CAST(floor(stop_ratio * 10000) AS BIGINT) AS qscore FROM q
       |), cum AS (
       |  SELECT qscore, sum(c) OVER (ORDER BY qscore) AS cum FROM (
       |    SELECT qscore, count(*) AS c FROM scored GROUP BY 1)
       |), thr AS (
       |  SELECT max(qscore) AS t FROM cum
       |  WHERE cum <= floor($dropFrac * (SELECT count(*) FROM scored))
       |)
       |SELECT doc_id, qscore FROM scored, thr
       |WHERE qscore > coalesce(t, ${Long.MinValue}::BIGINT)""".stripMargin
}
