package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * token counting, quality metrics, n-gram-heuristic language ID,
 * document fingerprinting. All pure `functions._` column expressions —
 * whole-stage codegen, no UDFs, trivially scale-out (embarrassingly
 * parallel over documents).
 */
object Text {

  def loadDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Whitespace tokens + a BPE-ish regex token estimate
    * (`\w+` runs and isolated punctuation, the classic pre-tokenizer
    * shape). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens_ws"),
      regexp_count(col("text"), lit("\\w+|[^\\w\\s]")).as("n_tokens_re"),
      length(col("text")).as("n_chars"))

  val tokenCountsSql: String =
    """SELECT doc_id,
      |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens_ws,
      |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens_re,
      |  length(text) AS n_chars
      |FROM documents""".stripMargin

  /** The English stopword alternation — ONE definition feeding both
    * qualityMetrics' stop_ratio and language ID's `en` score (and, via
    * interpolation, both SQL twins). */
  private val enStopRe = "\\b(the|a|and|of|to|in|is)\\b"

  /** Gate columns as expressions over a raw `text` column, for fused
    * single-scan pipelines (CorpusPipeline composes all of its quality
    * gates in ONE projection instead of joining operator outputs). */
  private[pipeline] def nTokensCol: Column =
    size(split(trim(col("text")), "\\s+")).cast("double")
  private[pipeline] def alphaRatioCol: Column =
    regexp_count(col("text"), lit("[A-Za-z]")).cast("double") /
      length(col("text")).cast("double")
  private[pipeline] def langPredCol: Column = {
    val scores = langPatterns.map { case (l, p) =>
      l -> regexp_count(lower(col("text")), lit(p))
    }
    val maxAll = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(lit(false), lit("x"))) { case (w, (l, s)) =>
      w.when(s === maxAll && s > 0, lit(l))
    }.otherwise(lit("unknown"))
  }

  /** Quality metrics: length, punctuation density, stopword ratio, mean
    * word length, alpha ratio. Formulas chosen to be expressible
    * identically in the DuckDB oracle. */
  def qualityMetrics(docs: DataFrame): DataFrame = {
    val nTok = nTokensCol
    val nCh = length(col("text")).cast("double")
    docs.select(
      col("doc_id"),
      nCh.as("n_chars"),
      nTok.as("n_tokens"),
      (regexp_count(col("text"), lit("[\\.,;:!\\?]")).cast("double") / nCh).as("punct_ratio"),
      (regexp_count(lower(col("text")), lit(enStopRe)).cast("double") / nTok)
        .as("stop_ratio"),
      ((nCh - nTok + 1) / nTok).as("mean_word_len"),
      alphaRatioCol.as("alpha_ratio"))
  }

  val qualityMetricsSql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS DOUBLE) AS n_chars,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
      |  len(regexp_extract_all(text, '[.,;:!?]')) / CAST(length(text) AS DOUBLE) AS punct_ratio,
      |  len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b'))
      |    / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS stop_ratio,
      |  (CAST(length(text) AS DOUBLE) - len(regexp_split_to_array(trim(text), '\s+')) + 1)
      |    / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS mean_word_len,
      |  len(regexp_extract_all(text, '[A-Za-z]')) / CAST(length(text) AS DOUBLE) AS alpha_ratio
      |FROM documents""".stripMargin

  /** Stopword-count language-ID heuristic over 5 languages, with CJK
    * character density for zh. Deterministic argmax with a fixed
    * tie-break order. */
  private val langPatterns: Seq[(String, String)] = Seq(
    "en" -> enStopRe,
    "de" -> "\\b(der|die|das|und|ist|nicht|mit)\\b",
    "es" -> "\\b(el|los|las|que|y|por|una)\\b",
    "fr" -> "\\b(le|les|des|et|est|une|dans)\\b",
    "zh" -> "[\\x{4e00}-\\x{9fff}]")

  def languageId(docs: DataFrame): DataFrame = {
    val scores = langPatterns.map { case (l, p) =>
      regexp_count(lower(col("text")), lit(p)).as(s"score_$l")
    }
    val scored = docs.select((col("doc_id") +: scores): _*)
    val langs = langPatterns.map(_._1)
    val maxAll = greatest(langs.map(l => col(s"score_$l")): _*)
    // first language (priority order en>de>es>fr>zh) whose score equals
    // the max and is positive wins — when-chains resolve ties by order
    val best = langs.foldLeft(when(lit(false), lit("x"))) { (w, l) =>
      w.when(col(s"score_$l") === maxAll && col(s"score_$l") > 0, lit(l))
    }.otherwise(lit("unknown"))
    scored.withColumn("lang_pred", best)
  }

  val languageIdSql: String = {
    val scores = langPatterns.map { case (l, p) =>
      s"len(regexp_extract_all(lower(text), '$p')) AS score_$l"
    }
    val langs = langPatterns.map(_._1)
    val maxAll = "greatest(" + langs.map(l => s"score_$l").mkString(", ") + ")"
    val whens = langs.map(l => s"WHEN score_$l = $maxAll AND score_$l > 0 THEN '$l'")
    s"""WITH scored AS (
       |  SELECT doc_id, ${scores.mkString(", ")} FROM documents
       |) SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
       |         CASE ${whens.mkString(" ")} ELSE 'unknown' END AS lang_pred
       |  FROM scored""".stripMargin
  }

  /** Corpus-level word frequency: top-k words by total count (classic
    * wordcount — explode + one aggregation; deterministic tie-break on
    * the word itself). */
  def wordFrequency(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)

  def wordFrequencySql(k: Int): String =
    s"""SELECT word, count(*) AS n
       |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
       |      FROM documents)
       |GROUP BY word ORDER BY n DESC, word ASC LIMIT $k""".stripMargin

  /**
   * Zipf fit — a corpus-health diagnostic for training-data curation:
   * natural text follows `freq ∝ rank^s` with s ≈ −1; a slope far from
   * −1 over the head of the distribution flags boilerplate floods
   * (slope ≈ 0: the same templates repeated) or shredded/synthetic
   * text. One row: OLS slope/intercept/R² of ln(freq) on ln(rank) over
   * the top-`topN` words, plus the rank count actually fitted.
   *
   * Plan shape: word counts are ONE map-side-combined aggregation; the
   * top-N head is a distributed TakeOrderedAndProject (per-partition
   * top-N, merged — no global sort materializes the vocabulary);
   * ranking and the regression run on that N-row frame, so the
   * single-partition window is bounded by the QUERY's topN, not the
   * corpus. regr_slope/regr_intercept/regr_r2 are the same
   * least-squares aggregates in both engines.
   */
  def zipfFit(docs: DataFrame, topN: Int): DataFrame = {
    require(topN >= 2, s"zipf fit needs topN >= 2, got $topN")
    val head = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(topN)
    val ranked = head.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("word").asc)))
    val y = log(col("n").cast("double"))
    val x = log(col("rank").cast("double"))
    // round-9 on the OLS outputs (cross-engine convention): each is a
    // quotient of stacked float reductions whose accumulation order the
    // engines don't pin — unrounded values carry latent last-ulp hash
    // risk against the oracle.
    ranked.agg(
      round(regr_slope(y, x), 9).as("zipf_slope"),
      round(regr_intercept(y, x), 9).as("zipf_intercept"),
      round(regr_r2(y, x), 9).as("zipf_r2"),
      count(lit(1)).as("n_ranks"))
  }

  /** DuckDB twin of [[zipfFit]] — same head selection, same OLS. */
  def zipfFitSql(topN: Int): String =
    s"""WITH freqs AS (
       |  SELECT word, count(*) AS n
       |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
       |        FROM documents)
       |  GROUP BY word ORDER BY n DESC, word ASC LIMIT $topN
       |), ranked AS (
       |  SELECT n, row_number() OVER (ORDER BY n DESC, word ASC) AS rank
       |  FROM freqs
       |)
       |SELECT round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 9) AS zipf_slope,
       |       round(regr_intercept(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 9) AS zipf_intercept,
       |       round(regr_r2(ln(CAST(n AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 9) AS zipf_r2,
       |       CAST(count(*) AS BIGINT) AS n_ranks
       |FROM ranked""".stripMargin

  /**
   * TF-IDF: the classic two-level text pipeline — per-(doc, term)
   * counts (one shuffle by (doc, term) with map-side combine), document
   * frequencies (one aggregate by term), and `tf * ln(N / df)`.
   *
   * The `df` (O(vocabulary)) and `docLens` (O(#documents)) sides carry
   * NO broadcast hint: both scale with the corpus, so a hard
   * `broadcast()` is a guaranteed OOM at the 100 TB target. AQE picks a
   * broadcast join at runtime when the measured size is genuinely under
   * the threshold, and falls back to a shuffle join otherwise —
   * PlanShapeSpec pins the absence of a hint-forced broadcast.
   *
   * Output is bounded by an integer predicate (`cnt >= minCount`), not
   * a float threshold or a score ranking, so the row SET is exactly
   * reproducible in the DuckDB oracle — float comparisons only ever
   * happen on emitted values (1e-6 tolerance), never decide membership.
   */
  def tfIdf(docs: DataFrame, minCount: Long = 3L): DataFrame = {
    val terms = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val termCounts = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val docLens = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("n_terms"))
    val df = termCounts.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col("doc_id"))).head().getLong(0)
    termCounts
      .filter(col("cnt") >= minCount)
      .join(df, Seq("term"))
      .join(docLens, Seq("doc_id"))
      .select(col("doc_id"), col("term"), col("cnt"), col("df"),
        ((col("cnt") / col("n_terms")) * log(lit(nDocs.toDouble) / col("df")))
          .as("tfidf"))
  }

  def tfIdfSql(minCount: Long = 3L): String =
    s"""WITH terms AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
       |  FROM documents
       |), tc AS (
       |  SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY doc_id, term
       |), dl AS (
       |  SELECT doc_id, count(*) AS n_terms FROM terms GROUP BY doc_id
       |), idf AS (
       |  SELECT term, count(*) AS df FROM tc GROUP BY term
       |), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
       |SELECT tc.doc_id, tc.term, tc.cnt, idf.df,
       |       (CAST(tc.cnt AS DOUBLE) / dl.n_terms)
       |         * ln(CAST(n.n_docs AS DOUBLE) / idf.df) AS tfidf
       |FROM tc JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN n
       |WHERE tc.cnt >= $minCount""".stripMargin

  // Kept to the regex subset shared by Java (Spark) and RE2 (DuckDB):
  // no lookaround, no backrefs.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[^ \\t\\n]+"
  // group 1 = host[:port]; same char-class convention as urlRe so the
  // literal renders identically through Spark's escaped string parser
  // and DuckDB's raw strings (both resolve \t\n inside the class)
  private val urlHostRe = "https?://([^/ \\t\\n]+)"

  /** PII/URL scrubbing — the standard pre-training redaction pass:
    * emails and URLs replaced with sentinel tokens, with counts and the
    * digest of the redacted text for byte-exact verification. Pure
    * projections, embarrassingly parallel. */
  def redact(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).as("n_emails"),
      regexp_count(col("text"), lit(urlRe)).as("n_urls"),
      md5(regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
        urlRe, "<URL>")).as("redacted_md5"))

  val redactSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$emailRe')) AS n_emails,
       |  len(regexp_extract_all(text, '$urlRe')) AS n_urls,
       |  md5(regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
       |      '$urlRe', '<URL>', 'g')) AS redacted_md5
       |FROM documents""".stripMargin

  /** Repetition signals (Gopher-style quality rules): fraction of the
    * doc taken by its most frequent word, and the distinct-word ratio.
    * One explode + per-(doc, word) count + per-doc max — two partial
    * aggregations, no joins against raw text. */
  def repetition(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        (max(col("c")).cast("double") / sum(col("c"))).as("top_word_frac"),
        (count(lit(1)).cast("double") / sum(col("c"))).as("distinct_ratio"))
  }

  val repetitionSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w
      |)
      |SELECT doc_id,
      |       CAST(max(c) AS DOUBLE) / sum(c) AS top_word_frac,
      |       CAST(count(*) AS DOUBLE) / sum(c) AS distinct_ratio
      |FROM c GROUP BY doc_id""".stripMargin

  /** Corpus-level statistics report: doc count, token totals, and
    * exact interpolated percentiles of per-doc token counts (Spark
    * `percentile` == DuckDB `quantile_cont`). One narrow aggregation —
    * the shape of every "corpus card" summary at any scale. */
  /**
   * Per-language vocabulary size with an HLL++ cardinality sketch —
   * the 100-TB path for "how many distinct tokens does each slice
   * have" (the exact `count(DISTINCT)` shuffles every distinct token;
   * the sketch is a few KB per group, mergeable map-side, one pass).
   * Like the approx-quantile escape hatches, the query VERIFIES the
   * sketch's declared contract in-engine and emits the verdict next
   * to the exact count: `|apx − exact| ≤ 4·rsd·exact` (HLL++'s rsd is
   * a standard deviation; 4σ makes the check deterministic in
   * practice), so the DuckDB oracle pins structure + verdict (TRUE
   * everywhere) rather than sketch internals DuckDB cannot replay.
   * At production scale you run ONLY the sketch agg; the exact twin
   * here is the test-scale verification, the same trade
   * [[graft.ts.Quantiles.bucketQuantilesApproxChecked]] makes.
   */
  def vocabApproxChecked(docs: DataFrame, rsd: Double = 0.05): DataFrame = {
    require(rsd > 0 && rsd < 0.4, s"rsd $rsd outside HLL++'s supported range")
    docs.select(col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("n_vocab"),
        approx_count_distinct(col("tok"), rsd).as("apx"))
      // the relative error rides along as a NUMERIC column so a
      // tolerance miss is diagnosable (ADVICE r11: a verdict-only
      // column pinned TRUE by an oracle turns a legitimate 4-sigma
      // miss into an opaque hash failure — the bound is asserted in
      // PipelineSpec instead, and the hash-checked query carries only
      // the deterministic columns)
      .select(col("lang"), col("n_vocab"),
        (abs(col("apx") - col("n_vocab")) / col("n_vocab")).as("rsd_err"),
        (abs(col("apx") - col("n_vocab")) <=
          lit(4 * rsd) * col("n_vocab")).as("rsd_ok"))
  }

  /** Oracle twin of [[vocabApproxChecked]]'s DETERMINISTIC columns
    * (the sketch verdict/margin are spec-asserted, not hash-checked —
    * a probabilistic miss must read as a tolerance failure, not an
    * engine mismatch). */
  val vocabApproxCheckedSql: String =
    """SELECT lang, count(DISTINCT tok) AS n_vocab
      |FROM (
      |  SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |  FROM documents)
      |GROUP BY lang""".stripMargin

  /**
   * Heavy-hitter words with a Count-Min sketch check — the third
   * sketch in the escape-hatch family (Bloom for membership in
   * [[CorpusPipeline.contaminationBloom]], HLL++ for cardinality in
   * [[vocabApproxChecked]], CMS here for FREQUENCY): at 100 TB the
   * exact word-frequency table is vocabulary-sized, while the sketch
   * is eps⁻¹·ln(1/δ) counters, mergeable map-side, ONE pass; heavy
   * hitters are then read off the sketch for a candidate set.
   * Test-scale verification: the exact top-k (count desc, word asc —
   * deterministic row_number rule) is computed next to the sketch
   * estimate of each winner, and the CMS contract — an OVERESTIMATE
   * by at most eps·N (w.p. ≥ confidence; fixed seed ⇒ deterministic
   * here) — is emitted as a verdict the oracle pins TRUE, alongside
   * the exact counts it can replay.
   */
  def heavyHittersApprox(
      docs: DataFrame, k: Int = 20,
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    require(k > 0 && eps > 0 && confidence > 0 && confidence < 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(
      explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
    val cms = toks.stat.countMinSketch("word", eps, confidence, 42)
    val total = cms.totalCount()
    val est = udf((w: String) => cms.estimateCount(w))
    // top-k via sort+limit = TakeOrderedAndProject (per-partition
    // top-k + driver merge, never a single-partition vocab sort); the
    // row_number window then ranks only the k survivors. The UDF runs
    // on k rows — the one place a driver-held sketch can be probed.
    val top = toks.groupBy(col("word")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("word").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_exact").desc, col("word").asc)
    // cms_over = estimate − exact (the CMS overestimate, bounded by
    // ceil(eps·N) w.p. >= confidence): numeric so a tolerance miss is
    // diagnosable; the bound itself is asserted in PipelineSpec, and
    // the hash-checked query carries only the deterministic columns
    top
      .withColumn("rnk", row_number().over(w))
      .withColumn("e", est(col("word")))
      .select(col("word"), col("n_exact"), col("rnk"),
        (col("e") - col("n_exact")).as("cms_over"),
        (col("e") >= col("n_exact") &&
          col("e") <= col("n_exact") + lit(math.ceil(eps * total).toLong))
          .as("cms_ok"))
  }

  /** Oracle twin of [[heavyHittersApprox]]'s DETERMINISTIC columns
    * (exact top-k under the same tie rule; the sketch verdict/margin
    * are spec-asserted, not hash-checked). */
  def heavyHittersApproxSql(k: Int = 20): String =
    s"""SELECT word, n_exact, rnk FROM (
       |  SELECT word, count(*) AS n_exact,
       |    row_number() OVER (ORDER BY count(*) DESC, word ASC) AS rnk
       |  FROM (
       |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
       |    FROM documents)
       |  GROUP BY word)
       |WHERE rnk <= $k""".stripMargin

  def corpusStats(docs: DataFrame): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+")).cast("double")
    docs.select(col("doc_id"), nTok.as("n_tokens"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        avg(col("n_tokens")).as("mean_tokens"),
        expr("percentile(n_tokens, 0.5)").as("p50_tokens"),
        expr("percentile(n_tokens, 0.9)").as("p90_tokens"),
        expr("percentile(n_tokens, 0.99)").as("p99_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
  }

  val corpusStatsSql: String =
    """WITH t AS (
      |  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tokens
      |  FROM documents
      |)
      |SELECT count(*) AS n_docs, sum(n_tokens) AS total_tokens,
      |       avg(n_tokens) AS mean_tokens,
      |       quantile_cont(n_tokens, 0.5) AS p50_tokens,
      |       quantile_cont(n_tokens, 0.9) AS p90_tokens,
      |       quantile_cont(n_tokens, 0.99) AS p99_tokens,
      |       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
      |FROM t""".stripMargin

  /**
   * Unigram negative log-likelihood per document (bits/token) against
   * the corpus' own word distribution — the CCNet/Wikipedia-LM
   * "perplexity filter" shape with the simplest possible model:
   * p(w) = corpus_count(w) / corpus_tokens, doc score =
   * -mean(log2 p(w)). Low = boilerplate made of very common words,
   * high = rare-word soup; both tails get filtered in practice.
   *
   * Scale shape: word frequencies are ONE aggregation (map-side
   * combined, vocab-sized result); the score join is keyed by the word
   * — a scalar-keyed shuffle join, deliberately NOT a broadcast
   * (vocabulary is corpus-sized, the exact tfIdf lesson); the per-doc
   * reduce is a third map-side-combined aggregation. The corpus token
   * total is one driver scalar.
   */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    // the vocab-sized aggregate is materialized ONCE (review r04: the
    // driver-side total action would otherwise run the whole
    // tokenize+aggregate subtree and the score join would re-run it)
    val freq = words.groupBy(col("w")).agg(count(lit(1)).as("cw")).localCheckpoint()
    // total tokens from the vocab aggregate — not a second
    // tokenize-the-corpus pass (sum of per-word counts == token count)
    val total = freq.agg(sum(col("cw"))).head().getLong(0)
    words.join(freq, Seq("w"))
      .groupBy(col("doc_id"))
      .agg((-avg(log2(col("cw").cast("double") / total.toDouble))).as("nll_bits"),
        count(lit(1)).as("n_tokens"))
  }

  val unigramLogProbSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      |  FROM documents
      |), f AS (
      |  SELECT w, count(*) AS cw FROM w GROUP BY w
      |), t AS (SELECT count(*) AS total FROM w)
      |SELECT doc_id, -avg(log2(cw / CAST(total AS DOUBLE))) AS nll_bits,
      |       count(*) AS n_tokens
      |FROM w JOIN f USING (w) CROSS JOIN t GROUP BY doc_id""".stripMargin

  /**
   * Interpolated bigram negative log-likelihood per document
   * (bits/token) against the corpus' own bigram distribution — the
   * CCNet/KenLM "perplexity filter" one model order up from
   * [[unigramLogProb]]: each token is predicted from its predecessor
   * (BOS sentinel for the first), with unigram interpolation so
   * unseen-in-context mass never zeroes out:
   *
   *   p(w | prev) = λ · c(prev,w)/c(prev,·)  +  (1−λ) · c(w)/T
   *   nll2_bits   = −mean(log2 p)  over the doc's positions
   *
   * Trained on the corpus being scored (every observed bigram has
   * count ≥ 1, so p > 0 without further smoothing); docs whose word
   * order is unlike the corpus (shuffled spam, boilerplate soup)
   * score high even when their vocabulary looks normal — exactly the
   * signal the unigram model cannot see.
   *
   * Scale shape: pair extraction is one window-lag per doc (shuffle
   * by doc_id); the bigram table is ONE map-side-combined aggregation
   * materialized once, from which context and unigram counts derive
   * (vocab-bounded aggs, no second corpus pass); the score is a
   * chain of word-keyed shuffle joins — deliberately NOT broadcasts
   * (bigram vocabulary is corpus-sized, the tfIdf lesson) — and a
   * final per-doc reduce. T is one driver scalar.
   */
  def bigramLogProb(docs: DataFrame, lambda: Double = 0.7): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda $lambda outside (0, 1)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = docs.select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "w")))
      .select(col("doc_id"),
        coalesce(lag(col("w"), 1).over(w), lit("<s>")).as("prev"), col("w"))
    val big = pairs.groupBy(col("prev"), col("w"))
      .agg(count(lit(1)).as("c2")).localCheckpoint()
    val ctx = big.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
    val uni = big.groupBy(col("w")).agg(sum(col("c2")).as("cw"))
    val total = big.agg(sum(col("c2"))).head().getLong(0).toDouble
    pairs.join(big, Seq("prev", "w")).join(ctx, Seq("prev")).join(uni, Seq("w"))
      .groupBy(col("doc_id"))
      .agg((-avg(log2(
          lit(lambda) * col("c2") / col("c1") +
          lit(1 - lambda) * col("cw") / total))).as("nll2_bits"),
        count(lit(1)).as("n_tokens"))
  }

  def bigramLogProbSql(lambda: Double = 0.7): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w,
       |    generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos
       |  FROM documents
       |), pairs AS (
       |  SELECT doc_id,
       |    coalesce(lag(w) OVER (PARTITION BY doc_id ORDER BY pos), '<s>') AS prev,
       |    w
       |  FROM toks
       |), big AS (SELECT prev, w, count(*) AS c2 FROM pairs GROUP BY prev, w),
       |ctx AS (SELECT prev, sum(c2) AS c1 FROM big GROUP BY prev),
       |uni AS (SELECT w, sum(c2) AS cw FROM big GROUP BY w),
       |t AS (SELECT CAST(sum(c2) AS DOUBLE) AS total FROM big)
       |SELECT doc_id,
       |  -avg(log2($lambda * c2 / c1 + ${1 - lambda} * cw / total)) AS nll2_bits,
       |  count(*) AS n_tokens
       |FROM pairs JOIN big USING (prev, w) JOIN ctx USING (prev)
       |  JOIN uni USING (w) CROSS JOIN t
       |GROUP BY doc_id""".stripMargin

  /** Per-domain URL frequency across the corpus: extract every URL
    * host, count by (lowercased) domain, top-k with a deterministic
    * tie-break — the domain-blocklist / source-mix curation signal.
    * One explode + one aggregation; the regex group is the host. */
  def domainFrequency(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(expr(
        s"regexp_extract_all(text, '$urlHostRe', 1)")).as("domain"))
      .select(lower(col("domain")).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("domain").asc)
      .limit(k)

  /** `extraTexts`: literal documents planted identically on both sides
    * (the fixture's synthetic text carries no URLs, and a 0 == 0 match
    * discriminates nothing). */
  /** Single-quote escaping for planted literals interpolated into the
    * DuckDB oracle (ADVICE r04: an apostrophe in a plant text would
    * otherwise produce invalid SQL). Backslashes are NOT escaped on
    * purpose — DuckDB string literals don't process them, and plants
    * avoid them so the Spark side needs no mirroring escape. */
  private def sqlLit(t: String): String = t.replace("'", "''")

  def domainFrequencySql(k: Int, extraTexts: Seq[String] = Nil): String = {
    val extra =
      if (extraTexts.isEmpty) ""
      else "\n  UNION ALL SELECT * FROM (VALUES " +
        extraTexts.map(t => s"('${sqlLit(t)}')").mkString(", ") + ") v(text)"
    s"""SELECT domain, count(*) AS n FROM (
       |  SELECT lower(unnest(regexp_extract_all(text, '$urlHostRe', 1))) AS domain
       |  FROM (SELECT text FROM documents$extra))
       |GROUP BY domain ORDER BY n DESC, domain ASC LIMIT $k""".stripMargin
  }

  /** Character-distribution Shannon entropy per document (bits/char)
    * plus the distinct-character count — the classic gibberish /
    * boilerplate / encoding-junk signal (low entropy = repeated
    * characters, high = random bytes; natural language sits ~4 bits).
    * Computed as log2(T) - sum(c*log2(c))/T over per-char counts, the
    * exact same formula the oracle evaluates — no reliance on either
    * engine's built-in entropy aggregate. Two map-side-combined
    * aggregations; shuffle keys are (doc_id, char) then doc_id. */
  def charEntropy(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(expr("regexp_extract_all(text, '[\\\\s\\\\S]', 0)")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        (log2(sum(col("c"))) -
          sum(col("c") * log2(col("c"))) / sum(col("c"))).as("entropy_bits"),
        count(lit(1)).as("distinct_chars"))

  /** `extraDocs`: literal documents planted identically on both sides.
    * ADVICE r04 flagged a potential UTF-16-unit vs codepoint mismatch
    * for non-BMP characters — both engines are in fact codepoint-based
    * (java.util.regex matches supplementary characters as single units;
    * DuckDB's RE2 classes match one codepoint), and the planted astral
    * text in SparkEntry keeps the differential discriminating on it. */
  def charEntropySql(extraDocs: Seq[(Long, String)] = Nil): String = {
    val extra =
      if (extraDocs.isEmpty) ""
      else "\n  UNION ALL SELECT * FROM (VALUES " +
        extraDocs.map { case (id, t) => s"($id::BIGINT, '${sqlLit(t)}')" }
          .mkString(", ") + ") v(doc_id, text)"
    s"""WITH ch AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch
       |  FROM (SELECT doc_id, text FROM documents$extra)
       |), c AS (
       |  SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch
       |)
       |SELECT doc_id,
       |       log2(sum(c)) - sum(c * log2(c)) / sum(c) AS entropy_bits,
       |       count(*) AS distinct_chars
       |FROM c GROUP BY doc_id""".stripMargin
  }

  /**
   * Per-source distribution divergence — the corpus-MIX health metric:
   * KL(source ‖ corpus) and Jensen-Shannon divergence of each source's
   * unigram distribution against the whole corpus, over the top-`topN`
   * corpus vocabulary with add-`alpha` smoothing. A source whose
   * distribution sits far from the pool (templated boilerplate, a
   * different language, machine output) shows up as a KL/JS outlier —
   * the quantitative input to mix reweighting that langid/quality
   * scores only proxy.
   *
   * Plan shape: ONE tokenize pass feeds (a) the corpus wordcount whose
   * top-N head is a distributed TakeOrderedAndProject (no global
   * sort), and (b) the (source, word) counts restricted by a broadcast
   * vocab semi-join. The probability grid is sources × topN — QUERY-
   * bounded, never corpus-sized — so its per-source analytic window
   * and the final agg are free; smoothing (alpha > 0) keeps every
   * log argument strictly positive.
   *
   * Output: `(source, n_tokens, kl_div, js_div)` with n_tokens the
   * vocab-restricted token count of the source.
   *
   * Hash stability: the kl/js floats are a 200-500-term reduction of
   * `p·log(p/q)` terms — `log` is NOT IEEE-correctly-rounded (libm
   * builds differ by an ulp on identical inputs) and the sum order is
   * engine-defined, so this output can never be made bit-stable
   * across engines. (The r14/r15 driver reds on this family were in
   * fact uncast HUGEINT sums in the oracle twin, since CAST back —
   * but the log-sum hazard stands on its own, so the moments carrier
   * stays.) The oracle-hashed carrier for this operator is therefore
   * [[sourceDivergenceMoments]] — the exact integer grid the scores
   * derive from — per the round-12 explicit-moments convention; this
   * scores view keeps the family's round-9 display convention and is
   * differentially spec-tested with tolerance instead.
   */
  def sourceDivergence(docs: DataFrame, topN: Int = 500,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha $alpha must be > 0 (smoothing)")
    val denomAdd = alpha * topN
    val scored = sourceDivergenceMoments(docs, topN)
      .withColumn("p", (col("n_sw") + alpha) / (col("n_s") + denomAdd))
      .withColumn("q", (col("n_w") + alpha) / (col("n_tot") + denomAdd))
      .withColumn("m", (col("p") + col("q")) / 2)
    scored.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        round(sum(col("p") * log(col("p") / col("q"))), 9).as("kl_div"),
        round(sum(col("p") * log(col("p") / col("m"))
          + col("q") * log(col("q") / col("m"))) / 2, 9).as("js_div"))
  }

  /**
   * The exact integer moments grid behind [[sourceDivergence]]: one
   * row per (source, top-N vocab word) with the raw counts every
   * smoothed divergence derives from — `n_sw` (word count within the
   * source), `n_w` (corpus count of the word), `n_s` (vocab-restricted
   * token count of the source), `n_tot` (total vocab-restricted corpus
   * tokens). All columns are strings/integers, so the output is
   * bit-stable across engines BY CONSTRUCTION — this is the operator's
   * driver-hashed carrier (round-12 explicit-moments convention; see
   * [[sourceDivergence]]'s scaladoc for why the log-sum scores can't
   * be). Vocabulary selection is deterministic: top-N by corpus count,
   * ties broken by word ascending. The grid is sources × topN —
   * query-bounded, never corpus-sized.
   */
  def sourceDivergenceMoments(docs: DataFrame, topN: Int = 500): DataFrame = {
    require(topN >= 1, s"topN $topN must be >= 1")
    val words = docs.select(col("source"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
    val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("n_w"))
      .orderBy(col("n_w").desc, col("word").asc).limit(topN)
    val tot = vocab.agg(sum(col("n_w")).as("n_tot"))
    val sources = docs.select(col("source")).distinct()
    val cs = words.join(broadcast(vocab.select(col("word"))), Seq("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("n_sw"))
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    sources.crossJoin(broadcast(vocab))
      .join(cs, Seq("source", "word"), "left")
      .withColumn("n_sw", coalesce(col("n_sw"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("n_s", sum(col("n_sw")).over(wSrc))
      .select(col("source"), col("word"), col("n_sw"), col("n_w"),
        col("n_s"), col("n_tot"))
  }

  /** DuckDB oracle twin of [[sourceDivergence]] (ln = natural log in
    * both engines; the identical smoothing constants are injected as
    * the same double literal on both sides). */
  def sourceDivergenceSql(topN: Int = 500, alpha: Double = 0.5,
      docsRel: String = "documents"): String = {
    val denomAdd = alpha * topN
    s"""WITH mom AS (
       |${sourceDivergenceMomentsSql(topN, docsRel).replace("\n", "\n  ")}
       |), scored AS (
       |  SELECT source, n_s, p, q, (p + q) / 2 AS m FROM (
       |    SELECT source, n_s,
       |      (n_sw + $alpha) / (n_s + $denomAdd) AS p,
       |      (n_w + $alpha) / (n_tot + $denomAdd) AS q
       |    FROM mom
       |  )
       |)
       |SELECT source, max(n_s) AS n_tokens,
       |  round(sum(p * ln(p / q)), 9) AS kl_div,
       |  round(sum(p * ln(p / m) + q * ln(q / m)) / 2, 9) AS js_div
       |FROM scored GROUP BY source""".stripMargin
  }

  /** DuckDB oracle twin of [[sourceDivergenceMoments]] — the
    * driver-hashed integer-moments carrier. */
  def sourceDivergenceMomentsSql(topN: Int = 500,
      docsRel: String = "documents"): String = {
    require(topN >= 1, s"topN $topN must be >= 1")
    s"""WITH words AS (
       |  SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
       |  FROM $docsRel
       |), vocab AS (
       |  SELECT word, count(*) AS n_w FROM words
       |  GROUP BY word ORDER BY n_w DESC, word ASC LIMIT $topN
       |), tot AS (
       |  SELECT CAST(sum(n_w) AS BIGINT) AS n_tot FROM vocab
       |), srcs AS (
       |  SELECT DISTINCT source FROM $docsRel
       |), cs AS (
       |  SELECT source, word, count(*) AS n_sw FROM words
       |  WHERE word IN (SELECT word FROM vocab) GROUP BY 1, 2
       |), grid AS (
       |  SELECT s.source, v.word, v.n_w, coalesce(c.n_sw, 0) AS n_sw, t.n_tot
       |  FROM srcs s CROSS JOIN vocab v CROSS JOIN tot t
       |  LEFT JOIN cs c ON c.source = s.source AND c.word = v.word
       |)
       |SELECT source, word, n_sw, n_w,
       |  CAST(sum(n_sw) OVER (PARTITION BY source) AS BIGINT) AS n_s, n_tot
       |FROM grid""".stripMargin
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercase
    * text — the canonical exact-dedup key. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(normText(col("text"))).as("fp"))

  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  val fingerprintSql: String =
    """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |FROM documents""".stripMargin
}
