package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Linear quality-classifier filtering — the fastText/CCNet-style gate
 * (and the GPT-3 data-quality LR filter shape): train a logistic
 * regression on L1-normalized hashed-unigram features with
 * deterministic full-batch gradient descent, then keep documents the
 * model scores positive.
 *
 *   x_d  = counts over `nBuckets` md5-hashed token buckets / n_tokens
 *          (+ a constant bias feature at bucket -1)
 *   w_0  = 0;  w_{k+1} = w_k - lr/N · Σ_d (σ(w_k·x_d) - y_d) x_d
 *
 * Everything is deterministic (zero init, fixed learning rate, fixed
 * iteration count, no RNG, no shuffling-order dependence beyond
 * float-sum association), so an independent engine can replay the
 * whole optimization — the DuckDB oracle unrolls the K gradient steps
 * as chained CTEs and must land on the same weights and the same kept
 * set.
 *
 * Scale design: the feature frame is built once (explode → ONE
 * shuffle by doc_id → count-agg → per-doc packed sparse vector, one
 * compact row per document) and persisted; each GD step is ONE scan
 * of that frame: the w·x dot product is a higher-order fold over the
 * packed array (broadcast nBuckets+1 weights as a literal map — no
 * join, no window, no shuffle), then a gradient aggregation whose
 * output is nBuckets+1 rows, map-side combined; nBuckets+1 doubles
 * come to the driver per iteration (the k-means/[[PQ]] refinement
 * shape — the corpus never moves, the model does). At 100 TB: `iters`
 * passes over the packed frame (≈ one row per doc), each a scan +
 * tiny-key agg; train on a bounded hash-sample via the same
 * [[Sampling.hashOrderedSample]] draw if even that is too much.
 */
object QualityClassifier {

  private val BIAS = -1L

  private def bucketCol(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % nBuckets

  /** `(doc_id, y, bucket, x)` — L1-normalized hashed token counts per
    * document. The r17 shape redistributes `docs` BEFORE the token
    * explode (the previous `repartition` sat on the exploded token
    * frame — every token row crossed the exchange, strictly more bytes
    * than the raw text, and the tokenize+md5 map work ran at the
    * scan's parallelism: ONE task on the single-row-group fixtures,
    * guide §2.3/§2.2). On the starved branch the fan-out exchange is
    * keyed by doc_id, so the count-agg, the packed-vector agg, the GD
    * scans and the score agg all reuse that one clustering; on the
    * identity branch (production-scale scan, ADVICE r17) the count-agg
    * keys by (doc_id, y, n, bucket) and [[docFeatures]]' per-doc
    * groupBy adds its own doc_id exchange — two exchanges of compact
    * count rows, still never the exploded token stream.
    *
    * The bias feature (bucket −1, x = 1.0) is no longer a unioned
    * synthetic row — [[docFeatures]] prepends it arithmetically when
    * packing (a union would erase the doc_id partitioning and cost two
    * extra exchanges). Consequence: a document yields rows iff it has
    * ≥ 1 token row, i.e. text is non-NULL (an empty/whitespace text
    * still tokenizes to one `""` token). The oracle SQL matches: its
    * bias-row union and doc count are restricted to `text IS NOT NULL`
    * (r18), so a NULL-text document vanishes from BOTH engines —
    * pinned by NullTextDifferentialSpec. */
  private[pipeline] def features(docs: DataFrame, labelPred: Column,
      nBuckets: Int): DataFrame =
    graft.Fanout.ifStarved(docs, col("doc_id"))
      .select(
        col("doc_id"), labelPred.cast("double").as("y"),
        size(split(trim(col("text")), "\\s+")).cast("double").as("n"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"), col("y"), col("n"),
        bucketCol(col("tok"), nBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("y"), col("n"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .select(col("doc_id"), col("y"), col("bucket"),
        (col("cnt") / col("n")).as("x"))

  /** `(doc_id, y, feats)` — each document's sparse feature vector
    * packed into ONE row as a bucket-sorted array<struct<bucket,x>>
    * with the bias element (bucket −1, x = 1.0) prepended. Built on
    * the [[features]] clustering (no extra shuffle for the
    * collect_list) and persisted by the callers; sort_array pins the
    * per-doc summation order — the bias bucket −1 sorts first, so the
    * prepend produces the exact array the old unioned-bias sort did —
    * and the dot products below stay bit-deterministic across runs and
    * partitionings (buckets are unique within a doc, all >= 0). */
  private def docFeatures(docs: DataFrame, labelPred: Column,
      nBuckets: Int): DataFrame =
    features(docs, labelPred, nBuckets)
      .groupBy(col("doc_id"), col("y"))
      .agg(concat(
        array(struct(lit(BIAS).as("bucket"), lit(1.0).as("x"))),
        sort_array(collect_list(struct(col("bucket"), col("x")))))
        .as("feats"))

  /** σ-input per doc: the sparse dot product w·x as a higher-order
    * fold over the packed array — a pure projection, no window, no
    * shuffle. */
  private def dotW(wmap: Column): Column =
    aggregate(col("feats"), lit(0.0), (acc, f) =>
      acc + coalesce(element_at(wmap, f.getField("bucket")), lit(0.0))
        * f.getField("x"))

  /** The GD loop over an already-persisted packed feature frame. Per
    * iteration ONE scan: the fold above scores each doc in place,
    * residual × feature per exploded row, then the nBuckets+1-row
    * map-side-combined gradient agg; nBuckets+1 doubles come to the
    * driver per step. The r9 shape (groupBy doc_id + join back on
    * doc_id) paid two extra shuffles of the feature frame per
    * iteration for the same numbers.
    *
    * DELIBERATELY a per-iteration driver action (re-examined r18): the
    * "one action per sweep" alternative — weights as a one-row map
    * frame, each level consuming the previous level's broadcast, one
    * head() at the end — was built and MEASURED 5× worse
    * (pipeline_classifier_weights 1.57→8.44 s, and the sample-bounded
    * variant 1.59→5.81 s, i.e. a ~4 s data-size-INDEPENDENT overhead:
    * five chained crossJoin+agg+broadcast levels cost more in
    * planning/codegen/AQE stage scheduling than the five ~0.1 s
    * collect jobs they remove). At 100 TB the per-iteration sync is
    * noise against the scan each step must do anyway. */
  private def gdLoop(docFeats: DataFrame, n: Double, iters: Int,
      lr: Double): Map[Long, Double] = {
    val spark = docFeats.sparkSession
    import spark.implicits._
    // w as a driver-side map (nBuckets+1 doubles); buckets enter the
    // model the first time a gradient row mentions them (w=0 before)
    var w = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      val wmap = typedLit(w)
      val grad = docFeats
        .select((lit(1.0) / (lit(1.0) + exp(-dotW(wmap))) - col("y"))
          .as("r"), explode(col("feats")).as("f"))
        .groupBy(col("f.bucket").as("bucket"))
        .agg((sum(col("r") * col("f.x")) / n).as("g"))
        .as[(Long, Double)].collect()
      w = grad.map { case (b, g) => b -> (w.getOrElse(b, 0.0) - lr * g) }.toMap
    }
    w
  }

  /** The per-process trained-model cache behind [[trainedWeights]] —
    * a production pipeline trains ONCE and serves many scoring/filter
    * passes; the harness's classifier queries mirror that by sharing
    * one model per (fixture, hyperparameter) key. The map holds
    * nBuckets+1 doubles per entry, nothing corpus-sized. */
  private val weightsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Long, Double]]()

  /** Test hook: drop every cached model. */
  private[graft] def clearCache(): Unit = weightsCache.clear()

  /** The full training pass (feature build + persist + GD loop) as a
    * driver-side weight map. `cacheKey = None` always retrains (the
    * bench's pipeline_classifier_weights row measures the real train
    * wall every rep); `Some(key)` trains once per process per
    * (key, labelPred, hyperparameters) and reuses — the
    * train-once/score-many production shape. The label predicate is
    * part of the cache key (its canonical SQL rendering): two callers
    * with the same fixture key but different label definitions train
    * different models. The caller-supplied `cacheKey` is assumed to
    * name IMMUTABLE content (a fixture path whose data never changes
    * in-process) — regenerating the data behind a live key serves
    * stale weights; use [[clearCache]] (tests) or a new key
    * (content-versioned paths) when data changes. */
  def trainedWeights(docs: DataFrame, labelPred: Column, nBuckets: Int,
      iters: Int, lr: Double,
      cacheKey: Option[String] = None): Map[Long, Double] = {
    def compute(): Map[Long, Double] = {
      val feats = docFeatures(docs, labelPred, nBuckets).persist()
      try {
        // one packed row per doc: counting feats materializes the cache
        // AND yields N — no separate corpus scan
        val n = feats.count().toDouble
        gdLoop(feats, n, iters, lr)
      } finally feats.unpersist()
    }
    cacheKey match {
      case Some(k) =>
        val predSql = org.apache.spark.sql.GraftColumnBridge
          .expression(labelPred).sql
        weightsCache.computeIfAbsent(
          s"$k|$predSql|$nBuckets|$iters|$lr", _ => compute())
      case None => compute()
    }
  }

  /** K deterministic full-batch GD steps; returns the final
    * `(bucket, weight)` table (bucket -1 = bias). */
  def train(docs: DataFrame, labelPred: Column, nBuckets: Int,
      iters: Int, lr: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = trainedWeights(docs, labelPred, nBuckets, iters, lr)
    spark.createDataset(w.toSeq.sortBy(_._1)).toDF("bucket", "weight")
      .select(col("bucket"), round(col("weight"), 9).as("weight"))
  }

  /** [[train]] on a bounded hash-ordered sample of the corpus — the
    * declared 100-TB escape hatch when even `iters` one-scan GD passes
    * over the full packed frame are too much. The draw is
    * [[Sampling.hashOrderedSample]] (md5-of-decimal-doc_id, which both
    * engines compute identically, so the oracle replays the exact
    * sample); everything after the draw — feature build, persist, GD —
    * is bounded by `sampleMax` rows. The sampled frame stays a plan
    * (TakeOrderedAndProject), NOT a driver collect: document rows
    * carry full text, and [[train]]'s persist already guarantees the
    * draw runs once. */
  def trainSampled(docs: DataFrame, labelPred: Column, nBuckets: Int,
      iters: Int, lr: Double, sampleMax: Int): DataFrame =
    train(Sampling.hashOrderedSample(docs, sampleMax, "doc_id"),
      labelPred, nBuckets, iters, lr)

  /** Documents the trained model ranks in the top `keepFrac` by score
    * — the quota operating point (a raw σ(s) >= 0.5 cut depends on
    * calibration the short GD run doesn't reach; production quality
    * gates pick the threshold from a kept-volume target anyway).
    * `(doc_id, clf_score)`, round-9 boundary collapse, whole-tie-class
    * at the cut. Features are built ONCE and shared between training
    * and final scoring (the r9 shape rebuilt the tokenize→hash→agg
    * chain from scratch to score); scores are localCheckpointed (one
    * compact row per doc) so the feature cache can be released before
    * the lazy threshold-filter result is consumed. */
  def scoreFilter(docs: DataFrame, labelPred: Column, nBuckets: Int,
      iters: Int, lr: Double, keepFrac: Double,
      cacheKey: Option[String] = None): DataFrame = {
    require(keepFrac > 0 && keepFrac < 1, "keepFrac in (0,1)")
    val scores = cacheKey match {
      case None =>
        // fresh train: features are built ONCE and shared between the
        // GD loop and final scoring
        val feats = docFeatures(docs, labelPred, nBuckets).persist()
        try {
          val n = feats.count().toDouble
          val w = gdLoop(feats, n, iters, lr)
          feats
            .select(col("doc_id"), round(dotW(typedLit(w)), 9).as("clf_score"))
            .localCheckpoint()
        } finally feats.unpersist()
      case key @ Some(_) =>
        // train-once/score-many: the model comes from the process
        // cache (trained on first use); scoring is one feature pass.
        // dotW never reads the label column, so the scores — and the
        // kept set — are bit-identical to the fresh-train route
        // (spec-pinned in SelectionPipelineSpec).
        val w = trainedWeights(docs, labelPred, nBuckets, iters, lr, key)
        docFeatures(docs, lit(false), nBuckets)
          .select(col("doc_id"), round(dotW(typedLit(w)), 9).as("clf_score"))
          .localCheckpoint()
    }
    val thr = scores.agg(
      expr(s"percentile(clf_score, ${1 - keepFrac})").as("thr"))
    scores.crossJoin(broadcast(thr)).filter(col("clf_score") >= col("thr"))
      .select(col("doc_id"), col("clf_score"))
  }

  /** Serving-side scoring with a CALLER-SUPPLIED weight table (bucket
    * −1 = bias) — the half of [[scoreFilter]] that needs no label
    * column and no GD loop, for when the model was trained elsewhere
    * (a prior [[train]]/[[trainSampled]] run, possibly on a sample).
    * One feature pass, zero driver actions — safe to splice from the
    * corpus_classifier_score TVF at analysis time. `(doc_id,
    * clf_score)` for every document WITH TEXT (a doc sharing no bucket
    * with the model scores 0.0 — never silently dropped; a NULL-text
    * doc has no features and no score row, on both engines). */
  def scoreWithWeights(docs: DataFrame, weights: Map[Long, Double],
      nBuckets: Int): DataFrame = {
    require(weights.nonEmpty, "scoreWithWeights needs at least one weight")
    docFeatures(docs, lit(false), nBuckets)
      .select(col("doc_id"), round(dotW(typedLit(weights)), 9).as("clf_score"))
  }

  /** DuckDB twin of [[scoreWithWeights]] — the weights as a VALUES
    * table, LEFT-joined so zero-overlap documents keep their 0.0. */
  def scoreWithWeightsSql(weights: Map[Long, Double], nBuckets: Int): String = {
    val vals = weights.toSeq.sortBy(_._1)
      .map { case (b, w) => s"($b, CAST($w AS DOUBLE))" }.mkString(", ")
    s"""WITH ${featsSql("FALSE", nBuckets)}, w(bucket, wt) AS (VALUES $vals)
       |SELECT doc_id, round(sum(coalesce(wt, 0.0) * x), 9) AS clf_score
       |FROM feats LEFT JOIN w USING (bucket) GROUP BY doc_id""".stripMargin
  }

  private def featsSql(labelWhere: String, nBuckets: Int,
      table: String = "documents"): String =
    // `text IS NOT NULL` on the bias branch and the doc count keeps
    // this aligned with the engine's no-union shape (r18, ADVICE r17):
    // a NULL-text document explodes to no token rows in BOTH engines,
    // so it must contribute no bias row and not inflate N either — the
    // engine's N is the packed-row count, which only covers documents
    // with at least one token row (any non-NULL text, even "",
    // tokenizes to >= 1 row). NullTextDifferentialSpec pins the
    // engine/oracle agreement on exactly this input class.
    s"""feats AS (
       |  SELECT doc_id, y, bucket, count(*) * 1.0 / any_value(n) AS x
       |  FROM (
       |    SELECT doc_id,
       |      CASE WHEN $labelWhere THEN 1.0 ELSE 0.0 END AS y,
       |      len(regexp_split_to_array(trim(text), '\\s+')) AS n,
       |      ('0x' || substr(md5(unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))), 1, 8))::BIGINT % $nBuckets AS bucket
       |    FROM $table)
       |  GROUP BY doc_id, y, bucket
       |  UNION ALL
       |  SELECT doc_id, CASE WHEN $labelWhere THEN 1.0 ELSE 0.0 END, -1, 1.0
       |  FROM $table WHERE text IS NOT NULL
       |), nn AS (SELECT count(*) * 1.0 AS n FROM $table WHERE text IS NOT NULL)""".stripMargin

  /** Unrolled-GD weight CTEs `w1..w$iters` over `feats`/`nn`. */
  private def gdSql(iters: Int, lr: Double): String = {
    val steps = new StringBuilder
    // step 1: w=0 everywhere -> sigmoid(0)=0.5, residual = 0.5 - y
    steps ++=
      s""", w1 AS (
         |  SELECT bucket, 0 - $lr * sum((0.5 - y) * x) / (SELECT n FROM nn) AS wt
         |  FROM feats GROUP BY bucket
         |)""".stripMargin
    for (k <- 2 to iters) {
      val p = k - 1
      steps ++=
        s""", s$k AS (
           |  SELECT doc_id, sum(wt * x) AS s
           |  FROM feats JOIN w$p USING (bucket) GROUP BY doc_id
           |), w$k AS (
           |  SELECT bucket,
           |    any_value(wt) - $lr * sum((1.0 / (1.0 + exp(-s)) - feats.y) * x)
           |      / (SELECT n FROM nn) AS wt
           |  FROM feats JOIN w$p USING (bucket) JOIN s$k USING (doc_id)
           |  GROUP BY bucket
           |)""".stripMargin
    }
    steps.toString
  }

  /** DuckDB twin of [[train]]. */
  def trainSql(labelWhere: String, nBuckets: Int, iters: Int,
      lr: Double): String =
    s"""WITH ${featsSql(labelWhere, nBuckets)}${gdSql(iters, lr)}
       |SELECT bucket, round(wt, 9) AS weight FROM w$iters""".stripMargin

  /** DuckDB twin of [[trainSampled]] — replays the md5-ordered draw
    * end-to-end, then the same unrolled GD over the sampled rows. */
  def trainSampledSql(labelWhere: String, nBuckets: Int, iters: Int,
      lr: Double, sampleMax: Int): String =
    s"""WITH sdocs AS (
       |  SELECT * FROM documents
       |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT $sampleMax
       |), ${featsSql(labelWhere, nBuckets, "sdocs")}${gdSql(iters, lr)}
       |SELECT bucket, round(wt, 9) AS weight FROM w$iters""".stripMargin

  /** DuckDB twin of [[scoreFilter]]. */
  def scoreFilterSql(labelWhere: String, nBuckets: Int, iters: Int,
      lr: Double, keepFrac: Double): String =
    s"""WITH ${featsSql(labelWhere, nBuckets)}${gdSql(iters, lr)}, sc AS (
       |  SELECT doc_id, round(sum(wt * x), 9) AS clf_score
       |  FROM feats JOIN w$iters USING (bucket) GROUP BY doc_id
       |)
       |SELECT doc_id, clf_score FROM sc
       |WHERE clf_score >=
       |  (SELECT quantile_cont(clf_score, ${1 - keepFrac}) FROM sc)"""
      .stripMargin
}
