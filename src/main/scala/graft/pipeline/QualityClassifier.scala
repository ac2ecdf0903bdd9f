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
 * Scale design: the feature frame is built once (explode →
 * one (doc_id, bucket) hash aggregation, ONE shuffle) and persisted;
 * each GD step is: score pass (broadcast nBuckets+1 weights as a
 * literal map — zero extra shuffle on the feats partitioning), then a
 * gradient aggregation whose output is nBuckets+1 rows, map-side
 * combined; nBuckets+1 doubles come to the driver per iteration
 * (the k-means/[[PQ]] refinement shape — the corpus never moves, the
 * model does). At 100 TB: `iters` passes over the feature frame, each
 * a scan + tiny-key agg; train on a bounded hash-sample via the same
 * [[Sampling.hashOrderedSample]] draw if even that is too much.
 */
object QualityClassifier {

  private val BIAS = -1L

  private def bucketCol(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % nBuckets

  /** `(doc_id, y, bucket, x)` — L1-normalized hashed counts + the bias
    * row per document. */
  private[pipeline] def features(docs: DataFrame, labelPred: Column,
      nBuckets: Int): DataFrame = {
    val toks = docs.select(
      col("doc_id"), labelPred.cast("double").as("y"),
      size(split(trim(col("text")), "\\s+")).cast("double").as("n"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    val counts = toks
      .select(col("doc_id"), col("y"), col("n"),
        bucketCol(col("tok"), nBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("y"), col("n"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .select(col("doc_id"), col("y"), col("bucket"),
        (col("cnt") / col("n")).as("x"))
    val bias = docs.select(col("doc_id"), labelPred.cast("double").as("y"),
      lit(BIAS).as("bucket"), lit(1.0).as("x"))
    counts.unionByName(bias)
  }

  /** K deterministic full-batch GD steps; returns the final
    * `(bucket, weight)` table (bucket -1 = bias). */
  def train(docs: DataFrame, labelPred: Column, nBuckets: Int,
      iters: Int, lr: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = features(docs, labelPred, nBuckets).persist()
    try {
      val n = docs.count().toDouble
      // w as a driver-side map (nBuckets+1 doubles); buckets enter the
      // model the first time a gradient row mentions them (w=0 before)
      var w = Map.empty[Long, Double]
      for (_ <- 1 to iters) {
        val wmap = typedLit(w)
        val scored = feats
          .withColumn("ws", coalesce(element_at(wmap, col("bucket")), lit(0.0))
            * col("x"))
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(col("ws")).as("s"))
          .select(col("doc_id"),
            (lit(1.0) / (lit(1.0) + exp(-col("s"))) - col("y")).as("r"))
        val grad = feats.join(scored, "doc_id")
          .groupBy(col("bucket"))
          .agg((sum(col("r") * col("x")) / n).as("g"))
          .as[(Long, Double)].collect()
        w = grad.map { case (b, g) => b -> (w.getOrElse(b, 0.0) - lr * g) }.toMap
      }
      spark.createDataset(w.toSeq.sortBy(_._1)).toDF("bucket", "weight")
        .select(col("bucket"), round(col("weight"), 9).as("weight"))
    } finally feats.unpersist()
  }

  /** Documents the trained model ranks in the top `keepFrac` by score
    * — the quota operating point (a raw σ(s) >= 0.5 cut depends on
    * calibration the short GD run doesn't reach; production quality
    * gates pick the threshold from a kept-volume target anyway).
    * `(doc_id, clf_score)`, round-9 boundary collapse, whole-tie-class
    * at the cut. */
  def scoreFilter(docs: DataFrame, labelPred: Column, nBuckets: Int,
      iters: Int, lr: Double, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac < 1, "keepFrac in (0,1)")
    val wRows = train(docs, labelPred, nBuckets, iters, lr)
    val w = wRows.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wmap = typedLit(w)
    val scores = features(docs, labelPred, nBuckets)
      .withColumn("ws", coalesce(element_at(wmap, col("bucket")), lit(0.0))
        * col("x"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("ws")), 9).as("clf_score"))
    val thr = scores.agg(
      expr(s"percentile(clf_score, ${1 - keepFrac})").as("thr"))
    scores.crossJoin(broadcast(thr)).filter(col("clf_score") >= col("thr"))
      .select(col("doc_id"), col("clf_score"))
  }

  private def featsSql(labelWhere: String, nBuckets: Int): String =
    s"""feats AS (
       |  SELECT doc_id, y, bucket, count(*) * 1.0 / any_value(n) AS x
       |  FROM (
       |    SELECT doc_id,
       |      CASE WHEN $labelWhere THEN 1.0 ELSE 0.0 END AS y,
       |      len(regexp_split_to_array(trim(text), '\\s+')) AS n,
       |      ('0x' || substr(md5(unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))), 1, 8))::BIGINT % $nBuckets AS bucket
       |    FROM documents)
       |  GROUP BY doc_id, y, bucket
       |  UNION ALL
       |  SELECT doc_id, CASE WHEN $labelWhere THEN 1.0 ELSE 0.0 END, -1, 1.0
       |  FROM documents
       |), nn AS (SELECT count(*) * 1.0 AS n FROM documents)""".stripMargin

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
