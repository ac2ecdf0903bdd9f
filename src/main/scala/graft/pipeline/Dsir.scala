package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection via importance resampling (Xie et al.
 * 2023, "Data Selection for Language Models via Importance
 * Resampling"): score every raw document by how much more likely its
 * hashed-unigram profile is under a TARGET distribution (documents
 * matching `targetPred`, e.g. a trusted high-quality subset) than
 * under the RAW corpus distribution, then keep the top `keepFrac` by
 * log importance weight.
 *
 *   weight(d) = Σ_tok log p̂_target(bucket(tok)) / p̂_raw(bucket(tok))
 *
 * with Laplace-smoothed bucket probabilities over `nBuckets` hashed
 * feature buckets. bucket(tok) = hi-32-bits-of-md5 % nBuckets — the
 * [[Dedup.md5Hash64]] convention, reproducible bit-for-bit in DuckDB.
 *
 * Scale design: BOTH bucket distributions come from one conditional
 * aggregation over the token stream (`count` + `count_if(is_target)`,
 * map-side combined, `nBuckets`-bounded output — no id join); the
 * ratio table (nBuckets rows) broadcasts into the scoring pass, which
 * is explode → broadcast-join → per-doc sum (one shuffle keyed by
 * doc_id, map-side combined). The selection threshold is an
 * exact percentile AGGREGATE over doc-level weights (partial/final, no
 * global sort); at 100 TB swap in `percentile_approx` — same plan
 * shape, mergeable sketch. Log weights are rounded to 9 decimals
 * before thresholding so duplicate documents (identical token
 * multisets summed in different partition orders) stay exactly tied —
 * the whole tie-class lands on the same side of the cut in any engine.
 */
object Dsir {

  private def bucketCol(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % nBuckets

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))

  /** `(doc_id, dsir_logweight)` for every document. */
  def logWeights(docs: DataFrame, targetPred: Column, nBuckets: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), targetPred.as("is_tgt"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"), col("is_tgt"),
        bucketCol(col("tok"), nBuckets).as("bucket"))
    // both distributions from ONE conditional aggregation pass —
    // nBuckets-bounded output, map-side combined, no id join
    val ratio = toks.groupBy(col("bucket")).agg(
      count(lit(1)).as("c_raw"),
      count_if(col("is_tgt")).as("c_tgt"))
    val totals = ratio.agg(
      sum(col("c_raw")).as("n_raw"), sum(col("c_tgt")).as("n_tgt"))
    val lr = ratio.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("c_tgt") + 1).cast("double") / (col("n_tgt") + nBuckets)) -
         log((col("c_raw") + 1).cast("double") / (col("n_raw") + nBuckets)))
          .as("logratio"))
    toks.select(col("doc_id"), col("bucket")).join(broadcast(lr), "bucket")
      .groupBy(col("doc_id"))
      .agg(round(sum(col("logratio")), 9).as("dsir_logweight"))
  }

  /** Documents whose log weight reaches the (1 - keepFrac) percentile
    * — `(doc_id, dsir_logweight)` of the kept set. Whole-tie-class
    * semantics at the cut (>= threshold). */
  def select(docs: DataFrame, targetPred: Column, nBuckets: Int,
      keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac < 1, "keepFrac in (0,1)")
    val w = logWeights(docs, targetPred, nBuckets)
    val thr = w.agg(
      expr(s"percentile(dsir_logweight, ${1 - keepFrac})").as("thr"))
    w.crossJoin(broadcast(thr)).filter(col("dsir_logweight") >= col("thr"))
      .select(col("doc_id"), col("dsir_logweight"))
  }

  /** DuckDB twin: same hash, same smoothing, same round-9 tie
    * collapse, quantile_cont == Spark exact percentile. `targetWhere`
    * is a SQL predicate over `documents` selecting the target set. */
  def selectSql(targetWhere: String, nBuckets: Int, keepFrac: Double): String = {
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % $nBuckets AS bucket
       |  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |        FROM documents)
       |), ratio AS (
       |  SELECT bucket, count(*) AS c_raw,
       |    count(*) FILTER (WHERE doc_id IN
       |      (SELECT doc_id FROM documents WHERE $targetWhere)) AS c_tgt
       |  FROM toks GROUP BY bucket
       |), lr AS (
       |  SELECT bucket,
       |    ln((c_tgt + 1) * 1.0 / ((SELECT sum(c_tgt) FROM ratio) + $nBuckets)) -
       |    ln((c_raw + 1) * 1.0 / ((SELECT sum(c_raw) FROM ratio) + $nBuckets))
       |      AS logratio
       |  FROM ratio
       |), w AS (
       |  SELECT doc_id, round(sum(logratio), 9) AS dsir_logweight
       |  FROM toks JOIN lr USING (bucket) GROUP BY doc_id
       |)
       |SELECT doc_id, dsir_logweight FROM w
       |WHERE dsir_logweight >=
       |  (SELECT quantile_cont(dsir_logweight, ${1 - keepFrac}) FROM w)"""
      .stripMargin
  }
}
