package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Binary (sign) quantization — the 1-bit-per-dimension extreme of the
 * ANN compression spectrum next to [[SQ]] (8 bits/dim) and [[PQ]]
 * (sub-byte codebooks): each dimension binarizes against its corpus
 * MEAN (`bit_i = x_i > mu_i`, the zero-training baseline of the
 * binary-hashing literature), candidates rank by HAMMING distance.
 * 64-dim float32 embeddings become two 32-bit words — 16× smaller
 * than the raw vectors, and distance evaluation is two XOR+popcount
 * instructions instead of 64 multiply-adds. The recall row
 * (ann_recall_binary) prices exactly what that buys and costs.
 *
 * Scale shape: the "model" is dim round-9 means (one posexplode agg);
 * encoding is one aggregation to ceil(dim/32) packed words per vector
 * (32 bits per word — no sign-bit/overflow edge at any dimension);
 * search joins the packed corpus against the BROADCAST query words on
 * word index and map-side-combines the per-pair popcount sum — ONE
 * scan of the 16-byte codes, never the raw embeddings, all queries in
 * one pass (the [[Similarity.bruteForceTopK]] contract). No driver
 * action anywhere — the builder is TVF-spliceable.
 *
 * Determinism contract: means are round-9 (bit-identical thresholds
 * across engines — the grid-average convention); Hamming is exact
 * integer arithmetic; ties rank to the lowest neighbor id. The
 * engines' different unnest bases (0- vs 1-based) are harmless by
 * construction: Hamming is the total count of differing dimension
 * bits, independent of the packing layout, which only needs to be
 * internally consistent per engine.
 */
object BQ {

  private def corpus(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** `(vec_id, widx, word)` — the packed sign codes, 32 bits per
    * word, thresholds = broadcast round-9 per-dimension means. */
  private def encoded(embs: DataFrame): DataFrame = {
    val c = corpus(embs)
    val means = c
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(round(avg(col("x")), 9).as("mu"))
    val bit: Column = when(
      col("x") > col("mu"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"))
      .otherwise(lit(0L))
    c.select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .join(broadcast(means), Seq("pos"))
      .groupBy(col("vec_id"), floor(col("pos") / 32).cast("long").as("widx"))
      .agg(sum(bit).as("word"))
  }

  /**
   * Top-k by Hamming distance between packed sign codes:
   * `(query_id, neighbor_id, hdist, rank)`. Queries are an in-corpus
   * id set whose code rows broadcast; self excluded; ties to the
   * lowest neighbor id. An id set resolving to no corpus vectors
   * yields an empty result (no driver-side existence check — the
   * plan-only discipline).
   */
  def hammingTopK(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    require(queryIds.nonEmpty, "BQ.hammingTopK needs at least one query id")
    require(k >= 1, s"k $k must be >= 1")
    val enc = encoded(embs)
    val q = enc.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("widx"),
        col("word").as("qword"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hdist").asc, col("neighbor_id").asc)
    enc.join(broadcast(q), Seq("widx"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(bit_count(col("word").bitwiseXOR(col("qword")))).as("hdist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * Two-stage serving search — the production binary-index shape:
   * the packed-code Hamming scan shortlists `shortlist` candidates
   * per query (cheap: 16-byte codes, popcount), then ONLY the
   * shortlist's raw vectors are fetched and re-ranked by exact
   * cosine. At 100 TB the raw-embedding fetch is bounded by
   * shortlist × queries — the corpus-sized pass touches nothing but
   * the codes. Output matches [[Similarity.bruteForceTopK]]'s shape
   * (`query_id, neighbor_id, cos, rank`), so the shared recall
   * evaluator scores the two-stage trade directly; with shortlist =
   * corpus the result IS the brute-force ranking (spec-pinned).
   */
  def rerankTopK(embs: DataFrame, queryIds: Seq[Long], k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist $shortlist must be >= k $k (stage 2 only re-orders)")
    val cand = hammingTopK(embs, queryIds, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val corpus = embs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", graft.functions.VecNorm(col("v")))
    val queries = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    corpus.join(broadcast(cand), col("vec_id") === col("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VecDot(col("v"), col("qv"))
          / (col("norm") * col("qnorm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** DuckDB oracle twin of [[rerankTopK]] — the Hamming shortlist CTE
    * feeding the exact-cosine re-rank. */
  def rerankTopKSql(queryIds: Seq[Long], k: Int, shortlist: Int): String =
    s"""WITH cand AS (
       |${hammingTopKSql(queryIds, shortlist).replace("\n", "\n  ")}
       |), scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    list_cosine_similarity(
       |      CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS cos
       |  FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.neighbor_id
       |  JOIN embeddings q ON q.vec_id = c.query_id
       |)
       |SELECT query_id, neighbor_id, cos, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin

  /** DuckDB oracle twin of [[hammingTopK]] — means, packing, popcount
    * and ranking all re-derived relationally. */
  def hammingTopKSql(queryIds: Seq[Long], k: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), u AS (
       |  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e
       |), m AS (
       |  SELECT pos, round(avg(x), 9) AS mu FROM u GROUP BY pos
       |), w AS (
       |  SELECT vec_id, CAST(floor(pos / 32) AS BIGINT) AS widx,
       |    sum(CASE WHEN x > mu
       |        THEN (CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER))
       |        ELSE 0 END) AS word
       |  FROM u JOIN m USING (pos) GROUP BY 1, 2
       |), q AS (
       |  SELECT vec_id AS query_id, widx, word AS qword FROM w
       |  WHERE vec_id IN (${queryIds.mkString(", ")})
       |), s AS (
       |  SELECT q.query_id, w.vec_id AS neighbor_id,
       |    CAST(sum(bit_count(xor(w.word, q.qword))) AS BIGINT) AS hdist
       |  FROM w JOIN q USING (widx)
       |  WHERE w.vec_id <> q.query_id
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, hdist, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY hdist ASC, neighbor_id ASC) AS rank
       |  FROM s)
       |WHERE rank <= $k""".stripMargin
}
