package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SQ8 scalar quantization — the third compression point on the ANN
 * spectrum next to [[PQ]] (product quantization) and
 * [[Similarity]]'s IVF: each dimension is quantized independently to
 * an 8-bit code against per-dimension corpus bounds
 *
 *   code_i = clamp(⌊255·(x_i − lo_i)/(hi_i − lo_i) + 0.5⌋, 0, 255)
 *   dec_i  = lo_i + code_i·(hi_i − lo_i)/255
 *
 * (hi == lo degenerates to code 0), and search scores the L2 distance
 * between the raw query and the RECONSTRUCTED corpus vector — the
 * FAISS `SQ8` index semantics. Versus PQ: 1 byte/dim instead of
 * log2(ksub) bits per d-dim subspace (less compression), but training
 * is ONE aggregation pass (no Lloyd iterations) and decode is exact
 * per-dimension — the right trade when the corpus churns faster than
 * codebooks can be retrained.
 *
 * Scale shape: bounds = one posexplode + a dim-keyed map-side-combined
 * agg (dim rows to the driver — the "model" is 2·dim doubles);
 * encode = a zero-shuffle projection (bounds broadcast as literals);
 * search = one corpus pass over codes with broadcast queries + the
 * WindowGroupLimit partial top-k, the [[Similarity.bruteForceTopK]]
 * contract. Nothing iterates, nothing joins on the corpus.
 *
 * Determinism contract (oracle-replayable): floor(x + 0.5) rounding
 * (identical in both engines, unlike round()'s mode variance), clamp
 * after floor, ADC ties to the lowest neighbor id.
 */
object SQ {

  /** `lo(i)`/`hi(i)` = corpus min/max of dimension i. */
  final case class Bounds(lo: Array[Double], hi: Array[Double])

  private def corpus(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Per-dimension min/max in one pass: the dim-keyed agg output is
    * 2·dim doubles — the whole trained model. Full-corpus on purpose:
    * unlike Lloyd training this is a SINGLE scan (the irreducible
    * look-at-the-data cost), and sample-trained bounds would clip
    * out-of-sample outliers to the cube surface silently. */
  def trainBounds(embs: DataFrame): Bounds = {
    val rows = corpus(embs)
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("pos")).collect()
    Bounds(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  private def codeCol(b: Bounds): Column = {
    val loL = typedLit(b.lo.toSeq)
    val hiL = typedLit(b.hi.toSeq)
    transform(col("v"), (x, i) => {
      val lo = element_at(loL, i + 1)
      val hi = element_at(hiL, i + 1)
      when(hi === lo, lit(0L)).otherwise(
        least(lit(255L), greatest(lit(0L),
          floor(lit(255.0) * (x - lo) / (hi - lo) + lit(0.5)))))
    })
  }

  private def decodeCol(b: Bounds, codes: Column): Column = {
    val loL = typedLit(b.lo.toSeq)
    val hiL = typedLit(b.hi.toSeq)
    transform(codes, (c, i) => {
      val lo = element_at(loL, i + 1)
      val hi = element_at(hiL, i + 1)
      lo + c.cast("double") * (hi - lo) / lit(255.0)
    })
  }

  /** `(vec_id, codes)` — one uint8-range code per dimension, a pure
    * projection against the broadcast bounds. */
  def encode(embs: DataFrame, b: Bounds): DataFrame =
    corpus(embs).select(col("vec_id"), codeCol(b).as("codes"))

  /** Train + encode, exploded to `(vec_id, pos, code)` rows — the
    * dump/compare surface. */
  def codes(embs: DataFrame): DataFrame = {
    val b = trainBounds(embs)
    encode(embs, b)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("pos", "code")))
  }

  /**
   * Top-k by L2 between each raw query vector and the reconstructed
   * corpus: `(query_id, neighbor_id, adist, rank)`. Queries are a
   * bounded in-corpus id set, collected and broadcast as a literal
   * frame; the corpus is scanned ONCE — a single crossJoin against
   * the broadcast queries (the [[Similarity.bruteForceTopK]] shape),
   * not one branch per query. Self excluded, ties to the lowest
   * neighbor id.
   */
  def adcTopK(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val b = trainBounds(embs)
    val dec = encode(embs, b)
      .select(col("vec_id"), decodeCol(b, col("codes")).as("dec"))
    val qvecs = corpus(embs)
      .filter(col("vec_id").isInCollection(queryIds))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    require(qvecs.nonEmpty,
      s"SQ.adcTopK: none of the ${queryIds.size} query ids resolve in the corpus")
    val qdf = qvecs.toDF("query_id", "qv")
    val diff = zip_with(col("dec"), col("qv"), (a, qx) => a - qx)
    val scored = dec.crossJoin(broadcast(qdf))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.VecDot(diff, diff).as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * IVF-SQ8 (the FAISS `IVF,SQ8` index): a coarse quantizer restricts
   * each query to its `nProbe` highest-dot inverted lists, and the L2
   * scoring decodes ONLY the probed lists' SQ8 codes — [[PQ.ivfAdcTopK]]'s
   * pruning with [[adcTopK]]'s per-dimension reconstruction. The point
   * on the index spectrum: SQ8's exact per-dim decode (no codebook
   * training) with IVF's O(N·nProbe/|coarse|) search cost.
   *
   * Plan: ONE projection emits (codes, cid) and is checkpointed — the
   * search scans 1 byte/dim codes + a scalar list id, never raw
   * embeddings, and ALL queries ride ONE pass over it (broadcast
   * literal query frame carrying each query's probe list; the
   * [[adcTopK]] crossJoin shape, probed-list filter applied on the
   * scan). At deployment the code table is written `partitionBy(cid)`
   * and the probe filter becomes partition pruning, the
   * [[Similarity.ivfIndexTopK]] discipline. Coarse assignment ties to
   * the lowest cid; probe lists rank by dot, ties low — both
   * re-derived by the DuckDB oracle, so the pruning is hash-checked.
   */
  def ivfSq8TopK(
      embs: DataFrame, queryIds: Seq[Long], k: Int,
      coarse: Array[Array[Double]], nProbe: Int): DataFrame = {
    require(nProbe > 0 && nProbe <= coarse.length)
    require(coarse.forall(_.length == coarse.head.length),
      "ragged coarse codebook")
    val spark = embs.sparkSession
    import spark.implicits._
    val b = trainBounds(embs)
    val enc = corpus(embs).select(col("vec_id"), codeCol(b).as("codes"),
        graft.functions.NearestCentroid(col("v"), coarse).as("cid"))
      .localCheckpoint()
    val qvecs = corpus(embs)
      .filter(col("vec_id").isInCollection(queryIds))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      .sortBy(_._1)
    require(qvecs.nonEmpty,
      s"SQ.ivfSq8TopK: none of the ${queryIds.size} query ids resolve in the corpus")
    val qrows = qvecs.map { case (qid, q) =>
      val probes = coarse.zipWithIndex.map { case (cv, ci) =>
        require(cv.length == q.length,
          s"coarse centroid dim ${cv.length} != query dim ${q.length}")
        var s = 0.0
        var i = 0
        while (i < q.length) { s += q(i) * cv(i); i += 1 }
        (s, ci)
      }.sortBy { case (d, ci) => (-d, ci) }.take(nProbe).map(_._2).toSeq
      (qid, q.toSeq, probes)
    }
    val qdf = qrows.toDF("query_id", "qv", "probes")
    val diff = zip_with(decodeCol(b, col("codes")), col("qv"), (a, qx) => a - qx)
    val scored = enc.crossJoin(broadcast(qdf))
      .filter(array_contains(col("probes"), col("cid")) &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.VecDot(diff, diff).as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private val boundsCtes: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |), u AS (
      |  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e
      |), b AS (
      |  SELECT pos, min(x) AS lo, max(x) AS hi FROM u GROUP BY pos
      |), c AS (
      |  SELECT vec_id, pos,
      |    CASE WHEN hi = lo THEN 0
      |         ELSE least(255, greatest(0,
      |           CAST(floor(255 * (x - lo) / (hi - lo) + 0.5) AS BIGINT)))
      |    END AS code
      |  FROM u JOIN b USING (pos)
      |)""".stripMargin

  /** DuckDB twin of [[codes]]. */
  val codesSql: String =
    s"""$boundsCtes
       |SELECT vec_id, pos - 1 AS pos, code FROM c""".stripMargin

  /** DuckDB twin of [[ivfSq8TopK]] — bounds, codes, decode, coarse
    * assignment, probe lists and the restricted ranking all re-derived
    * relationally from the same centroid literals. */
  def ivfSq8TopKSql(
      queryIds: Seq[Long], k: Int,
      coarse: Array[Array[Double]], nProbe: Int): String = {
    val coarseRows = coarse.zipWithIndex.map { case (cv, ci) =>
      s"($ci, [${cv.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n       ")
    val qIn = queryIds.mkString(", ")
    s"""$boundsCtes, d AS (
       |  SELECT vec_id, pos, lo + code * (hi - lo) / 255.0 AS dx
       |  FROM c JOIN b USING (pos)
       |), cc(ccid, cv) AS (
       |  SELECT * FROM (VALUES
       |       $coarseRows)
       |), a AS (
       |  SELECT vec_id, ccid FROM (
       |    SELECT e.vec_id, cc.ccid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_inner_product(e.v, cc.cv) DESC, cc.ccid ASC) AS rn
       |    FROM e, cc) WHERE rn = 1
       |), p AS (
       |  SELECT query_id, ccid FROM (
       |    SELECT q.vec_id AS query_id, cc.ccid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_inner_product(q.v, cc.cv) DESC, cc.ccid ASC) AS rn
       |    FROM e q, cc WHERE q.vec_id IN ($qIn)) WHERE rn <= $nProbe
       |), qq AS (
       |  SELECT vec_id, pos, x AS qx FROM u WHERE vec_id IN ($qIn)
       |), s AS (
       |  SELECT qq.vec_id AS query_id, d.vec_id AS neighbor_id,
       |    sum((qx - dx) * (qx - dx)) AS adist
       |  FROM qq
       |  JOIN d ON qq.pos = d.pos AND d.vec_id <> qq.vec_id
       |  JOIN a ON a.vec_id = d.vec_id
       |  JOIN p ON p.query_id = qq.vec_id AND p.ccid = a.ccid
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, adist, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist ASC, neighbor_id ASC) AS rank
       |  FROM s)
       |WHERE rank <= $k""".stripMargin
  }

  /** DuckDB twin of [[adcTopK]]. */
  def adcTopKSql(queryIds: Seq[Long], k: Int): String =
    s"""$boundsCtes, d AS (
       |  SELECT vec_id, pos, lo + code * (hi - lo) / 255.0 AS dx
       |  FROM c JOIN b USING (pos)
       |), q AS (
       |  SELECT vec_id, pos, x AS qx FROM u
       |  WHERE vec_id IN (${queryIds.mkString(", ")})
       |), s AS (
       |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |    sum((qx - dx) * (qx - dx)) AS adist
       |  FROM q JOIN d ON q.pos = d.pos AND d.vec_id <> q.vec_id
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, adist, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist ASC, neighbor_id ASC) AS rank
       |  FROM s)
       |WHERE rank <= $k""".stripMargin
}
