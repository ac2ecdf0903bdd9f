package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Fully-distributed spherical k-means (Lloyd) over the embeddings
 * table — the corpus-scale complement of [[Similarity.trainCentroids]]
 * (which trains on a bounded driver-side sample for the IVF coarse
 * quantizer). Here every corpus vector participates in every
 * iteration, the way SemDeDup / cluster-balanced data curation
 * pipelines need it.
 *
 * Scale design (the MLlib shape, restated over DataFrames):
 *  - assignment is [[graft.functions.NearestCentroid]] — one compiled
 *    projection per iteration, NO shuffle, no k× row blowup;
 *  - the centroid update is posexplode(v) → groupBy(cid, ord).avg —
 *    partial aggregation collapses each partition to ≤ k·dim rows
 *    before the shuffle, so shuffle volume is O(k·dim·partitions)
 *    regardless of corpus size;
 *  - only k·dim aggregated doubles ever reach the driver per
 *    iteration (the next iteration's broadcast literals), never rows.
 *
 * Determinism: init = the k lowest vec_ids' vectors (unit-normalized),
 * ties in assignment break to the lowest cid (NearestCentroid's
 * contract), empty clusters keep their previous centroid. No RNG
 * anywhere, so the whole fixed-point after N iterations is
 * differential-testable against the DuckDB oracle ([[kmeansAssignSql]]
 * recomputes the same N Lloyd steps as chained CTEs).
 */
object Clustering {

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.max(math.sqrt(s), 1e-12)
    v.map(_ / n)
  }

  /** Deterministic init: unit-normalized vectors of the k lowest
    * vec_ids (a bounded k-row collect). */
  private def initCentroids(corpus: DataFrame, k: Int): Array[Array[Double]] =
    corpus.sort(col("vec_id")).limit(k).select(col("v")).collect()
      .map(r => normalize(r.getSeq[Double](0).toArray))

  /** One Lloyd refinement: per-cluster mean (empty clusters keep the
    * previous centroid), re-normalized to the unit sphere. */
  private def refine(
      corpus: DataFrame, cents: Array[Array[Double]]): Array[Array[Double]] = {
    val assigned = corpus.withColumn("cid",
      graft.functions.NearestCentroid(col("v"), cents))
    val means: Array[Row] = assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("ord", "value")))
      .groupBy(col("cid"), col("ord"))
      .agg(avg(col("value")).as("m"))
      .collect()
    val dim = cents.head.length
    val next = cents.map(_.clone())
    val sums = Array.fill(cents.length)(null: Array[Double])
    means.foreach { r =>
      val c = r.getInt(0)
      if (sums(c) == null) sums(c) = new Array[Double](dim)
      sums(c)(r.getInt(1)) = r.getDouble(2)
    }
    for (c <- cents.indices if sums(c) != null) next(c) = normalize(sums(c))
    next
  }

  /** The trained (unit) centroid matrix after `iters` Lloyd
    * refinements — k·dim doubles, usable as the literal quantizer for
    * any downstream [[graft.functions.NearestCentroid]] consumer
    * (e.g. [[Similarity.semanticPairs]]'s cluster restriction). */
  def kmeansCentroids(
      embs: DataFrame, k: Int = 10, iters: Int = 2): Array[Array[Double]] = {
    val corpus = embs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    var cents = initCentroids(corpus, k)
    for (_ <- 0 until iters) cents = refine(corpus, cents)
    cents
  }

  /**
   * Bounded-sample training — the 100-TB path: the full-corpus Lloyd
   * above is linear-per-iteration (`iters` corpus scans to learn k·dim
   * doubles); here the `iters` refinements run on a hash-ordered
   * `TakeOrdered` sample (map-side top-N, bounded at any corpus size —
   * the [[Similarity.trainCentroids]] pattern), so training is ONE
   * corpus pass regardless of `iters` (the draw pass is the
   * irreducible look-at-the-data cost; the Lloyd refinements are
   * bounded by `sampleMax`). Deterministic — the draw is
   * [[Sampling.hashOrderedSample]] (md5-of-decimal-id, which BOTH
   * engines compute identically), so the DuckDB oracle re-derives it
   * exactly ([[kmeansAssignSampledSql]] replays sample → init → Lloyd
   * → full-corpus assignment; xxhash64 would be Spark-only and leave
   * this path spec-checked, r9 review). Objective quality vs
   * full-corpus training is guarded by SampledTrainingSpec.
   */
  def kmeansCentroidsSampled(
      embs: DataFrame, k: Int = 10, iters: Int = 2,
      sampleMax: Int = 4096): Array[Array[Double]] = {
    // LocalRelation, not localCheckpoint — see PQ.trainSampled
    val sample = Sampling.hashOrderedSampleLocal(
      embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      sampleMax)
    var cents = initCentroids(sample, k)
    for (_ <- 0 until iters) cents = refine(sample, cents)
    cents
  }

  /** Full-corpus assignment under sample-trained centroids — one
    * compiled projection, no shuffle: the production composition
    * (train on a sample, assign everything). */
  def kmeansAssignSampled(
      embs: DataFrame, k: Int = 10, iters: Int = 2,
      sampleMax: Int = 4096): DataFrame =
    embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cid", graft.functions.NearestCentroid(
        col("v"), kmeansCentroidsSampled(embs, k, iters, sampleMax)))
      .select(col("vec_id"), col("cid"))

  /** Cluster assignment after `iters` Lloyd refinements:
    * `(vec_id, cid)`. */
  def kmeansAssign(embs: DataFrame, k: Int = 10, iters: Int = 2): DataFrame =
    embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cid",
        graft.functions.NearestCentroid(col("v"), kmeansCentroids(embs, k, iters)))
      .select(col("vec_id"), col("cid"))

  /** Cluster occupancy after `iters` refinements: `(cid, n_members)` —
    * the balance diagnostic cluster-curation pipelines gate on. */
  def kmeansSizes(embs: DataFrame, k: Int = 10, iters: Int = 2): DataFrame =
    kmeansAssign(embs, k, iters)
      .groupBy(col("cid")).agg(count(lit(1)).as("n_members"))

  /** `x / max(||x||, 1e-12)` over a DuckDB list column — mirrors
    * [[normalize]] bit-for-bit (same guard constant). */
  private def normSql(l: String): String =
    s"list_transform($l, x -> x / greatest(sqrt(list_sum(list_transform($l, y -> y*y))), 0.000000000001))"

  /** The shared CTE chain: e, c0, then (a_i, m_i, l_i, c_i) per
    * iteration, ending with the final assignment CTE `asg`. With
    * `sampleMax` set, init and every Lloyd refinement read the
    * md5-ordered `smp` draw ([[kmeansCentroidsSampled]]'s exact
    * sample) while the final `asg` still covers the full corpus. */
  private def kmeansCtes(
      k: Int, iters: Int, sampleMax: Option[Int] = None): String = {
    val t = if (sampleMax.isDefined) "smp" else "e"
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |)""".stripMargin)
    sampleMax.foreach { n =>
      sb.append(
        s""", smp AS (
           |  SELECT vec_id, v FROM e
           |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $n
           |)""".stripMargin)
    }
    sb.append(
      s""", c0 AS (
         |  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, ${normSql("v")} AS c
         |  FROM (SELECT vec_id, v FROM $t ORDER BY vec_id LIMIT $k)
         |)""".stripMargin)
    def assignCte(name: String, cents: String, src: String): String =
      s""", $name AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_inner_product(e.v, c.c) DESC, c.cid ASC) AS rn
         |    FROM $src e, $cents c) WHERE rn = 1
         |)""".stripMargin
    for (i <- 1 to iters) {
      val prev = if (i == 1) "c0" else s"c${i - 1}"
      sb.append(assignCte(s"a$i", prev, t))
      sb.append(
        s""", m$i AS (
           |  SELECT cid, ord, avg(val) AS m FROM (
           |    SELECT a.cid, unnest(e.v) AS val, generate_subscripts(e.v, 1) AS ord
           |    FROM a$i a JOIN $t e ON a.vec_id = e.vec_id) GROUP BY cid, ord
           |), l$i AS (
           |  SELECT cid, list(m ORDER BY ord) AS l FROM m$i GROUP BY cid
           |), c$i AS (
           |  SELECT p.cid, coalesce(${normSql("u.l")}, p.c) AS c
           |  FROM $prev p LEFT JOIN l$i u ON p.cid = u.cid
           |)""".stripMargin)
    }
    sb.append(assignCte("asg", s"c$iters", "e"))
    sb.toString
  }

  def kmeansAssignSql(k: Int = 10, iters: Int = 2): String =
    s"""${kmeansCtes(k, iters)}
       |SELECT vec_id, CAST(cid AS INT) AS cid FROM asg""".stripMargin

  /** Oracle for [[kmeansAssignSampled]]: the sampled Lloyd chain —
    * md5-ordered draw, init + refinements on the sample, assignment
    * over the full corpus — re-derived entirely in DuckDB. */
  def kmeansAssignSampledSql(
      k: Int = 10, iters: Int = 2, sampleMax: Int = 4096): String =
    s"""${kmeansCtes(k, iters, Some(sampleMax))}
       |SELECT vec_id, CAST(cid AS INT) AS cid FROM asg""".stripMargin

  def kmeansSizesSql(k: Int = 10, iters: Int = 2): String =
    s"""${kmeansCtes(k, iters)}
       |SELECT CAST(cid AS INT) AS cid, count(*) AS n_members
       |FROM asg GROUP BY cid""".stripMargin

  /** SemDeDup restricted to the DISTRIBUTED k-means clusters: the
    * oracle recomputes the Lloyd chain AND the within-cluster pair
    * verification, so the composition (training → assignment →
    * restriction → cosine) is hash-checked end-to-end. */
  def semanticPairsKmeansSql(threshold: Double, k: Int = 10, iters: Int = 2): String =
    s"""${kmeansCtes(k, iters)}
       |SELECT x.vec_id AS i, y.vec_id AS j,
       |       list_cosine_similarity(xe.v, ye.v) AS cos
       |FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |JOIN e xe ON xe.vec_id = x.vec_id
       |JOIN e ye ON ye.vec_id = y.vec_id
       |WHERE list_cosine_similarity(xe.v, ye.v) >= $threshold""".stripMargin
}
