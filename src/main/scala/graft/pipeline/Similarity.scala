package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (`Array[Float]`):
 * brute-force cosine top-k as the exact baseline, an IVF
 * (inverted-file) variant as the 100 TB scale path, and a
 * random-hyperplane LSH pair generator for cosine near-dup at scale.
 *
 * All vector math is `zip_with`/`aggregate` higher-order functions —
 * Catalyst expressions, no UDFs.
 */
object Similarity {

  def loadEmbeddings(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /**
   * Exact top-k cosine neighbours for a set of query vectors.
   * Queries are broadcast (bounded set); the corpus is scanned once —
   * at 100 TB this is one pass, embarrassingly parallel, with the
   * top-k maintained per partition by the window's partial sort.
   * Deterministic tie-break on neighbour id.
   */
  def bruteForceTopK(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = embs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2norm(col("v")))
    val queries = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("v"), col("qv")) / (col("norm") * col("qnorm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  def bruteForceTopKSql(queryIds: Seq[Long], k: Int): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |  WHERE vec_id IN (${queryIds.mkString(",")})
       |), scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS cos
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |) SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank
       |  FROM ranked WHERE rank <= $k""".stripMargin

  /**
   * IVF top-k: the scale path. Coarse quantizer = `nCentroids` vectors
   * picked deterministically from the corpus (ids sorted, evenly
   * strided); every corpus vector is assigned to its nearest centroid
   * (one broadcast join — centroids are tiny); a query probes only the
   * `nProbe` nearest centroid lists. Search cost drops from O(N) to
   * O(N * nProbe / nCentroids) per query; the assignment shuffle is
   * by cluster id, so lists co-locate and at 100 TB the corpus can be
   * written bucketed by cluster for pure partition-pruned probes.
   * Approximate: recall is tested against [[bruteForceTopK]].
   */
  def ivfTopK(
      embs: DataFrame, queryIds: Seq[Long], k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val corpus = embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2norm(col("v")))
    // centroid seeds: evenly strided over the id range — pure arithmetic
    // on the id column, no global sort (a Window.orderBy with no
    // partition key would single-thread at scale)
    val (minId, maxId) = {
      val r = corpus.agg(min(col("vec_id")), max(col("vec_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val stride = math.max((maxId - minId + 1) / nCentroids, 1L)
    val centroids = corpus
      .filter(pmod(col("vec_id") - minId, lit(stride)) === 0 &&
        (col("vec_id") - minId) / stride < nCentroids)
      .select(((col("vec_id") - minId) / stride).cast("long").as("cid"),
        col("v").as("cv"), col("norm").as("cnorm"))
    // nearest centroid per vector: aggregate max over (cos, -cid) — a
    // partial-aggregated groupBy, cheaper than a row_number window
    val assign = corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("norm"), col("cid"),
        (dot(col("v"), col("cv")) / (col("norm") * col("cnorm"))).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(
        first(col("v")).as("v"), first(col("norm")).as("norm"),
        max(struct(col("ccos"), (-col("cid")).as("negcid"))).as("best"))
      .select(col("vec_id"), col("v"), col("norm"), (-col("best.negcid")).cast("long").as("cid"))
    val queryProbes = assign.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("qnorm"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm"))).as("ccos"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qnorm"), col("cid"))
    val scored = queryProbes.join(assign, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("v"), col("qv")) / (col("norm") * col("qnorm"))).as("cos"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH for cosine near-dup at scale: `nBits`-bit
    * signature from signs of dot products with deterministic
    * pseudo-random hyperplanes (hash-derived, no RNG state), banded
    * into `nBits/bandBits` buckets; bucket-colliding pairs are verified
    * with exact cosine. */
  def cosineLshPairs(
      embs: DataFrame, threshold: Double,
      nBits: Int = 16, bandBits: Int = 4): DataFrame = {
    val corpus = embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2norm(col("v")))
    // hyperplanes are data-independent: derive them deterministically
    // (hash-mixed, centered) on the driver and embed as literal arrays,
    // so per-row work is nBits plain dot products — no per-row plane
    // construction. Dim comes from one bounded head() probe.
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    def mix(b: Int, d: Int): Double = {
      var x = b.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      ((x & 0xFFFFFL).toDouble / 0xFFFFFL.toDouble) - 0.5
    }
    val planes = Array.tabulate(nBits, dim)(mix)
    // one compiled pass per row instead of nBits interpreted
    // higher-order-function dot products
    val sig = graft.functions.VectorSignature(col("v"), planes)
    val signed = corpus.withColumn("sig", sig)
    val nBands = nBits / bandBits
    val mask = (1L << bandBits) - 1
    val bands = signed.select(col("vec_id"), col("v"), col("norm"), explode(array(
      (0 until nBands).map(c => struct(lit(c).as("band"),
        shiftright(col("sig"), c * bandBits).bitwiseAND(mask).as("key"))): _*)).as("bb"))
      .select(col("vec_id"), col("v"), col("norm"), col("bb.band"), col("bb.key"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("i"), col("y.vec_id").as("j"),
        (dot(col("x.v"), col("y.v")) / (col("x.norm") * col("y.norm"))).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
  }
}
