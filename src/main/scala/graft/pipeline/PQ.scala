package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (Jégou et al., "Product Quantization for
 * Nearest Neighbor Search", TPAMI 2011) — the memory-side scale path
 * for ANN over a 100-TB embedding corpus, complementing the IVF
 * partition-pruning path in [[Similarity]]:
 *
 *  - the embedding is split into `m` contiguous subvectors;
 *  - each subspace gets its own small L2 k-means codebook (`ksub`
 *    centroids), trained with deterministic Lloyd iterations;
 *  - a vector is stored as `m` small codes (here 4 bytes instead of
 *    64 doubles — a 128× compression of the scan payload);
 *  - a query is answered by Asymmetric Distance Computation (ADC):
 *    one `m × ksub` lookup table of exact subspace distances per
 *    query, then every corpus vector's approximate distance is `m`
 *    table lookups + adds over its CODES — the full-precision
 *    embedding column is never read at query time.
 *
 * Spark mapping, stage by stage:
 *  - assignment/encoding reuses [[graft.functions.NearestCentroid]]
 *    (compiled dot-argmax projection, zero shuffle) via the augmented
 *    trick: `argmin_c ‖x−c‖² = argmax_c (x·c − ‖c‖²/2)`, i.e. the
 *    L2-nearest codeword is the dot-nearest after appending a
 *    constant 1 to x and `−‖c‖²/2` to each codeword. No second
 *    kernel needed, and the augmented coordinate is ordered LAST so
 *    the accumulation order matches the oracle's
 *    `list_inner_product(x,c) − list_inner_product(c,c)/2` exactly.
 *  - codebook training is the same distributed Lloyd shape as
 *    [[Clustering]] (posexplode → groupBy(cid, ord) with map-side
 *    combine; only k·d doubles reach the driver per iteration), just
 *    plain-L2 instead of spherical: subvectors are NOT normalized and
 *    centroid updates are NOT re-projected to the sphere.
 *  - the ADC scan is one projection over the encoded table: per
 *    query, `m` `element_at`s into broadcast literal lookup arrays,
 *    summed — codegen-friendly, no join, no shuffle until the final
 *    per-query top-k window.
 *
 * Determinism contract (differential-testable end to end): init =
 * the ksub lowest vec_ids' subvectors, assignment ties to the lowest
 * code, empty clusters keep their previous codeword, ADC ties to the
 * lowest neighbor id. The DuckDB oracle re-derives codebooks, codes
 * and ADC ranking from the same contract.
 *
 * At production scale the codebooks are trained on a bounded sample
 * (the [[Similarity.trainCentroids]] pattern) and the encoded table
 * is written once, bucketed; here training runs on the full corpus so
 * the whole pipeline stays oracle-checkable.
 */
object PQ {

  /** `cents(j)(c)` = codeword c of subspace j (d doubles each). */
  final case class Codebooks(m: Int, d: Int, cents: Array[Array[Array[Double]]])

  private def corpus(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def subvec(j: Int, d: Int): Column = slice(col("v"), j * d + 1, d)

  /** `[c, -‖c‖²/2]` rows for the L2-as-dot argmax. */
  private def augmented(cents: Array[Array[Double]]): Array[Array[Double]] =
    cents.map { c =>
      var n2 = 0.0
      var i = 0
      while (i < c.length) { n2 += c(i) * c(i); i += 1 }
      c :+ (-0.5 * n2)
    }

  private def assignCol(j: Int, d: Int, cents: Array[Array[Double]]): Column =
    graft.functions.NearestCentroid(
      concat(subvec(j, d), array(lit(1.0))), augmented(cents))

  /** One plain-L2 Lloyd refinement of ALL m codebooks in a single
    * Spark job: per-subspace assignment columns (m compiled argmax
    * projections), then ONE explode of (subspace, cid, ord, value)
    * structs into one hash agg — map-side combine collapses each
    * partition to ≤ m·ksub·d rows, and the driver receives one
    * m·ksub·d result instead of m round-trips per iteration. */
  private def refineAll(
      c: DataFrame, d: Int,
      cents: Array[Array[Array[Double]]]): Array[Array[Array[Double]]] = {
    val m = cents.length
    val withCids = c.select(col("v") +: (0 until m).map(j =>
      assignCol(j, d, cents(j)).as(s"cid$j")): _*)
    val parts = (0 until m).map { j =>
      transform(subvec(j, d), (x, i) =>
        struct(lit(j).as("j"), col(s"cid$j").as("cid"),
          i.as("ord"), x.as("value")))
    }
    val means = withCids
      .select(explode(flatten(array(parts: _*))).as("s"))
      .select(col("s.j"), col("s.cid"), col("s.ord"), col("s.value"))
      .groupBy(col("j"), col("cid"), col("ord"))
      .agg(avg(col("value")).as("m"))
      .collect()
    val next = cents.map(_.map(_.clone()))
    val sums = Array.fill(m, cents.head.length)(null: Array[Double])
    means.foreach { r =>
      val (j, cid) = (r.getInt(0), r.getInt(1))
      if (sums(j)(cid) == null) sums(j)(cid) = new Array[Double](d)
      sums(j)(cid)(r.getInt(2)) = r.getDouble(3)
    }
    for (j <- 0 until m; cid <- cents(j).indices if sums(j)(cid) != null)
      next(j)(cid) = sums(j)(cid)
    next
  }

  /** Training loop over an ALREADY-persisted corpus frame — the
    * m·iters refinement jobs each rescan it, so callers cache it once
    * (train/codes/adcTopK do; at production scale training runs on a
    * bounded cached sample regardless). */
  private def trainOn(c: DataFrame, m: Int, ksub: Int, iters: Int): Codebooks = {
    val dim = c.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val d = dim / m
    val init: Array[Array[Double]] = c.sort(col("vec_id")).limit(ksub)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    var cents = Array.tabulate(m)(j => init.map(_.slice(j * d, j * d + d)))
    for (_ <- 0 until iters) cents = refineAll(c, d, cents)
    Codebooks(m, d, cents)
  }

  /** Train all `m` codebooks (deterministic, see object doc). */
  def train(embs: DataFrame, m: Int, ksub: Int, iters: Int): Codebooks = {
    val c = corpus(embs).persist()
    try trainOn(c, m, ksub, iters) finally c.unpersist()
  }

  /**
   * Bounded-sample training — the 100-TB path (Jégou et al. train
   * codebooks on a sample; m·ksub·d parameters never need the full
   * corpus). The sample is drawn by hash order (`TakeOrdered` —
   * map-side top-N, bounded memory at any corpus size, the
   * [[Similarity.trainCentroids]] pattern), materialized once, and the
   * `iters` Lloyd jobs scan only it: ONE corpus pass total instead of
   * `iters` (the draw pass is the irreducible look-at-the-data cost;
   * everything after is bounded by `sampleMax`). Deterministic — the
   * draw is [[Sampling.hashOrderedSample]] (md5-of-decimal-id, which
   * BOTH engines compute identically), so the DuckDB oracle re-derives
   * it exactly ([[codesSampledSql]] replays sample → per-subspace
   * Lloyd → full-corpus encode; xxhash64 would be Spark-only and
   * leave this path spec-checked, r9 review). Codebook quality vs
   * full-corpus training is guarded by the recall-floor differential
   * in SampledTrainingSpec.
   */
  def trainSampled(
      embs: DataFrame, m: Int, ksub: Int, iters: Int,
      sampleMax: Int = 4096): Codebooks = {
    // LocalRelation, not localCheckpoint: the sibling train() unpersists
    // its cached corpus in a finally, and a checkpointed sample would
    // stay pinned in executor storage for the JVM's lifetime (r10
    // review); the rows are bounded by sampleMax, so they live once on
    // the driver instead
    val sample = Sampling.hashOrderedSampleLocal(corpus(embs), sampleMax)
    trainOn(sample, m, ksub, iters)
  }

  /** [[codes]] with sample-trained codebooks: the corpus is scanned
    * once for the sample draw and once for the encode projection —
    * two passes total, independent of `iters`. */
  def codesSampled(
      embs: DataFrame, m: Int, ksub: Int, iters: Int,
      sampleMax: Int = 4096): DataFrame =
    encode(embs, trainSampled(embs, m, ksub, iters, sampleMax))

  private def encodeOn(c: DataFrame, cb: Codebooks): DataFrame = {
    val cols = col("vec_id") +: (0 until cb.m).map(j =>
      assignCol(j, cb.d, cb.cents(j)).as(s"c$j"))
    c.select(cols: _*)
  }

  /** `(vec_id, c0..c{m-1})` — the encoded table: one compiled
    * projection, no shuffle, no row blowup. */
  def encode(embs: DataFrame, cb: Codebooks): DataFrame =
    encodeOn(corpus(embs), cb)

  /** Train + encode in one call (the oracle-checkable composition).
    * The corpus projection is cached across the two stages; at
    * production scale the encoded table is WRITTEN once (that is the
    * point of PQ — a 100-TB embedding corpus becomes a sub-TB code
    * table) and queries never touch the embeddings again. */
  def codes(embs: DataFrame, m: Int, ksub: Int, iters: Int): DataFrame = {
    val c = corpus(embs).persist()
    try {
      val cb = trainOn(c, m, ksub, iters)
      // eager localCheckpoint: materializes the (tiny) code table
      // before the corpus cache is dropped
      encodeOn(c, cb).localCheckpoint()
    } finally c.unpersist()
  }

  /** Per-query ADC lookup tables: `table(j)(c) = ‖q_j − cent_{j,c}‖²`,
    * sequential accumulation (the oracle's list_zip lambda mirrors
    * this order). */
  private def lookupTables(cb: Codebooks, q: Array[Double]): Array[Array[Double]] =
    Array.tabulate(cb.m) { j =>
      cb.cents(j).map { c =>
        var s = 0.0
        var i = 0
        while (i < cb.d) {
          val diff = q(j * cb.d + i) - c(i)
          s += diff * diff
          i += 1
        }
        s
      }
    }

  /** Union of per-query scored-code projections + the final top-k
    * window (shared by the full-scan and IVF-restricted paths). */
  private def rankAdc(
      perQuery: Seq[DataFrame], k: Int): DataFrame = {
    val scored = perQuery.reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def adcCol(cb: Codebooks, tables: Array[Array[Double]]): Column =
    (0 until cb.m).map(j =>
      element_at(typedLit(tables(j).toSeq), col(s"c$j") + 1))
      .reduce(_ + _)

  /**
   * ADC top-k: `(query_id, neighbor_id, adist, rank)` per corpus
   * query id. The lookup tables (m·ksub doubles per query) are exact
   * subspace distances computed driver-side from the collected query
   * vectors (bounded set, the [[Similarity.bruteForceTopK]] contract).
   */
  def adcTopK(
      embs: DataFrame, queryIds: Seq[Long], k: Int,
      m: Int, ksub: Int, iters: Int): DataFrame = {
    val c = corpus(embs).persist()
    val (cb, enc, qvecs) = try {
      val cb = trainOn(c, m, ksub, iters)
      // the per-query score branches below each rescan the encoded
      // table; checkpoint it once (m ints per vector — the compressed
      // representation ADC exists for)
      val enc = encodeOn(c, cb).localCheckpoint()
      val qvecs: Seq[(Long, Array[Double])] = c
        .filter(col("vec_id").isInCollection(queryIds))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
        .sortBy(_._1)
      (cb, enc, qvecs)
    } finally c.unpersist()
    rankAdc(qvecs.map { case (qid, q) =>
      val adist = adcCol(cb, lookupTables(cb, q))
      enc.filter(col("vec_id") =!= qid)
        .select(lit(qid).as("query_id"), col("vec_id").as("neighbor_id"),
          adist.as("adist"))
    }, k)
  }

  /**
   * IVF + ADC — the production composition (Jégou et al.'s IVFADC
   * minus the residual encoding, kept non-residual so the oracle
   * stays a pure re-derivation): a coarse quantizer restricts each
   * query to its `nProbe` nearest inverted lists (partition pruning
   * at deployment: the code table is written `partitionBy(cid)`), and
   * ADC scores ONLY the codes in the probed lists. Search cost is
   * O(N · nProbe / |coarse|) table lookups per query, embeddings
   * never read. Coarse assignment ties to the lowest cid
   * ([[graft.functions.NearestCentroid]]'s contract); probe lists are
   * ranked by dot, ties to the lowest cid — both re-derived by the
   * DuckDB oracle, so the pruning itself is hash-checked.
   */
  def ivfAdcTopK(
      embs: DataFrame, queryIds: Seq[Long], k: Int,
      m: Int, ksub: Int, iters: Int,
      coarse: Array[Array[Double]], nProbe: Int): DataFrame = {
    require(nProbe > 0 && nProbe <= coarse.length)
    // coarse centroids must match corpus dimension — a silent
    // truncated dot product would quietly diverge from the oracle
    require(coarse.forall(_.length == coarse.head.length),
      "ragged coarse codebook")
    val c = corpus(embs).persist()
    val (cb, enc, qvecs) = try {
      val cb = trainOn(c, m, ksub, iters)
      // ONE projection: m subspace codes + the coarse list id
      val cols = col("vec_id") +:
        ((0 until m).map(j => assignCol(j, cb.d, cb.cents(j)).as(s"c$j")) :+
          graft.functions.NearestCentroid(col("v"), coarse).as("cid"))
      val enc = c.select(cols: _*).localCheckpoint()
      val qvecs: Seq[(Long, Array[Double])] = c
        .filter(col("vec_id").isInCollection(queryIds))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
        .sortBy(_._1)
      (cb, enc, qvecs)
    } finally c.unpersist()
    rankAdc(qvecs.map { case (qid, q) =>
      // probe list: nProbe coarse ids by descending dot, ties low cid
      val probes = coarse.zipWithIndex.map { case (cv, ci) =>
        require(cv.length == q.length,
          s"coarse centroid dim ${cv.length} != query dim ${q.length}")
        var s = 0.0
        var i = 0
        while (i < q.length) { s += q(i) * cv(i); i += 1 }
        (s, ci)
      }.sortBy { case (d, ci) => (-d, ci) }.take(nProbe).map(_._2)
      val adist = adcCol(cb, lookupTables(cb, q))
      enc.filter(col("cid").isin(probes.toIndexedSeq: _*) && col("vec_id") =!= qid)
        .select(lit(qid).as("query_id"), col("vec_id").as("neighbor_id"),
          adist.as("adist"))
    }, k)
  }

  /**
   * Full IVFADC (Jégou et al. 2011 §IV): like [[ivfAdcTopK]] but the
   * codebooks quantize RESIDUALS `v − coarse(v)` — the vectors PQ
   * actually compresses in production, since residuals concentrate
   * near zero and the same `ksub` codewords buy much finer resolution
   * than on raw vectors. Consequences, both handled here:
   *
   *  - encoding subtracts the assigned coarse centroid first — one
   *    extra `zip_with`/`element_at` projection step, still
   *    shuffle-free;
   *  - a query's lookup tables become PER-PROBED-LIST (the query
   *    residual differs per list): nProbe·m·ksub doubles per query,
   *    still driver-trivial, and each probed list is scored with its
   *    own table.
   *
   * Everything — coarse assignment, residuals, codebooks, codes,
   * per-list tables, restricted ranking — is re-derived by the DuckDB
   * oracle ([[ivfAdcResidualTopKSql]]).
   */
  def ivfAdcResidualTopK(
      embs: DataFrame, queryIds: Seq[Long], k: Int,
      m: Int, ksub: Int, iters: Int,
      coarse: Array[Array[Double]], nProbe: Int): DataFrame = {
    require(nProbe > 0 && nProbe <= coarse.length)
    // coarse centroids must match corpus dimension — a silent
    // truncated dot product would quietly diverge from the oracle
    require(coarse.forall(_.length == coarse.head.length),
      "ragged coarse codebook")
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    val c = corpus(embs).persist()
    val (cb, enc, qvecs) = try {
      val withCid = c.withColumn("cid",
        graft.functions.NearestCentroid(col("v"), coarse))
      val res = withCid.withColumn("v",
        zip_with(col("v"), element_at(coarseLit, col("cid") + 1),
          (a, b) => a - b)).persist()
      try {
        val cb = trainOn(res, m, ksub, iters)
        val cols = col("vec_id") +:
          ((0 until m).map(j => assignCol(j, cb.d, cb.cents(j)).as(s"c$j")) :+
            col("cid"))
        val enc = res.select(cols: _*).localCheckpoint()
        val qvecs: Seq[(Long, Array[Double])] = c
          .filter(col("vec_id").isInCollection(queryIds))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
          .sortBy(_._1)
        (cb, enc, qvecs)
      } finally res.unpersist()
    } finally c.unpersist()
    rankAdc(qvecs.map { case (qid, q) =>
      val probes = coarse.zipWithIndex.map { case (cv, ci) =>
        require(cv.length == q.length,
          s"coarse centroid dim ${cv.length} != query dim ${q.length}")
        var s = 0.0
        var i = 0
        while (i < q.length) { s += q(i) * cv(i); i += 1 }
        (s, ci)
      }.sortBy { case (d, ci) => (-d, ci) }.take(nProbe).map(_._2)
      // one scored branch per probed list, each with ITS residual table
      probes.map { l =>
        val qres = Array.tabulate(q.length)(i => q(i) - coarse(l)(i))
        val adist = adcCol(cb, lookupTables(cb, qres))
        enc.filter(col("cid") === l && col("vec_id") =!= qid)
          .select(lit(qid).as("query_id"), col("vec_id").as("neighbor_id"),
            adist.as("adist"))
      }.reduce(_ unionByName _)
    }, k)
  }

  // ------------------------------------------------------------------
  // DuckDB oracle twins: re-derive codebooks (per-subspace Lloyd CTE
  // chains, the Clustering.kmeansCtes pattern in L2 form), codes and
  // the ADC ranking from the same determinism contract.
  // ------------------------------------------------------------------

  /** L2 assignment score written EXACTLY like the Spark kernel
    * evaluates the augmented dot (see object doc). */
  private def scoreSql(v: String, c: String): String =
    s"(list_inner_product($v, $c) - list_inner_product($c, $c)/2)"

  /** CTE chain for subspace j: `s{j}_e` (sliced corpus), `s{j}_c0` …
    * `s{j}_c{iters}` (codebooks), `s{j}_asg` (final codes). With
    * `sampled` set, init and every Lloyd refinement read the sliced
    * md5-ordered draw `s{j}_t` ([[trainSampled]]'s exact sample) while
    * the final `s{j}_asg` still encodes the full corpus. */
  private def subspaceCtes(j: Int, d: Int, ksub: Int, iters: Int,
      sampled: Boolean = false): String = {
    val lo = j * d + 1
    val hi = j * d + d
    val p = s"s$j"
    val t = if (sampled) s"${p}_t" else s"${p}_e"
    val sb = new StringBuilder
    sb.append(
      s""", ${p}_e AS (
         |  SELECT vec_id, v[$lo:$hi] AS v FROM e
         |)""".stripMargin)
    if (sampled) sb.append(
      s""", ${p}_t AS (
         |  SELECT vec_id, v[$lo:$hi] AS v FROM smp
         |)""".stripMargin)
    sb.append(
      s""", ${p}_c0 AS (
         |  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, v AS c
         |  FROM (SELECT vec_id, v FROM $t ORDER BY vec_id LIMIT $ksub)
         |)""".stripMargin)
    def assign(name: String, cents: String, src: String): String =
      s""", $name AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${scoreSql("e.v", "c.c")} DESC, c.cid ASC) AS rn
         |    FROM $src e, $cents c) WHERE rn = 1
         |)""".stripMargin
    for (i <- 1 to iters) {
      val prev = if (i == 1) s"${p}_c0" else s"${p}_c${i - 1}"
      sb.append(assign(s"${p}_a$i", prev, t))
      sb.append(
        s""", ${p}_m$i AS (
           |  SELECT cid, ord, avg(val) AS m FROM (
           |    SELECT a.cid, unnest(e.v) AS val, generate_subscripts(e.v, 1) AS ord
           |    FROM ${p}_a$i a JOIN $t e ON a.vec_id = e.vec_id) GROUP BY cid, ord
           |), ${p}_l$i AS (
           |  SELECT cid, list(m ORDER BY ord) AS l FROM ${p}_m$i GROUP BY cid
           |), ${p}_c$i AS (
           |  SELECT prev.cid, coalesce(u.l, prev.c) AS c
           |  FROM $prev prev LEFT JOIN ${p}_l$i u ON prev.cid = u.cid
           |)""".stripMargin)
    }
    sb.append(assign(s"${p}_asg", s"${p}_c$iters", s"${p}_e"))
    sb.toString
  }

  /** Default corpus CTE body (the fixture table); the randomized
    * differential suite substitutes a VALUES-backed corpus. */
  val DefaultCorpusSql: String =
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"

  private def pqCtes(
      m: Int, d: Int, ksub: Int, iters: Int,
      corpusSql: String, sampleMax: Option[Int] = None): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (
         |  $corpusSql
         |)""".stripMargin)
    sampleMax.foreach { n =>
      sb.append(
        s""", smp AS (
           |  SELECT vec_id, v FROM e
           |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $n
           |)""".stripMargin)
    }
    for (j <- 0 until m)
      sb.append(subspaceCtes(j, d, ksub, iters, sampled = sampleMax.isDefined))
    val joins = (1 until m)
      .map(j => s"JOIN s${j}_asg s$j ON s$j.vec_id = s0.vec_id").mkString("\n  ")
    val codeCols = (0 until m).map(j => s"CAST(s$j.cid AS INT) AS c$j").mkString(", ")
    sb.append(
      s""", codes AS (
         |  SELECT s0.vec_id, $codeCols FROM s0_asg s0
         |  $joins
         |)""".stripMargin)
    sb.toString
  }

  /** Oracle for [[codes]]. `d` must match the corpus dim / m. */
  def codesSql(m: Int, d: Int, ksub: Int, iters: Int,
      corpusSql: String = DefaultCorpusSql): String =
    s"""${pqCtes(m, d, ksub, iters, corpusSql)}
       |SELECT * FROM codes""".stripMargin

  /** Oracle for [[codesSampled]]: the sampled training chain —
    * md5-ordered draw, per-subspace Lloyd on the sample, encode over
    * the full corpus — re-derived entirely in DuckDB. */
  def codesSampledSql(m: Int, d: Int, ksub: Int, iters: Int,
      sampleMax: Int, corpusSql: String = DefaultCorpusSql): String =
    s"""${pqCtes(m, d, ksub, iters, corpusSql, Some(sampleMax))}
       |SELECT * FROM codes""".stripMargin

  /** Per-subspace distance-table CTEs: ‖q_j − c‖² via elementwise
    * lambda, sequential list_sum — the Spark driver loop's
    * arithmetic. */
  private def dtabCtes(queryIds: Seq[Long], m: Int, d: Int, iters: Int): String =
    (0 until m).map { j =>
      val lo = j * d + 1
      val hi = j * d + d
      s""", dtab$j AS (
         |  SELECT q.vec_id AS query_id, c.cid,
         |    list_sum(list_transform(list_zip(q.v[$lo:$hi], c.c),
         |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
         |  FROM e q, s${j}_c$iters c
         |  WHERE q.vec_id IN (${queryIds.mkString(",")})
         |)""".stripMargin
    }.mkString

  private def dFrom(m: Int) = (0 until m).map(j => s"dtab$j d$j").mkString(", ")
  private def dPreds(m: Int) = (0 until m)
    .map(j => s"d$j.query_id = q.query_id AND d$j.cid = codes.c$j")
    .mkString("\n    AND ")
  private def adistSum(m: Int) = (0 until m).map(j => s"d$j.dist").mkString(" + ")

  private val rankTail =
    s"""), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adist ASC, neighbor_id ASC) AS rank
       |  FROM scored
       |) SELECT query_id, neighbor_id, adist, CAST(rank AS INT) AS rank
       |  FROM ranked WHERE rank <= """.stripMargin

  /** Oracle for [[adcTopK]]: subspace distance tables from the same
    * codebook CTEs, ADC sum in subspace order, same tie-breaks. */
  def adcTopKSql(
      queryIds: Seq[Long], k: Int,
      m: Int, d: Int, ksub: Int, iters: Int,
      corpusSql: String = DefaultCorpusSql): String = {
    s"""${pqCtes(m, d, ksub, iters, corpusSql)}${dtabCtes(queryIds, m, d, iters)}, qids(query_id) AS (
       |  SELECT unnest([${queryIds.mkString(",")}])
       |), scored AS (
       |  SELECT q.query_id, codes.vec_id AS neighbor_id, ${adistSum(m)} AS adist
       |  FROM qids q, codes, ${dFrom(m)}
       |  WHERE ${dPreds(m)}
       |    AND codes.vec_id <> q.query_id
       |$rankTail$k""".stripMargin
  }

  /** Oracle for [[ivfAdcTopK]]: the ADC oracle plus literal coarse
    * centroids, the argmax-dot assignment, and per-query probe lists —
    * every pruning decision re-derived in SQL. */
  def ivfAdcTopKSql(
      queryIds: Seq[Long], k: Int,
      m: Int, d: Int, ksub: Int, iters: Int,
      coarse: Array[Array[Double]], nProbe: Int,
      corpusSql: String = DefaultCorpusSql): String = {
    val coarseRows = coarse.zipWithIndex.map { case (cv, ci) =>
      s"($ci, [${cv.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n       ")
    s"""${pqCtes(m, d, ksub, iters, corpusSql)}${dtabCtes(queryIds, m, d, iters)}, cc(ccid, cv) AS (
       |  SELECT * FROM (VALUES
       |       $coarseRows)
       |), a AS (
       |  SELECT vec_id, ccid FROM (
       |    SELECT e.vec_id, cc.ccid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_inner_product(e.v, cc.cv) DESC, cc.ccid ASC) AS rn
       |    FROM e, cc) WHERE rn = 1
       |), qids(query_id) AS (
       |  SELECT unnest([${queryIds.mkString(",")}])
       |), p AS (
       |  SELECT query_id, ccid FROM (
       |    SELECT q.vec_id AS query_id, cc.ccid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_inner_product(q.v, cc.cv) DESC, cc.ccid ASC) AS rn
       |    FROM e q, cc WHERE q.vec_id IN (${queryIds.mkString(",")})) WHERE rn <= $nProbe
       |), scored AS (
       |  SELECT q.query_id, codes.vec_id AS neighbor_id, ${adistSum(m)} AS adist
       |  FROM qids q, codes, a, p, ${dFrom(m)}
       |  WHERE ${dPreds(m)}
       |    AND a.vec_id = codes.vec_id
       |    AND p.query_id = q.query_id AND p.ccid = a.ccid
       |    AND codes.vec_id <> q.query_id
       |$rankTail$k""".stripMargin
  }

  /** Oracle for [[ivfAdcResidualTopK]]: the codebook chains run over
    * the RESIDUAL corpus (coarse assignment + elementwise subtract
    * inlined as the corpus CTE), and the distance tables are
    * per-(query, probed list) against the query's residual for that
    * list. */
  def ivfAdcResidualTopKSql(
      queryIds: Seq[Long], k: Int,
      m: Int, d: Int, ksub: Int, iters: Int,
      coarse: Array[Array[Double]], nProbe: Int): String = {
    val coarseRows = coarse.zipWithIndex.map { case (cv, ci) =>
      s"($ci, [${cv.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n       ")
    val residualCorpus =
      s"""SELECT vec_id, list_transform(list_zip(rv, cv), x -> x[1] - x[2]) AS v FROM (
         |    SELECT raw.vec_id, raw.rv, icc.cv,
         |      row_number() OVER (PARTITION BY raw.vec_id
         |        ORDER BY list_inner_product(raw.rv, icc.cv) DESC, icc.ccid ASC) AS rn
         |    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS rv FROM embeddings) raw,
         |         (VALUES
         |       $coarseRows) icc(ccid, cv)
         |  ) WHERE rn = 1""".stripMargin
    val qIn = queryIds.mkString(",")
    val dtabs = (0 until m).map { j =>
      val lo = j * d + 1
      val hi = j * d + d
      s""", dtab$j AS (
         |  SELECT q.vec_id AS query_id, p.ccid, c.cid,
         |    list_sum(list_transform(list_zip(
         |      list_transform(list_zip(q.v, cc.cv), x -> x[1] - x[2])[$lo:$hi], c.c),
         |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
         |  FROM raw q, p, cc, s${j}_c$iters c
         |  WHERE p.query_id = q.vec_id AND cc.ccid = p.ccid AND q.vec_id IN ($qIn)
         |)""".stripMargin
    }.mkString
    val dPredsR = (0 until m)
      .map(j => s"d$j.query_id = q.query_id AND d$j.ccid = p.ccid AND d$j.cid = codes.c$j")
      .mkString("\n    AND ")
    s"""${pqCtes(m, d, ksub, iters, residualCorpus)}, raw AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), cc(ccid, cv) AS (
       |  SELECT * FROM (VALUES
       |       $coarseRows)
       |), a AS (
       |  SELECT vec_id, ccid FROM (
       |    SELECT raw.vec_id, cc.ccid,
       |      row_number() OVER (PARTITION BY raw.vec_id
       |        ORDER BY list_inner_product(raw.v, cc.cv) DESC, cc.ccid ASC) AS rn
       |    FROM raw, cc) WHERE rn = 1
       |), qids(query_id) AS (
       |  SELECT unnest([$qIn])
       |), p AS (
       |  SELECT query_id, ccid FROM (
       |    SELECT q.vec_id AS query_id, cc.ccid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_inner_product(q.v, cc.cv) DESC, cc.ccid ASC) AS rn
       |    FROM raw q, cc WHERE q.vec_id IN ($qIn)) WHERE rn <= $nProbe
       |)$dtabs, scored AS (
       |  SELECT q.query_id, codes.vec_id AS neighbor_id, ${adistSum(m)} AS adist
       |  FROM qids q, codes, a, p, ${dFrom(m)}
       |  WHERE $dPredsR
       |    AND a.vec_id = codes.vec_id
       |    AND p.query_id = q.query_id AND p.ccid = a.ccid
       |    AND codes.vec_id <> q.query_id
       |$rankTail$k""".stripMargin
  }
}
