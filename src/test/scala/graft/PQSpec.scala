package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.pipeline.PQ

/** Product-quantization pipeline: exactness on cluster-shaped data
  * (where ADC must reduce to exact distances), recall on perturbed
  * clusters, determinism, and the no-shuffle encode plan. The
  * fixture-backed hash checks live in the pq_codes / ann_pq_adc
  * oracle entries. */
class PQSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  /** 8 orthogonal-ish prototypes in dim 8; `spread` copies each, with
    * a deterministic sub-0.05 perturbation when `jitter` is set. */
  private def clustered(spread: Int, jitter: Boolean): DataFrame = {
    val protos: Seq[Seq[Double]] =
      (0 until 8).map(p => (0 until 8).map(d => if (d == p) 4.0 else 0.0))
    val rows = for {
      c <- 0 until spread
      p <- 0 until 8
    } yield {
      val base = protos(p)
      val v =
        if (!jitter || c == 0) base
        else base.zipWithIndex.map { case (x, d) =>
          // deterministic jitter in (-0.05, 0.05): small vs the 4.0
          // proto separation, so nearest-proto structure is preserved
          x + (((p * 131 + c * 17 + d * 7) % 19) - 9) / 200.0
        }
      ((c * 8 + p).toLong, v.map(_.toFloat))
    }
    // copy-major ids: the first 8 vec_ids are one clean copy of each
    // prototype, so the deterministic init spans every point mass and
    // Lloyd's fixed point reconstructs the corpus exactly (the pure-
    // cluster test's premise)
    rows.toDF("vec_id", "embedding")
  }

  private def l2sq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("codes: identical vectors always share codes; determinism across runs") {
    val df = clustered(spread = 3, jitter = false).cache()
    try {
      val c1 = PQ.codes(df, m = 2, ksub = 4, iters = 2).collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
      val c2 = PQ.codes(df, m = 2, ksub = 4, iters = 2).collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
      assert(c1 == c2, "two runs disagree — nondeterminism in training")
      // members of the same cluster are exact duplicates -> same codes
      for (p <- 0 until 8; c <- 1 until 3)
        assert(c1(c * 8L + p) == c1(p.toLong),
          s"duplicate vectors got different codes (cluster $p)")
    } finally df.unpersist()
  }

  test("adc on pure clusters: top-k agrees with exact L2 ranking") {
    // ksub = 8 codewords per subspace and 8 point-mass clusters:
    // Lloyd converges to the prototypes, every vector's reconstruction
    // is itself, and ADC == exact distance — so the approximate path
    // must EQUAL brute force here, rank for rank
    val df = clustered(spread = 3, jitter = false).cache()
    try {
      val vecs = df.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toMap
      val queryIds = Seq(0L, 7L, 23L)
      val got = PQ.adcTopK(df, queryIds, k = 5, m = 2, ksub = 8, iters = 3)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      val exp = queryIds.flatMap { q =>
        vecs.toSeq.filter(_._1 != q)
          .map { case (id, v) => (q, id, l2sq(vecs(q), v)) }
          .sortBy(t => (t._3, t._2)).take(5).zipWithIndex
          .map { case ((qq, id, dd), i) => (qq, i + 1, id, dd) }
      }.sortBy(t => (t._1, t._2))
      assert(got.map(t => (t._1, t._2, t._3)).toSeq ==
        exp.map(t => (t._1, t._2, t._3)))
      got.zip(exp).foreach { case (g, e) =>
        assert(math.abs(g._4 - e._4) < 1e-9, s"adist off: $g vs $e")
      }
    } finally df.unpersist()
  }

  test("adc on jittered clusters: right cluster always, recall@5 >= 0.6") {
    // Within a cluster every member shares the query's nearest
    // codewords, so ADC cannot ORDER the members — that is PQ's
    // documented quantization floor (serving stacks re-rank the
    // shortlist exactly). What must hold: every returned neighbour is
    // from the query's cluster (cross-cluster gap 32 vs jitter² ~
    // 0.01), which pigeonholes recall@5 to >= (5+5-7)/5 = 0.6.
    val df = clustered(spread = 8, jitter = true).cache()
    try {
      val vecs = df.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toMap
      val queryIds = Seq(1L, 17L, 33L, 49L)
      val got = PQ.adcTopK(df, queryIds, k = 5, m = 2, ksub = 8, iters = 3)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      queryIds.foreach { q =>
        assert(got(q).forall(n => n % 8 == q % 8),
          s"query $q returned a cross-cluster neighbour: ${got(q)}")
      }
      val hits = queryIds.map { q =>
        val exact = vecs.toSeq.filter(_._1 != q)
          .map { case (id, v) => (id, l2sq(vecs(q), v)) }
          .sortBy(t => (t._2, t._1)).take(5).map(_._1).toSet
        (got(q) & exact).size
      }.sum
      val recall = hits.toDouble / (queryIds.size * 5)
      assert(recall >= 0.6, s"recall@5 = $recall")
    } finally df.unpersist()
  }

  test("ivf-adc: full probe == plain adc; partial probe only prunes") {
    val df = clustered(spread = 4, jitter = true).cache()
    try {
      val coarse = graft.pipeline.Similarity.syntheticCentroids(4, 8)
      val queryIds = Seq(2L, 19L)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(3), r.getLong(1))
      // probing EVERY list must reproduce the unrestricted ADC ranking
      val full = PQ.ivfAdcTopK(df, queryIds, k = 5, m = 2, ksub = 8, iters = 2,
        coarse, nProbe = 4).collect().map(key).toSet
      val plain = PQ.adcTopK(df, queryIds, k = 5, m = 2, ksub = 8, iters = 2)
        .collect().map(key).toSet
      assert(full == plain)
      // a partial probe returns a subset of the candidates (pruning
      // can only REMOVE neighbours, never invent or re-rank survivors
      // ahead of better pruned ones — adist values are unchanged)
      val partial = PQ.ivfAdcTopK(df, queryIds, k = 5, m = 2, ksub = 8, iters = 2,
        coarse, nProbe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fullIds = PQ.ivfAdcTopK(df, queryIds, k = 40, m = 2, ksub = 8, iters = 2,
        coarse, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(partial.subsetOf(fullIds))
      assert(partial.nonEmpty)
    } finally df.unpersist()
  }

  test("residual ivfadc on pure clusters: adists exact to ulps, dups first") {
    // point-mass clusters + ksub covering every distinct residual =>
    // exact reconstruction, so every ADC distance equals the true
    // ||q - x||^2 up to the ulps the residual subtract/re-add
    // introduces (observed: 31.999999999999993 vs ...96 on a
    // mathematical 32-tie — which is also why an id-tie-break ranking
    // comparison would be wrong here: the float ties ARE perturbed)
    val df = clustered(spread = 3, jitter = false).cache()
    try {
      val vecs = df.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toMap
      val queryIds = Seq(0L, 7L, 23L)
      val coarse = graft.pipeline.Similarity.syntheticCentroids(4, 8)
      val rows = PQ.ivfAdcResidualTopK(df, queryIds, k = 5,
        m = 2, ksub = 8, iters = 3, coarse, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      assert(rows.length == queryIds.size * 5)
      rows.foreach { case (q, _, n, adist) =>
        assert(math.abs(adist - l2sq(vecs(q), vecs(n))) < 1e-8,
          s"adist for $q->$n not the true distance: $adist")
      }
      // the two exact duplicates of each query's prototype rank 1-2
      queryIds.foreach { q =>
        val top2 = rows.filter(_._1 == q).sortBy(_._2).take(2).map(_._3).toSet
        val dups = vecs.keySet.filter(id => id != q && id % 8 == q % 8)
        assert(top2 == dups, s"query $q top-2 $top2 != duplicates $dups")
      }
    } finally df.unpersist()
  }

  test("encode plan: one projection, ZERO shuffles, no row blowup") {
    val df = clustered(spread = 2, jitter = false)
    val cb = PQ.train(df, m = 2, ksub = 4, iters = 1)
    val enc = PQ.encode(df, cb)
    val plan = enc.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    assert(plan.collect { case s: ShuffleExchangeExec => s }.isEmpty)
    assert(enc.count() == df.count())
  }

  test("train rejects a dim not divisible into m subspaces") {
    val df = clustered(spread = 1, jitter = false)
    intercept[IllegalArgumentException](PQ.train(df, m = 3, ksub = 2, iters = 1))
  }

  // ---------------- SQ8 scalar quantization ----------------

  test("sq8: codes stay in [0,255], extremes land on the rails, decode error is bounded") {
    val df = clustered(spread = 8, jitter = true)
    val b = graft.pipeline.SQ.trainBounds(df)
    val codes = graft.pipeline.SQ.codes(df)
    val mm = codes.agg(min(col("code")), max(col("code"))).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 255L,
      s"corpus min/max must hit the rails, got $mm")
    // max reconstruction error per dim is half a quantization step
    val dims = df.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
    val dec = codes.join(dims, Seq("vec_id", "pos"))
      .select(col("pos"), col("x"), col("code")).collect()
    dec.foreach { r =>
      val p = r.getInt(0); val x = r.getDouble(1); val c = r.getLong(2)
      val step = (b.hi(p) - b.lo(p)) / 255.0
      val rec = b.lo(p) + c * step
      assert(math.abs(rec - x) <= step / 2 + 1e-12,
        s"dim $p: |$rec - $x| > ${step / 2}")
    }
  }

  test("sq8: constant dimension degenerates to code 0") {
    val df = Seq(
      (0L, Seq(1.0f, 7.5f, 0.0f)), (1L, Seq(2.0f, 7.5f, 1.0f)),
      (2L, Seq(3.0f, 7.5f, 2.0f))).toDF("vec_id", "embedding")
    val c1 = graft.pipeline.SQ.codes(df).filter(col("pos") === 1)
      .select("code").as[Long].collect()
    assert(c1.forall(_ == 0L), c1.toSeq)
  }

  test("ivf-sq8: full probe == plain sq8 adc; partial probe only prunes") {
    val df = clustered(spread = 4, jitter = true).cache()
    try {
      val coarse = graft.pipeline.Similarity.syntheticCentroids(4, 8)
      val queryIds = Seq(2L, 19L)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(3), r.getLong(1))
      val full = graft.pipeline.SQ.ivfSq8TopK(df, queryIds, k = 5,
        coarse, nProbe = 4).collect().map(key).toSet
      val plain = graft.pipeline.SQ.adcTopK(df, queryIds, k = 5)
        .collect().map(key).toSet
      assert(full == plain)
      val partial = graft.pipeline.SQ.ivfSq8TopK(df, queryIds, k = 5,
        coarse, nProbe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fullIds = graft.pipeline.SQ.ivfSq8TopK(df, queryIds, k = 40,
        coarse, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(partial.subsetOf(fullIds))
      assert(partial.nonEmpty)
    } finally df.unpersist()
  }

  test("sq8 top-k achieves high recall vs exact L2 on jittered clusters") {
    val df = clustered(spread = 12, jitter = true)
    val qids = Seq(0L, 17L, 35L)
    val sq = graft.pipeline.SQ.adcTopK(df, qids, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // exact L2 on raw vectors, same exclusion + tie rules
    val raw = df.select(col("vec_id"),
        col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    qids.foreach { q =>
      val exact = raw.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (id, v.zip(raw(q)).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, d2) => (d2, id) }.take(5).map(_._1).toSet
      val inter = sq(q).intersect(exact).size
      assert(inter >= 4, s"query $q: recall@5 $inter/5 too low")
    }
  }

  // ---- binary (sign) quantization ------------------------------------

  test("BQ: hand-computed sign bits, Hamming order and low-id tie break") {
    // means = (4.0, 5.02): v1,v2 sit below both, v3,v4 above both,
    // v5 above dim-1 only
    val df = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.1f)),
      (3L, Array(10.0f, 10.0f)), (4L, Array(10.0f, 9.0f)),
      (5L, Array(0.0f, 6.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.pipeline.BQ.hammingTopK(df, Seq(1L), k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // v2 identical bits (0), v5 one flipped bit (1), v3/v4 two (tie ->
    // lower id first)
    assert(got == Seq((2L, 0L), (5L, 1L), (3L, 2L), (4L, 2L)))
  }

  test("BQ: popcount spans word boundaries (40-dim corpus, 2 packed words)") {
    val dims = 40
    val a = Array.fill(dims)(0.0f)
    val b = Array.fill(dims)(10.0f)
    val c = Array.tabulate(dims)(d => if (d == 35) 0.0f else 10.0f)
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding")
    val got = graft.pipeline.BQ.hammingTopK(df, Seq(2L), k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // c differs from b in exactly the one bit above word 0; a in all 40
    assert(got == Seq((3L, 1L), (1L, 40L)))
  }

  test("BQ rerank: shortlist = corpus reproduces the brute-force ranking exactly") {
    val df = clustered(spread = 3, jitter = true).cache()
    try {
      val n = df.count().toInt
      val queries = Seq(0L, 9L)
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toString).sorted.toSeq
      assert(
        rows(graft.pipeline.BQ.rerankTopK(df, queries, k = 5, shortlist = n)) ==
        rows(graft.pipeline.Similarity.bruteForceTopK(df, queries, k = 5)))
      intercept[IllegalArgumentException] {
        graft.pipeline.BQ.rerankTopK(df, queries, k = 5, shortlist = 3)
      }
    } finally df.unpersist()
  }

  test("BQ rerank: the exact second stage never scores below the raw binary ranking") {
    val df = clustered(spread = 3, jitter = true).cache()
    try {
      val queries = Seq(0L, 9L, 18L)
      val truth = graft.pipeline.Similarity.bruteForceTopK(df, queries, k = 5)
      def meanRecall(approx: org.apache.spark.sql.DataFrame): Double = {
        val m = graft.pipeline.Similarity.recallAtK(approx, truth)
          .collect().map(r => r.getDouble(3))
        m.sum / m.length
      }
      val binary = meanRecall(graft.pipeline.BQ.hammingTopK(df, queries, k = 5))
      val rerank = meanRecall(
        graft.pipeline.BQ.rerankTopK(df, queries, k = 5, shortlist = 15))
      assert(rerank >= binary,
        s"two-stage recall $rerank must be >= one-stage $binary")
    } finally df.unpersist()
  }

  test("BQ: binary recall is measurable and self-consistent on the clustered corpus") {
    val df = clustered(spread = 3, jitter = true).cache()
    try {
      val queries = Seq(0L, 9L, 18L)
      val approx = graft.pipeline.BQ.hammingTopK(df, queries, k = 5)
      val recall = graft.pipeline.Similarity.recallAtK(
        approx, graft.pipeline.Similarity.bruteForceTopK(df, queries, k = 5))
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(recall.keySet == queries.toSet)
      assert(recall.values.forall(r => r >= 0.0 && r <= 1.0))
      // sign bits must at least keep same-prototype copies together:
      // every query's top-5 by Hamming stays inside its own cluster,
      // so recall against L2 truth is well above chance (5/23)
      assert(recall.values.forall(_ >= 0.4), recall.toString)
    } finally df.unpersist()
  }
}
