package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Chunking, Dsir, QualityClassifier, Text}

/** Round-10 additions: document chunking, DSIR importance resampling,
  * and the hashed-feature logistic quality classifier. Planted-input
  * behavioral checks plus fixture invariants; the cross-engine hash
  * parity lives in the pipeline_chunk_documents / pipeline_dsir_select
  * / pipeline_classifier_* oracle entries. */
class SelectionPipelineSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private lazy val docs = Text.loadDocuments(spark, sf)

  // ---------------- chunking ----------------

  test("chunking: hand-computed windows with overlap") {
    val d = Seq(
      (1L, "a b c d e f g h i j"),         // 10 toks, chunk 4 stride 2 -> 4 chunks
      (2L, "a b c"),                        // n <= chunk -> 1 chunk
      (3L, "a b c d")                       // n == chunk -> 1 chunk
    ).toDF("doc_id", "text")
    val out = Chunking.chunk(d, chunkTokens = 4, overlapTokens = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_chunks", "chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 4, 4, "a b c d"), (1L, 1, 4, 4, "c d e f"),
      (1L, 2, 4, 4, "e f g h"), (1L, 3, 4, 4, "g h i j"),
      (2L, 0, 1, 3, "a b c"),
      (3L, 0, 1, 4, "a b c d")))
  }

  test("chunking: every token position is covered and counts reconcile") {
    val out = Chunking.chunk(docs, chunkTokens = 16, overlapTokens = 4)
    // last chunk ends exactly at n; consecutive chunks overlap by 4
    val bad = out.filter(col("chunk_tokens") <= 0 ||
      col("chunk_tokens") > 16 ||
      (col("chunk_id") < col("n_chunks") - 1 && col("chunk_tokens") =!= 16))
    assert(bad.count() == 0)
    // reassembling non-overlapped prefixes gives back the doc's tokens:
    // sum over chunks of (chunk_tokens - overlap·[not first]) == n
    val recon = out.groupBy(col("doc_id"), col("n_chunks"))
      .agg(sum(when(col("chunk_id") === 0, col("chunk_tokens"))
        .otherwise(col("chunk_tokens") - 4)).as("n_recon"))
    val n = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
    assert(recon.join(n, "doc_id").filter(col("n_recon") =!= col("n")).count() == 0)
  }

  // ---------------- DSIR ----------------

  test("dsir: planted target vocabulary ranks target-like docs on top") {
    // targets speak "alpha…", distractors speak "beta…"; one held-out
    // doc of each style is unlabeled — the alpha-style one must win
    val d = ((1L to 20L).map(i => (i, "alpha aleph arrow axiom", true)) ++
      (21L to 40L).map(i => (i, "beta bravo basalt borough", false)) ++
      Seq((100L, "alpha axiom arrow", false), (101L, "beta basalt bravo", false)))
      .toDF("doc_id", "text", "is_tgt")
    val w = Dsir.logWeights(d, col("is_tgt"), nBuckets = 64)
      .filter(col("doc_id") >= 100L)
      .orderBy(col("doc_id"))
      .as[(Long, Double)].collect().toSeq
    assert(w.size == 2 && w(0)._2 > w(1)._2,
      s"alpha-style doc must outweigh beta-style: $w")
    val kept = Dsir.select(d, col("is_tgt"), nBuckets = 64, keepFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(100L) && !kept.contains(101L))
  }

  test("dsir: fixture selection is deterministic and quota-sized") {
    val a = Dsir.select(docs, col("lang") === "en", nBuckets = 64, keepFrac = 0.3)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val b = Dsir.select(docs, col("lang") === "en", nBuckets = 64, keepFrac = 0.3)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(a == b)
    val n = docs.count()
    // >= quota (whole-tie-class at the cut), not wildly more
    assert(a.size >= (n * 0.3).toInt - 1 && a.size <= (n * 0.45).toInt, a.size)
  }

  // ---------------- quality classifier ----------------

  test("classifier: separable planted corpus is separated") {
    val d = ((1L to 30L).map(i => (i, "good clean prose text", true)) ++
      (31L to 60L).map(i => (i, "zz11 @@@@ garbage spam", false)))
      .toDF("doc_id", "text", "y")
    val kept = QualityClassifier.scoreFilter(d, col("y"), nBuckets = 32,
      iters = 5, lr = 4.0, keepFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (1L to 30L).toSet, s"kept=$kept")
  }

  test("classifier: training is deterministic and enriches the target class") {
    val w1 = QualityClassifier.train(docs, col("lang") === "en", 32, 5, 4.0)
      .orderBy("bucket").as[(Long, Double)].collect().toSeq
    val w2 = QualityClassifier.train(docs, col("lang") === "en", 32, 5, 4.0)
      .orderBy("bucket").as[(Long, Double)].collect().toSeq
    assert(w1 == w2)
    val kept = QualityClassifier.scoreFilter(docs, col("lang") === "en",
      32, 5, 4.0, keepFrac = 0.3)
    val enRate = kept.join(docs, "doc_id")
      .agg(avg((col("lang") === "en").cast("double"))).as[Double].head()
    val baseRate = docs.agg(avg((col("lang") === "en").cast("double")))
      .as[Double].head()
    assert(enRate > baseRate, s"kept en-rate $enRate must beat base $baseRate")
  }

  test("classifier: cached train-once route == fresh-train route, and caches") {
    QualityClassifier.clearCache()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val fresh = canon(QualityClassifier.scoreFilter(
      docs, col("lang") === "en", 32, 5, 4.0, keepFrac = 0.3))
    val cached = canon(QualityClassifier.scoreFilter(
      docs, col("lang") === "en", 32, 5, 4.0, keepFrac = 0.3,
      cacheKey = Some("spec-corpus")))
    assert(cached == fresh)
    // second cached call must serve the SAME model object (no retrain):
    // trainedWeights with the key returns the identical map instance
    val w1 = QualityClassifier.trainedWeights(
      docs, col("lang") === "en", 32, 5, 4.0, Some("spec-corpus"))
    val w2 = QualityClassifier.trainedWeights(
      docs, col("lang") === "en", 32, 5, 4.0, Some("spec-corpus"))
    assert(w1 eq w2)
    // a different hyperparameter key must NOT collide
    val w3 = QualityClassifier.trainedWeights(
      docs, col("lang") === "en", 32, 3, 4.0, Some("spec-corpus"))
    assert(!(w3 eq w1))
    QualityClassifier.clearCache()
  }
}
