package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{CorpusPipeline, Text}

/** Two-phase Bloom contamination: result identity with the exact
  * operator, actual map-side pruning, and the no-false-negative
  * property on planted overlaps. */
class BloomContaminationSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2))

  test("bloom two-phase == exact contamination on the fixture") {
    val docs = Text.loadDocuments(spark, sf)
    val bench = docs.filter(col("doc_id") < 3)
    val exact = CorpusPipeline.contamination(docs, bench, 5L)
      .collect().map(key).toSet
    val bloom = CorpusPipeline.contaminationBloom(docs, bench, 5L)
      .collect().map(key).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty, "fixture self-contamination should flag the bench docs")
  }

  test("planted overlap is never lost (no false negatives) at high fpp") {
    // even a deliberately lossy bloom (fpp 0.5) must keep every true
    // member — false positives only cost join work, never recall
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // contaminated
      (2L, "totally different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val got = CorpusPipeline.contaminationBloom(corpus, bench, minShared = 5L, fpp = 0.5)
      .collect().map(key).toSet
    assert(got == Set((1L, 900L, 5L)))
  }

  test("the prefilter prunes a disjoint corpus before the join") {
    val bench = Seq((900L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = (0L until 50L)
      .map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
      .toDF("doc_id", "text")
    // disjoint shingle spaces: at fpp 0.001 essentially nothing passes
    // the bloom, so the exact phase joins (near-)zero rows
    val got = CorpusPipeline.contaminationBloom(corpus, bench, 1L, fpp = 0.001)
    assert(got.collect().isEmpty)
  }
}
