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

  test("fractional score: hand-computed overlap fractions, absent-short-doc rule") {
    val bench = Seq((900L, "a b c d e f")).toDF("doc_id", "text")
    // bench 3-shingles (n=3): "a b c","b c d","c d e","d e f"
    val corpus = Seq(
      (1L, "a b c d x"),   // shingles: "a b c","b c d","c d x" -> 2/3
      (2L, "a b c d e f"), // all 4 bench shingles -> 4/4
      (3L, "p q r s"),     // disjoint -> 0/2
      (4L, "x y"))         // < n tokens: no shingles, absent
      .toDF("doc_id", "text")
    val got = CorpusPipeline.contaminationFraction(corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(math.abs(got(1L) - 2.0 / 3) < 1e-12)
    assert(got(2L) == 1.0)
    assert(got(3L) == 0.0)
  }

  test("fractional score counts DISTINCT shingles once, however often repeated") {
    val bench = Seq((900L, "a b c")).toDF("doc_id", "text")
    // "a b c" appears twice but is ONE distinct shingle of 5 total:
    // "a b c","b c a","c a b","a b c","b c z" -> distinct {a b c, b c a, c a b, b c z}
    val corpus = Seq((1L, "a b c a b c z")).toDF("doc_id", "text")
    val got = CorpusPipeline.contaminationFraction(corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 1.0 / 4) < 1e-12)
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
