package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SAX symbolization (Lin/Keogh et al., "A Symbolic Representation of
 * Time Series"): PAA-reduce each series to per-bucket means,
 * z-normalize the PAA values per series, then map each value to a
 * symbol by the equiprobable N(0,1) breakpoints — here the fixed
 * 4-letter alphabet {a,b,c,d} with breakpoints (-q, 0, +q),
 * q = 0.6744897501960817 (the standard-normal quartile). The
 * concatenated word is the series' shape signature — the classic
 * preprocessing step for whole-series similarity search / motif
 * indexing over huge series collections.
 *
 * Plan: ONE hash aggregation to PAA (series×buckets rows), analytic
 * mean/stddev windows and the symbol projection on that tiny frame
 * (all sharing a single exchange by series), then a per-series
 * sort-and-concat over its own buckets. The raw samples are touched
 * exactly once; everything after the PAA agg is bounded by
 * series × buckets, independent of samples-per-bucket. Z-scores are
 * rounded to 9 decimals before the breakpoint comparison so
 * float-sum association noise can't flip a symbol across engines.
 */
object Sax {

  private val Q = "0.6744897501960817"

  /** `(series, n_buckets, sax_word)`. A constant series (stddev 0)
    * z-scores to 0 everywhere → all-'c' by the half-open breakpoint
    * convention (symbol = first class whose upper bound exceeds z;
    * z = 0 falls in [0, q)). */
  def saxWords(
      samples: DataFrame, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val paa = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(avg(col("value")).as("paa"))
    val byS = org.apache.spark.sql.expressions.Window.partitionBy(col("series"))
    val z = paa
      .withColumn("mu", avg(col("paa")).over(byS))
      .withColumn("sd", stddev_pop(col("paa")).over(byS))
      .withColumn("z", round(
        when(col("sd") > 0, (col("paa") - col("mu")) / col("sd"))
          .otherwise(lit(0.0)), 9))
      .withColumn("sym",
        when(col("z") < -Q.toDouble, lit("a"))
          .when(col("z") < 0, lit("b"))
          .when(col("z") < Q.toDouble, lit("c"))
          .otherwise(lit("d")))
    z.groupBy(col("series"))
      .agg(
        count(lit(1)).as("n_buckets"),
        array_join(transform(
          array_sort(collect_list(struct(col("bucket"), col("sym")))),
          e => e.getField("sym")), "").as("sax_word"))
  }

  /** DuckDB twin — same breakpoints, same round-9 collapse,
    * string_agg ordered by bucket. */
  def saxWordsSql(
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), paa AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS paa
       |  FROM f GROUP BY series, $bkt
       |), z AS (
       |  SELECT series, bucket,
       |    round(CASE WHEN stddev_pop(paa) OVER (PARTITION BY series) > 0
       |      THEN (paa - avg(paa) OVER (PARTITION BY series))
       |             / stddev_pop(paa) OVER (PARTITION BY series)
       |      ELSE 0.0 END, 9) AS z
       |  FROM paa
       |), sym AS (
       |  SELECT series, bucket,
       |    CASE WHEN z < -$Q THEN 'a'
       |         WHEN z < 0 THEN 'b'
       |         WHEN z < $Q THEN 'c'
       |         ELSE 'd' END AS sym
       |  FROM z
       |)
       |SELECT series, count(*) AS n_buckets,
       |  string_agg(sym, '' ORDER BY bucket) AS sax_word
       |FROM sym GROUP BY series""".stripMargin
  }

  /**
   * Motif discovery over the SAX vocabulary — the POINT of
   * symbolizing (Lin/Keogh's motif-indexing use case): the top-k
   * length-`m` symbol patterns by occurrence count across ALL series'
   * words, `(motif, n_occurrences, n_series)`. "Which shapes does
   * this fleet keep repeating" — a spike-then-recover 'dba' or a
   * daily ramp 'abcd' surfacing across thousands of metrics is an
   * operational fingerprint no per-series query can see.
   *
   * Occurrences overlap (standard motif counting); n_series counts
   * how many distinct series exhibit the motif at least once, so a
   * single pathological series can't masquerade as a fleet-wide
   * pattern. Plan shape: the words frame is series-bounded; the
   * m-gram explode emits ≤ buckets−m+1 rows per series (still
   * series×buckets, independent of raw sample count); ONE
   * map-side-combined motif agg; the k cut is a distributed
   * TakeOrdered on the (count, n_series, motif) total order.
   */
  def motifs(
      samples: DataFrame, bucketMs: Long, m: Int, k: Int,
      alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(m >= 1, s"motif length $m must be >= 1")
    require(k >= 1, s"top-k $k must be >= 1")
    val words = saxWords(samples, bucketMs, alignMs, fromMs, toMs)
    words.filter(length(col("sax_word")) >= m)
      .select(col("series"), col("sax_word"),
        explode(sequence(lit(1), length(col("sax_word")) - m + 1)).as("pos"))
      .select(col("series"), expr(s"substring(sax_word, pos, $m)").as("motif"))
      .groupBy(col("motif"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("series")).as("n_series"))
      .orderBy(col("n_occurrences").desc, col("n_series").desc,
        col("motif").asc)
      .limit(k)
  }

  /** DuckDB twin of [[motifs]] — [[saxWordsSql]] as a subquery, the
    * same overlapping m-gram explode and ranked head. */
  def motifsSql(
      bucketMs: Long, m: Int, k: Int, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String =
    s"""WITH words AS (
       |${saxWordsSql(bucketMs, alignMs, fromMs, toMs, cte)}
       |), g AS (
       |  SELECT series, substring(sax_word, CAST(i AS INT), $m) AS motif
       |  FROM words, unnest(range(1, len(sax_word) - $m + 2)) AS t(i)
       |  WHERE len(sax_word) >= $m
       |)
       |SELECT motif, CAST(count(*) AS BIGINT) AS n_occurrences,
       |       CAST(count(DISTINCT series) AS BIGINT) AS n_series
       |FROM g GROUP BY motif
       |ORDER BY n_occurrences DESC, n_series DESC, motif ASC
       |LIMIT $k""".stripMargin
}
