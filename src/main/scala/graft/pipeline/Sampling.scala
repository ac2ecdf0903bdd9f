package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The shared bounded-sample draw for trainers ([[PQ.trainSampled]],
 * [[Clustering.kmeansCentroidsSampled]]) and the plan guard that pins
 * its shape (PlanShapeSpec): order by md5-of-decimal-id then id, take
 * the first `n`. Properties the one definition guarantees everywhere:
 *
 *  - compiles to `TakeOrderedAndProject` — per-partition top-N plus a
 *    driver merge, bounded memory at ANY corpus size, never a
 *    sort-the-world Exchange;
 *  - md5 (not xxhash64) because BOTH engines compute it identically,
 *    so a DuckDB oracle replays the exact draw
 *    (`ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT n`);
 *  - deterministic: hash order, then id tie-break.
 *
 * Cost: ONE corpus pass (any training scheme needs at least one look
 * at the data); everything downstream is bounded by `n`.
 */
object Sampling {

  /** The draw plan: `df` ordered by (md5(idCol-as-string), idCol),
    * first `n` rows. */
  def hashOrderedSample(df: DataFrame, n: Int, idCol: String = "vec_id"): DataFrame = {
    require(n > 0)
    df.sort(md5(col(idCol).cast("string")), col(idCol)).limit(n)
  }

  /** The draw, materialized as a driver-side LocalRelation: the rows
    * live once on the driver (bounded by `n` — the contract that makes
    * sampled training viable), NOT as checkpoint blocks pinned in
    * executor storage for the JVM's lifetime. Downstream Lloyd jobs
    * scan this tiny local frame instead of the corpus. */
  def hashOrderedSampleLocal(df: DataFrame, n: Int, idCol: String = "vec_id"): DataFrame = {
    val drawn = hashOrderedSample(df, n, idCol)
    val rows = drawn.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), drawn.schema)
  }
}
