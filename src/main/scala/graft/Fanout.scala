package graft

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Scan-starvation fan-out (r17, optimization guide §2.2/§2.5/§1.2).
 *
 * A parquet scan parallelizes at ROW-GROUP granularity, so a compact
 * single-row-group input (the fixture layout at every SF: one file,
 * one row group) yields ONE scan partition — and every CPU-heavy
 * derivation fused into that map stage (tokenize, shingle, per-token
 * md5/xxhash64) runs serially on one core while the rest of the
 * session idles. At production scale the same operators see thousands
 * of splits and the problem does not exist.
 *
 * [[ifStarved]] is the scale-adaptive redistribution: when (and only
 * when) the frame's natural partitioning offers fewer slots than the
 * session (`defaultParallelism`), hash-redistribute the COMPACT rows —
 * documents before they are exploded into tokens/shingles, never the
 * exploded intermediate — across a PINNED `defaultParallelism`
 * partitions (the session's slot count, not
 * `spark.sql.shuffle.partitions` — see the pinning note below). The
 * condition reads the actual scan layout, not a local-mode constant:
 * on a cluster-scale table (splits >= slots) this is the identity and
 * the plan is unchanged, so operators keep their no-corpus-shuffle
 * production shape while the starved small-scan case stops
 * serializing. The key is a real column (deterministic hash
 * assignment — a round-robin repartition would pay the
 * sort-before-repartition pass and rely on retry-unsafe ordering,
 * guide §2.5).
 *
 * Streaming frames are returned untouched: their per-batch
 * parallelism is the source's, and `df.rdd` is undefined for them.
 */
object Fanout {

  def ifStarved(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df
    val slots = df.sparkSession.sparkContext.defaultParallelism
    // planning only — building the RDD DAG runs no job
    val parts = try df.rdd.getNumPartitions catch { case _: Throwable => slots }
    // the partition count is PINNED: a keyed repartition without an
    // explicit count is fair game for AQE partition coalescing, which
    // sees a few-hundred-KB shuffle and merges it back to ONE partition
    // — re-serializing exactly the CPU-heavy map work this exists to
    // spread (measured: the un-pinned form executed scoreWithWeights
    // as a single 3.8 s task; pinned, the same chain is ~0.3 s across
    // the session). Pinning only applies on the starved branch, where
    // per-partition data is tiny and coalescing has nothing to save.
    if (parts < slots) df.repartition(slots, key) else df
  }
}
