package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Streaming exact deduplication over a document stream: the online
 * twin of [[Dedup.exact]] for continuously-arriving crawl shards.
 * First arrival of a content fingerprint is emitted, every later
 * arrival is dropped — `flatMapGroupsWithState` keyed by fingerprint
 * holds the lowest doc_id seen so far per fp (Structured Streaming's
 * own `dropDuplicates` keeps an ARBITRARY first-encountered row per
 * key under shuffle parallelism; the explicit state function keeps
 * the batch-deterministic min, so the stream's final output equals
 * the batch operator exactly and the DuckDB oracle can hash-check
 * it).
 *
 * Scale: state is O(distinct fingerprints) — one 16-byte md5 + one
 * long each, the standard streaming-dedup memory model; production
 * deployments bound it with a watermark TTL or RocksDB state store,
 * both config-level choices orthogonal to this logic. Shuffle per
 * batch is by fp — the same key the batch operator groups by.
 */
object StreamDedup {

  private val stagedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("fp", StringType)))

  /** The off-heap state store for corpus-cardinality state: exact
    * dedup holds ~one entry per unique document, which on the default
    * HDFS-backed (on-heap) provider is an executor-memory bound at
    * 100 TB. RocksDB spills the map to local disk — a pure config
    * swap, no operator change (the semantics are provider-independent,
    * pinned by StreamDedupSpec's differential). */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** `(numRowsTotal, memoryUsedBytes)` of the final micro-batch's
    * state operator in the LAST one-shot run — scale evidence for the
    * state-cardinality bound (read by ScaleProbe right after the run;
    * one-shot harness, not concurrent). */
  @volatile private[graft] var lastStateMetrics: Option[(Long, Long)] = None

  /** First-arrival winners per fingerprint over a staged file stream:
    * `(fp, doc_id)`. `srcStage` files replay one per micro-batch in
    * mtime order. State per fp = the min doc_id seen (a bare Long —
    * primitive state encodes without bean/case-class codegen). */
  private def runDedup(spark: SparkSession, srcStage: String): DataFrame = {
    import spark.implicits._
    val out = spark.readStream.schema(stagedSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcStage)
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val batchMin = rows.map(_._1).min
          if (state.exists) {
            // duplicate arrivals never re-emit; keep the min for the
            // (ordered-replay) invariant check below
            if (batchMin < state.get) state.update(batchMin)
            Iterator.empty
          } else {
            state.update(batchMin)
            Iterator.single((fp, batchMin))
          }
      }
      .toDF("fp", "doc_id")
    val sinkDir = java.nio.file.Files
      .createTempDirectory("graft_sdedup_").resolve("out").toString
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("append").parquet(sinkDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    lastStateMetrics = q.recentProgress.reverseIterator
      .flatMap(_.stateOperators.headOption)
      .map(so => (so.numRowsTotal, so.memoryUsedBytes))
      .nextOption()
    spark.read.parquet(sinkDir)
  }

  /**
   * One-shot replay of the documents fixture through the streaming
   * dedup in `nChunks` doc_id-ordered micro-batches (the same
   * range-partition staging discipline as the TS streaming family —
   * ascending arrival makes first-arrival = min doc_id, so the result
   * is the batch canonical mapping and fully oracle-checkable).
   */
  def documentsDedupOnce(
      spark: SparkSession, dir: String, nChunks: Int = 8,
      useRocksDb: Boolean = false): DataFrame =
      graft.ts.Compaction.withStatePartitions(spark, 8) {
      graft.ts.Compaction.withConf(spark,
        "spark.sql.streaming.stateStore.providerClass",
        if (useRocksDb) RocksDbProvider
        else spark.conf.get("spark.sql.streaming.stateStore.providerClass")) {
    val docs = Text.loadDocuments(spark, dir)
    val srcStage = java.nio.file.Files
      .createTempDirectory("graft_sdedup_src_").resolve("stage").toString
    Text.fingerprint(docs)
      .repartitionByRange(nChunks, col("doc_id"))
      .write.mode("overwrite").parquet(srcStage)
    locally {
      val files = new java.io.File(srcStage).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      require(files.length == nChunks,
        s"staging produced ${files.length} files for $nChunks chunks")
      files.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1000000000000L + i * 60000L)
      }
    }
    runDedup(spark, srcStage)
  } }

  /** Oracle: ascending replay makes the streaming winner the global
    * min doc_id per fingerprint — [[Dedup.exact]]'s canonical id. */
  val documentsDedupOnceSql: String =
    s"""WITH fp AS (${Text.fingerprintSql})
       |SELECT fp, min(doc_id) AS doc_id FROM fp GROUP BY fp""".stripMargin
}
