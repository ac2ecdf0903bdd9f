package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document chunking for training/RAG pipelines — split each document
 * into fixed-size token windows with overlap (the standard sliding
 * splitter contract: stride = chunk - overlap; a document with
 * n <= chunk tokens yields exactly one chunk; otherwise
 * ceil((n - chunk) / stride) + 1 chunks, the last possibly short).
 *
 * Scale design: a PURE per-document projection + explode — zero
 * shuffle, zero window, whole-stage codegen end to end. Each executor
 * chunks its own parquet partitions; at 100 TB the plan is
 * scan → project → generate, the only admissible shape for a
 * corpus-sized rewrite. Chunk text is re-joined from the token slice
 * (`slice` + `array_join`), so output size ~= input size × (1 +
 * overlap/stride) — the overlap amplification is the declared cost.
 *
 * Tokens are whitespace runs (`\s+` on the trimmed text) — the same
 * tokenizer every [[Text]] operator uses, so chunk token counts
 * compose with token-count accounting downstream.
 */
object Chunking {

  /** `(doc_id, chunk_id, n_chunks, chunk_start, chunk_tokens,
    * chunk_text)` — chunk_id is 0-based, chunk_start is the 0-based
    * token offset, chunk_tokens = actual tokens in this chunk
    * (= chunkTokens except possibly the last). Empty/whitespace-only
    * documents yield one empty chunk (n=1 token by the split contract:
    * splitting "" gives [""]). */
  def chunk(docs: DataFrame, chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need 0 <= overlap < chunk")
    val stride = chunkTokens - overlapTokens
    val toks = split(trim(col("text")), "\\s+")
    val n = size(toks)
    // n <= chunk -> 1 chunk; else ceil((n-chunk)/stride) + 1
    val nChunks = when(n <= chunkTokens, lit(1))
      .otherwise(ceil((n - chunkTokens).cast("double") / stride).cast("int") + 1)
    docs
      .select(col("doc_id"), toks.as("toks"), n.as("n"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("toks"), col("n"), col("n_chunks"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"), col("n_chunks"),
        (col("chunk_id") * stride).as("chunk_start"),
        least(lit(chunkTokens), col("n") - col("chunk_id") * stride)
          .as("chunk_tokens"),
        array_join(slice(col("toks"), col("chunk_id") * stride + 1,
          lit(chunkTokens)), " ").as("chunk_text"))
  }

  /** DuckDB twin: generate_series over the same chunk-count formula,
    * list_slice on 1-based inclusive bounds. */
  def chunkSql(chunkTokens: Int, overlapTokens: Int): String = {
    val stride = chunkTokens - overlapTokens
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents
       |), sized AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    CASE WHEN len(toks) <= $chunkTokens THEN 1
       |         ELSE CAST(ceil((len(toks) - $chunkTokens) * 1.0 / $stride) AS INT) + 1
       |    END AS n_chunks
       |  FROM t
       |)
       |SELECT doc_id, chunk_id, n_chunks,
       |  chunk_id * $stride AS chunk_start,
       |  least($chunkTokens, n - chunk_id * $stride) AS chunk_tokens,
       |  array_to_string(list_slice(toks, chunk_id * $stride + 1,
       |    chunk_id * $stride + $chunkTokens), ' ') AS chunk_text
       |FROM sized, unnest(generate_series(0, n_chunks - 1)) AS g(chunk_id)"""
      .stripMargin
  }
}
