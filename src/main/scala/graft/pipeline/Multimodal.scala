package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media as opaque `BINARY` columns with
 * typed metadata, and batch feature extraction via `mapPartitions`.
 *
 * The decode step is a clearly-marked STUB (this container has no
 * image/audio codecs): [[fakeDecode]] derives deterministic
 * pseudo-features from raw bytes. Everything around it — schema,
 * binary packing, partition-batched extraction, feature vector shape —
 * is the real production plumbing: swap [[fakeDecode]] for a JNI/codec
 * call and nothing else changes. At 100 TB the media table is
 * partitioned by id range; extraction is one `mapPartitions` pass with
 * no shuffle at all.
 */
object Multimodal {

  /** Pack text fixtures into the canonical media schema
    * `(media_id, media BINARY, meta STRUCT<format, n_bytes>)`. */
  def pack(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(lit("txt").as("format"),
        length(encode(col("text"), "UTF-8")).as("n_bytes")).as("meta"))

  val featureDim = 16

  /** STUB decoder: a real implementation would decode image/audio bytes
    * here (e.g. JPEG -> pixels -> resize -> embed). Deterministic
    * stand-in: a 16-bin byte histogram (normalized) plus mean byte
    * value — enough to exercise schema, batching, and downstream
    * consumers with stable values. */
  def fakeDecode(bytes: Array[Byte]): (Array[Float], Double) = {
    val hist = new Array[Float](featureDim)
    var sum = 0.0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      hist(b * featureDim / 256) += 1f
      sum += b
      i += 1
    }
    val n = math.max(bytes.length, 1)
    var k = 0
    while (k < featureDim) { hist(k) /= n; k += 1 }
    (hist, sum / n)
  }

  /** Batched feature extraction: one partition = one decode batch
    * (the Scala analogue of a pandas-UDF `mapInPandas` loop).
    *
    * Typed `Dataset.mapPartitions`, NOT `df.rdd` (VERDICT r01: the RDD
    * round-trip severed the Catalyst plan, killing codegen/AQE and
    * columnar reads on either side). This stays a single logical plan —
    * DeserializeToObject -> MapPartitions -> SerializeFromObject —
    * so upstream column pruning still reaches the parquet scan and
    * downstream operators plan against known statistics.
    *
    * Zero-length media yields a NULL mean_byte — the mean of nothing
    * is undefined, matching the SQL oracle's `list_avg([])` (review
    * r04: a 0.0 placeholder would silently diverge the differential
    * the moment an empty document enters the fixture). */
  def extractFeatures(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (feat, mean) = fakeDecode(bytes)
          (id, bytes.length.toLong,
            if (bytes.isEmpty) None else Some(mean), feat)
        }
      }
      .toDF("media_id", "n_bytes", "mean_byte", "features")
  }

  /** STUB resize kernel: nearest-neighbour resample of the media byte
    * stream to exactly `target` bytes (`out[k] = in[floor(k*n/target)]`)
    * — the 1-D shape of an image NN-resize. A real implementation swaps
    * this loop for a codec + 2-D resample; the surrounding plumbing
    * (typed mapPartitions batch, binary in/out, metadata) is unchanged. */
  def nnResample(bytes: Array[Byte], target: Int): Array[Byte] = {
    val n = bytes.length
    if (n == 0) Array.emptyByteArray
    else Array.tabulate(target)(k => bytes((k.toLong * n / target).toInt))
  }

  /** Media resize: every item downsampled to a fixed-size thumbnail.
    * One typed `mapPartitions` pass (single Catalyst pipeline, zero
    * shuffles — identical scale shape to [[extractFeatures]]). Output
    * keeps the thumbnail as `BINARY` plus its digest so correctness is
    * byte-exact checkable without comparing raw binaries. */
  def resize(packed: DataFrame, target: Int = 64): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media"))
      .filter(length(col("media")) > 0).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (id, bytes.length.toLong, nnResample(bytes, target))
        }
      }
      .toDF("media_id", "n_bytes_in", "thumb")
      .select(col("media_id"), col("n_bytes_in"),
        md5(col("thumb")).as("thumb_md5"))
  }

  /** DuckDB twin of [[resize]] (media is UTF-8-packed ASCII text in the
    * fixture, so character ops == byte ops). */
  def resizeSql(target: Int = 64): String =
    s"""SELECT doc_id AS media_id,
       |  CAST(strlen(text) AS BIGINT) AS n_bytes_in,
       |  md5(list_aggregate(
       |    [substring(text, CAST(floor(k * strlen(text) / $target) AS INT) + 1, 1)
       |     for k in range(0, $target)], 'string_agg', '')) AS thumb_md5
       |FROM documents WHERE strlen(text) > 0""".stripMargin

  /** Frame sampling: cut the media stream into fixed-size frames and
    * keep every `rate`-th one (the video-keyframe shape: decode is the
    * per-frame digest stub, the iterator `flatMap` is the real
    * one-pass-per-partition batch plumbing). Only complete frames are
    * emitted (a trailing partial frame is dropped, as a codec would).
    * Output grows by ~`1/(frameBytes*rate)` of the input — an explode
    * that never shuffles. */
  def frameSample(packed: DataFrame, frameBytes: Int = 256, rate: Int = 4): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          (0 until nFrames).iterator
            .filter(_ % rate == 0)
            .map { f =>
              val off = f * frameBytes
              (id, f, off.toLong,
                java.util.Arrays.copyOfRange(bytes, off, off + frameBytes))
            }
        }
      }
      .toDF("media_id", "frame_idx", "offset", "frame")
      .select(col("media_id"), col("frame_idx"), col("offset"),
        md5(col("frame")).as("frame_md5"))
  }

  def frameSampleSql(frameBytes: Int = 256, rate: Int = 4): String =
    s"""WITH f AS (
       |  SELECT doc_id AS media_id, text,
       |         unnest(range(0, strlen(text) // $frameBytes)) AS frame_idx
       |  FROM documents
       |)
       |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       |       CAST(frame_idx * $frameBytes AS BIGINT) AS "offset",
       |       md5(substring(text, CAST(frame_idx * $frameBytes AS INT) + 1, $frameBytes)) AS frame_md5
       |FROM f WHERE frame_idx % $rate = 0""".stripMargin
}
