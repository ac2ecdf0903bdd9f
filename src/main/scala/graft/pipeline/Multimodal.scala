package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("features", ArrayType(FloatType))))

  /** Batched feature extraction: one partition = one decode batch
    * (the Scala analogue of a pandas-UDF `mapInPandas` loop). */
  def extractFeatures(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    val rdd = packed.select(col("media_id"), col("media")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (feat, mean) = fakeDecode(bytes)
        Row(id, bytes.length.toLong, mean, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
