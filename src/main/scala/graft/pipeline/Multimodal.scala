package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media as opaque `BINARY` columns with
 * typed metadata, and batch feature extraction via `mapPartitions`.
 *
 * IMAGE decode is REAL (r10): the JDK ships PNG/JPEG codecs
 * (javax.imageio, headless-safe), so [[packImages]]/[[decodeImages]]/
 * [[resizeImages]] run a genuine encode → decode → transform →
 * re-encode → decode chain, oracle-checked end to end (PNG is
 * lossless and the synthesized pixels derive from doc digests the
 * oracle can recompute). AUDIO/VIDEO codecs are genuinely absent from
 * the container, so [[fakeDecode]] remains the clearly-marked stub
 * for those modalities — deterministic pseudo-features from raw
 * bytes; swap it for a codec call and nothing else changes. At 100 TB
 * the media table is partitioned by id range; extraction is one
 * `mapPartitions` pass with no shuffle at all.
 */
object Multimodal {

  // ImageIO's default stream cache backs every read/write with a temp
  // FILE in java.io.tmpdir — per-row create/delete I/O that dominates
  // the actual decode of small images and breaks under a read-only
  // tmpdir (r10 review). The object initializer runs once per JVM
  // (driver AND each executor, since the mapPartitions closures call
  // into this object), so every codec path below uses pure in-memory
  // streams.
  javax.imageio.ImageIO.setUseCache(false)

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

  // ---- REAL image decode (r10): the carried "no codecs in this
  // container" assumption was wrong for images — the JDK itself ships
  // PNG/JPEG codecs (javax.imageio, headless-safe). The path below is
  // a genuine encode → decode → measure chain, oracle-checkable
  // because PNG is LOSSLESS: media is synthesized as a real PNG whose
  // pixels derive deterministically from the document (md5 digest →
  // 4×4 grayscale block), so the decoded pixel statistics are
  // recomputable relationally by DuckDB from `documents` alone. Swap
  // the synthesis for a crawl's real image bytes and decode/resize
  // run unchanged. ----

  /** Each doc's md5 digest (16 bytes) rendered as a REAL 4×4 grayscale
    * PNG: `(media_id, media BINARY, meta)`. One mapPartitions pass —
    * the encode twin of the decode below. */
  def packImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text"))).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, hex) =>
          val img = new java.awt.image.BufferedImage(
            4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var p = 0
          while (p < 16) {
            val g = Integer.parseInt(hex.substring(2 * p, 2 * p + 2), 16)
            img.setRGB(p % 4, p / 4, (g << 16) | (g << 8) | g)
            p += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("media_id", "media")
      .select(col("media_id"), col("media"),
        struct(lit("png").as("format"),
          length(col("media")).as("n_bytes")).as("meta"))
  }

  private def grayPixels(img: java.awt.image.BufferedImage): Array[Int] = {
    val out = new Array[Int](img.getWidth * img.getHeight)
    var i = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        out(i) = img.getRGB(x, y) & 0xFF
        i += 1; x += 1
      }
      y += 1
    }
    out
  }

  /** REAL decode: `ImageIO.read` each PNG and measure pixel
    * statistics — `(media_id, width, height, mean_gray, min_gray,
    * max_gray)`. Same zero-shuffle typed-mapPartitions shape as
    * [[extractFeatures]]; the oracle re-derives every value from the
    * md5 digest (lossless roundtrip). */
  def decodeImages(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"media $id is not a decodable image")
          val px = grayPixels(img)
          (id, img.getWidth, img.getHeight,
            px.sum.toDouble / px.length, px.min, px.max)
        }
      }
      .toDF("media_id", "width", "height", "mean_gray", "min_gray", "max_gray")
  }

  /** REAL resize: decode, integer nearest-neighbour upscale (each
    * pixel becomes a `scale`×`scale` block — deterministic, no
    * interpolation ambiguity), re-encode as PNG, decode AGAIN and
    * measure — proving the full decode→transform→encode→decode chain.
    * Block replication preserves mean/min/max exactly, so the oracle
    * still recomputes every value from the digest. */
  def resizeImages(packed: DataFrame, scale: Int = 2): DataFrame = {
    require(scale >= 1)
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"media $id is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val big = new java.awt.image.BufferedImage(
            w * scale, h * scale, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h * scale) {
            var x = 0
            while (x < w * scale) {
              big.setRGB(x, y, img.getRGB(x / scale, y / scale))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(big, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val px = grayPixels(back)
          (id, back.getWidth, back.getHeight,
            px.sum.toDouble / px.length, px.min, px.max)
        }
      }
      .toDF("media_id", "width", "height", "mean_gray", "min_gray", "max_gray")
  }

  /** DuckDB twin of [[decodeImages]] ∘ [[packImages]] (and, with
    * `scale`, of [[resizeImages]]): md5-hex pairs → byte values →
    * pixel statistics. */
  def decodeImagesSql(scale: Int = 1): String =
    s"""WITH h AS (
       |  SELECT doc_id, md5(text) AS h FROM documents
       |), b AS (
       |  SELECT doc_id,
       |    16 * (strpos('0123456789abcdef', substring(h, 2 * i + 1, 1)) - 1)
       |      + (strpos('0123456789abcdef', substring(h, 2 * i + 2, 1)) - 1) AS byte
       |  FROM h, unnest(range(0, 16)) AS t(i)
       |)
       |SELECT doc_id AS media_id,
       |  CAST(${4 * scale} AS INT) AS width, CAST(${4 * scale} AS INT) AS height,
       |  avg(byte) AS mean_gray,
       |  CAST(min(byte) AS INT) AS min_gray, CAST(max(byte) AS INT) AS max_gray
       |FROM b GROUP BY doc_id""".stripMargin

  /**
   * Perceptual difference-hash (dHash) over a REAL image decode — the
   * image twin of [[graft.pipeline.Dedup.simhashPairs]]: visually
   * near-identical images land at small hamming distance, so image
   * near-dup dedup becomes a fingerprint join instead of a pixel
   * comparison. The image is nearest-neighbour-sampled onto a
   * `grid`×`grid` gray grid (identity for the fixture's 4×4 PNGs at
   * the default grid 4), then `2·g·(g−1)` bits of adjacent-pixel
   * comparisons: rows y/x∈0..g−2 `px[y][x+1] > px[y][x]` at bit
   * y·(g−1)+x; columns `px[y+1][x] > px[y][x]` at bit
   * g·(g−1)+x·(g−1)+y. Gradients survive re-encode/resize; absolute
   * levels (which plain hashing keys on) don't matter.
   */
  /** Hash width for a `grid`×`grid` dHash: row + column comparisons. */
  def phashBits(grid: Int): Int = 2 * grid * (grid - 1)

  def imagePhash(packed: DataFrame, grid: Int = 4): DataFrame = {
    // grid 6 → 60 bits is the Long ceiling; grid 4 matches the
    // fixture's 4×4 PNGs exactly (sampling = identity). Production
    // corpora use the larger grid: the longer hash is what keeps the
    // banded join keys selective at scale (see [[imagePhashPairs]]).
    require(grid >= 2 && grid <= 6, s"grid $grid outside [2, 6]")
    val g = grid
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"media $id is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val px = new Array[Int](g * g)
          var y = 0
          while (y < g) {
            var x = 0
            while (x < g) {
              px(y * g + x) = img.getRGB(x * w / g, y * h / g) & 0xFF
              x += 1
            }
            y += 1
          }
          var hash = 0L
          var bit = 0
          y = 0
          while (y < g) {
            var x = 0
            while (x < g - 1) {
              if (px(y * g + x + 1) > px(y * g + x)) hash |= 1L << bit
              bit += 1; x += 1
            }
            y += 1
          }
          var x = 0
          while (x < g) {
            var yy = 0
            while (yy < g - 1) {
              if (px((yy + 1) * g + x) > px(yy * g + x)) hash |= 1L << bit
              bit += 1; yy += 1
            }
            x += 1
          }
          (id, hash)
        }
      }
      .toDF("media_id", "phash")
  }

  /**
   * Image near-dup pairs by perceptual hash: `(i, j, hamming)` with
   * `hamming <= maxDist`, banded-LSH shape — the hash splits into
   * `maxDist + 1` equal bands, a pair within maxDist differs in at
   * most maxDist bands so it SHARES at
   * least one exact band (pigeonhole); candidates join on (band,
   * value) and the exact bit_count verify filters them, which makes
   * the banded result provably EQUAL to the quadratic ground truth —
   * the DuckDB oracle computes that ground truth as an independent
   * algorithm. One decode pass (checkpointed: one long per image),
   * candidate join keyed by band value, never all-pairs.
   */
  def imagePhashPairs(
      packed: DataFrame, maxDist: Int = 3, grid: Int = 4): DataFrame = {
    val nBits = phashBits(grid)
    val nBands = maxDist + 1
    // bands must TILE the hash exactly or the pigeonhole recall
    // guarantee silently breaks on the uncovered tail
    require(maxDist >= 0 && nBits % nBands == 0,
      s"maxDist $maxDist: $nBands bands must divide $nBits bits")
    val bandBits = nBits / nBands
    // SCALE NOTE: band-key selectivity is 2^bandBits. The fixture's
    // 4×4 grid (24-bit hash, 6-bit bands = 64 values) is demo-sized —
    // at corpus scale the band buckets fill and the candidate join
    // degenerates toward quadratic. The production setting is the
    // larger grid (grid 6 → 60-bit hash, 15-bit bands at maxDist 3),
    // where random collisions stay rare; the 30× probe measures grid 6.
    val ph = imagePhash(packed, grid).localCheckpoint()
    val bands = ph.select(col("media_id"), col("phash"),
      explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("band_val",
        expr(s"shiftright(phash, $bandBits * band)")
          .bitwiseAND(lit((1L << bandBits) - 1)))
    val a = bands.select(col("media_id").as("i"), col("phash").as("pi"),
      col("band"), col("band_val"))
    val b = bands.select(col("media_id").as("j"), col("phash").as("pj"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val")).filter(col("i") < col("j"))
      .select(col("i"), col("j"), col("pi"), col("pj")).distinct()
      .withColumn("hamming",
        bit_count(col("pi").bitwiseXOR(col("pj"))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select(col("i"), col("j"), col("hamming"))
  }

  /** DuckDB twin of [[imagePhashPairs]] ∘ [[packImages]]: the hash
    * re-derived from the md5 digest bytes, pairs by the QUADRATIC
    * ground-truth join — an independent algorithm that must agree
    * with the banded plan exactly. */
  def imagePhashPairsSql(maxDist: Int = 3): String = {
    // px list is 1-based in DuckDB: px[y*4+x+1] is pixel (x, y)
    val rowBits = for (y <- 0 until 4; x <- 0 until 3) yield
      s"(CASE WHEN px[${y * 4 + x + 2}] > px[${y * 4 + x + 1}] " +
        s"THEN ${1L << (y * 3 + x)} ELSE 0 END)"
    val colBits = for (x <- 0 until 4; y <- 0 until 3) yield
      s"(CASE WHEN px[${(y + 1) * 4 + x + 1}] > px[${y * 4 + x + 1}] " +
        s"THEN ${1L << (12 + x * 3 + y)} ELSE 0 END)"
    val hashExpr = (rowBits ++ colBits).mkString(" + ")
    s"""WITH h AS (
       |  SELECT doc_id, md5(text) AS h FROM documents
       |), b AS (
       |  SELECT doc_id, i,
       |    16 * (strpos('0123456789abcdef', substring(h, 2 * i + 1, 1)) - 1)
       |      + (strpos('0123456789abcdef', substring(h, 2 * i + 2, 1)) - 1) AS byte
       |  FROM h, unnest(range(0, 16)) AS t(i)
       |), px AS (
       |  SELECT doc_id, list(byte ORDER BY i) AS px FROM b GROUP BY doc_id
       |), ph AS (
       |  SELECT doc_id, CAST($hashExpr AS BIGINT) AS phash FROM px
       |)
       |SELECT a.doc_id AS i, b.doc_id AS j,
       |       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $maxDist""".stripMargin
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

  // ---- REAL audio decode (r10): javax.sound.sampled also ships with
  // the JDK — RIFF/WAVE PCM encode and parse need no external codec
  // and are headless-safe. Same lossless-digest construction as the
  // image path: each doc's md5 digest becomes 16 signed 16-bit PCM
  // samples ((byte-128)*256) written as a REAL WAV file, so every
  // decoded amplitude statistic is recomputable relationally by
  // DuckDB from `documents` alone. Swap the synthesis for a crawl's
  // real audio bytes and decode/resample run unchanged. ----

  val audioRate = 8000f

  private def pcm16Wav(samples: Array[Int], rate: Float): Array[Byte] = {
    val pcm = new Array[Byte](2 * samples.length)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Parse a WAV via the JDK codec and return its PCM samples (real
    * header parse + format negotiation — not a byte-offset hack). */
  private def wavSamples(bytes: Array[Byte]): (Array[Int], Float) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian, s"unexpected audio format $fmt")
    val raw = ais.readAllBytes()
    (Array.tabulate(raw.length / 2)(i => (raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)),
      fmt.getSampleRate)
  }

  /** Each doc's md5 digest rendered as a REAL 16-sample 8 kHz mono
    * 16-bit WAV: `(media_id, media BINARY, meta)`. */
  def packAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), md5(col("text"))).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, hex) =>
          val samples = Array.tabulate(16) { p =>
            (Integer.parseInt(hex.substring(2 * p, 2 * p + 2), 16) - 128) * 256
          }
          (id, pcm16Wav(samples, audioRate))
        }
      }
      .toDF("media_id", "media")
      .select(col("media_id"), col("media"),
        struct(lit("wav").as("format"),
          length(col("media")).as("n_bytes")).as("meta"))
  }

  /** REAL audio decode: `AudioSystem.getAudioInputStream` each WAV and
    * measure amplitude statistics — `(media_id, n_samples, sample_rate,
    * mean_amp, min_amp, max_amp)`. Zero-shuffle typed mapPartitions;
    * the oracle re-derives every value from the md5 digest (PCM is
    * lossless). */
  def decodeAudio(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (s, rate) = wavSamples(bytes)
          (id, s.length.toLong, rate.toInt,
            s.map(_.toLong).sum.toDouble / s.length, s.min, s.max)
        }
      }
      .toDF("media_id", "n_samples", "sample_rate",
        "mean_amp", "min_amp", "max_amp")
  }

  /** REAL audio resample: decode, decimate by `factor` (keep every
    * `factor`-th sample — deterministic, no filter ambiguity),
    * re-encode as a WAV at the reduced rate, decode AGAIN and measure —
    * proving the full decode→transform→encode→decode chain, the audio
    * twin of [[resizeImages]]. */
  def resampleAudio(packed: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1)
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (s, rate) = wavSamples(bytes)
          val dec = s.indices.collect { case i if i % factor == 0 => s(i) }.toArray
          val (back, rate2) = wavSamples(pcm16Wav(dec, rate / factor))
          (id, back.length.toLong, rate2.toInt,
            back.map(_.toLong).sum.toDouble / back.length, back.min, back.max)
        }
      }
      .toDF("media_id", "n_samples", "sample_rate",
        "mean_amp", "min_amp", "max_amp")
  }

  /** DuckDB twin of [[decodeAudio]] ∘ [[packAudio]] (and, with
    * `factor`, of [[resampleAudio]]): md5-hex pairs → signed PCM
    * amplitudes → statistics over the kept samples. */
  def decodeAudioSql(factor: Int = 1): String =
    s"""WITH h AS (
       |  SELECT doc_id, md5(text) AS h FROM documents
       |), a AS (
       |  SELECT doc_id,
       |    (16 * (strpos('0123456789abcdef', substring(h, 2 * i + 1, 1)) - 1)
       |     + (strpos('0123456789abcdef', substring(h, 2 * i + 2, 1)) - 1)
       |     - 128) * 256 AS amp
       |  FROM h, unnest(range(0, 16)) AS t(i) WHERE i % $factor = 0
       |)
       |SELECT doc_id AS media_id,
       |  CAST(${(15 / factor) + 1} AS BIGINT) AS n_samples,
       |  CAST(${8000 / factor} AS INT) AS sample_rate,
       |  avg(amp) AS mean_amp,
       |  CAST(min(amp) AS INT) AS min_amp, CAST(max(amp) AS INT) AS max_amp
       |FROM a GROUP BY doc_id""".stripMargin

  // ---- REAL video frame decode (r10): no container demuxer ships
  // with the JDK, so the container is synthetic — a length-prefixed
  // concatenation of REAL PNG frames (frame f's pixels derive from
  // md5(text || '#' || f)) — but every kept frame goes through a
  // genuine ImageIO decode, which is the per-frame work that
  // dominates at scale. Swap the splitter for a demuxer (MP4 boxes,
  // MKV EBML) and the decode/stat path runs unchanged. ----

  private def md5Bytes(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))

  private def pngFromDigest(digest: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < 16) {
      val g = digest(p) & 0xFF
      img.setRGB(p % 4, p / 4, (g << 16) | (g << 8) | g)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Each doc rendered as a `nFrames`-frame "video": a length-prefixed
    * stream of real 4×4 grayscale PNGs, frame f's pixels from
    * md5(text + "#" + f). `(media_id, media BINARY, meta)`. */
  def packVideo(docs: DataFrame, nFrames: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(bos)
          var f = 0
          while (f < nFrames) {
            val png = pngFromDigest(md5Bytes(text + "#" + f))
            out.writeInt(png.length)
            out.write(png)
            f += 1
          }
          (id, bos.toByteArray)
        }
      }
      .toDF("media_id", "media")
      .select(col("media_id"), col("media"),
        struct(lit("vid").as("format"),
          length(col("media")).as("n_bytes")).as("meta"))
  }

  /** REAL video keyframe sampling: walk the frame stream, SKIP the
    * bytes of dropped frames (the demuxer economy that matters at
    * scale — only every `rate`-th frame is decoded), run a genuine
    * ImageIO decode on each kept frame and measure its pixels —
    * `(media_id, frame_idx, width, height, mean_gray, min_gray,
    * max_gray)`. One zero-shuffle mapPartitions pass. */
  def sampleVideoFrames(packed: DataFrame, rate: Int = 2): DataFrame = {
    require(rate >= 1)
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Int, Int, Int, Double, Int, Int)]
          var f = 0
          while (in.available() > 0) {
            val len = in.readInt()
            if (f % rate == 0) {
              val png = new Array[Byte](len)
              in.readFully(png)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(png))
              require(img != null, s"media $id frame $f is not decodable")
              val px = grayPixels(img)
              out += ((id, f, img.getWidth, img.getHeight,
                px.sum.toDouble / px.length, px.min, px.max))
            } else {
              in.skipBytes(len)
            }
            f += 1
          }
          out
        }
      }
      .toDF("media_id", "frame_idx", "width", "height",
        "mean_gray", "min_gray", "max_gray")
  }

  /** DuckDB twin of [[sampleVideoFrames]] ∘ [[packVideo]]: per-frame
    * digest bytes → pixel statistics for the kept frames. */
  def sampleVideoFramesSql(nFrames: Int = 4, rate: Int = 2): String =
    s"""WITH fr AS (
       |  SELECT doc_id, f, md5(text || '#' || CAST(f AS VARCHAR)) AS h
       |  FROM documents, unnest(range(0, $nFrames)) AS t(f)
       |  WHERE f % $rate = 0
       |), b AS (
       |  SELECT doc_id, f,
       |    16 * (strpos('0123456789abcdef', substring(h, 2 * i + 1, 1)) - 1)
       |      + (strpos('0123456789abcdef', substring(h, 2 * i + 2, 1)) - 1) AS byte
       |  FROM fr, unnest(range(0, 16)) AS t(i)
       |)
       |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
       |  CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
       |  avg(byte) AS mean_gray,
       |  CAST(min(byte) AS INT) AS min_gray, CAST(max(byte) AS INT) AS max_gray
       |FROM b GROUP BY doc_id, f""".stripMargin
}
