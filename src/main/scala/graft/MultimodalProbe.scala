package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Multimodal, Text}

/**
 * Scale probe for the real-codec multimodal family (r10): decode is a
 * zero-shuffle typed `mapPartitions` pass, so wall time must scale
 * ~linearly in corpus size with no cross-worker term — the property
 * that makes the path viable at 100 TB (each executor decodes its own
 * partitions; nothing is exchanged). Replays the three real-decode
 * operators (image decode, WAV decode, video keyframe sampling) on a
 * replica corpus staged by [[ScaleProbe]] and prints one JSON line.
 *
 * Usage: runMain graft.MultimodalProbe [stagedDir] (a dir holding
 * documents.parquet — e.g. ScaleProbe's workDir).
 */
object MultimodalProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_scale")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    val docs = Text.loadDocuments(spark, dir)
    val nDocs = docs.count()
    // warm-up EVERY modality: session/codegen costs AND each codec
    // family's first-use initialization (ImageIO plugin scan,
    // javax.sound provider lookup) land here, not in whichever
    // measurement runs that path first (r10 review)
    val w = docs.limit(100)
    run(Multimodal.decodeImages(Multimodal.packImages(w)))
    run(Multimodal.decodeAudio(Multimodal.packAudio(w)))
    run(Multimodal.sampleVideoFrames(Multimodal.packVideo(w, 4), 2))

    val (nImg, tImg) = timed {
      run(Multimodal.decodeImages(Multimodal.packImages(docs)))
    }
    val (nRes, tRes) = timed {
      run(Multimodal.resizeImages(Multimodal.packImages(docs), 2))
    }
    val (nAud, tAud) = timed {
      run(Multimodal.decodeAudio(Multimodal.packAudio(docs)))
    }
    val (nVid, tVid) = timed {
      run(Multimodal.sampleVideoFrames(Multimodal.packVideo(docs, 4), 2))
    }

    def s2(d: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    println(
      s"""{"probe":"multimodal","dir":"$dir","n_docs":$nDocs,""" +
      s""""img_decode_sec":${s2(tImg)},"img_rows":$nImg,""" +
      s""""img_resize_sec":${s2(tRes)},"resize_rows":$nRes,""" +
      s""""audio_decode_sec":${s2(tAud)},"audio_rows":$nAud,""" +
      s""""video_frames_sec":${s2(tVid)},"video_rows":$nVid}""")
    spark.stop()
  }
}
