package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. */
case class MediaMeta(format: String, width: Int, height: Int,
                     durationMs: Long)

/** One media object: image/audio/video bytes as an opaque binary
  * column plus typed metadata — the storage shape for multimodal
  * training corpora (the bytes stay opaque to Catalyst; metadata
  * columns remain prunable/filterable). */
case class MediaRecord(media_id: Long, kind: String, content: Array[Byte],
                       meta: MediaMeta)

/** Per-media extracted features. */
case class MediaFeatures(media_id: Long, kind: String, dim: Int,
                         features: Array[Float])

/** One sampled video frame. */
case class Frame(media_id: Long, frame_idx: Int, offsetMs: Long,
                 frame_bytes: Array[Byte])

/** Multimodal-column plumbing: decode / feature-extract / resize /
  * frame-sample over binary columns with typed metadata.
  *
  * The Spark side is real — `Dataset[MediaRecord]` with case-class
  * encoders, batched `mapPartitions` for the imperative decode stage
  * (one codec init per partition, the same pattern a JNI/FFI codec
  * needs), metadata predicates that prune before any byte is
  * touched. The codec itself is a clearly marked deterministic STUB:
  * this container ships no image/audio libraries, so `decodeStub`
  * derives "pixels" from the bytes arithmetically; a real deployment
  * swaps in javax.imageio / ffmpeg behind the same signature.
  */
object MultimodalOps {
  /** Deterministic synthetic corpus (seeded arithmetic, no RNG):
    * media_id-derived bytes so every run and executor agrees. */
  def syntheticCorpus(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + (id % 7).toInt * 64
      val bytes = Array.tabulate(len)(i => ((id * 131 + i * 31) % 251).toByte)
      val meta = kind match {
        case "image" => MediaMeta("png", 32 + (id % 4).toInt * 16,
          32 + (id % 3).toInt * 16, 0L)
        case "audio" => MediaMeta("wav", 0, 0, 1000L + id % 5000)
        case _       => MediaMeta("mp4", 64, 48, 2000L + id % 8000)
      }
      MediaRecord(id, kind, bytes, meta)
    }
  }

  /** STUB decode — ??? in a real deployment this calls an image
    * codec (javax.imageio / libjpeg via FFI); none ships in this
    * container, so it derives a deterministic fake "pixel" plane from
    * the payload bytes. Signature and batch shape are the real
    * contract. */
  def decodeStub(content: Array[Byte], meta: MediaMeta): Array[Int] = {
    val w = math.max(meta.width, 1)
    val h = math.max(meta.height, 1)
    Array.tabulate(math.min(w * h, 4096)) { i =>
      java.lang.Byte.toUnsignedInt(content(i % content.length))
    }
  }

  /** Feature extraction: batched mapPartitions — codec state would be
    * initialized once per partition here (the executor-side pattern
    * for any native decoder); features are a 16-bin normalized
    * byte-value histogram of the decoded plane. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition "codec init" happens here (stubbed)
      records.map { r =>
        val pixels = decodeStub(r.content, r.meta)
        val hist = new Array[Float](16)
        var i = 0
        while (i < pixels.length) { hist(pixels(i) / 16) += 1f; i += 1 }
        val total = math.max(pixels.length, 1).toFloat
        MediaFeatures(r.media_id, r.kind, 16, hist.map(_ / total))
      }
    }
  }

  /** Resize stub: halves both dimensions, keeping every other
    * "pixel" byte — the metadata transform is real, the resample is
    * the stubbed codec step. */
  def resizeHalf(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind != "image") r
      else r.copy(
        content = r.content.zipWithIndex.collect {
          case (b, i) if i % 2 == 0 => b },
        meta = r.meta.copy(width = r.meta.width / 2,
          height = r.meta.height / 2))
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * every `everyMs` of duration; frame bytes are a deterministic
    * slice (stub for a real demuxer). flatMap keeps it narrow — one
    * task explodes its own videos, no shuffle. */
  def sampleFrames(media: Dataset[MediaRecord],
                   everyMs: Long = 1000): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val nFrames = math.max((r.meta.durationMs / everyMs).toInt, 1)
      (0 until nFrames).map { f =>
        val start = (f * r.content.length / nFrames)
        val end = ((f + 1) * r.content.length / nFrames)
        Frame(r.media_id, f, f * everyMs, r.content.slice(start, end))
      }
    }
  }

  /** The full multimodal pipeline as one frame: metadata-pruned scan
    * → features, joined with frame counts for videos. */
  def pipeline(spark: SparkSession, n: Int = 300): DataFrame = {
    val corpus = syntheticCorpus(spark, n)
    val feats = extractFeatures(corpus).toDF()
    val frameCounts = sampleFrames(corpus).groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"))
    feats.join(frameCounts, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("dim"),
        round(element_at(col("features"), 1).cast("double"), 4)
          .as("f0"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"))
      .orderBy("media_id")
  }
}
