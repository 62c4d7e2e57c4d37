package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {

  test("synthetic corpus is deterministic and metadata is prunable") {
    val a = MultimodalOps.syntheticCorpus(spark, 30).collect()
    val b = MultimodalOps.syntheticCorpus(spark, 30).collect()
    assert(a.map(_.media_id).sameElements(b.map(_.media_id)))
    assert(a.map(_.content.toSeq).toSeq == b.map(_.content.toSeq).toSeq)
    // metadata predicate prunes without touching bytes
    val imgs = MultimodalOps.syntheticCorpus(spark, 30)
      .filter(col("kind") === "image")
    assert(imgs.count() == 10)
  }

  test("image payloads: PNG rows round-trip losslessly, JPEG rows " +
      "are real DCT bitstreams within the codec error bound") {
    val imgs = MultimodalOps.syntheticCorpus(spark, 30)
      .filter(col("kind") === "image").collect()
    assert(imgs.count(_.meta.format == "png") == 5)
    assert(imgs.count(_.meta.format == "jpeg") == 5)
    imgs.foreach { r =>
      val px = MultimodalOps.decodeImage(r.content)
      assert(px.length == r.meta.width * r.meta.height)
      val w = r.meta.width
      if (r.meta.format == "png") {
        // PNG magic; decoded pixels are the seeded pattern, lossless
        assert((r.content(0) & 0xff) == 0x89 &&
          r.content.slice(1, 4).map(_.toChar).mkString == "PNG")
        px.zipWithIndex.foreach { case (v, i) =>
          val (x, y) = (i % w, i / w)
          assert(v == ((r.media_id * 131 + y * 31 + x * 7) % 251).toInt,
            s"pixel ($x,$y) of ${r.media_id}")
        }
      } else {
        // JPEG SOI marker; lossy decode stays near the source pattern
        assert((r.content(0) & 0xff) == 0xff && (r.content(1) & 0xff) == 0xd8)
        val src = MultimodalOps.syntheticLumaSmooth(
          r.media_id, r.meta.width, r.meta.height)
        val errs = px.zip(src).map { case (a, b) => math.abs(a - b) }
        assert(errs.sum.toDouble / errs.length <= 8,
          s"jpeg mean error of ${r.media_id}")
        assert(errs.max <= 48, s"jpeg max error of ${r.media_id}")
      }
    }
  }

  test("audio payloads: PCM rows round-trip exactly; G.711/ADPCM rows " +
      "are real compressed WAVs within their codec error bounds") {
    val auds = MultimodalOps.syntheticCorpus(spark, 30)
      .filter(col("kind") === "audio").collect()
    assert(auds.map(_.meta.format).toSet ==
      Set("wav", "ulaw", "alaw", "adpcm"))
    auds.foreach { r =>
      // RIFF/WAVE container magic on every variant
      assert(r.content.slice(0, 4).map(_.toChar).mkString == "RIFF" &&
        r.content.slice(8, 12).map(_.toChar).mkString == "WAVE")
      val n = 800 + (r.media_id % 5).toInt * 160
      val decoded = MultimodalOps.decodeAudioSamples(r.content)
      assert(decoded.length == n, s"frame count of ${r.media_id}")
      assert(r.meta.durationMs == n * 1000L / 8000L)
      r.meta.format match {
        case "wav" =>
          assert(decoded.sameElements(
            MultimodalOps.syntheticSamples(r.media_id, n)),
            s"PCM round-trip of ${r.media_id}")
        case "ulaw" | "alaw" =>
          val src = MultimodalOps.syntheticSamples(r.media_id, n)
          val maxErr = src.zip(decoded).map {
            case (a, b) => math.abs(a - b)
          }.max
          assert(maxErr <= 700, s"G.711 error $maxErr of ${r.media_id}")
          // 2:1 compression: payload is half the PCM frame bytes
          assert(r.content.length < n * 2)
        case "adpcm" =>
          val src = MultimodalOps.syntheticSamplesSmooth(r.media_id, n)
          assert(decoded(0) == src(0), "block predictor is exact")
          val tailMax = src.zip(decoded).drop(100)
            .map { case (a, b) => math.abs(a - b) }.max
          assert(tailMax <= 1000, s"ADPCM error $tailMax of ${r.media_id}")
          // 4:1 compression (plus block headers)
          assert(r.content.length < n)
      }
    }
  }

  test("a known waveform decodes to its exact histogram") {
    // 256 samples sweeping the 16-bit range uniformly: sample i has
    // high byte i-128, so plane value i — one per bin value, uniform
    // 16-bin histogram like the image case.
    val samples = Array.tabulate[Short](256)(i => ((i - 128) << 8).toShort)
    val wav = MultimodalOps.encodeWav(samples)
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(0L, "audio", wav, MediaMeta("wav", 0, 0, 32L))))
    val f = MultimodalOps.extractFeatures(ds).collect().head
    assert(f.features.forall(v => math.abs(v - 1f / 16) < 1e-6),
      s"expected uniform 1/16 bins, got ${f.features.toSeq}")
  }

  test("a known image decodes to its exact histogram") {
    import java.awt.image.BufferedImage
    // 4x4 grayscale: one pixel per 16-value bin -> uniform histogram
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
    (0 until 16).foreach(i => img.getRaster.setSample(i % 4, i / 4, 0, i * 16))
    val png = MultimodalOps.encodePng(img)
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(0L, "image", png, MediaMeta("png", 4, 4, 0L))))
    val f = MultimodalOps.extractFeatures(ds).collect().head
    assert(f.features.forall(v => math.abs(v - 1f / 16) < 1e-6),
      s"expected uniform 1/16 bins, got ${f.features.toSeq}")
  }

  test("feature extraction: normalized 16-bin histogram per media") {
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.syntheticCorpus(spark, 30)).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.dim == 16 && f.features.length == 16)
      assert(math.abs(f.features.sum - 1f) < 1e-3,
        s"histogram of ${f.media_id} must normalize to 1")
    }
  }

  test("resize halves image dimensions and box-filters real pixels") {
    val origRecs = MultimodalOps.syntheticCorpus(spark, 30).collect()
    val orig = origRecs.map(r => r.media_id -> r.meta).toMap
    val srcPx = origRecs.filter(_.kind == "image")
      .map(r => r.media_id -> MultimodalOps.decodeImage(r.content)).toMap
    val out = MultimodalOps.resizeHalf(
      MultimodalOps.syntheticCorpus(spark, 30)).collect()
    out.foreach { r =>
      if (r.kind == "image") {
        val m = orig(r.media_id)
        assert(r.meta.width == m.width / 2)
        assert(r.meta.height == m.height / 2)
        // each output pixel is the integer mean of its 2x2 source block
        val (src, dst) = (srcPx(r.media_id), MultimodalOps.decodeImage(r.content))
        val (w, ow) = (m.width, r.meta.width)
        dst.zipWithIndex.foreach { case (v, i) =>
          val (x, y) = (i % ow, i / ow)
          val s = src(2 * y * w + 2 * x) + src(2 * y * w + 2 * x + 1) +
            src((2 * y + 1) * w + 2 * x) + src((2 * y + 1) * w + 2 * x + 1)
          assert(v == s / 4, s"resampled pixel ($x,$y) of ${r.media_id}")
        }
      } else assert(r.meta == orig(r.media_id))
    }
  }

  test("video payloads are real Y4M streams; a golden clip demuxes to " +
      "pinned frame hashes") {
    def md5(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    // golden clip: id=7, 8x4, 3 frames at 2 fps — byte layout and
    // hashes pinned against an independent reference construction
    val frames = (0 until 3).map(f => MultimodalOps.syntheticLuma(7L, f, 8, 4))
    val clip = MultimodalOps.encodeY4m(frames, 8, 4, fpsNum = 2)
    assert(new String(clip.take(9), "US-ASCII") == "YUV4MPEG2",
      "stream must open with the YUV4MPEG2 magic")
    assert(md5(clip) == "c32ca85761a041fe86ae77011975e645",
      "golden clip bytes drifted")
    val dec = MultimodalOps.decodeY4m(clip)
    assert(dec.width == 8 && dec.height == 4 &&
      dec.fpsNum == 2 && dec.fpsDen == 1 && dec.frameMs == 500L)
    val expected = Seq("2aa28035c97b5cc24d286b19bc93e3d9",
      "3c24a979feb3f0c834b8056818c14966",
      "27f7643af8981462ba7fdbff46ec492c")
    assert(dec.frames.map(f => md5(f.map(_.toByte))) == expected,
      "demuxed luma planes must hash to the pinned values")
    dec.frames.zip(frames).foreach { case (a, b) =>
      assert(a.sameElements(b), "lossless luma round-trip")
    }
    // C420 streams (ffmpeg's default) demux too: luma extracted,
    // chroma skipped
    val lumaLen = 8 * 4
    val chroma = Array.fill((8 / 2) * (4 / 2) * 2)(128.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W8 H4 F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    bos.write("FRAME\n".getBytes("US-ASCII"))
    frames.head.foreach(v => bos.write(v & 0xff))
    bos.write(chroma)
    val dec420 = MultimodalOps.decodeY4m(bos.toByteArray)
    assert(dec420.frames.length == 1 &&
      dec420.frames.head.sameElements(frames.head),
      "C420 luma must extract with chroma skipped")
  }

  test("frame sampling demuxes real frames from BOTH containers; " +
      "each is a decodable PNG of the source luma") {
    val corpus = MultimodalOps.syntheticCorpus(spark, 30)
    val frames = MultimodalOps.sampleFrames(corpus, everyMs = 1000).collect()
    val videos = corpus.filter(col("kind") === "video").collect()
    assert(videos.count(_.meta.format == "y4m") == 5)
    assert(videos.count(_.meta.format == "avi") == 5)
    val byId = frames.groupBy(_.media_id)
    videos.foreach { v =>
      val fs = byId(v.media_id).sortBy(_.frame_idx)
      // 1 fps synthetic clips sampled at 1000ms: every frame
      assert(fs.length == (v.meta.durationMs / 1000L).toInt)
      fs.foreach { fr =>
        val px = MultimodalOps.decodeImage(fr.frame_bytes)
        assert(px.length == v.meta.width * v.meta.height)
        assert(fr.offsetMs == fr.frame_idx * 1000L)
        if (v.meta.format == "y4m") {
          // uncompressed path: lossless luma recovery
          assert(px.sameElements(MultimodalOps.syntheticLuma(
            v.media_id, fr.frame_idx, v.meta.width, v.meta.height)),
            s"frame ${fr.frame_idx} of ${v.media_id} must decode to the " +
              "source luma plane")
        } else {
          // MJPEG path: frames went through the DCT codec — bounded
          val src = MultimodalOps.syntheticLumaSmooth(
            v.media_id + fr.frame_idx, v.meta.width, v.meta.height)
          val errs = px.zip(src).map { case (a, b) => math.abs(a - b) }
          assert(errs.sum.toDouble / errs.length <= 8,
            s"mjpeg frame ${fr.frame_idx} of ${v.media_id} mean error")
        }
      }
    }
  }

  test("pipeline output: one row per media, videos carry frame counts") {
    val out = MultimodalOps.pipeline(spark, 60).collect()
    assert(out.length == 60)
    out.foreach { r =>
      val kind = r.getAs[String]("kind")
      val n = r.getAs[Long]("n_frames")
      if (kind == "video") assert(n > 0) else assert(n == 0)
    }
  }
}
