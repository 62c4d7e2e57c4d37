package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class MjpegAviSpec extends AnyFunSuite {

  private def smoothFrames(id: Long, n: Int, w: Int, h: Int) =
    (0 until n).map(f => MjpegAvi.encodeJpeg(
      MultimodalOps.lumaToImage(
        MultimodalOps.syntheticLumaSmooth(id + f, w, h), w, h)))

  test("mux/demux: container round-trip is byte-exact per frame " +
      "(MJPEG frames are self-contained JPEGs)") {
    val frames = smoothFrames(3L, 4, 64, 48)
    val avi = MjpegAvi.mux(frames, 64, 48, fpsNum = 2)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val clip = MjpegAvi.demux(avi)
    assert(clip.width == 64 && clip.height == 48)
    assert(clip.fpsNum == 2 && clip.fpsDen == 1 && clip.frameMs == 500L)
    assert(clip.frames.length == 4)
    clip.frames.zip(frames).foreach { case (a, b) =>
      assert(a.sameElements(b), "frame chunk bytes must round-trip exactly")
    }
  }

  test("every demuxed frame is a decodable JPEG whose pixels are " +
      "within the DCT error bound of the source pattern") {
    val (w, h) = (64, 48)
    val avi = MjpegAvi.mux(smoothFrames(5L, 3, w, h), w, h)
    val clip = MjpegAvi.demux(avi)
    clip.frames.zipWithIndex.foreach { case (jpeg, f) =>
      // JPEG SOI marker
      assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
      val px = MultimodalOps.decodeImage(jpeg)
      assert(px.length == w * h)
      val src = MultimodalOps.syntheticLumaSmooth(5L + f, w, h)
      val errs = px.zip(src).map { case (a, b) => math.abs(a - b) }
      val mean = errs.sum.toDouble / errs.length
      assert(mean <= 8, s"frame $f mean DCT error $mean")
      assert(errs.max <= 48, s"frame $f max DCT error ${errs.max}")
    }
  }

  test("jpeg encode is deterministic at explicit quality") {
    val img = MultimodalOps.lumaToImage(
      MultimodalOps.syntheticLumaSmooth(7L, 32, 32), 32, 32)
    assert(MjpegAvi.encodeJpeg(img).sameElements(MjpegAvi.encodeJpeg(img)))
    // lossy: jpeg is smaller than the raw plane
    assert(MjpegAvi.encodeJpeg(img).length < 32 * 32)
  }

  test("foreign-chunk tolerance: JUNK chunks and an idx1 skip cleanly") {
    val frames = smoothFrames(1L, 2, 32, 32)
    val avi = MjpegAvi.mux(frames, 32, 32)
    // append an idx1 chunk (size-skipped) and patch the RIFF size
    val idx1 = "idx1".getBytes("US-ASCII") ++ Array[Byte](8, 0, 0, 0) ++
      new Array[Byte](8)
    val spliced = avi ++ idx1
    val newSize = spliced.length - 8
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >> 8) & 0xff).toByte
    spliced(6) = ((newSize >> 16) & 0xff).toByte
    spliced(7) = ((newSize >> 24) & 0xff).toByte
    val clip = MjpegAvi.demux(spliced)
    assert(clip.frames.length == 2)
    clip.frames.zip(frames).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
  }

  test("corrupt magic fails loudly") {
    val avi = MjpegAvi.mux(smoothFrames(1L, 1, 16, 16), 16, 16)
    avi(9) = 'X'.toByte
    intercept[IllegalArgumentException](MjpegAvi.demux(avi))
  }
}
