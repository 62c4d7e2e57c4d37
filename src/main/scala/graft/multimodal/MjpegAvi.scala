package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Motion-JPEG in an AVI container — a REAL compressed video path
  * with zero external dependencies: the RIFF/AVI mux + demux are
  * implemented here from the public AVI spec (RIFF 'AVI ' → LIST
  * hdrl(avih, strl(strh,strf)) → LIST movi('00dc' frames)), and each
  * frame is a genuine baseline-JPEG bitstream produced/consumed by
  * the JDK's ImageIO codec (DCT + quantization + Huffman — an actual
  * lossy transform codec, unlike the uncompressed Y4M tier).
  *
  * MJPEG is intra-only (every frame standalone), which is exactly
  * why it is the one compressed video codec a no-ffmpeg JVM can do:
  * the container walk yields self-contained JPEG chunks. Inter-coded
  * codecs (H.264 & co.) remain descoped — that is now the ONLY
  * codec class requiring an external decoder behind these
  * signatures.
  *
  * Demux trusts declared chunk sizes, skips unknown chunks
  * (idx1/JUNK/INFO), and fails loudly on bad magics — so
  * foreign-muxed MJPEG AVIs parse too. Mux writes fixed-layout
  * headers; JPEG encode at an explicit quality makes the bytes
  * deterministic for a given JVM (golden-hash pinned in the spec).
  */
object MjpegAvi {

  case class AviClip(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                     frames: Seq[Array[Byte]]) {
    def frameMs: Long = 1000L * fpsDen / fpsNum
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** JPEG-encode one image at an explicit quality (MODE_EXPLICIT so
    * the quantization tables — and therefore the bytes — don't
    * depend on writer defaults drifting). */
  def encodeJpeg(img: BufferedImage, quality: Float = 0.95f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Mux JPEG frames into a minimal spec-correct AVI. */
  def mux(frames: Seq[Array[Byte]], w: Int, h: Int,
          fpsNum: Int = 1, fpsDen: Int = 1): Array[Byte] = {
    require(frames.nonEmpty, "empty clip")
    val usPerFrame = (1000000L * fpsDen / fpsNum).toInt
    val maxFrame = frames.map(_.length).max

    val strh = new ByteArrayOutputStream()
    strh.write(fourcc("vids")); strh.write(fourcc("MJPG"))
    strh.write(le32(0)); strh.write(le16(0)); strh.write(le16(0)) // flags, prio, lang
    strh.write(le32(0)) // initial frames
    strh.write(le32(fpsDen)); strh.write(le32(fpsNum)) // scale, rate → fps = rate/scale
    strh.write(le32(0)); strh.write(le32(frames.length)) // start, length
    strh.write(le32(maxFrame)); strh.write(le32(-1)) // bufsize, quality
    strh.write(le32(0)) // sample size (0: varying)
    strh.write(le16(0)); strh.write(le16(0)); strh.write(le16(w)); strh.write(le16(h))

    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    strf.write(le32(40)); strf.write(le32(w)); strf.write(le32(h))
    strf.write(le16(1)); strf.write(le16(24))
    strf.write(fourcc("MJPG")); strf.write(le32(w * h * 3))
    strf.write(le32(0)); strf.write(le32(0)); strf.write(le32(0)); strf.write(le32(0))

    val avih = new ByteArrayOutputStream()
    avih.write(le32(usPerFrame)); avih.write(le32(maxFrame * fpsNum / fpsDen))
    avih.write(le32(0)); avih.write(le32(0)) // padding granularity, flags (no idx1 → no AVIF_HASINDEX)
    avih.write(le32(frames.length)); avih.write(le32(0))
    avih.write(le32(1)); avih.write(le32(maxFrame))
    avih.write(le32(w)); avih.write(le32(h))
    avih.write(le32(0)); avih.write(le32(0)); avih.write(le32(0)); avih.write(le32(0))

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(fourcc(id)); bos.write(le32(body.length)); bos.write(body)
      if (body.length % 2 == 1) bos.write(0)
      bos.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write(fourcc("LIST")); bos.write(le32(4 + body.length))
      bos.write(fourcc(kind)); bos.write(body)
      bos.toByteArray
    }

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk("00dc", f)))

    val payload = hdrl ++ movi
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc("RIFF")); bos.write(le32(4 + payload.length))
    bos.write(fourcc("AVI ")); bos.write(payload)
    bos.toByteArray
  }

  /** Demux an MJPEG AVI: geometry + fps from strh/strf, one byte
    * array per '00dc'/'00db' frame chunk (each a standalone JPEG). */
  def demux(content: Array[Byte]): AviClip = {
    require(content.length >= 12 &&
      new String(content, 0, 4, "US-ASCII") == "RIFF" &&
      new String(content, 8, 4, "US-ASCII") == "AVI ",
      "not a RIFF/AVI stream")
    var w = -1; var h = -1; var fn = 25; var fd = 1
    val frames = Seq.newBuilder[Array[Byte]]

    def u32(pos: Int): Int =
      (content(pos) & 0xff) | ((content(pos + 1) & 0xff) << 8) |
        ((content(pos + 2) & 0xff) << 16) | ((content(pos + 3) & 0xff) << 24)

    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = new String(content, pos, 4, "US-ASCII")
        val len = u32(pos + 4)
        val body = pos + 8
        require(len >= 0 && body + len <= to, s"truncated $id chunk")
        id match {
          case "LIST" => walk(body + 4, body + len) // skip the list kind fourcc
          case "strh" if len >= 40 &&
              new String(content, body, 4, "US-ASCII") == "vids" =>
            fd = u32(body + 20); fn = u32(body + 24)
            require(fn > 0 && fd > 0, "invalid strh rate/scale")
          case "strf" if len >= 12 && w < 0 =>
            w = u32(body + 4); h = u32(body + 8)
          case s if s.endsWith("dc") || s.endsWith("db") =>
            frames += java.util.Arrays.copyOfRange(content, body, body + len)
          case _ => () // avih/idx1/JUNK/INFO: size-skip
        }
        pos = body + len + (len % 2)
      }
    }
    walk(12, 12 + u32(4) - 4)
    require(w > 0 && h > 0, "missing strf geometry")
    AviClip(w, h, fn, fd, frames.result())
  }
}
