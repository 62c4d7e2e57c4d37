package graft.multimodal

import java.io.ByteArrayOutputStream

/** RIFF/WAVE container mux + demux for the compressed-audio tier:
  * format tags 1 (PCM-16), 6 (G.711 A-law), 7 (G.711 μ-law) and
  * 0x11 (IMA ADPCM) — the four canonical WAV encodings, per the
  * public Microsoft/IBM RIFF WAVE spec. [[MultimodalOps]] writes
  * PCM via the JDK's `javax.sound.sampled`; the JDK has no G.711/
  * ADPCM WAV support, so this module is the real container +
  * [[G711]]/[[ImaAdpcm]] transcoding path those payloads need.
  *
  * The demuxer walks chunks by their declared sizes (fmt before
  * data, unknown chunks skipped, word-aligned), so foreign files
  * with LIST/fact chunks parse too; a missing magic or truncated
  * chunk fails loudly.
  */
object WavCodec {

  final val TagPcm16 = 1
  final val TagAlaw = 6
  final val TagUlaw = 7
  final val TagImaAdpcm = 0x11

  case class Wav(formatTag: Int, channels: Int, sampleRate: Int,
                 bitsPerSample: Int, samplesPerBlock: Int,
                 data: Array[Byte], dataFrames: Int) {
    /** Decode to mono 16-bit PCM regardless of the stored codec. */
    def samples: Array[Short] = formatTag match {
      case TagPcm16 =>
        Array.tabulate(data.length / 2)(i =>
          ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort)
      case TagAlaw => G711.decodeAlaw(data)
      case TagUlaw => G711.decodeUlaw(data)
      case TagImaAdpcm =>
        ImaAdpcm.decode(data, dataFrames, blockBytes =
          (samplesPerBlock - 1) / 2 + 4)
      case t => throw new IllegalArgumentException(s"unsupported WAV format tag $t")
    }
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def mux(tag: Int, rate: Int, bits: Int, blockAlign: Int,
                  avgBytesPerSec: Int, extra: Array[Byte],
                  fact: Option[Int], data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val fmtLen = 16 + (if (extra.nonEmpty || tag != TagPcm16) 2 + extra.length else 0)
    val factLen = fact.map(_ => 12).getOrElse(0)
    val dataPad = data.length % 2
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(4 + 8 + fmtLen + factLen + 8 + data.length + dataPad))
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII"))
    bos.write(le32(fmtLen))
    bos.write(le16(tag)); bos.write(le16(1)) // mono
    bos.write(le32(rate)); bos.write(le32(avgBytesPerSec))
    bos.write(le16(blockAlign)); bos.write(le16(bits))
    if (fmtLen > 16) { bos.write(le16(extra.length)); bos.write(extra) }
    fact.foreach { n => // non-PCM WAVs carry the frame count in fact
      bos.write("fact".getBytes("US-ASCII")); bos.write(le32(4)); bos.write(le32(n))
    }
    bos.write("data".getBytes("US-ASCII"))
    bos.write(le32(data.length))
    bos.write(data)
    if (dataPad == 1) bos.write(0) // RIFF chunks are word-aligned
    bos.toByteArray
  }

  /** μ-law WAV (format tag 7): 2:1 compressed vs PCM-16. */
  def encodeUlawWav(samples: Array[Short], rate: Int = 8000): Array[Byte] =
    mux(TagUlaw, rate, 8, 1, rate, Array.emptyByteArray,
      Some(samples.length), G711.encodeUlaw(samples))

  /** A-law WAV (format tag 6): 2:1 compressed vs PCM-16. */
  def encodeAlawWav(samples: Array[Short], rate: Int = 8000): Array[Byte] =
    mux(TagAlaw, rate, 8, 1, rate, Array.emptyByteArray,
      Some(samples.length), G711.encodeAlaw(samples))

  /** IMA ADPCM WAV (format tag 0x11): 4:1 compressed; `fmt ` carries
    * the samples-per-block extension, `fact` the true frame count
    * (the last block may be padded). */
  def encodeAdpcmWav(samples: Array[Short], rate: Int = 8000,
                     blockBytes: Int = 256): Array[Byte] = {
    val spb = ImaAdpcm.samplesPerBlock(blockBytes)
    val avg = (rate.toLong * blockBytes / spb).toInt
    mux(TagImaAdpcm, rate, 4, blockBytes, avg, le16(spb),
      Some(samples.length), ImaAdpcm.encode(samples, blockBytes))
  }

  /** Demux any supported WAV; walks the chunk list by declared
    * sizes. Mono only (the corpus shape); multi-channel fails loudly
    * rather than silently interleaving. */
  def parse(content: Array[Byte]): Wav = {
    require(content.length >= 12 &&
      new String(content, 0, 4, "US-ASCII") == "RIFF" &&
      new String(content, 8, 4, "US-ASCII") == "WAVE",
      "not a RIFF/WAVE stream")
    var pos = 12
    var tag = -1
    var channels = -1
    var rate = -1
    var bits = -1
    var spb = -1
    var data: Array[Byte] = null
    var factFrames = -1
    while (pos + 8 <= content.length) {
      val id = new String(content, pos, 4, "US-ASCII")
      val len = ((content(pos + 4) & 0xff)) | ((content(pos + 5) & 0xff) << 8) |
        ((content(pos + 6) & 0xff) << 16) | ((content(pos + 7) & 0xff) << 24)
      val body = pos + 8
      require(len >= 0 && body + len <= content.length, s"truncated $id chunk")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          def u16(o: Int) = (content(body + o) & 0xff) | ((content(body + o + 1) & 0xff) << 8)
          def u32(o: Int) = u16(o) | (u16(o + 2) << 16)
          tag = u16(0); channels = u16(2); rate = u32(4); bits = u16(14)
          if (tag == TagImaAdpcm) {
            require(len >= 20, "IMA ADPCM fmt missing samplesPerBlock")
            spb = u16(18)
          }
        case "fact" if len >= 4 =>
          factFrames = (content(body) & 0xff) | ((content(body + 1) & 0xff) << 8) |
            ((content(body + 2) & 0xff) << 16) | ((content(body + 3) & 0xff) << 24)
        case "data" => data = java.util.Arrays.copyOfRange(content, body, body + len)
        case _ => () // LIST/cue/bext etc.: skip by declared size
      }
      pos = body + len + (len % 2) // word alignment
    }
    require(tag >= 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    require(channels == 1, s"mono only, got $channels channels")
    val frames = tag match {
      case TagPcm16 => data.length / 2
      case TagAlaw | TagUlaw => data.length
      case TagImaAdpcm =>
        require(factFrames >= 0, "IMA ADPCM needs a fact chunk")
        factFrames
      case _ => data.length
    }
    Wav(tag, channels, rate, bits, spb, data,
      if (factFrames >= 0) factFrames else frames)
  }
}
