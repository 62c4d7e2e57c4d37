package graft.multimodal

/** ITU-T G.711 companding — the μ-law/A-law 2:1 logarithmic audio
  * codecs (8-bit code per 16-bit sample) that telephony WAV files
  * carry as format tags 7 (μ-law) and 6 (A-law).
  *
  * Implemented from the public ITU-T G.711 segment tables: each code
  * is sign | 3-bit segment (exponent) | 4-bit mantissa, companded so
  * quantization steps grow with amplitude. Both directions are pure
  * integer arithmetic — bit-deterministic on every executor — and
  * `encode(decode(code)) == code` holds for every code point (the
  * decode values are the quantization-cell midpoints, so re-encoding
  * is a fixed point; the spec asserts this over all 256 codes).
  *
  * Part of the compressed-codec tier of [[MultimodalOps]]: a REAL
  * lossy audio codec with no external dependency (reference's media
  * payloads are opaque bytes; here the engine actually transcodes
  * them). See `kinesis-to-humio.py:91-96` for the reference's only
  * codec work (gzip) — this module is the audio analogue the LLM
  * multimodal pipeline needs.
  */
object G711 {

  private final val UlawBias = 0x84 // 132: standard μ-law bias
  private final val UlawClip = 32635

  /** 16-bit linear PCM → 8-bit μ-law code (G.711 §4.2 encode). */
  def linearToUlaw(pcm: Short): Byte = {
    var s = pcm.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > UlawClip) s = UlawClip
    s += UlawBias
    // exponent = position of the leading 1 below bit 14
    var exponent = 7
    var mask = 0x4000
    while (exponent > 0 && (s & mask) == 0) { exponent -= 1; mask >>= 1 }
    val mantissa = (s >> (exponent + 3)) & 0x0f
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  /** 8-bit μ-law code → 16-bit linear PCM (cell midpoint). */
  def ulawToLinear(code: Byte): Short = {
    val u = ~code & 0xff
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val magnitude = (((mantissa << 3) + UlawBias) << exponent) - UlawBias
    (if ((u & 0x80) != 0) -magnitude else magnitude).toShort
  }

  /** 16-bit linear PCM → 8-bit A-law code (G.711 §4.1 encode; A-law
    * operates on the top 13 bits and XOR-masks with 0x55 for ones
    * density on the wire). */
  def linearToAlaw(pcm: Short): Byte = {
    var s = pcm.toInt >> 3 // 13-bit domain
    val mask = if (s >= 0) 0xd5 else { s = -s - 1; 0x55 }
    val code =
      if (s >= 0x1000) 0x7f // clip to top of segment 7
      else if (s < 0x20) s >> 1 // segment 0: linear, step 2
      else {
        var seg = 7
        var bound = 0x800
        while (s < bound) { seg -= 1; bound >>= 1 }
        (seg << 4) | ((s >> seg) & 0x0f)
      }
    (code ^ mask).toByte
  }

  /** 8-bit A-law code → 16-bit linear PCM (cell midpoint). */
  def alawToLinear(code: Byte): Short = {
    val a = (code ^ 0x55) & 0xff
    val seg = (a >> 4) & 0x07
    val mantissa = a & 0x0f
    val magnitude13 =
      if (seg == 0) (mantissa << 1) + 1
      else ((mantissa << 1) + 1 + 0x20) << (seg - 1)
    val magnitude = magnitude13 << 3
    (if ((a & 0x80) != 0) magnitude else -magnitude).toShort
  }

  def encodeUlaw(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) { out(i) = linearToUlaw(samples(i)); i += 1 }
    out
  }

  def decodeUlaw(codes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = ulawToLinear(codes(i)); i += 1 }
    out
  }

  def encodeAlaw(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) { out(i) = linearToAlaw(samples(i)); i += 1 }
    out
  }

  def decodeAlaw(codes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = alawToLinear(codes(i)); i += 1 }
    out
  }
}
