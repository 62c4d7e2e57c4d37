package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class G711Spec extends AnyFunSuite {

  test("ulaw: zero maps to 0xFF and decodes back to exactly 0") {
    assert(G711.linearToUlaw(0) == 0xff.toByte)
    assert(G711.ulawToLinear(0xff.toByte) == 0)
  }

  test("ulaw: encode(decode(code)) is the identity on all codes " +
      "except the negative-zero alias 0x7F") {
    (0 until 256).foreach { c =>
      val code = c.toByte
      val round = G711.linearToUlaw(G711.ulawToLinear(code))
      if (c == 0x7f)
        // 0x7F decodes to -0 == 0, whose canonical code is 0xFF —
        // the one many-to-one point of the μ-law code space
        assert(round == 0xff.toByte)
      else assert(round == code, f"code 0x$c%02x")
    }
  }

  test("alaw: encode(decode(code)) is the identity on every code") {
    (0 until 256).foreach { c =>
      val code = c.toByte
      assert(G711.linearToAlaw(G711.alawToLinear(code)) == code,
        f"code 0x$c%02x")
    }
  }

  test("ulaw: quantization error bounded over the full 16-bit domain") {
    var maxErr = 0
    var s = Short.MinValue.toInt
    while (s <= Short.MaxValue) {
      val err = math.abs(
        G711.ulawToLinear(G711.linearToUlaw(s.toShort)) - s)
      if (err > maxErr) maxErr = err
      s += 1
    }
    // top-segment cell width is 1024 (half-width 512); the clip at
    // 32635 adds up to 643 at full scale
    assert(maxErr <= 700, s"max ulaw error $maxErr")
  }

  test("alaw: quantization error bounded over the full 16-bit domain") {
    var maxErr = 0
    var s = Short.MinValue.toInt
    while (s <= Short.MaxValue) {
      val err = math.abs(
        G711.alawToLinear(G711.linearToAlaw(s.toShort)) - s)
      if (err > maxErr) maxErr = err
      s += 1
    }
    // top-segment cell width is 512 in the 16-bit domain; full-scale
    // clip error reaches 512 at -32768
    assert(maxErr <= 600, s"max alaw error $maxErr")
  }

  test("ulaw: small amplitudes quantize finely (companding works)") {
    // |s| < 32: segment 0, step 8 — error under 8, far tighter than
    // the 512 a linear 8-bit quantizer would need at full scale
    (-31 to 31).foreach { s =>
      val err = math.abs(G711.ulawToLinear(G711.linearToUlaw(s.toShort)) - s)
      assert(err <= 8, s"small-signal error $err at $s")
    }
  }

  test("wav container: ulaw and alaw payloads round-trip through " +
      "WavCodec at 2:1 compression") {
    val samples = MultimodalOps.syntheticSamples(5L, 800)
    Seq(WavCodec.encodeUlawWav(samples) -> WavCodec.TagUlaw,
        WavCodec.encodeAlawWav(samples) -> WavCodec.TagAlaw).foreach {
      case (wav, tag) =>
        val parsed = WavCodec.parse(wav)
        assert(parsed.formatTag == tag)
        assert(parsed.sampleRate == 8000 && parsed.channels == 1)
        assert(parsed.data.length == samples.length, "2:1 vs PCM-16")
        val decoded = parsed.samples
        assert(decoded.length == samples.length)
        val maxErr = samples.zip(decoded).map {
          case (a, b) => math.abs(a - b)
        }.max
        assert(maxErr <= 700, s"container decode error $maxErr")
    }
  }
}
