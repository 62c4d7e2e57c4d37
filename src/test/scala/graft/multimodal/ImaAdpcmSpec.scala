package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class ImaAdpcmSpec extends AnyFunSuite {

  test("block layout: header predictor IS sample 0 of each block; " +
      "samplesPerBlock matches the WAV formula") {
    assert(ImaAdpcm.samplesPerBlock(256) == 505)
    val samples = MultimodalOps.syntheticSamplesSmooth(4L, 1200)
    val enc = ImaAdpcm.encode(samples, blockBytes = 256)
    assert(enc.length == 3 * 256, "1200 samples -> 3 blocks of 505")
    val dec = ImaAdpcm.decode(enc, samples.length, blockBytes = 256)
    // every block's first decoded sample is stored verbatim
    Seq(0, 505, 1010).foreach { s0 =>
      assert(dec(s0) == samples(s0), s"block predictor at $s0")
    }
  }

  test("band-limited signal reconstructs within the step-table " +
      "tracking bound") {
    val samples = MultimodalOps.syntheticSamplesSmooth(7L, 2000)
    val dec = ImaAdpcm.decode(
      ImaAdpcm.encode(samples), samples.length)
    assert(dec.length == samples.length)
    val errs = samples.zip(dec).map { case (a, b) => math.abs(a - b) }
    // transient while the step index adapts from 0; steady-state
    // error is a fraction of the ±496 per-sample delta
    assert(errs.max <= 4000, s"max adpcm error ${errs.max}")
    val rms = math.sqrt(errs.map(e => e.toDouble * e).sum / errs.length)
    assert(rms <= 500, s"rms adpcm error $rms")
    // after the initial adaptation the tail tracks tightly
    val tailMax = errs.drop(100).max
    assert(tailMax <= 1000, s"steady-state max error $tailMax")
  }

  test("encode is deterministic and 4:1 vs PCM-16 (plus block headers)") {
    val samples = MultimodalOps.syntheticSamplesSmooth(9L, 1010)
    val a = ImaAdpcm.encode(samples)
    val b = ImaAdpcm.encode(samples)
    assert(a.sameElements(b))
    // 1010 samples -> 2 blocks of 256 bytes vs 2020 PCM bytes
    assert(a.length == 512)
  }

  test("wav container: IMA ADPCM WAV (tag 0x11) round-trips through " +
      "WavCodec with fact-chunk frame count") {
    val samples = MultimodalOps.syntheticSamplesSmooth(11L, 900)
    val wav = WavCodec.encodeAdpcmWav(samples)
    val parsed = WavCodec.parse(wav)
    assert(parsed.formatTag == WavCodec.TagImaAdpcm)
    assert(parsed.samplesPerBlock == 505)
    assert(parsed.dataFrames == 900, "fact chunk carries true count")
    val dec = parsed.samples
    assert(dec.length == 900)
    assert(dec(0) == samples(0))
    val tailMax = samples.zip(dec).drop(100)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(tailMax <= 1000, s"steady-state error $tailMax")
  }

  test("foreign-chunk tolerance: a LIST INFO chunk between fmt and " +
      "data parses fine") {
    val samples = MultimodalOps.syntheticSamplesSmooth(2L, 505)
    val wav = WavCodec.encodeAdpcmWav(samples)
    // splice a LIST INFO chunk just before 'data'
    val dataAt = {
      var p = 12
      var found = -1
      while (found < 0) {
        val id = new String(wav, p, 4, "US-ASCII")
        val len = (wav(p + 4) & 0xff) | ((wav(p + 5) & 0xff) << 8) |
          ((wav(p + 6) & 0xff) << 16) | ((wav(p + 7) & 0xff) << 24)
        if (id == "data") found = p else p = p + 8 + len + (len % 2)
      }
      found
    }
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.take(dataAt) ++ junk ++ wav.drop(dataAt)
    // patch the RIFF size
    val newSize = spliced.length - 8
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >> 8) & 0xff).toByte
    spliced(6) = ((newSize >> 16) & 0xff).toByte
    spliced(7) = ((newSize >> 24) & 0xff).toByte
    val parsed = WavCodec.parse(spliced)
    assert(parsed.samples.length == 505)
  }
}
