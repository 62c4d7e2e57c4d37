package graft.multimodal

/** IMA/DVI ADPCM — the 4:1 adaptive-differential audio codec WAV
  * files carry as format tag 0x11. Each 16-bit sample becomes a
  * 4-bit delta against an adaptive predictor; the step size walks a
  * public 89-entry table (IMA "Recommended Practices for Enhancing
  * Digital Audio Compatibility", 1992 — the same tables in every
  * implementation, which is what makes the bitstream interoperable).
  *
  * Block layout is the WAV convention (mono): a 4-byte header —
  * predictor:int16le (= the block's first decoded sample), step
  * index:uint8, reserved:uint8 — then packed nibbles, LOW nibble
  * first. `samplesPerBlock = (blockBytes - 4) * 2 + 1` (the header
  * predictor itself is sample 0). All integer arithmetic —
  * bit-deterministic across executors — and encode→decode is pinned
  * by golden hashes plus an error bound on band-limited input in the
  * spec (ADPCM is predictive: accuracy holds for signals whose
  * per-sample delta fits the step table's tracking range).
  *
  * Part of the compressed-codec tier of [[MultimodalOps]] (the
  * reference's only codec work is gzip, `kinesis-to-humio.py:91-96`;
  * an LLM multimodal pipeline needs real audio codecs — this one
  * ships with zero external dependencies).
  */
object ImaAdpcm {

  /** IMA step-size table (89 entries). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per 4-bit code (sign bit mirrors). */
  val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clampIndex(i: Int): Int = math.max(0, math.min(88, i))
  private def clampPcm(s: Int): Int = math.max(-32768, math.min(32767, s))

  /** Quantize one delta; returns (code, newPredictor, newIndex). */
  private def encodeStep(sample: Int, predictor: Int, index: Int): (Int, Int, Int) = {
    val step = StepTable(index)
    var diff = sample - predictor
    var code = if (diff < 0) { diff = -diff; 8 } else 0
    // 3-bit magnitude quantization: diff ≈ (code&7) * step/4 + step/8
    var vpdiff = step >> 3
    var s = step
    if (diff >= s) { code |= 4; diff -= s; vpdiff += s }
    s >>= 1
    if (diff >= s) { code |= 2; diff -= s; vpdiff += s }
    s >>= 1
    if (diff >= s) { code |= 1; vpdiff += s }
    val pred = clampPcm(
      if ((code & 8) != 0) predictor - vpdiff else predictor + vpdiff)
    (code, pred, clampIndex(index + IndexTable(code)))
  }

  /** Dequantize one 4-bit code; returns (sample, newPredictor=sample, newIndex). */
  private def decodeStep(code: Int, predictor: Int, index: Int): (Int, Int) = {
    val step = StepTable(index)
    var vpdiff = step >> 3
    if ((code & 4) != 0) vpdiff += step
    if ((code & 2) != 0) vpdiff += step >> 1
    if ((code & 1) != 0) vpdiff += step >> 2
    val pred = clampPcm(
      if ((code & 8) != 0) predictor - vpdiff else predictor + vpdiff)
    (pred, clampIndex(index + IndexTable(code)))
  }

  /** Samples per block for a given block size in bytes (mono). */
  def samplesPerBlock(blockBytes: Int): Int = (blockBytes - 4) * 2 + 1

  /** Encode mono PCM-16 into IMA ADPCM blocks of `blockBytes` each
    * (last block zero-padded in the nibble area; decoder trusts the
    * caller-provided sample count to drop the padding). */
  def encode(samples: Array[Short], blockBytes: Int = 256): Array[Byte] = {
    require(blockBytes >= 8 && blockBytes % 4 == 0,
      s"blockBytes must be a multiple of 4 >= 8, got $blockBytes")
    val spb = samplesPerBlock(blockBytes)
    val nBlocks = (samples.length + spb - 1) / spb
    val out = new Array[Byte](nBlocks * blockBytes)
    var index = 0 // step index carries across blocks (encoder choice;
    // each block header re-seeds the decoder, so any seed is valid)
    var b = 0
    while (b < nBlocks) {
      val base = b * blockBytes
      val s0 = b * spb
      var predictor = samples(s0).toInt
      out(base) = (predictor & 0xff).toByte
      out(base + 1) = ((predictor >> 8) & 0xff).toByte
      out(base + 2) = index.toByte
      out(base + 3) = 0
      var i = 1 // sample 0 is the header predictor
      var nib = 0
      var pos = base + 4
      var lowDone = false
      while (i < spb) {
        val si = s0 + i
        if (si < samples.length) {
          val (code, p, ix) = encodeStep(samples(si).toInt, predictor, index)
          predictor = p; index = ix; nib = code
        } else nib = 0
        if (!lowDone) { out(pos) = nib.toByte; lowDone = true }
        else { out(pos) = (out(pos) | (nib << 4)).toByte; lowDone = false; pos += 1 }
        i += 1
      }
      b += 1
    }
    out
  }

  /** Decode `nSamples` mono PCM-16 samples from IMA ADPCM blocks. */
  def decode(data: Array[Byte], nSamples: Int, blockBytes: Int = 256): Array[Short] = {
    val spb = samplesPerBlock(blockBytes)
    val out = new Array[Short](nSamples)
    var b = 0
    var written = 0
    while (written < nSamples) {
      val base = b * blockBytes
      require(base + 4 <= data.length, "truncated ADPCM block header")
      var predictor = ((data(base + 1) << 8) | (data(base) & 0xff)).toShort.toInt
      var index = clampIndex(data(base + 2) & 0xff)
      out(written) = predictor.toShort
      written += 1
      var i = 1
      var pos = base + 4
      var low = true
      while (i < spb && written < nSamples) {
        require(pos < data.length, "truncated ADPCM block payload")
        val code =
          if (low) data(pos) & 0x0f
          else { val c = (data(pos) >> 4) & 0x0f; pos += 1; c }
        low = !low
        val (p, ix) = decodeStep(code, predictor, index)
        predictor = p; index = ix
        out(written) = p.toShort
        written += 1
        i += 1
      }
      b += 1
    }
    out
  }
}
