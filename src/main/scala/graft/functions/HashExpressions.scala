package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hash/vector kernels of the
  * dedup and similarity operators.
  *
  * The same math is expressible with `aggregate`/`zip_with`
  * higher-order functions, but HOF lambdas evaluate interpreted —
  * per-element virtual calls — which made the 64-bit × n-token
  * SimHash and 32-wise MinHash signatures the bench hot spots. These
  * expressions evaluate as tight JVM loops and stay inside
  * whole-stage codegen (`doGenCode` emits a static call), which is
  * the preference order the engine follows: built-in functions →
  * native `Expression` → UDF (SURVEY.md §7.2).
  */
object HashExpressions {
  /** 64-bit SimHash of a pre-hashed token array (`array<bigint>`). */
  def simhash64(tokenHashes: Column): Column =
    GraftColumnBridge.column(
      SimHash64(GraftColumnBridge.expression(tokenHashes)))

  /** k-wise MinHash signature of a pre-hashed shingle array —
    * k derived hashes per element via splitmix64 remixing of one base
    * hash (one-hash MinHash, Appleby-style). */
  def minhashSignature64(shingleHashes: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature64(GraftColumnBridge.expression(shingleHashes), k))

  /** Distinct n-token-window hashes of a token array, without
    * materializing shingle strings: each token is xxhash64'd ONCE
    * (seed 42, same kernel as the `xxhash64` built-in), windows
    * combine token hashes with a polynomial mix + splitmix64
    * finalizer. Replaces `xxhash64(concat_ws(" ", slice(...)))` per
    * window — measured ~4× on the shingling stage at sf0.1, which
    * dominated `minhashPairs`. */
  def ngramHashes64(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      NgramHashes64(GraftColumnBridge.expression(tokens), n))

  /** Strided variant of [[ngramHashes64]]: windows start at
    * 0, stride, 2·stride, ... and only FULL `n`-token windows are
    * emitted (docs with fewer than `n` tokens yield an empty array) —
    * the chunk-fingerprint semantics of
    * [[graft.operators.TextAnalysis.chunkFingerprints]]. */
  def stridedNgramHashes64(tokens: Column, n: Int, stride: Int): Column =
    GraftColumnBridge.column(
      StridedNgramHashes64(GraftColumnBridge.expression(tokens), n, stride))

  /** Σ aᵢ·bᵢ over two `array<float>` columns, accumulated
    * sequentially in double — bit-identical to the
    * `aggregate(zip_with(...))` formulation it replaces (and to the
    * DuckDB oracle's `list_inner_product` on DOUBLE[]). */
  def dotFF(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductFF(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))

  /** One-pass int8 quantization diagnostics of an `array<float>`
    * embedding: struct(scale, q, max_abs_err, cos_recon). Replaces
    * three interpreted `aggregate(zip_with(...))` HOFs per row (the
    * r4 bench hot spot in q_embed_quantize) with a single codegen'd
    * loop; bit-identical to the HOF formulation (and the DuckDB
    * oracle) — see [[QuantizeReconFD.compute]] for the invariants. */
  def quantizeRecon(embedding: Column): Column =
    GraftColumnBridge.column(
      QuantizeReconFD(GraftColumnBridge.expression(embedding)))

  /** Jaccard similarity |A∩B| / |A∪B| of two `array<bigint>` columns
    * treated as sets (inputs pre-deduped). Hash-set loop instead of
    * the `array_intersect`+`array_union` pair, which materializes two
    * intermediate arrays per pair in the O(pairs) verification
    * stage. */
  def jaccardLL(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaccardSetsLL(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))

  /** One-pass within-document repetition signals over a token array:
    * struct(n_bigrams, n_trigrams, dup3_frac, top2_frac). Replaces an
    * interpreted `aggregate(array_sort(...))` longest-run fold that
    * was the r5 bench hot spot (10.9 s → sub-second at sf0.1). Gram
    * equality is decided on 64-bit window hashes (same kernel as
    * [[ngramHashes64]]) rather than gram strings — identical results
    * absent xxhash64 collisions, the q_dedup_exact_hash trade. */
  def repetitionStats(tokens: Column): Column =
    GraftColumnBridge.column(
      RepetitionStats(GraftColumnBridge.expression(tokens)))

  /** All space-joined n-token window STRINGS (non-distinct, in
    * order) — the codegen'd counterpart of
    * `transform(sequence(...), i -> concat_ws(" ", ...))` for
    * operators whose output needs the gram text itself. */
  def ngramStrings(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      NgramStrings(GraftColumnBridge.expression(tokens), n))

  /** Every `width`-char window's md5 truncated to 60 bits as a long
    * (stride 1, in order) — the portable substring-dedup window key;
    * see [[CharWindowMd5_60.compute]] for the DuckDB equivalence. */
  def charWindowMd5_60(text: Column, width: Int): Column =
    GraftColumnBridge.column(
      CharWindowMd5_60(GraftColumnBridge.expression(text), width))

  /** Asymmetric containment |A∩B| / |A| of two `array<bigint>` set
    * columns ([[ContainmentLL]]) — the quoted-inside detector. */
  def containmentLL(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ContainmentLL(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))

  /** The string's md5 truncated to its first `nibbles` hex digits as
    * a long ([[Md5Long]]) — the scalar codegen'd form of the
    * portable-hash idiom `conv(substring(md5(s), 1, nibbles), 16,
    * 10)`; see [[Md5Long.compute]] for the DuckDB equivalence. */
  def md5Long(s: Column, nibbles: Int): Column =
    GraftColumnBridge.column(
      Md5Long(GraftColumnBridge.expression(s), nibbles))
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Each bit of each token hash votes ±1; fingerprint bit j is set
    * iff the vote sum is positive. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }
}

case class MinHashSignature64(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature64"
  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature64.compute(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature64.compute($c, $k)")
  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature64 = copy(child = newChild)
}

object MinHashSignature64 {
  private final val Gamma = 0x9E3779B97F4A7C15L

  private def splitmix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** One-hash MinHash: sig[i] = min over shingles s of
    * splitmix64(base(s) + (i+1)·γ) — one stored hash per shingle,
    * k cheap remixes per (shingle, i). */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var s = 0
    while (s < n) {
      val base = arr.getLong(s)
      var i = 0
      while (i < k) {
        val h = splitmix64(base + (i + 1) * Gamma)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }
}

case class NgramHashes64(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"window size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes64"
  override protected def nullSafeEval(input: Any): Any =
    NgramHashes64.compute(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramHashes64.compute($c, $n)")
  override protected def withNewChildInternal(
      newChild: Expression): NgramHashes64 = copy(child = newChild)
}

object NgramHashes64 {
  /** Shared window-combine scheme (also used by the strided variant):
    * FNV-prime polynomial over token hashes + splitmix64 finalizer. */
  final val MixPrime = 0x100000001B3L

  def finalizeMix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hash every token once (same xxhash64 kernel + seed 42 as the
    * built-in). */
  def hashTokens(tokens: ArrayData): Array[Long] = {
    val m = tokens.numElements()
    val tokH = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = tokens.getUTF8String(i)
      tokH(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    tokH
  }

  /** Sort + single-pass unique over a primitive prefix — no per-hash
    * boxing in the hot loop (all consumers are set-semantics:
    * minhash/Jaccard/counting ignore array order). */
  def sortedDistinct(buf: Array[Long], len: Int): ArrayData = {
    java.util.Arrays.sort(buf, 0, len)
    var nOut = 0
    var i = 0
    while (i < len) {
      if (i == 0 || buf(i) != buf(i - 1)) { buf(nOut) = buf(i); nOut += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, nOut))
  }

  /** Sliding(n) semantics: docs with fewer than n tokens emit ONE
    * window of all their tokens (mirroring Scala `sliding`), else
    * numTokens-n+1 full windows; distinct, sorted. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val tokH = hashTokens(tokens)
    val nWindows = if (m < n) 1 else m - n + 1
    val out = new Array[Long](nWindows)
    var w = 0
    while (w < nWindows) {
      var h = 0xCBF29CE484222325L
      val end = math.min(w + n, m)
      var j = w
      while (j < end) { h = h * MixPrime + tokH(j); j += 1 }
      out(w) = finalizeMix(h)
      w += 1
    }
    sortedDistinct(out, nWindows)
  }
}

case class StridedNgramHashes64(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {
  require(n >= 1, s"window size must be >= 1, got $n")
  require(stride >= 1, s"stride must be >= 1, got $stride")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "strided_ngram_hashes64"
  override protected def nullSafeEval(input: Any): Any =
    StridedNgramHashes64.compute(input.asInstanceOf[ArrayData], n, stride)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StridedNgramHashes64.compute($c, $n, $stride)")
  override protected def withNewChildInternal(
      newChild: Expression): StridedNgramHashes64 = copy(child = newChild)
}

object StridedNgramHashes64 {
  /** Full windows only, at offsets 0, stride, 2·stride, ...;
    * distinct, sorted. Same token-hash + polynomial-mix scheme as
    * [[NgramHashes64]]. */
  def compute(tokens: ArrayData, n: Int, stride: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val tokH = NgramHashes64.hashTokens(tokens)
    val nWindows = (m - n) / stride + 1
    val out = new Array[Long](nWindows)
    var w = 0
    while (w < nWindows) {
      val start = w * stride
      var h = 0xCBF29CE484222325L
      var j = start
      while (j < start + n) { h = h * NgramHashes64.MixPrime + tokH(j); j += 1 }
      out(w) = NgramHashes64.finalizeMix(h)
      w += 1
    }
    NgramHashes64.sortedDistinct(out, nWindows)
  }
}

case class DotProductFF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_ff"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductFF.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotProductFF.compute($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFF =
    copy(left = newLeft, right = newRight)
}

object DotProductFF {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

case class QuantizeReconFD(child: Expression) extends UnaryExpression {
  override def dataType: DataType = QuantizeReconFD.schema
  override def prettyName: String = "quantize_recon_fd"
  override protected def nullSafeEval(input: Any): Any =
    QuantizeReconFD.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QuantizeReconFD.compute($c)")
  override protected def withNewChildInternal(
      newChild: Expression): QuantizeReconFD = copy(child = newChild)
}

object QuantizeReconFD {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false),
      nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("cos_recon", DoubleType, nullable = false)))

  /** Bit-compatibility invariants with the HOF/oracle formulation it
    * replaces (each step exactly mirrors a Spark built-in the DuckDB
    * oracle also reproduces):
    *   - scale = greatest(max|xᵢ| (float), 1e-12f).toDouble / 127.0
    *     (float abs/max are exact; starting the max at 1e-12f equals
    *     `greatest` incl. the empty-array null case);
    *   - qᵢ = round(xᵢ/scale, 0) with Spark `Round` semantics —
    *     BigDecimal.valueOf HALF_UP, not rint (half-to-even) and not
    *     floor(v+0.5) (unrepresentable-tie drift);
    *   - deqᵢ = byte(qᵢ).toDouble · scale; |qᵢ| ≤ 127 by the scale
    *     definition so the byte round-trip is lossless;
    *   - dot products accumulate sequentially in double, in list
    *     order (same as [[DotProductFF]] / `list_inner_product`).
    */
  // Return type must be the concrete InternalRow (not Any): the
  // codegen'd assignment target is typed InternalRow and janino
  // refuses the Object→InternalRow conversion, silently disabling
  // whole-stage codegen for the plan.
  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    var maxAbs = 1e-12f
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs.toDouble / 127.0
    val q = new Array[Byte](n)
    var maxErr = 0.0
    var dotED = 0.0
    var dotEE = 0.0
    var dotDD = 0.0
    i = 0
    while (i < n) {
      val e = arr.getFloat(i).toDouble
      val r = java.math.BigDecimal.valueOf(e / scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      q(i) = r.toByte
      val d = q(i).toDouble * scale
      val err = math.abs(e - d)
      if (err > maxErr) maxErr = err
      dotED += e * d
      dotEE += e * e
      dotDD += d * d
      i += 1
    }
    val cos = dotED / (math.sqrt(dotEE) * math.sqrt(dotDD))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new GenericArrayData(q), maxErr, cos))
  }
}

case class JaccardSetsLL(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_ll"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSetsLL.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaccardSetsLL.compute($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSetsLL =
    copy(left = newLeft, right = newRight)
}

object JaccardSetsLL {
  /** |A∩B| / |A∪B| for pre-deduped long arrays via one hash set. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val set = new java.util.HashSet[Long](na * 2)
    var i = 0
    while (i < na) { set.add(a.getLong(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (set.contains(b.getLong(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter).toDouble
  }
}

case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStats.compute($c)")
  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats = copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_trigrams", IntegerType, nullable = false),
    StructField("dup3_frac", DoubleType, nullable = false),
    StructField("top2_frac", DoubleType, nullable = false)))

  /** Fraction formulations mirror the oracle exactly:
    * dup3 = 1.0 - distinct/total (double division, same op order as
    * `1.0 - CAST(len(list_distinct(tri)) AS DOUBLE)/len(tri)`);
    * top2 = maxRun/total. Empty gram lists yield 0.0 (bigrams: a
    * 1-token doc) — matching the query-level guards. */
  // Concrete InternalRow return type: see QuantizeReconFD note.
  def compute(tokens: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val m = tokens.numElements()
    val tokH = NgramHashes64.hashTokens(tokens)
    def gramHashes(n: Int): Array[Long] =
      if (m < n) Array.emptyLongArray
      else {
        val out = new Array[Long](m - n + 1)
        var w = 0
        while (w <= m - n) {
          var h = 0xCBF29CE484222325L
          var j = w
          while (j < w + n) { h = h * NgramHashes64.MixPrime + tokH(j); j += 1 }
          out(w) = NgramHashes64.finalizeMix(h)
          w += 1
        }
        out
      }
    val bi = gramHashes(2)
    val tri = gramHashes(3)
    java.util.Arrays.sort(bi)
    java.util.Arrays.sort(tri)
    var distinct3 = if (tri.length > 0) 1 else 0
    var i = 1
    while (i < tri.length) { if (tri(i) != tri(i - 1)) distinct3 += 1; i += 1 }
    var best = if (bi.length > 0) 1 else 0
    var run = best
    i = 1
    while (i < bi.length) {
      if (bi(i) == bi(i - 1)) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    val dup3 =
      if (tri.length > 0) 1.0 - distinct3.toDouble / tri.length else 0.0
    val top2 = if (bi.length > 0) best.toDouble / bi.length else 0.0
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bi.length, tri.length, dup3, top2))
  }
}

case class NgramStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"window size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_strings"
  override protected def nullSafeEval(input: Any): Any =
    NgramStrings.compute(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramStrings.compute($c, $n)")
  override protected def withNewChildInternal(
      newChild: Expression): NgramStrings = copy(child = newChild)
}

object NgramStrings {
  private val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** All space-joined n-token windows, in order, full windows only
    * (same value surface as the `transform(sequence(...),
    * concat_ws(...))` formulation it replaces — that HOF's
    * per-element interpreted lambdas made q_text_ngram_freq the
    * slowest bench query). */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n)
      return new GenericArrayData(
        Array.empty[org.apache.spark.unsafe.types.UTF8String])
    val toks =
      new Array[org.apache.spark.unsafe.types.UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val win = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val out =
      new Array[org.apache.spark.unsafe.types.UTF8String](m - n + 1)
    var w = 0
    while (w <= m - n) {
      var j = 0
      while (j < n) { win(j) = toks(w + j); j += 1 }
      out(w) = org.apache.spark.unsafe.types.UTF8String
        .concatWs(Space, win: _*)
      w += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}

case class CharWindowMd5_60(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, s"window width must be >= 1, got $width")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_md5_60"
  override protected def nullSafeEval(input: Any): Any =
    CharWindowMd5_60.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharWindowMd5_60.compute($c, $width)")
  override protected def withNewChildInternal(
      newChild: Expression): CharWindowMd5_60 = copy(child = newChild)
}

object CharWindowMd5_60 {
  /** Every `width`-CHAR window's md5, truncated to its first 60 bits
    * as a long — exactly `('0x' || substring(md5(substring(text, i,
    * width)), 1, 15))::BIGINT` (the first 15 hex digits are the
    * first 7.5 digest bytes; the >>> 4 drops the half-nibble), so
    * any engine with md5 reproduces the keys. One UTF-8 pass builds
    * char→byte offsets (windows are CHARACTER-indexed like both
    * engines' substring), one reused MessageDigest hashes each
    * window's byte slice — no per-window string materialization.
    * Replaces the interpreted `transform(sequence(...), i ->
    * conv(substring(md5(...))))` formulation (~4× on the window
    * stream at sf0.1: 1.3 M windows explode in ~0.5 s warm, the
    * whole dup-span screen runs ~2.5 s in-session). */
  def compute(s: org.apache.spark.unsafe.types.UTF8String,
              width: Int): ArrayData = {
    val n = s.numChars()
    if (n < width) return new GenericArrayData(Array.emptyLongArray)
    val bytes = s.getBytes
    val offs = new Array[Int](n + 1)
    var i = 0
    var b = 0
    while (i < n) {
      offs(i) = b
      b += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(n) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = new Array[Byte](16)
    val out = new Array[Long](n - width + 1)
    var w = 0
    while (w <= n - width) {
      md.reset()
      md.update(bytes, offs(w), offs(w + width) - offs(w))
      md.digest(digest, 0, 16)
      out(w) = (((digest(0) & 0xffL) << 56) | ((digest(1) & 0xffL) << 48) |
        ((digest(2) & 0xffL) << 40) | ((digest(3) & 0xffL) << 32) |
        ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
        ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)) >>> 4
      w += 1
    }
    new GenericArrayData(out)
  }
}

case class Md5Long(child: Expression, nibbles: Int)
    extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be in [1, 15] to fit a positive long, got $nibbles")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long"
  override protected def nullSafeEval(input: Any): Any =
    Md5Long.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], nibbles)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Long.compute($c, $nibbles)")
  override protected def withNewChildInternal(
      newChild: Expression): Md5Long = copy(child = newChild)
}

object Md5Long {
  // One digest instance per thread: getInstance("MD5") per row costs
  // more than the hash itself on short keys.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The md5 of the string's UTF-8 bytes, truncated to its first
    * `nibbles` hex digits as a long — exactly `('0x' ||
    * substring(md5(s), 1, nibbles))::BIGINT` (the first k hex digits
    * are the top 4k bits of the digest read big-endian), so any
    * engine with md5 reproduces the keys. Replaces the interpreted
    * `conv(substring(md5(...), 1, k), 16, 10)` chain, which
    * materializes a 32-char hex string and re-parses it per row. */
  def compute(s: org.apache.spark.unsafe.types.UTF8String,
              nibbles: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    val top = ((digest(0) & 0xffL) << 56) | ((digest(1) & 0xffL) << 48) |
      ((digest(2) & 0xffL) << 40) | ((digest(3) & 0xffL) << 32) |
      ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
      ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)
    top >>> (64 - 4 * nibbles)
  }
}

case class ContainmentLL(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "containment_ll"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ContainmentLL.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ContainmentLL.compute($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainmentLL =
    copy(left = newLeft, right = newRight)
}

object ContainmentLL {
  /** |A∩B| / |A| for pre-deduped long arrays — the ASYMMETRIC
    * overlap measure: 1.0 means A's grams all appear in B (A quoted
    * inside B), regardless of how much bigger B is. Same hash-set
    * loop as [[JaccardSetsLL]], normalized by the LEFT side only. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    if (na == 0) return 0.0
    val nb = b.numElements()
    val set = new java.util.HashSet[Long](nb * 2)
    var i = 0
    while (i < nb) { set.add(b.getLong(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < na) { if (set.contains(a.getLong(i))) inter += 1; i += 1 }
    inter.toDouble / na.toDouble
  }
}
