package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A real unigram-LM tokenizer (the SentencePiece algorithm family,
  * Kudo 2018) trained by hard (Viterbi) EM — the second of the two
  * tokenizer algorithms that matter for LLM corpora, next to [[Bpe]].
  *
  * Algorithm (deterministic by construction):
  *   - seed vocabulary = every length-1 substring of the pre-token
  *     stream plus the top-K (count DESC, piece ASC) substrings of
  *     length 2..4, counts weighted by word frequency and counting
  *     overlapping occurrences;
  *   - piece costs are negative log-probabilities MICRO-QUANTIZED at
  *     birth: cost(p) = round(ln(total/count(p))·1e6) as BIGINT
  *     micro-nats (the DSIR discipline — ln is the only
  *     transcendental, everything after is exact integer math);
  *   - E-step: per distinct word, the min-cost segmentation by
  *     dynamic programming (ties: the LONGER final piece wins at
  *     every position — a total, replayable rule);
  *   - M-step: piece counts re-accumulated from the Viterbi
  *     segmentations (weighted by word frequency); pieces that went
  *     unused are pruned (every word stays segmentable: the pieces
  *     of its own segmentation survive by construction);
  *   - two EM rounds by contract (fixed-iteration discipline, like
  *     PageRank / k-means here), then final costs from final counts.
  *
  * Scale shape (the [[Bpe]] production mirror): training statistics
  * are map-side-combined aggregations over the DISTINCT-word
  * frequency table (Zipf-hot words collapse per task before any
  * shuffle); the vocabulary is a codebook-sized driver artifact
  * (≤ alphabet + topK rows — the AnnSearch bounded-collect
  * contract); encoding at 100 TB is one `mapPartitions` pass with
  * the cost table broadcast once, a per-partition word memo, and no
  * shuffle or token-keyed join anywhere.
  *
  * Determinism hazards and their handling: ln differs by ≤1 ulp
  * across libm implementations — quantization at ×1e6 makes a flip
  * possible only within ~1e-9 of a rounding boundary per DISTINCT
  * (total, count) pair (vocabulary-sized, the accepted risk class of
  * `round(x, 9)` elsewhere); every other step (DP sums, argmin
  * tie-breaks, count aggregation) is exact integer arithmetic. The
  * DuckDB oracle ([[UnigramOracle]]) replays seed selection, both EM
  * rounds, and the final encode as unrolled per-position DP CTEs.
  */
object Unigram {
  val MaxPieceLen = 4
  /** Oracle-unroll bound: the DP chain is generated to this many
    * position steps, so pre-tokens longer than this are a CONTRACT
    * violation (train/tokenCounts fail loudly rather than silently
    * diverging from the oracle). Real corpora pre-tokenize to short
    * alpha/digit runs; raise the constant and the oracle regenerates. */
  val MaxWordLen = 16

  final case class Piece(piece: String, cnt: Long, costMicro: Long)

  /** round(ln(total/cnt)·1e6) — half-up is exact floor(x+0.5) here
    * because ln(total/cnt) ≥ 0 (cnt ≤ total). */
  def quantCost(total: Long, cnt: Long): Long =
    math.floor(math.log(total.toDouble / cnt.toDouble) * 1e6 + 0.5).toLong

  /** Min-cost segmentation of `word` under `cost`; ties at any end
    * position resolve to the LONGEST piece. Throws if the word is
    * not coverable (cannot happen for vocabularies produced by
    * [[train]] on the same corpus). */
  def segment(word: String, cost: collection.Map[String, Long])
      : List[String] = {
    val L = word.length
    require(L <= MaxWordLen,
      s"pre-token '$word' exceeds MaxWordLen=$MaxWordLen (oracle contract)")
    val c = Array.fill(L + 1)(Long.MaxValue)
    val bp = Array.fill(L + 1)(0)
    c(0) = 0L
    var i = 1
    while (i <= L) {
      var l = 1
      while (l <= MaxPieceLen && l <= i) {
        if (c(i - l) != Long.MaxValue) {
          val pc = cost.getOrElse(word.substring(i - l, i), Long.MinValue)
          if (pc != Long.MinValue) {
            val tot = c(i - l) + pc
            // ascending l with >= keeps the LARGEST tying l
            if (tot < c(i) || (tot == c(i) && l > bp(i))) {
              c(i) = tot; bp(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    require(c(L) != Long.MaxValue, s"word '$word' not segmentable")
    var out = List.empty[String]
    var p = L
    while (p > 0) { out = word.substring(p - bp(p), p) :: out; p -= bp(p) }
    out
  }

  /** Distinct pre-token frequency table (word, n) — the weighted
    * frame every training pass aggregates over. */
  private def wordFreq(docs: DataFrame, textCol: String)
      : Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol)).as[String]
      .flatMap(Bpe.preTokens(_))
      .groupBy(col("value").as("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
  }

  /** Train the unigram vocabulary: seed + `rounds` Viterbi-EM
    * rounds. Returns final (piece, count, costMicro) sorted by
    * piece. */
  def train(docs: DataFrame, textCol: String, topKMulti: Int = 40,
            rounds: Int = 2): Seq[Piece] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = wordFreq(docs, textCol).cache()
    try {
      val tooLong = wf.filter(length(col("w")) > MaxWordLen).take(1)
      require(tooLong.isEmpty,
        s"pre-token '${tooLong.headOption.map(_._1).getOrElse("")}' " +
          s"exceeds MaxWordLen=$MaxWordLen")
      // seed substring counts, map-side combined; only the length-1
      // rows and the top-K multi-char rows are ever collected
      val subs = wf.flatMap { case (w, n) =>
        for {
          i <- 0 until w.length
          l <- 1 to MaxPieceLen if i + l <= w.length
        } yield (w.substring(i, i + l), n)
      }.groupBy(col("_1").as("piece")).agg(sum(col("_2")).as("cnt"))
      val chars = subs.filter(length(col("piece")) === 1)
      val multi = subs.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece").asc).limit(topKMulti)
      var pieces: Map[String, Long] = chars.union(multi)
        .as[(String, Long)].collect().toMap // codebook-sized by contract
      for (_ <- 1 to rounds) {
        val total = pieces.valuesIterator.sum
        val costs = pieces.map { case (p, c) => p -> quantCost(total, c) }
        val bc = spark.sparkContext.broadcast(costs)
        // E+M: Viterbi per distinct word, piece counts re-accumulated
        // (map-side partial via the per-partition HashMap)
        pieces = wf.mapPartitions { it =>
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          it.foreach { case (w, n) =>
            segment(w, bc.value).foreach(p =>
              m.update(p, m.getOrElse(p, 0L) + n))
          }
          m.iterator
        }.groupBy(col("_1").as("piece")).agg(sum(col("_2")).as("cnt"))
          .as[(String, Long)].collect().toMap
      }
      val totalF = pieces.valuesIterator.sum
      pieces.toSeq.sortBy(_._1).map { case (p, c) =>
        Piece(p, c, quantCost(totalF, c))
      }
    } finally wf.unpersist()
  }

  /** Per-document token counts under a trained vocabulary: one
    * narrow `mapPartitions` pass, costs broadcast once, per-partition
    * word memo — no shuffle, no join (the [[Bpe.tokenCounts]]
    * contract). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[Piece]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val costs = vocab.map(p => p.piece -> p.costMicro).toMap
    val bc = spark.sparkContext.broadcast(costs)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (id, text) =>
          var n = 0L
          Bpe.preTokens(text).foreach { w =>
            n += memo.getOrElseUpdate(w, segment(w, bc.value).length.toLong)
          }
          (id, n)
        }
      }
      .toDF(idCol, "n_tokens")
  }
}
