package graft.operators

import graft.{SparkSpec, Tables}

/** [[Unigram]] trainer/encoder pins beyond the oracle hash:
  *   - the DP segmentation equals an INDEPENDENT brute-force
  *     enumeration of every segmentation (min cost, ties resolved by
  *     the longest-piece-from-the-right rule — the DP's per-position
  *     tie-break induces exactly that total order);
  *   - vocabulary invariants (pruned pieces gone, counts positive,
  *     cost anti-monotone in count);
  *   - training is deterministic (two runs, identical artifact);
  *   - the encoder's counts are consistent with per-word
  *     segmentation lengths.
  */
class UnigramSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, dir).select("text")

  private def enumerate(word: String,
      cost: Map[String, Long]): Seq[List[String]] = {
    if (word.isEmpty) Seq(Nil)
    else (1 to math.min(Unigram.MaxPieceLen, word.length)).flatMap { l =>
      val piece = word.substring(0, l)
      if (cost.contains(piece))
        enumerate(word.substring(l), cost).map(piece :: _)
      else Seq.empty
    }
  }

  private def totalCost(seg: List[String], cost: Map[String, Long]): Long =
    seg.map(cost).sum

  /** The tie order the DP induces: among min-cost segmentations, the
    * one whose piece-length sequence read RIGHT-TO-LEFT is
    * lexicographically largest. */
  private def tieBest(segs: Seq[List[String]]): List[String] =
    segs.maxBy(_.reverse.map(_.length))(
      Ordering.Implicits.seqOrdering[List, Int])

  test("Viterbi segmentation equals exhaustive enumeration with the " +
      "documented tie rule, for every corpus word") {
    val vocab = Unigram.train(docs, "text")
    val cost = vocab.map(p => p.piece -> p.costMicro).toMap
    val words = docs.collect().flatMap(r => Bpe.preTokens(r.getString(0)))
      .distinct
    assert(words.nonEmpty)
    for (w <- words) {
      val dp = Unigram.segment(w, cost)
      val all = enumerate(w, cost)
      assert(all.nonEmpty, s"'$w' not coverable by the trained vocab")
      val minC = all.map(totalCost(_, cost)).min
      assert(totalCost(dp, cost) == minC,
        s"'$w': DP cost ${totalCost(dp, cost)} vs brute-force $minC")
      val best = tieBest(all.filter(totalCost(_, cost) == minC))
      assert(dp == best, s"'$w': DP $dp vs tie-rule best $best")
    }
  }

  test("vocabulary invariants and training determinism") {
    val v1 = Unigram.train(docs, "text")
    val v2 = Unigram.train(docs, "text")
    assert(v1 == v2, "training must be deterministic")
    assert(v1.forall(_.cnt > 0), "pruned pieces must not survive")
    assert(v1.map(_.piece) == v1.map(_.piece).sorted)
    for (a <- v1; b <- v1 if a.cnt > b.cnt)
      assert(a.costMicro <= b.costMicro,
        s"cost must be anti-monotone in count: $a vs $b")
  }

  test("encoder counts equal summed per-word segmentation lengths") {
    val vocab = Unigram.train(docs, "text")
    val cost = vocab.map(p => p.piece -> p.costMicro).toMap
    val expected = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map { r =>
        r.getLong(0) -> Bpe.preTokens(r.getString(1))
          .map(w => Unigram.segment(w, cost).length.toLong).sum
      }.toMap
    val got = Unigram.tokenCounts(
      Tables.documents(spark, dir), "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
