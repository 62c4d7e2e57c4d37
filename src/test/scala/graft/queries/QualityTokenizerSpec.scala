package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_quality_gopher + q_tokenizer_eval invariants beyond the oracle
  * gate: rule ordering and signal consistency for the Gopher-style
  * quality screen; fertility/compression sanity for the tokenizer
  * comparison (the oracle proves cross-engine equality; these prove
  * the VALUES mean what the metric names claim).
  */
class QualityTokenizerSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("gopher verdicts: first failing rule wins, signals consistent") {
    val rows = SparkEntry.queries("q_quality_gopher")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nWords, meanWl, nStop, verdict) =
        (r.getInt(1), r.getDouble(2), r.getInt(3), r.getString(4))
      // mean word length = word chars / words, so a 1-char-min word
      // alphabet bounds it in [1, longest word]
      assert(meanWl >= 1.0 && meanWl < 30.0, s"mean_word_len $meanWl")
      val expected =
        if (nWords < 30) "too_few_words"
        else if (nWords > 90) "too_many_words"
        else if (meanWl < 3.0 || meanWl > 10.0) "word_len_out_of_band"
        else if (nStop < 1) "no_stopword"
        else "keep"
      assert(verdict == expected,
        s"doc ${r.getLong(0)}: verdict $verdict, expected $expected " +
          s"(n_words=$nWords mean_wl=$meanWl n_stop=$nStop)")
    }
    // the screen discriminates on this corpus (not one constant verdict)
    assert(rows.map(_.getString(4)).distinct.length >= 2)
  }

  test("tokenizer eval: fertility >= 1 and byte ratios ordered") {
    val rows = SparkEntry.queries("q_tokenizer_eval")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (ws, bpe, uni) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val chars = r.getLong(2)
      // the unigram encoder splits every pre-token into >= 1 piece,
      // and pre-tokens >= whitespace tokens on this corpus
      assert(uni >= ws, s"lang ${r.getString(0)}: uni $uni < ws $ws")
      assert(r.getDouble(6) == uni.toDouble / ws.toDouble)
      // more tokens => fewer bytes per token: uni >= bpe tokens here
      // is not guaranteed, but both ratios must be consistent
      assert(r.getDouble(7) == chars.toDouble / uni.toDouble)
      assert(r.getDouble(8) == chars.toDouble / bpe.toDouble)
      assert(r.getDouble(7) >= 1.0, "a token is at least one byte")
    }
  }
}
