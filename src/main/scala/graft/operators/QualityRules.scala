package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher-style quality-rule core (Rae et al. 2021, appendix A —
  * public heuristics), shared by the batch registry key
  * (`q_quality_gopher`) and the streaming admission operator
  * ([[graft.streaming.StreamingQualityGate]], S22) — one expression
  * tree, two execution contexts, the S21/BM25 "share the scoring
  * core" discipline.
  *
  * Every signal is a pure per-row projection over exact ints (word
  * count, word-character count, distinct-stop-word count), and
  * `meanWordLen` is a bare int-ratio IEEE division (SURVEY 7.4 rule
  * 10) — so batch, stream, and the DuckDB oracle agree bit-for-bit,
  * and the streaming gate plans as one WholeStageCodegen map with no
  * state, shuffle, or join.
  *
  * Thresholds are fixture-adapted (the paper's 50..100k word band
  * and ≥2-stop-word rule would collapse the synthetic corpus into a
  * single verdict); the rule STRUCTURE — banded word count, banded
  * mean word length, stop-word presence, first failing rule wins —
  * is the paper's.
  */
object QualityRules {

  /** Gopher's stop-word set (the paper's 8 words). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Fixture-adapted rule thresholds. */
  val MinWords = 30
  val MaxWords = 90
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MinStopWords = 1

  def nWords(text: Column): Column = size(split(text, " "))

  /** Mean word length = word chars / words — a bare int ratio. */
  def meanWordLen(text: Column): Column =
    length(translate(text, " ", "")).cast("double") /
      size(split(text, " "))

  /** Distinct stop words present, as INT (rule 7: both engines cast
    * list lengths to INT on the output surface). */
  def nStop(text: Column): Column =
    size(array_intersect(array_distinct(split(text, " ")),
      array(StopWords.map(lit): _*))).cast("int")

  /** First failing rule wins; 'keep' iff all pass. The comparisons
    * run on the same unrounded signals the output surfaces. */
  def verdict(nWords: Column, meanWordLen: Column,
              nStop: Column): Column =
    when(nWords < MinWords, "too_few_words")
      .when(nWords > MaxWords, "too_many_words")
      .when(meanWordLen < MinMeanWordLen ||
        meanWordLen > MaxMeanWordLen, "word_len_out_of_band")
      .when(nStop < MinStopWords, "no_stopword")
      .otherwise("keep")
}
