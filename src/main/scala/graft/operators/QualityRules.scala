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

  /** One tuning of the rule tree — the thresholds are corpus policy,
    * the TREE is the shared operator. `minStop = 0` disables the
    * stop-word rule (non-prose corpora: logs, code). */
  case class Profile(minWords: Int, maxWords: Int,
                     minMeanWordLen: Double, maxMeanWordLen: Double,
                     minStop: Int)

  /** The document-tuned profile (the fixture-adapted Gopher bands
    * every q_quality_* key gates under). */
  val DocumentProfile: Profile = Profile(30, 90, 3.0, 10.0, 1)

  /** LOG-EVENT-tuned profile for the S26 streaming flagship: message
    *-sized word band (a CloudWatch line is sentences, not pages),
    * a wide mean-word-length band that still rejects binary blobs /
    * minified one-liners, and NO stop-word rule (log lines are not
    * prose). Same tree, different policy. */
  val LogEventProfile: Profile = Profile(3, 256, 1.0, 40.0, 0)

  /** Fixture-adapted rule thresholds (the document profile's — kept
    * as named constants because the oracle SQL quotes them). */
  val MinWords = DocumentProfile.minWords
  val MaxWords = DocumentProfile.maxWords
  val MinMeanWordLen = DocumentProfile.minMeanWordLen
  val MaxMeanWordLen = DocumentProfile.maxMeanWordLen
  val MinStopWords = DocumentProfile.minStop

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
    verdictWith(DocumentProfile)(nWords, meanWordLen, nStop)

  /** [[verdict]] under an explicit [[Profile]] — ONE expression tree
    * for every tuning (the batch quality keys, the S22 streaming
    * gate, the S26 log-event admission all compile from here). */
  def verdictWith(p: Profile)(nWords: Column, meanWordLen: Column,
                              nStop: Column): Column =
    when(nWords < p.minWords, "too_few_words")
      .when(nWords > p.maxWords, "too_many_words")
      .when(meanWordLen < p.minMeanWordLen ||
        meanWordLen > p.maxMeanWordLen, "word_len_out_of_band")
      .when(nStop < p.minStop, "no_stopword")
      .otherwise("keep")

  /** Boolean admission form: 'keep' under `p` for a text column —
    * the single-call shape a streaming gate fuses into its scan. */
  def keeps(text: Column, p: Profile): Column =
    verdictWith(p)(nWords(text), meanWordLen(text), nStop(text)) ===
      "keep"
}
