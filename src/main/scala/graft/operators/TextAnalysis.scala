package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language
  * identification (stopword-profile heuristic), token counting
  * (whitespace + a BPE-ish regex segmentation), and document
  * fingerprinting (whole-doc + rolling chunk hashes).
  *
  * All pure per-row projections of codegen'd built-ins / higher-order
  * functions — they add zero shuffles to whatever pipeline they are
  * composed into.
  */
object TextAnalysis {
  /** Stopword profiles per language — the classic cheap language-ID
    * heuristic (function words dominate any natural text). */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "you",
      "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los",
      "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "nicht",
      "mit", "ich"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "que",
      "dans"))

  /** Per-language stopword hit count over a token array column —
    * distinct stopword *types* present, via the native
    * `array_intersect` (an interpreted per-token `filter` lambda ×
    * 4 profiles was a bench hot spot). */
  def profileScore(toks: Column, lang: String): Column =
    size(array_intersect(toks, typedLit(profiles(lang))))

  /** Language-ID: argmax of profile scores, "und" (undetermined) when
    * no profile matches at all. Ties break by profile order
    * (en, es, de, fr) — deterministic. */
  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val ordered = Seq("en", "es", "de", "fr")
    val scored = ordered.map(l => struct(profileScore(toks, l).as("score"),
      lit(ordered.indexOf(l)).as("ord"), lit(l).as("lang")))
    // array_max on (score, -ord) struct: highest score, earliest
    // profile on ties (struct comparison is lexicographic).
    val best = array_max(array(scored.map(s =>
      struct(s.getField("score").as("score"),
        (-s.getField("ord")).as("negord"), s.getField("lang").as("lang"))): _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish sub-word segmentation count: alpha runs, digit runs, and
    * single punctuation marks — the pre-tokenizer shape used by most
    * BPE vocabularies. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpePattern), lit(0)))

  /** Whole-document fingerprint: xxhash64 of whitespace-normalized
    * lowercase text — equal fingerprints ⇔ equal normalized content
    * (modulo hash collision), the cheap first pass of content dedup. */
  def docFingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** Rolling chunk fingerprints: xxhash64 of each `chunk`-token
    * window (stride = chunk), for partial-overlap detection —
    * documents sharing any chunk fingerprint share a verbatim
    * `chunk`-token run. */
  def chunkFingerprints(text: Column, chunk: Int = 8): Column =
    // Full windows only: a trailing partial window would make two
    // docs "share an 8-token run" on the strength of a shorter
    // suffix. Docs with fewer than `chunk` tokens emit no chunk
    // fingerprints (the whole-doc fingerprint covers them). Native
    // strided kernel: token hashes once, window combine on longs —
    // no per-window shingle strings (see NgramHashes64).
    graft.functions.HashExpressions.stridedNgramHashes64(
      split(text, " "), chunk, chunk)

  /** Full per-document analysis frame. */
  def analyze(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      langId(col("text")).as("pred_lang"),
      wsTokenCount(col("text")).as("ws_tokens"),
      bpeTokenCount(col("text")).as("bpe_tokens"),
      docFingerprint(col("text")).as("fingerprint"),
      chunkFingerprints(col("text")).as("chunk_fps"))
}
