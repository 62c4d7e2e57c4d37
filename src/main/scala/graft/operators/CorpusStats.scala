package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level n-gram statistics for boilerplate detection: an
  * n-gram appearing in a large fraction of documents is template
  * text (headers, footers, license blurbs), the classic candidate
  * for removal before training.
  *
  * Document frequency — not raw term frequency — is the signal:
  * per-doc grams are deduplicated BEFORE the count, so a gram
  * repeated inside one doc counts once. Plan shape: explode distinct
  * per-doc grams → hash-aggregate on the gram → filter df ≥ minDf.
  * One shuffle keyed by gram; partial (map-side) aggregation absorbs
  * most of the volume because boilerplate grams are by definition
  * massively repeated. Output grams stay strings here because the
  * boilerplate *list* is the deliverable (it feeds a removal pass);
  * the hashed variant of the same pipeline is [[Contamination]].
  */
object CorpusStats {

  /** Word n-grams of the token array, as strings. A doc shorter than
    * `n` tokens contributes its full token run as one gram (mirrors
    * [[ApproxDedup]]'s short-doc fallback). */
  def ngrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    // Native windowing kernel ([[graft.functions.NgramStrings]] —
    // one tight UTF8String loop inside whole-stage codegen) instead
    // of the interpreted `transform(sequence(...), i ->
    // concat_ws(" ", slice(...)))` HOF chain, whose per-element
    // lambda interpretation made gram generation the dominant CPU of
    // q_text_boilerplate (the r5 q_text_ngram_freq lesson applied to
    // the one remaining HOF gram site). The short-doc fallback (< n
    // tokens → the full token run as one gram) is preserved exactly:
    // the HOF form's sequence(0, greatest(size-n, 0)) emitted one
    // truncated window for those docs.
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(graft.functions.HashExpressions.ngramStrings(toks, n))
  }

  /** Grams whose document frequency ≥ `minDf`: (gram, df). */
  def boilerplateGrams(docs: DataFrame, n: Int, minDf: Long): DataFrame =
    docs
      // n-gram explode CPU spread across the cluster, not file
      // splits (a sub-128 MB corpus file scans as one task)
      .repartition(col("text"))
      .select(explode(array_distinct(ngrams(col("text"), n))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
}
