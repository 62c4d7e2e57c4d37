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
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
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
