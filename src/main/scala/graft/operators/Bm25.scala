package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Okapi BM25 scoring core, shared verbatim by the batch retrieval
  * keys ([[graft.queries.RetrievalQueries]]) and the streaming
  * enrichment twin ([[graft.streaming.StreamingBm25Enrich]]) — one
  * expression tree, so stream/batch parity is structural, not
  * coincidental.
  *
  * Determinism contract (see RetrievalQueries scaladoc for the full
  * derivation): idf is quantized to 6 decimals AT BIRTH (`ln` is the
  * only non-exactly-rounded op in the pipeline); every later step is
  * a correctly-rounded IEEE double op with operand order mirrored by
  * the DuckDB oracle; per-(query,doc) term contributions are rounded
  * to the same 1e-6 grid and summed exactly (DECIMAL(18,6) in batch,
  * integer micro-units in the streaming fold — the same grid, so the
  * two paths emit bit-identical doubles).
  *
  * Scale shape: `idf` and `stats` are vocabulary-/scalar-sized
  * (broadcast); `postings` is the corpus-sized inverted frame that
  * never moves — query terms broadcast onto it.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75
  private val dec6 = DecimalType(18, 6)

  /** postings: (term, doc_id, tf, dl); idf: (term, idf6);
    * stats: (n_docs, avgdl) — one row. */
  final case class Index(postings: DataFrame, idf: DataFrame,
                         stats: DataFrame)

  /** Per-doc postings rows (doc_id, term, tf, dl) for (doc_id, text)
    * docs. Tokenizer is the engine-wide single-space split
    * (FIXTURES.md corpus contract). dl rides through the explode so
    * no corpus-sized doc_id join is needed to reattach it. Postings
    * are PER-DOCUMENT decomposable — postings(A ⊎ B) =
    * postings(A) ⊎ postings(B) — which is what makes the index
    * incrementally maintainable ([[IncrementalIndex]]). */
  def postings(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    docs
      .select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(w).as("term"),
        size(w).cast("long").as("dl"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
  }

  private def idfFrom(postings: DataFrame, stats: DataFrame): DataFrame =
    postings.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"),
        round(log(lit(1.0) +
          ((col("n_docs") - col("df")) + lit(0.5)) /
            (col("df") + lit(0.5))), 6).as("idf6"))

  /** Build the inverted index from (doc_id, text) rows. */
  def buildIndex(docs: DataFrame): Index = {
    val p = postings(docs)
    val stats = docs
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    Index(p, idfFrom(p, stats), stats)
  }

  /** Rehydrate an [[Index]] from a MAINTAINED postings frame
    * ([[IncrementalIndex]]'s durable state): idf/avgdl are
    * vocabulary-/scalar-sized aggregates over the postings, so they
    * are consistent with them by construction. Every doc carries at
    * least one posting row (the single-space split of an empty text
    * is one empty-string token), so the per-doc dl regroup loses no
    * document; with unique doc_ids (the corpus contract) the stats
    * equal [[buildIndex]]'s doc-side computation exactly — the sum
    * and count are integer-exact, the avgdl division is the same
    * single IEEE op. */
  def fromPostings(postings: DataFrame): Index = {
    val stats = postings.groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    Index(postings, idfFrom(postings, stats), stats)
  }

  /** Per-term contribution on the 1e-6 grid:
    * round(idf6 · (tf·(k1+1)) / (tf + k1·(1−b + b·dl/avgdl)), 6).
    * Expects columns idf6, tf, dl, avgdl in scope. */
  def contrib6: Column =
    round(col("idf6") * ((col("tf") * lit(K1 + 1)) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) *
        (col("dl").cast("double") / col("avgdl"))))), 6)

  /** (query_id, doc_id, term-contribution) rows for a query-term
    * frame (query_id, term). `qterms` is broadcast — the queries ≪
    * corpus contract; at web-scale query volume flip to
    * [[ScaleJoins.frequencySplitJoin]] on term. */
  def contributions(qterms: DataFrame, idx: Index): DataFrame =
    idx.postings
      .join(broadcast(qterms), "term")
      .join(broadcast(idx.idf), "term")
      .crossJoin(broadcast(idx.stats))
      .select(col("query_id"), col("doc_id"), contrib6.as("c"))

  /** Batch scoring: exact DECIMAL(18,6) sum of grid contributions
    * per (query_id, doc_id), emitted as double. */
  def score(qterms: DataFrame, idx: Index): DataFrame =
    contributions(qterms, idx)
      .select(col("query_id"), col("doc_id"), col("c").cast(dec6).as("s"))
      .groupBy("query_id", "doc_id")
      .agg(sum("s").cast("double").as("score"))
}
