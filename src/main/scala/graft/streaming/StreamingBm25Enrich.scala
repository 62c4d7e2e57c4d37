package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.Bm25

/** One incoming text query to retrieve for. */
case class TextQuery(query_id: Long, text: String)

/** One retrieved document for a streamed query. */
case class Bm25Hit(doc_id: Long, score: Double)

/** Per-query retrieval emission. */
case class Bm25Enriched(query_id: Long, n_matched: Long,
                        hits: Seq[Bm25Hit])

/** Streaming BM25 retrieval enrichment (S21) — sparse search at
  * ingest: each arriving text row is retrieved against a static
  * corpus index within its micro-batch. The inverted index is built
  * ONCE in batch ([[Bm25.buildIndex]]); per batch, arriving queries
  * tokenize (a projection), join the postings frame STREAM-STATIC on
  * term, and fold to a bounded per-query top-k — so per-batch cost
  * is postings-matched-by-query-terms, never corpus × batch. This is
  * the sparse twin of S18 (ANN enrichment): together they are the
  * hybrid ingest-time retrieval pair matching the batch
  * q_retrieval_bm25 / q_retrieval_fusion keys.
  *
  * Stateless across batches, exactly like S18: the group fold runs
  * through `flatMapGroupsWithState` but NEVER writes state — a
  * query's answer depends only on its own terms and the static
  * index, so at-least-once replay re-emits the SAME rows
  * (idempotent) rather than merging into a retained aggregate.
  *
  * EXACT stream/batch parity: per-term contributions come from the
  * same [[Bm25.contrib6]] expression tree on the same 1e-6 grid; the
  * in-fold per-doc sum uses exact integer micro-units, the same grid
  * the batch path sums in DECIMAL(18,6) — both convert once,
  * correctly rounded, to the identical double. StreamingBm25EnrichSpec
  * asserts hit-for-hit equality with [[Bm25.score]] for any
  * micro-batch split, plus replay idempotence.
  *
  * Scale: the static side of the stream-static join is the
  * corpus-sized postings frame keyed by term; idf/stats broadcast.
  * Decontamination screening at ingest (does an arriving eval doc
  * match training corpus text?), RAG query serving, and
  * near-duplicate triage all reduce to this shape.
  */
object StreamingBm25Enrich {

  /** Enrich the stream: one output row per query per micro-batch it
    * arrives in — (query_id, n_matched docs, hits ≤ k in
    * (score DESC, doc_id ASC) order). Run with OutputMode.Update. */
  def enrich(stream: Dataset[TextQuery], index: Bm25.Index, k: Int = 5)
      : Dataset[Bm25Enriched] = {
    import stream.sparkSession.implicits._
    val qterms = stream.toDF()
      .select(col("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    // Stream-static equi-join on term; idf + stats broadcast. The
    // static postings side is re-planned per micro-batch by
    // Structured Streaming — the stream side is the small one here,
    // so Spark broadcasts IT against the static frame.
    val contrib = index.postings
      .join(qterms, "term")
      .join(broadcast(index.idf), "term")
      .crossJoin(broadcast(index.stats))
      .select(col("query_id"), col("doc_id"),
        // exact integer micro-units of the shared 1e-6-grid
        // contribution: the fold's sum is order-free and replays the
        // batch DECIMAL(18,6) sum bit-for-bit
        round(Bm25.contrib6 * lit(1000000.0), 0).cast("long").as("micros"))
      .as[(Long, Long, Long)]
    contrib
      .groupByKey(_._1)
      // state type is a dummy Long, NEVER written — see scaladoc
      .flatMapGroupsWithState[Long, Bm25Enriched](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Long, Long)],
         _: GroupState[Long]) =>
          val byDoc = new scala.collection.mutable.LongMap[Long]()
          rows.foreach { case (_, d, m) =>
            byDoc.update(d, byDoc.getOrElse(d, 0L) + m)
          }
          val top = byDoc.toArray
            .map { case (d, m) => (d, m.toDouble / 1000000.0) }
            .sortBy { case (d, s) => (-s, d) }.take(k)
          Iterator.single(Bm25Enriched(id, byDoc.size.toLong,
            top.map { case (d, s) => Bm25Hit(d, s) }.toSeq))
      }
  }
}
