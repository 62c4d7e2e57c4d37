package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.{AnnSearch, Bm25, Rrf}
import graft.functions.VectorFns

/** One incoming hybrid query: text for the sparse ranker, embedding
  * for the dense one. */
case class HybridQuery(query_id: Long, text: String,
                       embedding: Seq[Float])

/** One fused hit: per-ranker ranks (None = outside that ranker's
  * depth), the RRF score and the fused rank. */
case class HybridHit(doc_id: Long, rb: Option[Int], rc: Option[Int],
                     rrf: Double, rk: Int)

/** Per-query fused emission. */
case class HybridEnriched(query_id: Long, hits: Seq[HybridHit])

/** S23 — streaming HYBRID retrieval: arriving documents get the full
  * sparse⊕dense RRF ranking at ingest, fusing the S21 BM25 channel
  * and the S18 dense channel through the SAME scoring cores the
  * batch `q_retrieval_fusion` key uses — [[Bm25.contrib6]] for term
  * contributions (the S21 discipline), the shared cosine expression
  * for the dense side, and [[Rrf]] for the fusion arithmetic (one
  * formula, no fork to drift). A document admitted at ingest with
  * fused rank r would get EXACTLY rank r from a batch re-run.
  *
  * Mechanics per micro-batch: the sparse channel joins arriving
  * query terms STREAM-STATIC against the postings frame (idf/stats
  * broadcast); the dense channel probes the IVF index's cells and
  * equi-joins the cell-assigned corpus. Both channels encode scores
  * as exact 1e-6-grid integer micro-units on ONE union'd long
  * column, and a single stateless `flatMapGroupsWithState` fold per
  * query ranks each channel to `depth`, fuses with [[Rrf.score]],
  * and emits the top `k`. The fold NEVER writes state (a query's
  * answer depends only on its own row and the static index), so
  * at-least-once replay re-emits identical rows — the S18/S21
  * idempotence contract.
  *
  * Exactness: with `nProbe = nCells` the dense candidate set is the
  * whole corpus and the emission is hit-for-hit the batch fusion
  * ranking (StreamingHybridRetrievalSpec pins parity for arbitrary
  * micro-batch splits, plus replay idempotence). With `nProbe <
  * nCells` the dense channel degrades to standard IVF recall — the
  * production setting at 100 TB, where per-batch cost is
  * candidates-in-probed-cells, never corpus × batch; the batch
  * side's cell-bound pruning ([[AnnSearch.exactCosineTopK]]) is the
  * drop-in when exact ingest ranking is required at scale.
  */
object StreamingHybridRetrieval {

  /** Static hybrid index: one BM25 inverted index + one IVF dense
    * index over the same corpus. */
  case class Index(bm25: Bm25.Index, centroids: Array[(Int, Seq[Float])],
                   assigned: org.apache.spark.sql.DataFrame)

  def buildIndex(docs: org.apache.spark.sql.DataFrame,
                 embeddings: org.apache.spark.sql.DataFrame,
                 nCentroids: Int = 8, kmeansIters: Int = 0): Index = {
    val centroids = AnnSearch.trainQuantizer(
      embeddings, nCentroids, kmeansIters)
    Index(Bm25.buildIndex(docs), centroids,
      AnnSearch.assignCells(embeddings, centroids)
        .select(col("vec_id").as("b_id"), col("embedding").as("vb"),
          col("cell")))
  }

  /** Enrich the stream: one output row per query per micro-batch it
    * arrives in, hits in fused (rrf DESC, doc_id ASC) order. Run
    * with OutputMode.Update. */
  def enrich(stream: Dataset[HybridQuery], index: Index,
             k: Int = 10, depth: Int = 50, nProbe: Int = 8)
      : Dataset[HybridEnriched] = {
    import stream.sparkSession.implicits._
    val df = stream.toDF()
    // sparse channel: S21's exact contribution pipeline — integer
    // micro-units of the shared 1e-6-grid BM25 contribution
    val qterms = df.select(col("query_id"),
      explode(array_distinct(split(col("text"), " "))).as("term"))
    val sparse = index.bm25.postings
      .join(qterms, "term")
      .join(broadcast(index.bm25.idf), "term")
      .crossJoin(broadcast(index.bm25.stats))
      .select(col("query_id"), col("doc_id"), lit("b").as("src"),
        round(Bm25.contrib6 * lit(1000000.0), 0).cast("long").as("v"))
    // dense channel: probe the IVF cells, equi-join the cell-assigned
    // corpus, 6-decimal cosine as exact micro-units (self-pairs kept:
    // the batch fusion ranks the query document too)
    val probed = AnnSearch.probeCells(
      df.select(col("query_id").as("vec_id"), col("embedding")),
      index.centroids, nProbe)
    val dense = probed
      .join(index.assigned, Seq("cell"))
      .select(col("a_id").as("query_id"), col("b_id").as("doc_id"),
        lit("c").as("src"),
        round(round(VectorFns.cosine(col("va"), col("vb")), 6)
          * lit(1000000.0), 0).cast("long").as("v"))
    sparse.unionByName(dense)
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      // state type is a dummy Long, NEVER written — see scaladoc
      .flatMapGroupsWithState[Long, HybridEnriched](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Long, String, Long)],
         _: GroupState[Long]) =>
          val bm = new scala.collection.mutable.LongMap[Long]()
          val cm = new scala.collection.mutable.LongMap[Long]()
          rows.foreach {
            case (_, d, "b", m) => bm.update(d, bm.getOrElse(d, 0L) + m)
            case (_, d, _, m) => cm.update(d, m)
          }
          def ranks(m: scala.collection.mutable.LongMap[Long])
              : Map[Long, Int] =
            m.toArray.sortBy { case (d, v) => (-v, d) }.take(depth)
              .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
          val (rb, rc) = (ranks(bm), ranks(cm))
          val hits = (rb.keySet ++ rc.keySet).toArray
            .map(d => (d, rb.get(d), rc.get(d),
              Rrf.score(rb.get(d), rc.get(d))))
            .sortBy { case (d, _, _, s) => (-s, d) }
            .take(k).zipWithIndex
            .map { case ((d, b, c, s), i) => HybridHit(d, b, c, s, i + 1) }
          Iterator.single(HybridEnriched(id, hits.toSeq))
      }
  }
}
