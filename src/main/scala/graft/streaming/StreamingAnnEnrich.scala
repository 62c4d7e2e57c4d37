package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.functions.VectorFns
import graft.operators.AnnSearch

/** One incoming embedding row to enrich. */
case class EmbQuery(vec_id: Long, embedding: Seq[Float])

/** One approximate neighbor of a streamed query. */
case class AnnNeighbor(b_id: Long, cos_sim: Double)

/** Per-query enrichment emission. */
case class AnnEnriched(vec_id: Long, n_candidates: Long,
                       nn: Seq[AnnNeighbor])

/** Streaming ANN enrichment (S18) — online retrieval at ingest:
  * each arriving embedding row is enriched with its approximate
  * nearest corpus neighbors within its micro-batch. The IVF index is
  * built ONCE in batch ([[AnnSearch.trainQuantizer]] +
  * [[AnnSearch.assignCells]]) and joined STREAM-STATIC: probe-cell
  * derivation is a per-row projection against the broadcast
  * centroids, the candidate match is an equi-join on cell id, and
  * the per-query top-k is a bounded heap fold over that query's
  * candidates inside its micro-batch — so per-batch cost is
  * candidates-in-probed-cells, never corpus × batch.
  *
  * TRULY stateless across batches: the group fold runs through
  * `flatMapGroupsWithState` but NEVER writes state (nothing persists
  * to the state store, nothing grows with stream lifetime), because
  * a query's answer depends only on its own row and the static
  * index. That also makes at-least-once replay idempotent — a
  * vec_id re-arriving in a later micro-batch re-emits the SAME
  * enrichment instead of merging into (and corrupting) a retained
  * aggregate, which is exactly the failure mode a watermark-less
  * streaming groupBy-agg would have here.
  *
  * The emitted top-k per query is EXACTLY the batch
  * [[AnnSearch.ivfTopK]] result for the same index parameters — for
  * any micro-batch split. StreamingAnnEnrichSpec asserts that
  * parity, neighbor-for-neighbor, plus replay idempotence.
  *
  * This is the ingest-time twin of `q_ann_filtered`'s query-time
  * shape: dedup-at-ingest (flag near-identical arrivals), retrieval
  * indexing, and embedding-drift monitoring all reduce to it.
  */
object StreamingAnnEnrich {

  /** The static index: broadcast-size centroid list + cell-assigned
    * corpus (vec_id, embedding, cell). */
  case class Index(centroids: Array[(Int, Seq[Float])],
                   assigned: DataFrame)

  def buildIndex(corpus: DataFrame, nCentroids: Int = 8,
                 kmeansIters: Int = 0): Index = {
    val centroids = AnnSearch.trainQuantizer(corpus, nCentroids, kmeansIters)
    Index(centroids, AnnSearch.assignCells(corpus, centroids)
      .select(col("vec_id").as("b_id"), col("embedding").as("vb"),
        col("cell")))
  }

  /** Enrich the stream: one output row per query per micro-batch it
    * arrives in — (vec_id, n_candidates, nn ≤ k entries in
    * (cos_sim DESC, b_id ASC) order). Run with OutputMode.Update. */
  def enrich(stream: Dataset[EmbQuery], index: Index, k: Int = 5,
             nProbe: Int = 2): Dataset[AnnEnriched] = {
    import stream.sparkSession.implicits._
    val probed = AnnSearch.probeCells(
      stream.toDF("vec_id", "embedding"), index.centroids, nProbe)
    probed
      .join(index.assigned, Seq("cell")) // stream-static equi-join
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"),
        col("b_id"),
        round(VectorFns.cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      // state type is a dummy Long, NEVER written — see scaladoc
      .flatMapGroupsWithState[Long, AnnEnriched](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Long, Double)],
         _: GroupState[Long]) =>
          val cand = rows.map { case (_, b, s) => (b, s) }.toArray
          val top = cand.sortBy { case (b, s) => (-s, b) }.take(k)
          Iterator.single(AnnEnriched(id, cand.length.toLong,
            top.map { case (b, s) => AnnNeighbor(b, s) }.toSeq))
      }
  }
}
