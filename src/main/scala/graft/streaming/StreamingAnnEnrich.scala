package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorFns}
import graft.operators.AnnSearch

/** One incoming embedding row to enrich. */
case class EmbQuery(vec_id: Long, embedding: Seq[Float])

/** Streaming ANN enrichment (S18) — online retrieval at ingest:
  * each arriving embedding row is enriched with its approximate
  * nearest corpus neighbors within its micro-batch. The IVF index is
  * built ONCE in batch ([[AnnSearch.trainQuantizer]] +
  * [[AnnSearch.assignCells]]) and joined STREAM-STATIC: probe-cell
  * derivation is a per-row projection against the broadcast
  * centroids, the candidate match is an equi-join on cell id, and
  * the per-query top-k is the bounded [[TopKAgg]] aggregate (k rows
  * of state per query, map-side partial — the S11 streaming shape),
  * so per-batch cost is candidates-in-probed-cells, never
  * corpus × batch.
  *
  * Because the operator is stateless across batches (every query row
  * arrives once; the aggregate completes within its batch), the
  * emitted top-k per query is EXACTLY the batch [[AnnSearch.ivfTopK]]
  * result for the same index parameters — for any micro-batch split.
  * StreamingAnnEnrichSpec asserts that parity, neighbor-for-neighbor.
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

  /** Enrich the stream: one output row per query —
    * (vec_id, n_candidates, nn: array<struct<b_id, cos_sim>> in
    * (cos_sim DESC, b_id ASC) order, ≤ k entries). Run with
    * OutputMode.Update. */
  def enrich(stream: Dataset[EmbQuery], index: Index, k: Int = 5,
             nProbe: Int = 2): DataFrame = {
    val probed = AnnSearch.probeCells(
      stream.toDF("vec_id", "embedding"), index.centroids, nProbe)
    probed
      .join(index.assigned, Seq("cell")) // stream-static equi-join
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("cos_sim",
        round(VectorFns.cosine(col("va"), col("vb")), 6))
      .groupBy(col("a_id").as("vec_id"))
      .agg(count(lit(1)).as("n_candidates"),
        TopKAgg.topK(
          struct(col("b_id"), col("cos_sim")),
          col("cos_sim"), col("b_id"), k).as("nn"))
  }
}
