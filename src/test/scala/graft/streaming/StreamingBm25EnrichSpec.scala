package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Bm25
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** S21: streaming BM25 retrieval against the static inverted index.
  * Stateless across batches, so stream/batch parity is EXACT for any
  * micro-batch split: every streamed query's emitted top-k equals
  * the batch [[Bm25.score]] ranking hit-for-hit, score-for-score
  * (shared contribution expression + shared 1e-6 grid).
  */
class StreamingBm25EnrichSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val k = 5

  private def docs = Tables.documents(spark, dir).select("doc_id", "text")

  private def queryRows: Seq[TextQuery] =
    docs.filter(col("doc_id") < 20)
      .collect().map(r => TextQuery(r.getLong(0), r.getString(1))).toSeq

  /** (query_id, doc_id, score, rank) from the batch reference. */
  private def batchRef(index: Bm25.Index): Set[(Long, Long, Double, Int)] = {
    val qterms = index.postings.filter(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"), col("term"))
    Bm25.score(qterms, index).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy { case (_, d, s) => (-s, d) }.take(k).zipWithIndex
          .map { case ((_, d, s), i) => (q, d, s, i + 1) }
      }.toSet
  }

  private def streamAll(index: Bm25.Index, chunks: Int)
      : Set[(Long, Long, Double, Int)] = {
    val rows = queryRows
    val parts = rows.grouped((rows.length + chunks - 1) / chunks).toSeq
    val ms = MemoryStream[TextQuery](spark)
    val name = s"s21_parity_$chunks"
    val q = StreamingBm25Enrich.enrich(ms.toDS(), index, k)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      parts.foreach { p => ms.addData(p); q.processAllAvailable() }
      spark.table(name).collect().flatMap { r =>
        val qid = r.getLong(0)
        r.getSeq[Row](2).zipWithIndex.map { case (h, i) =>
          (qid, h.getLong(0), h.getDouble(1), i + 1)
        }
      }.toSet
    } finally q.stop()
  }

  test("streamed top-k equals batch Bm25.score hit-for-hit, for " +
      "different micro-batch splits") {
    val index = Bm25.buildIndex(docs)
    val ref = batchRef(index)
    assert(ref.nonEmpty)
    assert(streamAll(index, chunks = 1) == ref)
    assert(streamAll(index, chunks = 3) == ref)
  }

  test("at-least-once replay is idempotent: a re-arriving query " +
      "re-emits the same enrichment") {
    val index = Bm25.buildIndex(docs)
    val rows = queryRows.take(4)
    val ms = MemoryStream[TextQuery](spark)
    val q = StreamingBm25Enrich.enrich(ms.toDS(), index, k)
      .writeStream.format("memory").queryName("s21_replay")
      .outputMode("update").start()
    try {
      ms.addData(rows); q.processAllAvailable()
      ms.addData(rows); q.processAllAvailable() // duplicate delivery
      val out = spark.table("s21_replay").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Row](2).map(h => (h.getLong(0), h.getDouble(1)))))
      // two emissions per query, identical content
      assert(out.length == rows.length * 2)
      assert(out.toSet.size == rows.length,
        "replayed emissions must be identical to the originals")
    } finally q.stop()
  }
}
