package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** S23: streaming hybrid (sparse⊕dense RRF) retrieval. With the
  * dense channel probing every cell, the ingest-time fusion must be
  * hit-for-hit the batch `q_retrieval_fusion` ranking — same shared
  * cores (Bm25.contrib6, the cosine expression, Rrf) — for ANY
  * micro-batch split, and replays must be idempotent. */
class StreamingHybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val nCells = 8

  private def index = StreamingHybridRetrieval.buildIndex(
    Tables.documents(spark, dir).select("doc_id", "text"),
    Tables.embeddings(spark, dir), nCentroids = nCells)

  private def queryRows: Seq[HybridQuery] = {
    val texts = Tables.documents(spark, dir)
      .filter(col("doc_id") < 20).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => HybridQuery(r.getLong(0), texts(r.getLong(0)),
        r.getSeq[Float](1)))
      .toSeq
  }

  /** (query, doc, rb, rc, rrf, rk) from the batch fusion key. */
  private def batchRef: Set[(Long, Long, Option[Int], Option[Int],
      Double, Int)] =
    SparkEntry.queries("q_retrieval_fusion")(spark, dir).collect()
      .map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          r.getDouble(4), r.getInt(5))
      }.toSet

  private def streamAll(chunks: Int, replay: Boolean = false)
      : Seq[(Long, Long, Option[Int], Option[Int], Double, Int)] = {
    val rows = queryRows
    val parts = rows.grouped((rows.length + chunks - 1) / chunks).toSeq
    val ms = MemoryStream[HybridQuery](spark)
    val name = s"s23_parity_${chunks}_$replay"
    // nProbe = nCells: full-coverage dense channel (the exactness
    // setting the parity contract is stated for)
    val q = StreamingHybridRetrieval.enrich(ms.toDS(), index,
      k = 10, depth = 50, nProbe = nCells)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      parts.foreach { p => ms.addData(p); q.processAllAvailable() }
      if (replay) { ms.addData(parts.head); q.processAllAvailable() }
      spark.table(name).collect().flatMap { r =>
        val qid = r.getLong(0)
        r.getSeq[Row](1).map { h =>
          (qid, h.getLong(0),
            if (h.isNullAt(1)) None else Some(h.getInt(1)),
            if (h.isNullAt(2)) None else Some(h.getInt(2)),
            h.getDouble(3), h.getInt(4))
        }
      }.toSeq
    } finally q.stop()
  }

  test("ingest-time fusion equals the batch q_retrieval_fusion " +
      "ranking hit-for-hit for different micro-batch splits") {
    val ref = batchRef
    for (chunks <- Seq(1, 3, 20)) {
      val got = streamAll(chunks)
      assert(got.size == got.toSet.size, s"duplicate emissions at $chunks")
      assert(got.toSet == ref,
        s"chunks=$chunks: stream-only=${got.toSet -- ref}, " +
          s"batch-only=${ref -- got.toSet}")
    }
  }

  test("at-least-once replay is idempotent: a re-arriving query " +
      "re-emits exactly its original ranking") {
    val ref = batchRef
    val got = streamAll(3, replay = true)
    // replayed queries emit twice; every emission must equal the ref
    assert(got.toSet == ref,
      s"replay changed emissions: extra=${got.toSet -- ref}")
    assert(got.size > ref.size, "replay should re-emit rows")
  }
}
