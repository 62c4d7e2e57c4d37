package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S22: streaming Gopher-rule admission. Stateless (shared
  * [[graft.operators.QualityRules]] expression tree, pure
  * projection), so stream/batch verdict parity is EXACT for any
  * micro-batch split, and at-least-once replay is idempotent.
  */
class StreamingQualityGateSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  /** The registry key's output as the reference:
    * doc_id → (n_words, mean_word_len, n_stop, verdict). */
  private def batchRef: Map[Long, (Int, Double, Int, String)] =
    SparkEntry.queries("q_quality_gopher")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getInt(3), r.getString(4)))
      .toMap

  private def streamAll(chunks: Int, replayFirst: Boolean = false)
      : Seq[(Long, Int, Double, Int, String, Boolean)] = {
    val rows = Tables.documents(spark, dir)
      .select("doc_id", "text").as[DocArrival].collect().toSeq
    val parts = rows.grouped((rows.length + chunks - 1) / chunks).toSeq
    val ms = MemoryStream[DocArrival](spark)
    val name = s"s22_parity_${chunks}_$replayFirst"
    val q = StreamingQualityGate.gate(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      parts.foreach { p => ms.addData(p); q.processAllAvailable() }
      if (replayFirst) { ms.addData(parts.head); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
          r.getInt(3), r.getString(4), r.getBoolean(5))).toSeq
    } finally q.stop()
  }

  test("streamed verdicts equal the batch registry key doc-for-doc, " +
      "for different micro-batch splits") {
    val ref = batchRef
    assert(ref.nonEmpty)
    for (chunks <- Seq(1, 4)) {
      val got = streamAll(chunks)
      assert(got.map(_._1).toSet == ref.keySet)
      got.foreach { case (id, nw, mwl, ns, verdict, keep) =>
        assert((nw, mwl, ns, verdict) == ref(id), s"doc $id")
        assert(keep == (verdict == "keep"), s"doc $id")
      }
      // the gate discriminates (not one constant verdict)
      assert(got.map(_._5).distinct.length >= 2)
    }
  }

  test("at-least-once replay is idempotent: a re-arriving doc " +
      "re-emits the identical row") {
    val got = streamAll(chunks = 3, replayFirst = true)
    val ref = batchRef
    // every emitted row (including the replayed duplicates) matches
    // the batch reference — replay adds rows, never contradicts
    got.foreach { case (id, nw, mwl, ns, verdict, _) =>
      assert((nw, mwl, ns, verdict) == ref(id), s"doc $id")
    }
    val dupIds = got.groupBy(_._1).filter(_._2.length > 1)
    assert(dupIds.nonEmpty, "replayed chunk should re-emit rows")
    dupIds.values.foreach(rows =>
      assert(rows.distinct.length == 1, "replay rows identical"))
  }
}
