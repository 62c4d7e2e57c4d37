package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.ImportanceResampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** S20: streaming DSIR admission against the batch-trained bucket
  * model. Stateless (literal-array model, pure projection), so
  * stream/batch score parity is EXACT for any micro-batch split.
  */
class StreamingDsirAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private val B = 1024

  private def docs = Tables.documents(spark, dir)
  private def target = docs.filter(col("source") === "src0")
    .select("doc_id", "text")
  private def pool = docs.filter(col("source") =!= "src0")
    .select("doc_id", "text")

  private def batchRef: Map[Long, (Long, Long)] =
    ImportanceResampling.dsirScores(target, pool, "doc_id", "text", B)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def streamAll(chunks: Int, threshold: Long,
      replayFirst: Boolean = false): Seq[(Long, Long, Long, Boolean)] = {
    val model = StreamingDsirAdmission.trainDense(
      target, pool, "doc_id", "text", B)
    assert(model.length == B)
    val rows = pool.as[DocArrival].collect().toSeq
    val parts = rows.grouped((rows.length + chunks - 1) / chunks).toSeq
    val ms = MemoryStream[DocArrival](spark)
    val name = s"s20_parity_${chunks}_$replayFirst"
    val q = StreamingDsirAdmission.admit(ms.toDS(), model, threshold)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      parts.foreach { p => ms.addData(p); q.processAllAvailable() }
      if (replayFirst) { // at-least-once delivery of the first chunk
        ms.addData(parts.head); q.processAllAvailable()
      }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSeq
    } finally q.stop()
  }

  test("streamed scores equal batch dsirScores doc-for-doc, for " +
      "different micro-batch splits; admission = threshold on the " +
      "same score") {
    val ref = batchRef
    assert(ref.nonEmpty)
    val threshold = 0L
    for (chunks <- Seq(1, 4)) {
      val got = streamAll(chunks, threshold)
      assert(got.map(_._1).toSet == ref.keySet)
      got.foreach { case (id, nToks, score, admitted) =>
        assert((nToks, score) == ref(id), s"doc $id")
        assert(admitted == (score >= threshold), s"doc $id")
      }
    }
  }

  test("at-least-once replay is idempotent: a re-arriving doc " +
      "re-emits the identical row") {
    val got = streamAll(chunks = 3, threshold = 0L, replayFirst = true)
    val byDoc = got.groupBy(_._1)
    // every doc's emissions are identical rows (replayed docs emit
    // the same verdict, never a merged/accumulated one)
    byDoc.foreach { case (id, rows) =>
      assert(rows.distinct.size == 1, s"doc $id emitted $rows") }
    assert(got.size > byDoc.size, "replay must re-emit")
  }

  test("tokens unseen at train time score via the smoothed ct=cr=0 " +
      "cell — the lookup is total, no nulls, no drops") {
    val model = StreamingDsirAdmission.trainDense(
      target, pool, "doc_id", "text", B)
    val novel = Seq(DocArrival(9001L,
      "qqqxyzzy9871 zzzplugh1234 wibble8soup")).toDS()
    val ms = MemoryStream[DocArrival](spark)
    val q = StreamingDsirAdmission.admit(ms.toDS(), model, 0L)
      .writeStream.format("memory").queryName("s20_novel")
      .outputMode("append").start()
    try {
      ms.addData(novel.collect().toSeq); q.processAllAvailable()
      val r = spark.table("s20_novel").collect()
      assert(r.length == 1)
      assert(r(0).getLong(1) == 3L) // n_toks
      assert(!r(0).isNullAt(2))    // score defined for novel tokens
    } finally q.stop()
  }
}
