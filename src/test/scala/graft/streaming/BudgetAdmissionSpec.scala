package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Sampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S15: streaming token-budget admission. Parity discipline: when the
  * stream delivers documents in the batch operator's md5 admit order,
  * the streaming gate admits EXACTLY the batch operator's admitted
  * set with identical running totals — stated precisely, the stream
  * generalizes the batch semantics from "md5 order over the complete
  * corpus" to "arrival order", and the two coincide on an md5-ordered
  * arrival. Within-batch row order never matters (the handler sorts
  * by the same key), only the cross-batch split does. */
class BudgetAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def perDoc = Tables.documents(spark, sf)
    .select(col("doc_id"), col("lang").as("group"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

  private def budgets: Map[String, Long] = perDoc
    .groupBy("group").agg(expr("sum(n_tokens) div 2").as("b"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("md5-ordered arrival reproduces the batch operator exactly") {
    val budgetDf = perDoc.groupBy("group")
      .agg(expr("sum(n_tokens) div 2").as("token_budget"))
    val batchAdmitted = Sampling.admitByTokenBudget(
        perDoc.withColumnRenamed("n_tokens", "toks"), "doc_id",
        Seq("group"), col("toks"), budgetDf)
      .select("doc_id", "group", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet

    // stream the corpus in admit order, split across 3 micro-batches,
    // rows SHUFFLED within each batch (handler re-sorts)
    val ordered = perDoc.as[AdmitDoc].collect()
      .sortBy(d => (BudgetAdmission.admitKey(d.doc_id), d.doc_id))
    val chunks = ordered.grouped((ordered.length + 2) / 3).toSeq
    val ms = MemoryStream[AdmitDoc](spark)
    val q = BudgetAdmission.admit(ms.toDS(), budgets)
      .writeStream.format("memory").queryName("s15_parity")
      .outputMode("append").start()
    try {
      chunks.foreach { c =>
        ms.addData(scala.util.Random.shuffle(c.toSeq))
        q.processAllAvailable()
      }
      val streamed = spark.table("s15_parity").as[AdmittedDoc].collect()
        .map(a => (a.doc_id, a.group, a.n_tokens, a.cum_tokens)).toSet
      assert(streamed == batchAdmitted)
    } finally q.stop()
  }

  test("a group past budget admits nothing more; unbudgeted groups " +
    "admit nothing at all") {
    val ms = MemoryStream[AdmitDoc](spark)
    val q = BudgetAdmission.admit(ms.toDS(), Map("en" -> 10L))
      .writeStream.format("memory").queryName("s15_gate")
      .outputMode("append").start()
    try {
      ms.addData(AdmitDoc(1, "en", 6), AdmitDoc(2, "en", 6),
        AdmitDoc(3, "zz", 5))
      q.processAllAvailable()
      // both en docs admitted (second crosses the budget), zz dropped
      val first = spark.table("s15_gate").as[AdmittedDoc].collect()
      assert(first.map(_.doc_id).toSet == Set(1L, 2L))
      assert(first.map(_.cum_tokens).max == 12L)
      // gate now closed: later arrivals admit nothing
      ms.addData(AdmitDoc(4, "en", 1))
      q.processAllAvailable()
      assert(spark.table("s15_gate").count() == 2)
    } finally q.stop()
  }
}
