package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.QualityRules

/** Streaming quality-gate admission (S22) — the Gopher-rule screen
  * running at ingest, where rejecting a document is cheapest: before
  * it is stored, embedded, tokenized, or deduped. Completes the
  * ingest-admission trio: S20 selects by DISTRIBUTION (DSIR
  * target-likeness), S10 by BUDGET, this by intrinsic QUALITY.
  *
  * COMPLETELY stateless, like S20: the rule core
  * ([[graft.operators.QualityRules]] — the identical expression tree
  * the batch `q_quality_gopher` key runs) is a pure per-row
  * projection over exact ints, so each micro-batch plans as one
  * WholeStageCodegen map over the source. No state store, no
  * shuffle, no stream-static join. At-least-once replay is trivially
  * idempotent (same row → same signals → same verdict), and
  * stream/batch verdict parity is EXACT for any micro-batch split —
  * StreamingQualityGateSpec pins both against the registry key's
  * output.
  *
  * At 100 TB/day this is the first operator in the ingest chain; its
  * throughput ceiling is the source's scan rate because the
  * projection fuses into the scan stage.
  */
object StreamingQualityGate {

  /** Gate an arriving document stream: emits (doc_id, n_words,
    * mean_word_len, n_stop, verdict, keep) per arrival — signals kept
    * alongside the verdict so the downstream sink can audit WHY a
    * document was dropped (the q_curation_provenance discipline). */
  def gate(arrivals: Dataset[DocArrival]): DataFrame =
    arrivals
      .withColumn("n_words", QualityRules.nWords(col("text")))
      .withColumn("mean_word_len", QualityRules.meanWordLen(col("text")))
      .withColumn("n_stop", QualityRules.nStop(col("text")))
      .withColumn("verdict",
        QualityRules.verdict(col("n_words"), col("mean_word_len"),
          col("n_stop")))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("n_stop"), col("verdict"),
        (col("verdict") === "keep").as("keep"))
}
