package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.ImportanceResampling

/** One arriving document to score. */
case class DocArrival(doc_id: Long, text: String)

/** Streaming DSIR admission (S20) — data selection at ingest: every
  * arriving document is scored against a batch-trained DSIR bucket
  * model ([[ImportanceResampling.bucketModel]]) and admitted iff its
  * importance score clears a threshold — the "keep only target-like
  * web text" gate running where it's cheapest, BEFORE the document is
  * ever stored, embedded, or deduped.
  *
  * COMPLETELY stateless — stronger than S18's never-written state:
  * the model is ≤B (bkt → lr_micro) cells collected once (the
  * ANN-codebook bounded-collect contract) and embedded as a LITERAL
  * array, so scoring is a pure per-row projection — `transform` the
  * token array through the portable md5 bucket, `element_at` the
  * literal, `aggregate` the exact BIGINT sum. No state store, no
  * shuffle, no stream-static join, not even a groupBy: each
  * micro-batch plans as one WholeStageCodegen map over the source.
  * That is the maximal-throughput shape for an ingest filter at
  * 100 TB/day — and at-least-once replay is trivially idempotent
  * (same row → same score → same verdict).
  *
  * A document's score here is EXACTLY the batch
  * [[ImportanceResampling.dsirScores]] value for the same corpora
  * and bucket count — for any micro-batch split — because the
  * full-domain model makes every token's lookup total (tokens unseen
  * at train time smooth to the ct=cr=0 cell instead of vanishing).
  * StreamingDsirAdmissionSpec pins that parity and the replay
  * idempotence.
  */
object StreamingDsirAdmission {

  /** The trained model as a dense lookup: index = bucket,
    * value = lr_micro. Always exactly `buckets` entries — the
    * bounded collect is the model's size contract, same as the
    * ANN centroid codebooks. */
  def trainDense(target: DataFrame, pool: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): Array[Long] = {
    val dense = new Array[Long](buckets)
    ImportanceResampling.bucketModel(target, pool, idCol, textCol,
        buckets)
      .collect()
      .foreach(r => dense(r.getLong(0).toInt) = r.getLong(1))
    dense
  }

  /** The per-row score column: exact BIGINT sum of the literal
    * model's cells over the text's md5 token buckets. */
  def scoreCol(text: Column, model: Array[Long]): Column = {
    val buckets = model.length
    val arr = typedLit(model.toSeq)
    aggregate(
      transform(split(text, " "), w =>
        element_at(arr,
          (graft.functions.HashExpressions.md5Long(w, 8)
            % buckets).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Score + admit the stream: one output row per arriving doc —
    * (doc_id, n_toks, score, admitted). Append-mode safe (stateless,
    * no watermark needed). */
  def admit(stream: Dataset[DocArrival], model: Array[Long],
      thresholdMicro: Long): DataFrame =
    stream.toDF("doc_id", "text")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"),
        scoreCol(col("text"), model).as("score"))
      .withColumn("admitted", col("score") >= thresholdMicro)
}
