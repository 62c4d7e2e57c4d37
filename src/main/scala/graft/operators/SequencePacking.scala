package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard pretraining
  * batching shape: documents are concatenated in a stable order and
  * the token stream is cut into fixed-`budget` context windows; each
  * document is assigned to the window its first token falls in.
  *
  * Window id is a pure function of the running token count
  * (`floor(tokens_before_doc / budget)`), so the whole operator is
  * one partitioned prefix-sum window — no sequential driver loop, no
  * state. That is what makes it a 100 TB operator: each shard (e.g. a
  * language or a source split) packs independently under one
  * hash-shuffle + sort, exactly like any partitioned window; a global
  * pack order would serialize and is deliberately not offered.
  */
object SequencePacking {
  /** Assign each doc a (shard-local) context-window id.
    *
    * @param docs   must contain `shard`, `ord` (stable in-shard
    *               order), and `tokens` (per-doc token count)
    * @param budget window size in tokens
    */
  def packWindows(docs: DataFrame, shard: String, ord: String,
                  tokens: String, budget: Int): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(shard).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(tokens)).over(w))
      .withColumn("window_id",
        floor((col("__cum") - col(tokens)) / budget).cast("int"))
      .withColumn("offset_in_window",
        ((col("__cum") - col(tokens)) % budget).cast("int"))
      .drop("__cum")
  }
}
