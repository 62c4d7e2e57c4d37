package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level cross-document deduplication — the C4 / RefinedWeb
  * curation move: a LINE (here, a fixed-width token segment — the
  * segmenter is pluggable; production corpora split on newlines,
  * this synthetic corpus has none) that recurs across ≥ `minDf`
  * distinct documents is boilerplate (navigation chrome, license
  * blurbs, templated headers), and is removed from EVERY document it
  * appears in, after which documents are reassembled in original
  * segment order.
  *
  * Plan shape (scale-first):
  *  1. segmenting is a NARROW per-row op (split + slice in-task);
  *  2. the document-frequency count shuffles 8-byte portable hashes
  *     (`conv(substring(md5(seg),1,15))` — replayable in any engine
  *     with md5), never segment text;
  *  3. the frequent set is BROADCAST back and flagged map-side, so
  *     the corpus is never shuffled by segment key — the same
  *     hot-key discipline as the lm-score head/tail split: a
  *     boilerplate segment is by definition the hottest possible
  *     join key, and an equi-join on it would bottleneck one
  *     reducer. Pigeonhole bounds the broadcast: ≤ total_segments /
  *     minDf rows of 8 bytes, small at any production boilerplate
  *     threshold (minDf in the hundreds); for a low-threshold
  *     near-dedup sweep where that bound is too loose, the tail of
  *     the same frame shuffle-joins by hash exactly as
  *     `q_text_lm_score` does;
  *  4. reassembly groups each document's flagged segments once —
  *     the per-key collect_list holds ONE document's segments, the
  *     same fits-one-task precondition as every chunker/sessionizer
  *     (a document that cannot fit a task cannot be reassembled by
  *     any engine).
  */
object LineDedup {

  /** Portable 60-bit segment key: `('0x' || substring(md5(seg), 1,
    * 15))::BIGINT` in DuckDB terms. */
  def segKey(seg: Column): Column =
    graft.functions.HashExpressions.md5Long(seg, 15)

  /** Non-overlapping `width`-token segments of each document:
    * (doc_id, idx, seg). The trailing segment keeps the remainder. */
  def segments(docs: DataFrame, width: Int): DataFrame = {
    val ws = split(col("text"), " ")
    docs
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0),
          floor((size(col("ws")) + lit(width - 1)) / lit(width))
            .cast("int") - 1),
        k => concat_ws(" ", slice(col("ws"), k * width + 1, lit(width))))))
      .select(col("doc_id"), col("pos").as("idx"), col("col").as("seg"))
  }

  /** Per-document cleanup profile after dropping segments with
    * document frequency ≥ `minDf`: (doc_id, n_segs, n_dropped,
    * clean_hash, clean_len) — the reassembled text travels as its
    * md5 + length, not as a corpus-sized string column. */
  def cleanProfile(docs: DataFrame, width: Int, minDf: Long): DataFrame = {
    val segs = segments(docs, width).withColumn("h", segKey(col("seg")))
    val frequent = segs
      .select(col("h"), col("doc_id"))
      .groupBy("h").agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"), lit(true).as("is_freq"))
    val flagged = segs
      .join(broadcast(frequent), Seq("h"), "left")
      .withColumn("is_freq", coalesce(col("is_freq"), lit(false)))
    val cleanText = array_join(
      transform(
        filter(
          array_sort(collect_list(struct(col("idx"), col("seg"),
            col("is_freq")))),
          x => !x("is_freq")),
        x => x("seg")), " ")
    flagged.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_segs"),
        sum(when(col("is_freq"), 1).otherwise(0)).cast("int")
          .as("n_dropped"),
        cleanText.as("clean_text"))
      .select(col("doc_id"), col("n_segs"), col("n_dropped"),
        md5(col("clean_text").cast("binary")).as("clean_hash"),
        length(col("clean_text")).as("clean_len"))
  }
}
