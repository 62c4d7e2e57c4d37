package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage/compression ops for training-data pipelines:
  * symmetric int8 quantization (4× smaller than float32, the standard
  * storage trade for ANN corpora) and its dequantize/verify path.
  *
  * Pure per-row projections of built-in functions — quantization adds
  * zero shuffles to whatever pipeline it's composed into, and the
  * scale factor rides along as a column so dequantization is
  * self-contained.
  */
object EmbeddingOps {
  /** Per-vector symmetric scale: max|xᵢ| / 127 (0-safe). */
  def i8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x))), lit(1e-12f))
      .cast("double") / 127.0

  /** Quantize to int8 range [-127, 127] with round-half-up — stored
    * as TINYINT so the 4× storage shrink over float32 is real, not
    * just numeric. */
  def quantizeI8(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") / scale, 0).cast("tinyint"))

  /** Dequantize back to doubles. */
  def dequantizeI8(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** (vec_id, scale, q) frame plus reconstruction diagnostics:
    * max absolute error (bounded by scale/2) and the cosine between
    * the original and reconstructed vectors.
    *
    * One codegen'd pass per row ([[graft.functions.QuantizeReconFD]])
    * — bit-identical to the `aggregate(zip_with(...))` HOF
    * formulation it replaced, which evaluated interpreted and was the
    * r4 bench hot spot (4.8 s driver / 0.74 s local at sf0.1). */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"),
        graft.functions.HashExpressions.quantizeRecon(col("embedding"))
          .as("d"))
      .select(col("vec_id"), col("d.scale").as("scale"),
        col("d.q").as("q"), col("d.max_abs_err").as("max_abs_err"),
        col("d.cos_recon").as("cos_recon"))
}
