package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

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
    * the original and reconstructed vectors. */
  def quantized(embeddings: DataFrame): DataFrame = {
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val scaled = embeddings
      .withColumn("scale", i8Scale(col("embedding")))
      .withColumn("q", quantizeI8(col("embedding"), col("scale")))
      .withColumn("deq", dequantizeI8(col("q"), col("scale")))
    scaled.select(col("vec_id"), col("scale"), col("q"),
      aggregate(
        zip_with(col("embedding"), col("deq"),
          (a, b) => abs(a.cast("double") - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("max_abs_err"),
      (dotD(col("embedding"), col("deq")) /
        (sqrt(VectorFns.dot(col("embedding"), col("embedding"))) *
         sqrt(dotD(col("deq"), col("deq"))))).as("cos_recon"))
  }
}
