package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EmbeddingOpsSpec extends SparkSpec {

  test("int8 quantization: values bounded, reconstruction within scale/2") {
    val q = EmbeddingOps.quantized(
      Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val rows = q.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val codes = r.getSeq[Byte](r.fieldIndex("q"))
      assert(codes.forall(c => c >= -127 && c <= 127),
        s"vec ${r.getLong(0)} codes out of range")
      assert(r.getAs[Double]("cos_recon") > 0.999)
      // symmetric round-to-nearest ⇒ error ≤ scale/2 (+ float eps)
      assert(r.getAs[Double]("max_abs_err") <= scale / 2 + 1e-9,
        s"vec ${r.getLong(0)} error ${r.getAs[Double]("max_abs_err")} > ${scale / 2}")
    }
  }

  test("dequantized vectors keep cosine ~1 with originals") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("scale", EmbeddingOps.i8Scale(col("embedding")))
      .withColumn("deq", EmbeddingOps.dequantizeI8(
        EmbeddingOps.quantizeI8(col("embedding"), col("scale")),
        col("scale")))
    val cos = e.select(
      (aggregate(zip_with(col("embedding"), col("deq"),
        (a, b) => a.cast("double") * b), lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate(transform(col("embedding"),
          a => a.cast("double") * a.cast("double")), lit(0.0),
          (acc, x) => acc + x)) *
         sqrt(aggregate(transform(col("deq"), b => b * b), lit(0.0),
           (acc, x) => acc + x)))).as("cos"))
      .agg(min("cos")).head().getDouble(0)
    assert(cos > 0.999, f"worst-case cosine after int8 roundtrip: $cos%.6f")
  }
}
