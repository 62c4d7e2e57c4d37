package graft.multimodal

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins `q_multimodal_pipeline` against the committed golden CSV
  * produced by the INDEPENDENT pure-Python codec suite
  * (`tools/multimodal_oracle.py`: stdlib PNG inflate + filter
  * reconstruction, a hand-written baseline-JPEG decoder running the
  * libjpeg islow IDCT, G.711/IMA-ADPCM decode from the public tables,
  * Y4M and RIFF/AVI demux — no shared code with the Scala codecs),
  * decoding the same persisted corpus bytes. The driver's DuckDB
  * oracle reads the same file; this spec catches drift first.
  * Regenerate with `python3 tools/multimodal_oracle.py` only when the
  * corpus shape changes deliberately.
  */
class GoldenMultimodalSpec extends SparkSpec {

  test("q_multimodal_pipeline matches the independent codec suite's golden rows") {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("dim", IntegerType),
      StructField("f0", DoubleType),
      StructField("n_frames", LongType)))
    val golden = spark.read
      .option("header", "true").schema(schema)
      .csv("tools/golden/multimodal_pipeline.csv")
      .orderBy("media_id").collect()
    val actual = MultimodalOps.pipeline(spark)
      .orderBy("media_id").collect()
    assert(actual.length === golden.length)
    actual.zip(golden).foreach { case (a, g) =>
      assert(a.toSeq === g.toSeq, s"media_id ${g.getLong(0)}")
    }
  }
}
