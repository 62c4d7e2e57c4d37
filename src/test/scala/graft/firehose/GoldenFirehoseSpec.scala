package graft.firehose

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.queries.PipelineQueries

/** Pins the three Firehose query keys against the committed golden
  * CSVs produced by the INDEPENDENT stdlib-Python decoder
  * (`tools/firehose_oracle.py` — gzip-until-plain loop + DATA_MESSAGE
  * byte scan + json parse, no shared code with [[FirehoseDecoder]]).
  * The driver's DuckDB oracle reads the same files, so this spec
  * catches golden drift before the round gate does. Regenerate with
  * `python3 tools/firehose_oracle.py` only when the fixture itself
  * changes deliberately.
  */
class GoldenFirehoseSpec extends SparkSpec {

  private def golden(name: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      // RFC 4180 double-double-quote escaping (Python csv's default;
      // the payload column embeds JSON quotes)
      .option("quote", "\"").option("escape", "\"")
      .schema(schema)
      .csv(s"tools/golden/$name.csv")

  private def rowsOf(df: DataFrame, sortCols: String*): Seq[String] =
    df.orderBy(sortCols.head, sortCols.tail: _*)
      .collect().map(_.mkString("|")).toSeq

  private def assertMatches(actual: DataFrame, expected: DataFrame,
                            sortCols: String*): Unit = {
    assert(actual.columns.sorted.toSeq === expected.columns.sorted.toSeq)
    val cols = actual.columns.sorted.toSeq
    assert(
      rowsOf(actual.selectExpr(cols: _*), sortCols: _*) ===
        rowsOf(expected.selectExpr(cols: _*), sortCols: _*))
  }

  test("q_firehose_pipeline matches the independent decoder's golden rows") {
    val schema = StructType(Seq(
      StructField("timestamp", LongType),
      StructField("logGroup", StringType),
      StructField("logStream", StringType),
      StructField("logStreamPrefix", StringType),
      StructField("file", StringType),
      StructField("id", StringType),
      StructField("message", StringType),
      StructField("block_idx", IntegerType),
      StructField("event_idx", IntegerType),
      StructField("batch_id", IntegerType)))
    assertMatches(PipelineQueries.firehosePipeline(spark),
      golden("firehose_pipeline", schema),
      "file", "block_idx", "event_idx")
  }

  test("q_firehose_payloads matches the independent decoder's golden rows") {
    val schema = StructType(Seq(
      StructField("file", StringType),
      StructField("block_idx", IntegerType),
      StructField("batch_id", IntegerType),
      StructField("payload", StringType),
      StructField("n_events", IntegerType)))
    assertMatches(PipelineQueries.firehosePayloads(spark, batchSize = 3),
      golden("firehose_payloads", schema),
      "file", "block_idx", "batch_id")
  }

  test("q_firehose_throughput matches the independent decoder's golden rows") {
    val schema = StructType(Seq(
      StructField("file", StringType),
      StructField("n_events", LongType),
      StructField("min_ts", LongType),
      StructField("max_ts", LongType)))
    assertMatches(PipelineQueries.firehoseThroughput(spark),
      golden("firehose_throughput", schema),
      "file")
  }
}
