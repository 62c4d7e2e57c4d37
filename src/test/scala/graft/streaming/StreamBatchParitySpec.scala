package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Unified-engine parity: the SAME StreamingOps code runs in batch
  * and streaming mode and produces identical results — Structured
  * Streaming's core contract (a stream is an incrementalized batch
  * query). This is what lets one operator library serve both the
  * 100 TB backfill and the live pipeline without a rewrite.
  */
class StreamBatchParitySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, 5, 1L, "click"), (2L, 20, 1L, "click"), (3L, 65, 2L, "view"),
    (4L, 70, 2L, "click"), (5L, 100, 3L, "view"), (6L, 130, 1L, "view"),
    (7L, 140, 3L, "purchase"), (8L, 190, 2L, "view"))

  private def withTs(df: DataFrame): DataFrame = df
    .toDF("event_id", "minute", "user_id", "event_type")
    .withColumn("ts", expr(
      "timestampadd(MINUTE, minute, TIMESTAMP'2024-01-01 00:00:00')"))

  private def runStream(f: DataFrame => DataFrame,
                        name: String): Set[Seq[Any]] = {
    val ms = MemoryStream[(Long, Int, Long, String)](spark)
    ms.addData(rows: _*)
    val q = f(withTs(ms.toDF())).writeStream.format("memory")
      .queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    spark.table(name).collect().map(_.toSeq).toSet
  }

  private def runBatch(f: DataFrame => DataFrame,
                       closed: DataFrame => DataFrame): Set[Seq[Any]] =
    closed(f(withTs(rows.toDF()))).collect().map(_.toSeq).toSet

  // The exact unified-engine contract: append-mode streaming output
  // equals the batch result RESTRICTED to windows the final
  // watermark closed (max event time 190min − 10min lateness =
  // 180min); windows still open when the stream ends are the defined
  // difference, not drift. Batch runs the identical operator code —
  // the watermark call is a no-op there.
  private val wmMin = 190 - 10

  test("tumbling window counts: stream == watermark-closed batch") {
    val stream = runStream(StreamingOps.tumblingCounts(_), "par_tumbling")
    val batch = runBatch(StreamingOps.tumblingCounts(_),
      _.filter(expr(s"timestampadd(MINUTE, 60, w_start) <= " +
        s"timestampadd(MINUTE, $wmMin, TIMESTAMP'2024-01-01 00:00:00')")))
    assert(stream == batch && stream.nonEmpty, s"$stream vs $batch")
  }

  test("sliding window counts: stream == watermark-closed batch") {
    val stream = runStream(StreamingOps.slidingCounts(_), "par_sliding")
    val batch = runBatch(StreamingOps.slidingCounts(_),
      _.filter(expr(s"timestampadd(MINUTE, 60, w_start) <= " +
        s"timestampadd(MINUTE, $wmMin, TIMESTAMP'2024-01-01 00:00:00')")))
    assert(stream == batch && stream.nonEmpty, s"$stream vs $batch")
  }

  test("session window counts: stream == watermark-closed batch") {
    val stream = runStream(StreamingOps.sessionCounts(_), "par_session")
    val batch = runBatch(StreamingOps.sessionCounts(_),
      _.filter(expr(s"s_end <= " +
        s"timestampadd(MINUTE, $wmMin, TIMESTAMP'2024-01-01 00:00:00')")))
    assert(stream == batch && stream.nonEmpty, s"$stream vs $batch")
  }
}
