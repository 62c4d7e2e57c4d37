package graft.streaming

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.firehose.FirehoseFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming capability specs S1–S6 (SURVEY.md §2.3): windows,
  * watermark late-drop, dedup, and exactly-once file ingest with
  * checkpoint restart — the upgraded R4/R15 semantics.
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  /** (event_id, minute, user_id, event_type) rows → streaming DF. */
  private def eventStream():
      (MemoryStream[(Int, Int, Int, String)], DataFrame) = {
    val ms = MemoryStream[(Int, Int, Int, String)](spark)
    val df = ms.toDF()
      .toDF("event_id", "minute", "user_id", "event_type")
      .withColumn("event_id", col("event_id").cast("long"))
      .withColumn("user_id", col("user_id").cast("long"))
      .withColumn("ts", expr(
        "timestampadd(MINUTE, minute, TIMESTAMP'2024-01-01 00:00:00')"))
    (ms, df)
  }

  private def runToMemory(df: DataFrame, name: String,
                          mode: String = "update") = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    spark.table(name)
  }

  test("S1 tumbling window counts") {
    val (ms, df) = eventStream()
    ms.addData((1, 5, 1, "click"), (2, 20, 1, "click"), (3, 65, 2, "view"))
    val out = runToMemory(StreamingOps.tumblingCounts(df), "s1")
      .collect().map(r => (r.getAs[Timestamp]("w_start"),
        r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    assert(out == Set((ts(0), "click", 2L), (ts(60), "view", 1L)))
  }

  test("S2 sliding window counts") {
    val (ms, df) = eventStream()
    ms.addData((1, 5, 1, "click"))
    val out = runToMemory(
      StreamingOps.slidingCounts(df, "1 hour", "15 minutes"), "s2")
      .collect().map(r => r.getAs[Timestamp]("w_start")).toSet
    // minute 5 falls in 4 sliding windows: starts at -45, -30, -15, 0
    assert(out == Set(ts(-45), ts(-30), ts(-15), ts(0)))
  }

  test("S3 session windows close after the gap") {
    val (ms, df) = eventStream()
    // user 1: events at 0,10 (one session), then 60 (new session after
    // >30min gap); user 2: single event
    ms.addData((1, 0, 1, "a"), (2, 10, 1, "a"), (3, 60, 1, "a"),
      (4, 0, 2, "b"))
    val out = runToMemory(StreamingOps.sessionCounts(df, "30 minutes"),
      "s3", mode = "complete")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("s_start"), r.getAs[Long]("n"))).toSet
    assert(out == Set((1L, ts(0), 2L), (1L, ts(60), 1L), (2L, ts(0), 1L)))
  }

  test("S4 watermark drops events later than the allowed lateness") {
    val (ms, df) = eventStream()
    val agg = StreamingOps.watermarkedCounts(df, "10 minutes")
    val q = agg.writeStream.format("memory").queryName("s4")
      .outputMode("update").start()
    try {
      ms.addData((1, 120, 1, "a")) // advances watermark to 120-10=110
      q.processAllAvailable()
      ms.addData((2, 5, 1, "a"))   // hour-0 window closed (< watermark) → dropped
      ms.addData((3, 115, 1, "a")) // within lateness → counted
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("s4").groupBy("w_start")
      .agg(max("n").as("n")).collect()
      .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[Long]("n"))).toMap
    assert(out == Map(ts(120) -> 1L, ts(60) -> 1L)) // no hour-0 window row
  }

  test("S5 streaming dedup keeps first occurrence per event_id") {
    val (ms, df) = eventStream()
    ms.addData((1, 0, 1, "a"), (1, 1, 1, "a"), (2, 2, 1, "b"),
      (2, 2, 1, "b"), (3, 3, 2, "c"))
    val out = runToMemory(StreamingOps.dedup(df), "s5", mode = "append")
    assert(out.count() == 3)
    assert(out.select("event_id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 3L)))
  }

  test("S7 stream-stream interval join matches purchases within the window") {
    val cs = MemoryStream[(Int, Int, Int)](spark) // (user, click_id, minute)
    val ps = MemoryStream[(Int, Int, Int)](spark) // (user, purchase_id, minute)
    val clicks = cs.toDF().toDF("user_id", "click_id", "minute")
      .withColumn("ts", expr(
        "timestampadd(MINUTE, minute, TIMESTAMP'2024-01-01 00:00:00')"))
      .drop("minute")
    val purchases = ps.toDF().toDF("p_user_id", "purchase_id", "p_minute")
      .withColumn("p_ts", expr(
        "timestampadd(MINUTE, p_minute, TIMESTAMP'2024-01-01 00:00:00')"))
      .drop("p_minute")
    val q = StreamingOps.intervalJoin(clicks, purchases, 60)
      .select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("s7")
      .outputMode("append").start()
    try {
      ps.addData((1, 100, 0), (1, 101, 30), (2, 200, 10))
      cs.addData((1, 1, 40), (1, 2, 85), (2, 3, 80))
      q.processAllAvailable()
      val got = spark.table("s7").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      // click 1 @40: purchases @0,@30 within trailing 60 min → both
      // click 2 @85: only @30 is within 60 min (@0 is 85 min away)
      // click 3 @80 (user 2): purchase @10 is 70 min away → none
      assert(got == Set((1, 100), (1, 101), (2, 101)))
    } finally q.stop()
  }

  test("S8 streaming batched sink: foreachBatch drives HttpBatchSink") {
    val staging = Files.createTempDirectory("s8_staging").toFile
    FirehoseFixture.writeStandard(staging)
    graft.firehose.PostCollectorS8.queue.clear()
    val q = StreamingOps.ingestStream(spark, staging.getAbsolutePath)
      .withColumn("block_idx", lit(0))
      .withColumn("event_idx", lit(0))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        graft.sinks.HttpBatchSink.write(batch, batchSize = 4) { p =>
          graft.firehose.PostCollectorS8.queue.add(p); true
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    val payloads = graft.firehose.PostCollectorS8.queue.asScala.toSeq
    assert(payloads.map(_.events.size).sum == 14)
    assert(payloads.forall(_.events.size <= 4))
  }

  test("S9 stream-static enrich joins each micro-batch to the dim") {
    val (ms, df) = eventStream()
    ms.addData((1, 5, 1, "click"), (2, 10, 2, "view"), (3, 15, 9, "click"))
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")
    val out = runToMemory(
      StreamingOps.enrichWithStatic(df, dim, Seq("user_id"))
        .select("event_id", "name"), "s9", mode = "append")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // inner join: user 9 has no dim row and drops
    assert(out == Set((1L, "alice"), (2L, "bob")))
  }

  test("S12 streaming dedup screen flags near-dups of the static corpus") {
    val ms = MemoryStream[(Long, String)](spark)
    val stream = ms.toDF().toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"),
      (11L, "an entirely separate reference document about shuffle plans"))
      .toDF("doc_id", "text")
    ms.addData(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "totally novel incoming text with no corpus overlap at all"))
    val out = runToMemory(
      StreamingOps.dedupScreen(stream, corpus, n = 3, threshold = 0.5),
      "s12", mode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 1 is an exact copy of corpus 10 (jaccard 1.0, single row
    // despite sharing every band); doc 2 must not flag.
    assert(out.toSeq == Seq((1L, 10L, 1.0)))
  }

  test("S12 dedup screen with eventTime bounds state via " +
      "dropDuplicatesWithinWatermark and flags the same dups") {
    val ms = MemoryStream[(Long, Int, String)](spark)
    val stream = ms.toDF().toDF("doc_id", "minute", "text")
      .withColumn("ts", expr(
        "timestampadd(MINUTE, minute, TIMESTAMP'2024-01-01 00:00:00')"))
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"),
      (11L, "an entirely separate reference document about shuffle plans"))
      .toDF("doc_id", "text")
    ms.addData(
      (1L, 0, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, 1, "totally novel incoming text with no corpus overlap at all"))
    val screened = StreamingOps.dedupScreen(stream, corpus, n = 3,
      threshold = 0.5, eventTime = Some(("ts", "10 minutes")))
    // the plan must carry the watermark-bounded dedup operator, not
    // the unbounded one
    assert(screened.queryExecution.logical.toString
      .contains("DeduplicateWithinWatermark"),
      "expected a DeduplicateWithinWatermark node in the plan")
    val out = runToMemory(screened, "s12wm", mode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 10L, 1.0)))
  }

  test("S13 idempotent foreachBatch sink: replaying a batch id leaves no dupes") {
    val out = Files.createTempDirectory("graft_s13").toFile.getAbsolutePath
    val writer = StreamingOps.idempotentBatchWriter(out)
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    writer(b0, 0L)
    writer(Seq((3L, "c")).toDF("id", "v"), 1L)
    // crash-replay of batch 0 with the same content: partition
    // overwrite, not append
    writer(b0, 0L)
    val all = spark.read.parquet(out)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(all.sorted.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"replay must not duplicate batch 0: ${all.toSeq}")
  }

  test("S10 left-outer interval join emits unmatched clicks with nulls " +
      "after the watermark passes") {
    val clicks = MemoryStream[(Long, Int)](spark)
    val cdf = clicks.toDF().toDF("user_id", "minute")
      .withColumn("ts", expr(
        "timestampadd(MINUTE, minute, TIMESTAMP'2024-01-01 00:00:00')"))
      .drop("minute")
    val purchases = MemoryStream[(Long, Int)](spark)
    val pdf = purchases.toDF().toDF("p_user_id", "p_minute")
      .withColumn("p_ts", expr(
        "timestampadd(MINUTE, p_minute, TIMESTAMP'2024-01-01 00:00:00')"))
      .drop("p_minute")
    // user 1: click @5 with purchase @2 (matched); user 2: click @6,
    // no purchase. Sentinels far in the future push the watermark past
    // every join window so the unmatched click must emit with nulls.
    clicks.addData((1L, 5), (2L, 6), (99L, 10000))
    purchases.addData((1L, 2), (98L, 10000))
    val out = runToMemory(
      StreamingOps.intervalJoinLeftOuter(cdf, pdf)
        .select(col("user_id"), col("p_user_id")), "s10", mode = "append")
      .filter(col("user_id") < 90)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(out == Set((1L, Some(1L)), (2L, None)))
  }

  test("S11 custom TopKAgg aggregates in streaming update mode") {
    val ms = MemoryStream[(Long, Long, Double)](spark)
    val df = ms.toDF().toDF("key", "tie", "score")
    val agg = df.groupBy("key")
      .agg(graft.functions.TopKAgg.topK(
        struct(col("tie"), col("score")), col("score"), col("tie"), 2)
        .as("top"))
    ms.addData((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 7.0),
      (2L, 20L, 1.0))
    val out1 = runToMemory(agg, "s11a")
      .collect().map { r =>
        r.getAs[Long]("key") ->
          r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("top"))
            .map(_.getLong(0)).toList
      }.toMap
    // k=2 heap across the micro-batch: best two scores per key
    assert(out1(1L) == List(11L, 12L))
    assert(out1(2L) == List(20L))
  }

  test("S6 exactly-once file ingest across checkpoint restart") {
    val staging = Files.createTempDirectory("fh_staging").toFile
    val checkpoint = Files.createTempDirectory("fh_ckpt").toFile
    val outDir = Files.createTempDirectory("fh_out").toFile

    def runOnce(): Unit = {
      // parquet sink: supports checkpoint recovery and has its own
      // commit log — the full exactly-once chain (source commit log
      // replaces the reference's SQLite files table, R4/R15).
      val q = StreamingOps.ingestStream(spark, staging.getAbsolutePath)
        .writeStream.format("parquet")
        .option("path", outDir.getAbsolutePath)
        .option("checkpointLocation", checkpoint.getAbsolutePath)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    FirehoseFixture.write(staging, "a.log",
      FirehoseFixture.block(0, 3, "s/a").getBytes("UTF-8"))
    runOnce()
    assert(spark.read.parquet(outDir.getAbsolutePath).count() == 3)

    // restart with a new file; checkpoint must skip a.log entirely
    FirehoseFixture.write(staging, "b.gz",
      FirehoseFixture.gzip(FirehoseFixture.block(1, 2, "s/b").getBytes("UTF-8")))
    runOnce()
    val ids = spark.read.parquet(outDir.getAbsolutePath)
      .collect().map(_.getAs[String]("id")).sorted.toSeq
    // a.log events exactly once (not re-decoded on restart) + b.gz
    assert(ids == Seq("ev-0-0", "ev-0-1", "ev-0-2", "ev-1-0", "ev-1-1"))
  }
}
