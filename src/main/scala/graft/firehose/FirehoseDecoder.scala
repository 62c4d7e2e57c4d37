package graft.firehose

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One decoded log event (FIXTURES.md §A.3 + batching ordinals). */
case class FirehoseEvent(timestamp: Long, logGroup: String,
                         logStream: String, logStreamPrefix: String,
                         file: String, id: String, message: String,
                         block_idx: Int, event_idx: Int)

/** Decoder for the Kinesis-Firehose/CloudWatch-Logs file format the
  * reference ingests: S3 objects containing **concatenated**
  * DATA_MESSAGE JSON blocks with no separator, gzip'd zero or more
  * times (reference behavior at `kinesis-to-humio.py:15,91-96,99-131`).
  *
  * Spark-first shape: `binaryFile` scan → per-file flatMap
  * (gunzip-until-plain ∘ split-on-delimiter) → `from_json` with the
  * block schema → `explode(logEvents)` → lineage/prefix projection.
  * Every stage after the scan is a narrow transformation — one task
  * per file split, no shuffle anywhere in the decode path, so the
  * pipeline scales linearly with executor count at 100 TB.
  *
  * Replicated reference semantics (SURVEY.md §2.1):
  *  - block boundary = next delimiter occurrence; last block runs to
  *    EOF (`kinesis-to-humio.py:123-127`);
  *  - a file with zero delimiters yields zero events, not an error
  *    (`:114-115`) — including delimiter-in-message false positives
  *    (`:107-112`), which are intentionally NOT fixed;
  *  - `logStreamPrefix` = first two `/`-segments of `logStream`,
  *    lenient for shorter names (`:137`);
  *  - event `timestamp` stays epoch-millis LongType end-to-end
  *    (`:147`) — callers convert via `timestamp_millis` only when
  *    windowing.
  */
object FirehoseDecoder {
  /** Block-start delimiter (`kinesis-to-humio.py:15`). */
  val Delimiter: Array[Byte] =
    "{\"messageType\":\"DATA_MESSAGE\"".getBytes("UTF-8")

  /** DATA_MESSAGE block schema (FIXTURES.md §A.2). */
  val blockSchema: StructType = StructType(Seq(
    StructField("messageType", StringType),
    StructField("owner", StringType),
    StructField("logGroup", StringType),
    StructField("logStream", StringType),
    StructField("subscriptionFilters", ArrayType(StringType)),
    StructField("logEvents", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("timestamp", LongType),
      StructField("message", StringType)))))))

  /** Gzip magic check (`kinesis-to-humio.py:38-44`). */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte

  /** Decompress until the payload no longer starts with gzip magic —
    * the reference's gunzip-in-a-loop (`kinesis-to-humio.py:91-96`).
    * A streaming GZIPInputStream consumes *all* members of a
    * multi-member gzip file per layer (member concatenation and
    * gzip-of-gzip are different things; both occur in the wild).
    */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    var cur = bytes
    while (isGzip(cur)) {
      val in = new GZIPInputStream(new ByteArrayInputStream(cur), 64 * 1024)
      try cur = in.readAllBytes()
      finally in.close()
    }
    cur
  }

  /** All start offsets of `Delimiter` in `bytes` (overlap-free scan,
    * mirroring mmap.find at `kinesis-to-humio.py:107-112`). */
  private[firehose] def delimiterOffsets(bytes: Array[Byte]): Seq[Int] = {
    val hits = Seq.newBuilder[Int]
    var i = 0
    val n = bytes.length
    val m = Delimiter.length
    while (i <= n - m) {
      var j = 0
      while (j < m && bytes(i + j) == Delimiter(j)) j += 1
      if (j == m) { hits += i; i += m } else i += 1
    }
    hits.result()
  }

  /** Slice into blocks: [offset_i, offset_i+1); the last block runs to
    * EOF (`kinesis-to-humio.py:121-131`). Zero delimiters ⇒ zero
    * blocks (`:114-115`). */
  def splitBlocks(bytes: Array[Byte]): Seq[String] = {
    val offs = delimiterOffsets(bytes)
    offs.zipAll(offs.drop(1), -1, bytes.length).map { case (a, b) =>
      new String(bytes, a, b - a, "UTF-8")
    }
  }

  /** file → raw block strings, with the block's index within its file
    * (needed downstream for block-scoped batching, R13).
    *
    * `permissive=false` (default) matches the reference: a corrupt
    * gzip stream fails the job (its gunzip loop would crash too).
    * `permissive=true` is the 100 TB production mode: corrupt files
    * yield zero blocks and are counted in the `corrupt_files`
    * accumulator instead of failing a 10-hour job on one bad object.
    */
  def blocks(spark: SparkSession, path: String,
             permissive: Boolean = false,
             corruptCounter: Option[org.apache.spark.util.LongAccumulator] =
               None): DataFrame = {
    import spark.implicits._
    val corrupt = corruptCounter.getOrElse(
      spark.sparkContext.longAccumulator("corrupt_files"))
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (file, content) =>
        val payload =
          if (!permissive) Some(gunzipAll(content))
          else scala.util.Try(gunzipAll(content)).toOption.orElse {
            corrupt.add(1); None
          }
        payload.iterator.flatMap(p =>
          splitBlocks(p).iterator.zipWithIndex.map {
            case (block, i) => (file, i, block)
          })
      }
      .toDF("file", "block_idx", "block")
  }

  /** block rows (file, block_idx, block) → one row per log event,
    * enriched with lineage columns — the single shared projection
    * used by the batch scan ([[decode]]), the batch ingest
    * ([[graft.sources.BatchIngest]]) and the streaming ingest
    * ([[graft.streaming.StreamingOps.ingestStream]]), so the R8–R12
    * semantics live in exactly one place. Output matches FIXTURES.md
    * §A.3 plus `block_idx`/`event_idx` ordinals for batching.
    */
  def decodeBlocks(blocksDf: DataFrame): DataFrame =
    blocksDf
      .select(col("file"), col("block_idx"),
        from_json(col("block"), blockSchema).as("b"))
      .select(col("file"), col("block_idx"),
        col("b.logGroup").as("logGroup"),
        col("b.logStream").as("logStream"),
        posexplode(col("b.logEvents")).as(Seq("event_idx", "ev")))
      .select(
        col("ev.timestamp").as("timestamp"),
        col("logGroup"),
        col("logStream"),
        // '/'.join(logStream.split('/')[0:2]) — kinesis-to-humio.py:137
        concat_ws("/", slice(split(col("logStream"), "/", -1), 1, 2))
          .as("logStreamPrefix"),
        col("file"),
        col("ev.id").as("id"),
        col("ev.message").as("message"),
        col("block_idx"), col("event_idx"))

  /** Full decode: one row per log event — the reference's R6–R12
    * pipeline as one declarative plan. */
  def decode(spark: SparkSession, path: String,
             permissive: Boolean = false): DataFrame =
    decodeBlocks(blocks(spark, path, permissive))

  /** Typed surface: the same decode as a Dataset[FirehoseEvent] for
    * callers who want compile-time field access. */
  def decodeTyped(spark: SparkSession, path: String,
                  permissive: Boolean = false): Dataset[FirehoseEvent] = {
    import spark.implicits._
    decode(spark, path, permissive).as[FirehoseEvent]
  }

  /** R13 batching: size-bounded micro-batches that never span blocks
    * (`kinesis-to-humio.py:150`) — batch ordinal is a pure per-row
    * projection of the in-block event position, so no shuffle. */
  def withBatchId(events: DataFrame, batchSize: Int = 5000): DataFrame =
    events.withColumn("batch_id",
      (col("event_idx") / batchSize).cast("int"))

  /** R17 observability: attach the reference's progress counters
    * (events, blocks, files — `kinesis-to-humio.py:114-117,133`) as
    * an `Observation` evaluated during the action, zero extra passes.
    * Read `obs.get` after the first action on the returned frame. */
  private val obsSeq = new java.util.concurrent.atomic.AtomicLong(0)

  def observed(events: DataFrame):
      (DataFrame, org.apache.spark.sql.Observation) = {
    // Unique listener key per call: a fixed name can cross listener
    // registrations when concurrent actions share one session (seen
    // as a rare flake under parallel test suites).
    val obs = org.apache.spark.sql.Observation(
      s"firehose_metrics_${obsSeq.incrementAndGet()}")
    val withObs = events.observe(obs,
      count(lit(1)).as("events"),
      approx_count_distinct(concat_ws("#", col("file"), col("block_idx")))
        .as("blocks_approx"),
      approx_count_distinct(col("file")).as("files_approx"))
    (withObs, obs)
  }
}
