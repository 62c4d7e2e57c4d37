package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.util.sketch.BloomFilter

import graft.firehose.FirehoseDecoder
import graft.sources.TxTable

/** S26 — the reference's WHOLE program as one streaming pipeline to
  * the engine's own storage layer: file-source Firehose ingest
  * (R1–R12: listing, gunzip-until-plain, DATA_MESSAGE split, parse,
  * explode, lineage/prefix enrich) → stateless quality gate (the S22
  * admission shape) → exact duplicate screen (the reference's R4
  * anti-join, applied at EVENT granularity — Kinesis delivers
  * at-least-once, so redelivered events carry the same CloudWatch
  * event id) → EXACTLY-ONCE transactional commit per micro-batch
  * (S24, [[TxTable.appendOnce]]), with the commit log doubling as
  * the change feed (S25) any downstream aggregate maintains itself
  * from. The reference's SQLite `files` table + HTTP re-send loop
  * (kinesis-to-humio.py:48-68,167-174) become one crash-safe,
  * time-travelable corpus table.
  *
  * == Exactly-once, twice over ==
  * Replay of an in-flight micro-batch after a crash is absorbed by
  * the (appId, batchId) txn record — appendOnce NO-OPS the replay.
  * Redelivery of the same EVENT in a *different* file (the Kinesis
  * at-least-once shape the txn record cannot see) is absorbed by the
  * dedup screen: within the batch by `dropDuplicates(id)` (copies
  * are byte-identical in the stored projection, so any winner is the
  * same row), across batches by a left-anti join against the
  * table's own id column. Both screens are deterministic in CONTENT
  * regardless of how files group into micro-batches, because the
  * stored projection drops per-file lineage — a redelivered copy is
  * indistinguishable from its original.
  *
  * == Scale shape ==
  * Decode and gate are stateless per-row work fused into the source
  * scan. The cross-batch screen is LAYERED: a standing driver-held
  * BLOOM FILTER over the table's ids (built once per start, folded
  * forward per batch — no false negatives, so "absent" commits with
  * NO table read) classifies first, and only the maybe-residue
  * (fpp·batch + true redeliveries) pays the exact anti-join against
  * the table's id column — column-pruned parquet over the table's
  * own id-bucketed files, elided entirely by AQE's empty-relation
  * propagation when the residue is empty. The reference does the
  * same anti-join against its processed-file log, at file
  * granularity. The commit is one manifest CAS per micro-batch.
  */
object StreamingCorpusPipeline {

  /** Stored projection: per-file lineage intentionally dropped so
    * redelivered copies are byte-identical (see scaladoc). */
  val tableDdl: String = "id STRING,ts BIGINT,log_group STRING," +
    "log_stream STRING,stream_prefix STRING,message STRING"

  /** The stateless quality gate: the SHARED
    * [[graft.operators.QualityRules]] verdict tree under its
    * log-event-tuned profile — message-sized word band, wide
    * mean-word-length band, no stop-word rule. The same expression
    * tree every batch quality key and the S22 streaming gate compile
    * from, at log-line policy: one operator, tuned twice. Pure
    * per-row projection — fuses into the scan. */
  def qualityKeep: org.apache.spark.sql.Column =
    graft.operators.QualityRules.keeps(col("message"),
      graft.operators.QualityRules.LogEventProfile)

  /** The streaming decode: binaryFile source → the SAME
    * gunzip/split/parse kernel as the batch scan
    * ([[FirehoseDecoder.decodeBlocks]] — R6–R12 live in one place).
    * `maxFilesPerTrigger` bounds ingest per micro-batch (admission
    * control; also what makes fixture runs deterministic). */
  def decodedStream(spark: SparkSession, stagingDir: String,
                    maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    val files = spark.readStream
      .format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(stagingDir)
      .select("path", "content")
      .as[(String, Array[Byte])]
    val blocks = files.flatMap { case (file, content) =>
      FirehoseDecoder.splitBlocks(FirehoseDecoder.gunzipAll(content))
        .iterator.zipWithIndex.map { case (b, i) => (file, i, b) }
    }.toDF("file", "block_idx", "block")
    FirehoseDecoder.decodeBlocks(blocks)
  }

  // ── standing Bloom prescreen over the table's committed event ids ──
  // The cross-batch duplicate screen's scale lever: a driver-held
  // Bloom filter (built from the table at pipeline start, folded
  // forward with each commit's ids) classifies arriving events
  // BEFORE the anti-join. Bloom filters have NO false negatives, so
  // "absent" = DEFINITELY NEW (committed without any table read);
  // only the "maybe" residue — fpp·batch + true redeliveries —
  // reaches the exact anti-join, and when that residue is empty
  // AQE's empty-relation propagation elides the table scan entirely.
  // Ids are xxhash64'd to longs first (a hash collision can only
  // move a new id into the "maybe" class — verified exactly, never
  // dropped). Replays re-fold ids harmlessly (Bloom insert is
  // idempotent); a restart rebuilds from the table.
  //
  // SIZING is manifest-driven, not fixed: the head manifest carries
  // per-file row counts, so the committed id count is an O(1)
  // metadata read (Snapshot.totalRows — never a table scan), and the
  // filter is created for 2× that count (headroom) at ~1% fpp. After
  // each commit the new head count is re-checked against the build
  // capacity; when it crosses, the filter is REBUILT from the table
  // at the new 2× size — without this a fixed filter silently
  // saturates as the table grows (fpp → 1) and the prescreen
  // degrades to the exact anti-join it exists to elide. No false
  // negatives at ANY fill level, so correctness never depends on the
  // resize; only the residue volume does. The filter is
  // capacity-sized driver state (like a broadcast codebook), not
  // data-sized.

  /** Spec observability: prescreen rebuilds and exact-anti-join
    * residue volume (counted only when wired — costs a job per
    * batch). */
  final class PipelineDiag {
    val bloomRebuilds = new java.util.concurrent.atomic.AtomicLong(0L)
    val residueRows = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  private case class BloomState(bytes: Array[Byte], capacity: Long)

  /** ~1% fpp: numBits = n·ln(1/p)/ln²2 ≈ 9.585·n, floored for tiny
    * tables. */
  private def bitsFor(capacity: Long): Long =
    math.max(64L, (capacity * 9.6).toLong)

  private def idHash: org.apache.spark.sql.Column = xxhash64(col("id"))

  private def emptyBloom(capacity: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    BloomFilter.create(capacity, bitsFor(capacity)).writeTo(bos)
    bos.toByteArray
  }

  // est/numBits literals MUST match the build capacity exactly —
  // util.sketch merge refuses mismatched filters
  private def bloomAggOf(ids: DataFrame, capacity: Long)
      : Option[Array[Byte]] = {
    val agg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(idHash),
        Literal(capacity), Literal(bitsFor(capacity)))
        .toAggregateExpression())
    Option(ids.agg(agg.as("bf")).head().getAs[Array[Byte]](0))
  }

  private def foldBloom(base: BloomState, ids: DataFrame): BloomState =
    bloomAggOf(ids, base.capacity) match {
      case None => base
      case Some(delta) =>
        val b = BloomFilter.readFrom(new ByteArrayInputStream(base.bytes))
        b.mergeInPlace(BloomFilter.readFrom(new ByteArrayInputStream(delta)))
        val bos = new ByteArrayOutputStream()
        b.writeTo(bos)
        BloomState(bos.toByteArray, base.capacity)
    }

  /** (Re)build the standing filter from the table: capacity = 2× the
    * committed row count (O(1) off the head manifest's per-file
    * counts; a pre-upgrade table without counts pays one COUNT —
    * once, at start), floored at `minCapacity`. */
  private def buildBloom(spark: SparkSession, table: String,
                         minCapacity: Long): BloomState = {
    val committed = TxTable.snapshot(table).flatMap(_.totalRows)
      .getOrElse(TxTable.read(spark, table).count())
    val capacity = math.max(minCapacity, 2L * committed)
    val built = bloomAggOf(TxTable.read(spark, table).select("id"),
      capacity).getOrElse(emptyBloom(capacity))
    BloomState(built, capacity)
  }

  private def mightContain(bf: BloomState): org.apache.spark.sql.Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bf.bytes), GraftColumnBridge.expression(idHash)))

  /** Start the pipeline: ingest `stagingDir` into the TxTable at
    * `table` (created empty with [[tableDdl]] if absent), exactly
    * once end-to-end. Runs with Trigger.AvailableNow — drains
    * everything currently staged, then stops; a restarted run (same
    * checkpoint) replays only unfinished work and appendOnce no-ops
    * anything already committed. */
  def start(spark: SparkSession, stagingDir: String, table: String,
            checkpoint: String, appId: String,
            maxFilesPerTrigger: Int = 1,
            bloomMinCapacity: Long = 4096L,
            diag: Option[PipelineDiag] = None): StreamingQuery = {
    if (TxTable.latestVersion(table).isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(tableDdl))
      require(TxTable.create(empty, table, bucketKey = "id",
        buckets = 2) || TxTable.latestVersion(table).nonEmpty,
        s"could not initialize pipeline table $table")
    }
    // per-start() standing filter: rebuilt from the table on (re)start
    val bloomRef = new java.util.concurrent.atomic.AtomicReference[
      BloomState](null)
    decodedStream(spark, stagingDir, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val evs = batch
          .filter(qualityKeep)
          .select(col("id"), col("timestamp").as("ts"),
            col("logGroup").as("log_group"),
            col("logStream").as("log_stream"),
            col("logStreamPrefix").as("stream_prefix"),
            col("message"))
          .dropDuplicates("id")
        val bf = bloomRef.get() match {
          case null =>
            val built = buildBloom(spark, table, bloomMinCapacity)
            bloomRef.set(built); built
          case b => b
        }
        // prescreen: "definitely new" commits with NO table read;
        // only the maybe-residue pays the exact anti-join (AQE
        // elides the table scan when the residue is empty)
        val suspects = evs.filter(mightContain(bf))
          .join(TxTable.read(spark, table).select("id"),
            Seq("id"), "left_anti")
        diag.foreach(_.residueRows.addAndGet(
          evs.filter(mightContain(bf)).count()))
        val fresh = evs.filter(!mightContain(bf)).unionByName(suspects)
        TxTable.appendOnce(fresh, table, appId, batchId,
          bucketKey = "id", buckets = 2)
        // saturation check off the committed head's O(1) row count:
        // past the build capacity the filter's fpp decays toward 1
        // (residue → whole batch), so re-size and rebuild from the
        // table — the post-commit read includes this batch, keeping
        // the no-false-negative invariant across the swap
        val committed = TxTable.snapshot(table).flatMap(_.totalRows)
        if (committed.exists(_ > bf.capacity)) {
          bloomRef.set(buildBloom(spark, table, bloomMinCapacity))
          diag.foreach(_.bloomRebuilds.incrementAndGet())
        } else {
          // fold ALL the batch's gated ids (not just fresh): folding
          // an already-present id is idempotent, and evs's lineage
          // carries no table read — one cheap batch-local pass
          bloomRef.set(foldBloom(bf, evs.select("id")))
        }
        ()
      }
      .start()
  }
}
