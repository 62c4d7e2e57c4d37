package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.firehose.FirehoseDecoder

/** Structured-Streaming surface of the engine.
  *
  * The reference is a manually-scheduled micro-batch stream: list →
  * anti-join processed files → decode → send, with a SQLite
  * processed-file log for exactly-once per file
  * (`kinesis-to-humio.py:48-68,210-216`). Spark's file source +
  * checkpoint commit log subsumes exactly that contract
  * ([[ingestStream]]), and the window/watermark/dedup operators below
  * add the event-time surface the reference never had (its events
  * pass through with raw timestamps, `kinesis-to-humio.py:147`).
  *
  * All transforms take/return streaming DataFrames so they compose
  * with any source; specs drive them through MemoryStream, production
  * through `readStream`.
  *
  * Scale: every aggregate here keys its state by (window, group) and
  * is bounded by the watermark — state store size is O(active
  * windows × groups), not O(events); at 1000 executors state
  * partitions shard with the shuffle.
  */
object StreamingOps {
  /** Tumbling event-time window counts (S1). `ts` must be TimestampType. */
  def tumblingCounts(events: DataFrame, every: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), every), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Sliding window counts (S2). */
  def slidingCounts(events: DataFrame, length: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows with an inactivity gap (S3) — the streaming
    * equivalent of the batch `q_events_sessionize`. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n"))

  /** Watermarked counts for the late-data spec (S4): events older
    * than `lateness` behind the max seen ts are dropped. */
  def watermarkedCounts(events: DataFrame,
                        lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** Watermark-bounded exact dedup on event id (S5) — streaming
    * variant of `q_dedup_exact`. Uses dropDuplicatesWithinWatermark:
    * plain `dropDuplicates("event_id")` would ignore the watermark
    * for state eviction (the event-time column isn't in the key set)
    * and grow one state entry per distinct id forever. */
  def dedup(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Stream-stream interval join: clicks enriched with purchases of
    * the same user within the trailing `windowMinutes` — both sides
    * watermarked so the join state expires (unbounded state is the
    * classic stream-join failure at scale). Columns: left needs
    * (user_id, ts, ...); right (p_user_id, p_ts, ...) — the right
    * side's key/time are p_-prefixed so the post-join columns are
    * unambiguous.
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame,
                   windowMinutes: Int = 60): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
    val p = purchases.withWatermark("p_ts", "10 minutes")
    c.join(p,
      col("user_id") === col("p_user_id") &&
      col("p_ts") <= col("ts") &&
      col("p_ts") >= col("ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
  }

  /** Left-outer stream-stream interval join (S10): like
    * [[intervalJoin]], but clicks with no purchase in the trailing
    * window are emitted with nulls once the watermark passes the
    * window's end — the state for an unmatched left row is held
    * exactly until the join condition can no longer be satisfied,
    * then released (bounded state, the outer-join analogue of the
    * inner join's expiry). */
  def intervalJoinLeftOuter(clicks: DataFrame, purchases: DataFrame,
                            windowMinutes: Int = 60): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
    val p = purchases.withWatermark("p_ts", "10 minutes")
    c.join(p,
      col("user_id") === col("p_user_id") &&
      col("p_ts") <= col("ts") &&
      col("p_ts") >= col("ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      "left_outer")
  }

  /** Stream-static enrichment (S9): join each micro-batch against a
    * static dimension, broadcast — the streaming counterpart of the
    * batch dimension joins. Stateless: the dim is planned into every
    * micro-batch (and re-resolved if its files change between
    * batches); no streaming state accrues, so this costs the same at
    * any stream length. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
                       keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** Streaming incremental dedup screen (S12): flag each arriving
    * document that near-duplicates a STATIC reference corpus — the
    * streaming form of [[graft.operators.ApproxDedup.incrementalMinhash]]
    * (same banding, same verification kernel). Stateless stream-static
    * equi-join on (band_idx, band_hash): the corpus banding is planned
    * into each micro-batch (precompute + persist it in production);
    * no streaming state accrues in the join itself. The same shape
    * with the benchmark gram set as the static side is a streaming
    * contamination screen.
    *
    * State bound: the candidate dedup keeps one state entry per
    * (new_id, corpus_id) pair. On an UNBOUNDED stream pass
    * `eventTime = Some((tsColumn, delay))` — the stream side gets
    * `withWatermark(tsColumn, delay)` and the dedup becomes
    * `dropDuplicatesWithinWatermark`, so entries expire once the
    * watermark passes them. Without it (`None`, fine for bounded
    * replays and tests) the plain `dropDuplicates` state grows with
    * the number of distinct candidate pairs for the stream's
    * lifetime.
    *
    * @param eventTime optional (event-time column on `stream`,
    *                  watermark delay e.g. "10 minutes") bounding
    *                  dedup state on unbounded streams
    */
  def dedupScreen(stream: DataFrame, corpus: DataFrame, n: Int = 3,
                  k: Int = 32, bands: Int = 8,
                  threshold: Double = 0.5,
                  eventTime: Option[(String, String)] = None): DataFrame = {
    import graft.operators.ApproxDedup._
    val r = k / bands
    def shingle(df: DataFrame, idAs: String, shAs: String) = df
      .select(col("doc_id").as(idAs), shingleHashes64(col("text"), n).as(shAs))
    // The stream side carries its shingle array through the band
    // explode (no streaming self-join exists to re-attach it); the
    // STATIC corpus side is banded as bare (id, band) rows and its
    // shingle arrays re-join only for deduped candidates — the
    // broadcast is 1× the corpus shingle footprint, not ×bands.
    val streamSide = eventTime match {
      case Some((tsCol, delay)) => stream.withWatermark(tsCol, delay)
        .select(col("doc_id").as("new_id"), col(tsCol).as("__et"),
          shingleHashes64(col("text"), n).as("sh_new"))
      case None => shingle(stream, "new_id", "sh_new")
    }
    val carry = Seq(col("new_id"), col("sh_new")) ++
      (if (eventTime.isDefined) Seq(col("__et")) else Nil)
    val newSide = streamSide
      .select(carry :+
        posexplode(bandHashes(minhashSignature(col("sh_new"), k), bands, r))
          .as(Seq("band_idx", "band_hash")): _*)
    val corpusSh = shingle(corpus, "corpus_id", "sh_corpus")
    val corpusBands = corpusSh
      .select(col("corpus_id"),
        posexplode(bandHashes(minhashSignature(col("sh_corpus"), k), bands, r))
          .as(Seq("band_idx", "band_hash")))
    val candidates = newSide
      .join(broadcast(corpusBands), Seq("band_idx", "band_hash"))
      // candidate dedup BEFORE verification: one Jaccard per pair,
      // not one per shared band.
      .select(Seq(col("new_id"), col("sh_new"), col("corpus_id")) ++
        (if (eventTime.isDefined) Seq(col("__et")) else Nil): _*)
    val deduped = eventTime match {
      case Some(_) =>
        candidates.dropDuplicatesWithinWatermark("new_id", "corpus_id")
      case None => candidates.dropDuplicates("new_id", "corpus_id")
    }
    deduped
      .join(broadcast(corpusSh), "corpus_id")
      .withColumn("jaccard",
        round(jaccard(col("sh_new"), col("sh_corpus")), 6))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "corpus_id", "jaccard")
  }

  /** The reference pipeline as a stream (S6): file source over a
    * staging dir → Firehose decode → exactly-once via checkpoint.
    * The file-source commit log replaces the SQLite `files` table
    * (R4/R15); replay after restart reprocesses nothing.
    */
  def ingestStream(spark: SparkSession, stagingDir: String): DataFrame = {
    import spark.implicits._
    val files = spark.readStream
      .format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(stagingDir)
      .select("path", "content")
      .as[(String, Array[Byte])]
    val blocks = files.flatMap { case (file, content) =>
      FirehoseDecoder.splitBlocks(FirehoseDecoder.gunzipAll(content))
        .iterator.zipWithIndex.map { case (b, i) => (file, i, b) }
    }.toDF("file", "block_idx", "block")
    FirehoseDecoder.decodeBlocks(blocks).drop("block_idx", "event_idx")
  }

  /** Idempotent foreachBatch sink (S13): partitioned-overwrite
    * parquet keyed by the micro-batch id — the standard production
    * pattern for exactly-once delivery to sinks without transactional
    * streaming support. A batch replayed after a crash (same batchId)
    * OVERWRITES its own partition instead of appending duplicates, so
    * end-to-end semantics stay exactly-once even though foreachBatch
    * alone is at-least-once. Dynamic partition-overwrite is passed as
    * a WRITER option (truly scoped to this write — a session-conf set
    * here would leak and silently change unrelated overwrite writes
    * to keep stale partitions).
    */
  def idempotentBatchWriter(outDir: String)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    batch
      .withColumn("__batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("__batch_id")
      .parquet(outDir)
  }
}
