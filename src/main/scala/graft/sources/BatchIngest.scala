package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.firehose.FirehoseDecoder

/** Batch-mode exactly-once ingest: the reference's processed-file
  * log (SQLite `files` table, `kinesis-to-humio.py:48-68`) and
  * anti-join dedup (`:210-216`) re-expressed as a parquet `_processed`
  * log and a distributed `left_anti` join — the batch counterpart of
  * [[graft.streaming.StreamingOps.ingestStream]]'s checkpoint.
  *
  * Contract preserved from the reference: a file is marked processed
  * once decoded, even if the downstream send fails (`:167-174` —
  * at-most-once per event, exactly-once per file). The anti-join
  * replaces the reference's O(n·m) driver-side list scan with a
  * distributed hash join on file paths.
  */
object BatchIngest {
  /** Paths in `stagingGlob` not yet present in the processed log. */
  def unprocessed(spark: SparkSession, stagingGlob: String,
                  processedLog: String): DataFrame = {
    val listing = spark.read.format("binaryFile").load(stagingGlob)
      .select(col("path"), col("content"))
    val processed = processedParquet(spark, processedLog)
    listing.join(processed, Seq("path"), "left_anti")
  }

  private def processedParquet(spark: SparkSession,
                               processedLog: String): DataFrame = {
    val dir = new java.io.File(processedLog)
    if (dir.exists() && dir.listFiles() != null && dir.listFiles().nonEmpty)
      spark.read.parquet(processedLog).select("path")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("path",
            org.apache.spark.sql.types.StringType))))
  }

  /** Decode every unprocessed file, append their paths to the log,
    * and return the decoded events. Runs the decode on exactly the
    * anti-joined file set — a second run over the same staging dir
    * yields zero rows (R4 semantics).
    */
  def ingestOnce(spark: SparkSession, stagingGlob: String,
                 processedLog: String): DataFrame = {
    import spark.implicits._
    // Pin the batch's file set BEFORE touching the log: the fresh
    // path frame is localCheckpoint()ed (eager), which materializes
    // it on the executors and truncates its lineage to a LogicalRDD —
    // the returned plan no longer references the log, so the append
    // below cannot anti-join the whole batch away on plan
    // re-resolution, and the path set never transits the driver (at
    // many-million-file scale the listing stays distributed).
    val pinned = unprocessed(spark, stagingGlob, processedLog)
      .select("path").localCheckpoint()
    val fresh = spark.read.format("binaryFile").load(stagingGlob)
      .select(col("path"), col("content"))
      .join(broadcast(pinned), Seq("path"), "left_semi")
    val blocks = fresh
      .as[(String, Array[Byte])]
      .flatMap { case (file, content) =>
        FirehoseDecoder.splitBlocks(FirehoseDecoder.gunzipAll(content))
          .iterator.zipWithIndex.map { case (b, i) => (file, i, b) }
      }
      .toDF("file", "block_idx", "block")
    val events = FirehoseDecoder.decodeBlocks(blocks)
      .drop("block_idx", "event_idx")
    // Mark processed regardless of downstream outcome — the
    // reference's track_file runs even after send errors (:167-174).
    pinned.write.mode(SaveMode.Append).parquet(processedLog)
    events
  }
}
