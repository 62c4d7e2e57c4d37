package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The reference's sink stage re-expressed for Spark: Humio-shaped
  * structured payloads (`kinesis-to-humio.py:136-153`) posted in
  * size-bounded batches that never span blocks (`:150`), with
  * per-partition connection reuse (`:289`) and the reference's
  * log-and-continue error channel (`:154-158` — a failed batch is
  * dropped, never retried).
  *
  * `post` is pluggable because this environment has zero egress; the
  * specs install a recording stub, production installs a real HTTP
  * client. `foreachPartition` keeps the sink fully distributed — each
  * executor posts its own partitions, nothing funnels through the
  * driver; at 1000 executors the sink fan-out is 1000-wide.
  */
object HttpBatchSink {
  /** One POST body: the tags + events envelope of
    * `kinesis-to-humio.py:136-148`. */
  case class Payload(tags: Map[String, String],
                     events: Seq[(Long, Map[String, String])])

  /** The tags + events envelope for one (file, block)-scoped batch. */
  private def payloadOf(file: String, batch: Seq[Row]): Payload = {
    val head = batch.head
    Payload(
      Map("logStreamPrefix" -> head.getAs[String]("logStreamPrefix"),
        "logGroup" -> head.getAs[String]("logGroup")),
      batch.map { r =>
        (r.getAs[Long]("timestamp"), Map(
          "id" -> r.getAs[String]("id"),
          "message" -> r.getAs[String]("message"),
          "file" -> file,
          "logStream" -> r.getAs[String]("logStream")))
      })
  }

  /** Sink `events` (the FirehoseDecoder.decode output schema). Groups
    * rows by (file, block) so tags stay constant within a batch, then
    * flushes every `batchSize` events or at block end. Returns the
    * failed-batch count (via a Spark accumulator, so it aggregates
    * correctly from executors on a real cluster, not just local mode).
    */
  def write(events: DataFrame, batchSize: Int = 5000)
           (post: Payload => Boolean): Long = {
    val failures =
      events.sparkSession.sparkContext.longAccumulator("sink_failures")
    events
      .repartition(col("file"), col("block_idx"))
      .sortWithinPartitions("file", "block_idx", "event_idx")
      .foreachPartition { rows: Iterator[Row] =>
        // Per-partition "connection": mirrors the per-run PoolManager
        // (kinesis-to-humio.py:289) at executor granularity. Rows
        // arrive sorted by (file, block, event), so batches are cut
        // by streaming the iterator — at most one batch is buffered,
        // never the whole partition (binaryFile does not split files,
        // so a partition can hold an entire large file's events).
        var curKey: (String, Int) = null
        val batch = scala.collection.mutable.ArrayBuffer.empty[Row]
        def flush(): Unit = if (batch.nonEmpty) {
          // Log-and-continue (kinesis-to-humio.py:154-158): the
          // reference drops failed batches after logging.
          if (!post(payloadOf(curKey._1, batch.toSeq))) failures.add(1)
          batch.clear()
        }
        rows.foreach { r =>
          val key = (r.getAs[String]("file"), r.getAs[Int]("block_idx"))
          if (key != curKey) { flush(); curKey = key } // block end (:150)
          batch += r
          if (batch.size >= batchSize) flush()
        }
        flush()
      }
    failures.value
  }

  /** The delivery policy the reference LACKS (it logs and drops,
    * kinesis-to-humio.py:154-158 — that at-most-once mode stays
    * available as [[write]]): each batch retries up to `maxRetries`
    * times with exponential backoff (`backoffMs << attempt` between
    * tries), and a batch that exhausts its retries lands in the
    * returned DEAD-LETTER frame — the input schema unchanged, so the
    * caller re-drives it through any sink (parquet for offline
    * replay, or this method again once the endpoint heals).
    *
    * Delivery happens EXACTLY ONCE, eagerly, inside this call: the
    * dead-letter frame is localCheckpointed before returning, so
    * consuming the result (counting it, writing it, re-posting it)
    * never re-executes the posts. A `post` that throws counts as a
    * failed attempt, like one returning false — transport exceptions
    * must not kill the executor mid-partition. Batch granularity is
    * all-or-nothing (the reference's contract), so a retry after a
    * failure never double-delivers individual events.
    */
  def writeWithRetry(events: DataFrame, batchSize: Int = 5000,
                     maxRetries: Int = 3, backoffMs: Long = 10)
                    (post: Payload => Boolean): DataFrame = {
    val dead = events
      .repartition(col("file"), col("block_idx"))
      .sortWithinPartitions("file", "block_idx", "event_idx")
      .mapPartitions { rows: Iterator[Row] =>
        def attempt(p: Payload): Boolean = {
          var tries = 0
          var ok = try post(p) catch { case _: Exception => false }
          while (!ok && tries < maxRetries) {
            Thread.sleep(backoffMs << tries)
            tries += 1
            ok = try post(p) catch { case _: Exception => false }
          }
          ok
        }
        val deadRows = scala.collection.mutable.ArrayBuffer.empty[Row]
        var curKey: (String, Int) = null
        val batch = scala.collection.mutable.ArrayBuffer.empty[Row]
        def flush(): Unit = if (batch.nonEmpty) {
          if (!attempt(payloadOf(curKey._1, batch.toSeq)))
            deadRows ++= batch
          batch.clear()
        }
        rows.foreach { r =>
          val key = (r.getAs[String]("file"), r.getAs[Int]("block_idx"))
          if (key != curKey) { flush(); curKey = key }
          batch += r
          if (batch.size >= batchSize) flush()
        }
        flush()
        deadRows.iterator
      }(org.apache.spark.sql.Encoders.row(events.schema))
    dead.localCheckpoint()
  }
}
