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
          val file = curKey._1
          val head = batch.head
          val payload = Payload(
            Map("logStreamPrefix" -> head.getAs[String]("logStreamPrefix"),
              "logGroup" -> head.getAs[String]("logGroup")),
            batch.toSeq.map { r =>
              (r.getAs[Long]("timestamp"), Map(
                "id" -> r.getAs[String]("id"),
                "message" -> r.getAs[String]("message"),
                "file" -> file,
                "logStream" -> r.getAs[String]("logStream")))
            })
          // Log-and-continue (kinesis-to-humio.py:154-158): the
          // reference drops failed batches after logging.
          if (!post(payload)) failures.add(1)
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
}
