package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IncrementalIndex
import graft.sources.TxTable

/** S27 — LIVE index maintenance: the corpus table's commit log
  * streamed (the S25 file-source tail of `_txlog/v*.json`) into
  * [[IncrementalIndex]]'s per-version fold, so the BM25 postings
  * index follows the corpus by the latency of one micro-batch
  * instead of a from-scratch rebuild per session. Each newly
  * observed corpus version applies exactly once — the apply is
  * guarded by the index table's transactional batch ledger keyed by
  * the SOURCE version, so crash replays and duplicate micro-batch
  * groupings no-op (the S24/S25 idempotence discipline, applied to
  * derived state). Versions apply in ascending order within a batch,
  * keeping the ledger's high-water exact across any batching.
  *
  * Scale: per corpus commit the work is the commit's churn (feed →
  * retract keys + inserted docs' postings) plus two metadata CAS
  * commits on the index table; no snapshot rescan, no executor
  * state. The same loop serves the IVF index via [[applyIvfVersions]]
  * with a pinned quantizer.
  */
object StreamingIndexMaintain {

  /** LIVE-MAINTAINER REGISTRY (this JVM): one entry per
    * (index path, appId) holding the running query — the handle
    * `STOP MAINTAIN INDEX` stops, the existence check a second
    * `START MAINTAIN` on the same (index, appId) refuses against
    * (the one-maintainer-per-(index, appId) contract made loud
    * instead of a CAS-contention mystery), and the guard
    * `DROP INDEX` consults before deleting a table a maintainer is
    * mid-commit on. Scope: THIS driver JVM — maintainers in other
    * drivers are invisible here (the ledger still keeps them
    * exactly-once; this registry is the operational face, not the
    * correctness mechanism). */
  private val live = new java.util.concurrent.ConcurrentHashMap[
    (String, String), StreamingQuery]()

  private def absPath(p: String): String =
    java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString

  /** Start-and-register under the refusal contract: prunes dead
    * entries, refuses while an ACTIVE maintainer holds the same
    * (index, appId), registers the new query atomically. */
  private def registered(index: String, appId: String)(
      mk: => StreamingQuery): StreamingQuery = live.synchronized {
    val k = (absPath(index), appId)
    Option(live.get(k)).foreach { q =>
      if (q.isActive) throw new IllegalStateException(
        s"a live maintainer already holds $index under appId " +
          s"$appId — stop it first (one maintainer per (index, " +
          "appId))")
      live.remove(k)
    }
    val q = mk
    live.put(k, q)
    q
  }

  /** The ACTIVE maintainers of `index` in this JVM: (appId, query)
    * pairs. Dead entries are pruned on the way. */
  def liveMaintainers(index: String): Seq[(String, StreamingQuery)] =
    live.synchronized {
      val p = absPath(index)
      val dead = live.entrySet().iterator()
      val out = Seq.newBuilder[(String, StreamingQuery)]
      while (dead.hasNext) {
        val e = dead.next()
        if (!e.getValue.isActive) dead.remove()
        else if (e.getKey._1 == p) out += ((e.getKey._2, e.getValue))
      }
      out.result().sortBy(_._1)
    }

  /** Stop the registered maintainer(s) of `index` — all of them, or
    * just `appId`'s. Returns how many were stopped. */
  def stopMaintainers(index: String,
                      appId: Option[String] = None): Int = {
    val victims = liveMaintainers(index)
      .filter(m => appId.forall(_ == m._1))
    victims.foreach { case (a, q) =>
      q.stop()
      live.remove((absPath(index), a))
    }
    victims.size
  }

  /** Versions named by a micro-batch of manifest lines, ascending. */
  private def versionsIn(batch: DataFrame): Seq[Long] =
    batch
      .select(regexp_extract(col("value"), """"version":(\d+)""", 1)
        .cast("long").as("v"))
      .where(col("v").isNotNull)
      .collect().map(_.getLong(0)).sorted.toSeq

  /** Tail `corpus`'s commit log and maintain the postings index at
    * `index` (created on first use), exactly once per source
    * version. */
  def start(spark: SparkSession, corpus: String, index: String,
            appId: String, checkpoint: String): StreamingQuery = {
    IncrementalIndex.initBm25(spark, index)
    registered(index, appId) {
    spark.readStream.text(s"$corpus/_txlog/v*.json")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        for (v <- versionsIn(batch))
          IncrementalIndex.applyBm25(spark, corpus, index, v, appId)
        ()
      }
      .start()
    }
  }

  /** The IVF twin: same tail, pinned centroids. */
  def startIvf(spark: SparkSession, corpus: String, index: String,
               centroidsTable: String, appId: String,
               checkpoint: String): StreamingQuery = {
    val cents = IncrementalIndex.loadCentroids(spark, centroidsTable)
    registered(index, appId) {
    spark.readStream.text(s"$corpus/_txlog/v*.json")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        for (v <- versionsIn(batch))
          IncrementalIndex.applyIvf(spark, corpus, index, cents, v, appId)
        ()
      }
      .start()
    }
  }

  /** The MinHash band-index twin: same tail, so the standing
    * (doc_id, band_idx, band_hash) near-dup screen state
    * ([[IncrementalIndex.screenMinhash]]'s serving table) follows
    * the corpus at micro-batch latency — the ingest-time dedup
    * consumer reads CURRENT band state instead of waiting for the
    * next batch fold (the reference's anti-join dedup, R4 at
    * kinesis-to-humio.py:210-216, generalized to event-scale
    * near-dup). */
  def startMinhash(spark: SparkSession, corpus: String, index: String,
                   appId: String, checkpoint: String, n: Int = 3,
                   k: Int = 32, bands: Int = 8): StreamingQuery = {
    IncrementalIndex.initMinhash(spark, index)
    registered(index, appId) {
    spark.readStream.text(s"$corpus/_txlog/v*.json")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        for (v <- versionsIn(batch))
          IncrementalIndex.applyMinhash(spark, corpus, index, v, appId,
            n, k, bands)
        ()
      }
      .start()
    }
  }

  /** The SimHash fingerprint twin: live maintenance of the standing
    * per-doc fingerprint table ([[IncrementalIndex.applySimhash]]),
    * the other half of the ingest-time near-dup screen. */
  def startSimhash(spark: SparkSession, corpus: String, index: String,
                   appId: String, checkpoint: String): StreamingQuery = {
    IncrementalIndex.initSimhash(spark, index)
    registered(index, appId) {
    spark.readStream.text(s"$corpus/_txlog/v*.json")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        for (v <- versionsIn(batch))
          IncrementalIndex.applySimhash(spark, corpus, index, v, appId)
        ()
      }
      .start()
    }
  }

  /** The IVFADC code-table twin: same tail, pinned coarse centroids
    * + residual codebooks ([[IncrementalIndex.applyPq]]) — the live
    * form of the 32×-compressed serving index. */
  def startPq(spark: SparkSession, corpus: String, index: String,
              centroidsTable: String, booksTable: String, appId: String,
              checkpoint: String, m: Int = 16, dim: Int = 64)
      : StreamingQuery = {
    val idx = IncrementalIndex.loadPqIndex(spark, centroidsTable,
      booksTable)
    registered(index, appId) {
    spark.readStream.text(s"$corpus/_txlog/v*.json")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        for (v <- versionsIn(batch))
          IncrementalIndex.applyPq(spark, corpus, index, idx, v, appId,
            m, dim)
        ()
      }
      .start()
    }
  }
}
