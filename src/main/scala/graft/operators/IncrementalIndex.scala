package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.TxTable

/** INCREMENTAL INDEX MAINTENANCE off the [[TxTable]] change feed —
  * the join between the storage layer's CDC surface and the
  * retrieval layer's indexes. The indexes this engine builds (BM25
  * postings, IVF cell assignments) are PER-DOCUMENT decomposable:
  *
  *   postings(corpus)  = ⊎ per-doc postings rows
  *   assigned(corpus)  = ⊎ per-vector argmax-cell rows (centroids
  *                         PINNED at index birth)
  *
  * so they are abelian-group state exactly like the q_corpus_ivm
  * aggregates: a corpus commit's change feed (inserts + net deletes,
  * [[TxTable.changes]]) folds into the index as RETRACT the feed's
  * doc ids, then APPEND the inserted docs' rows — updates
  * (delete+insert per key) replace, compactions (empty feed) net to
  * zero. The maintained index is itself a TxTable: versioned,
  * time-travelable, vacuumable, and the apply is EXACTLY-ONCE per
  * source version via the transactional batch ledger
  * ([[TxTable.appendOnce]] keyed by the SOURCE version) — a crash
  * replay of a half-applied transition re-runs the retract (no-op:
  * the rows are already gone, and the guarded append has not yet
  * re-added them) and completes the append, never double-applying.
  *
  * Derived statistics (idf, avgdl, per-cell counts) are
  * vocabulary-/cell-sized aggregates OVER the maintained frame —
  * recomputed on read ([[bm25Index]]), never stored, so they are
  * consistent by construction.
  *
  * CONTRACT: one maintainer per (index, appId) at a time, applying
  * source versions in ascending order — the Structured Streaming
  * single-query discipline ([[graft.streaming.StreamingIndexMaintain]]
  * provides exactly that loop). Concurrent writers with other appIds
  * (e.g. a compactor on the index table) interleave safely through
  * the normal CAS rebase.
  *
  * Scale: per source commit the work is the commit's churn — the
  * feed bounds the retract key frame (broadcast into
  * [[TxTable.deleteKeys]], whose file-touch set is manifest-stat
  * pruned) and the append is the inserted docs' rows. Nothing
  * corpus-sized moves; a quiet day costs metadata. Rebuilding from
  * scratch (the pre-round-12 story) cost a full corpus scan per
  * session — this is the production path a live RAG/dedup consumer
  * needs. Reference scope: the reference maintains its
  * processed-file state incrementally per batch
  * (kinesis-to-humio.py:141-166); this is that discipline applied to
  * the engine's own derived state.
  */
object IncrementalIndex {

  /** Maintained BM25 postings schema ([[Bm25.Index]]'s postings
    * frame, made durable). */
  val postingsSchemaDdl: String =
    "doc_id BIGINT,term STRING,tf BIGINT,dl BIGINT"

  /** Maintained IVF assignment schema ([[AnnSearch.assignCells]]'s
    * output, embedding column dropped — the corpus table keeps the
    * vectors; the index holds the routing). */
  val ivfSchemaDdl: String = "vec_id BIGINT,cell INT"

  private def emptyFrame(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL(ddl))

  /** Per-doc postings rows for a (doc_id, text) frame — the
    * insert-side delta, shared verbatim with the from-scratch build
    * so maintained and rebuilt indexes are definitionally the same
    * function of the corpus. */
  def postings(docs: DataFrame): DataFrame =
    Bm25.postings(docs)

  /** Maintained SimHash fingerprint schema
    * ([[ApproxDedup.simhashOf]]'s output, made durable — the
    * near-dup screen's standing state). */
  val simhashSchemaDdl: String = "doc_id BIGINT,simhash BIGINT"

  /** Create an (empty) index table with `ddl`'s schema. Idempotent:
    * a lost create against an existing table is fine. */
  def init(spark: SparkSession, index: String, ddl: String,
           idCol: String): Unit =
    if (TxTable.latestVersion(index).isEmpty)
      require(TxTable.create(emptyFrame(spark, ddl), index,
        bucketKey = idCol) || TxTable.latestVersion(index).nonEmpty,
        s"could not initialize index table $index")

  /** THE SHARED FOLD for any per-row-decomposable index — one whose
    * rows are a function of single corpus rows (`rowsOf(A ⊎ B) =
    * rowsOf(A) ⊎ rowsOf(B)`): fold the corpus transition (v−1 → v)
    * into the index, exactly once per (appId, v). Retracts EVERY id
    * the feed touches (deletes AND the delete half of updates; a
    * pure insert's id matches nothing in the index), then appends
    * `rowsOf` of the inserted rows under the source version's txn
    * record. Returns the index version after the apply.
    *
    * Crash safety: the ledger guard covers the whole apply; a replay
    * after the retract committed but before the append re-runs the
    * retract (no-op — the rows are already gone and the guarded
    * append has not re-added them) and completes the append. */
  def applyDecomposable(spark: SparkSession, corpus: String,
                        index: String, v: Long, appId: String,
                        idCol: String, buckets: Int = 4)(
      rowsOf: DataFrame => DataFrame): Long = {
    if (TxTable.lastCommittedBatch(index, appId).exists(_ >= v))
      return TxTable.latestVersion(index).getOrElse(0L)
    val feed = TxTable.changes(spark, corpus, v - 1, v)
    TxTable.deleteKeys(spark, index, feed.select(idCol),
      key = idCol, bucketKey = idCol, buckets = buckets)
    val ins = feed.filter(col("_change") === "insert")
    TxTable.appendOnce(rowsOf(ins), index, appId, batchId = v,
      bucketKey = idCol, buckets = buckets)
  }

  /** Create the (empty) postings index table. */
  def initBm25(spark: SparkSession, index: String): Unit =
    init(spark, index, postingsSchemaDdl, "doc_id")

  /** Fold the corpus transition (v−1 → v) into the postings index,
    * exactly once per (appId, v). Returns the index table's version
    * after the apply. */
  def applyBm25(spark: SparkSession, corpus: String, index: String,
                v: Long, appId: String = "graft_bm25_index",
                buckets: Int = 4): Long =
    applyDecomposable(spark, corpus, index, v, appId, "doc_id",
      buckets)(ins => postings(ins.select("doc_id", "text")))

  /** Create the (empty) SimHash fingerprint index table. */
  def initSimhash(spark: SparkSession, index: String): Unit =
    init(spark, index, simhashSchemaDdl, "doc_id")

  /** Fold the corpus transition into the SimHash fingerprint index —
    * the standing near-dup screen state ([[ApproxDedup.simhashOf]]
    * per inserted doc; portable md5-derived fingerprints, so the
    * maintained table is row-level DuckDB-replayable). */
  def applySimhash(spark: SparkSession, corpus: String, index: String,
                   v: Long, appId: String = "graft_simhash_index",
                   buckets: Int = 4): Long =
    applyDecomposable(spark, corpus, index, v, appId, "doc_id",
      buckets)(ins => ApproxDedup.simhashOf(
        ins.select("doc_id", "text")))

  /** The maintained index as a scorable [[Bm25.Index]]: postings
    * from the table's snapshot (head or time-traveled), idf/avgdl
    * recomputed from them — vocabulary-sized aggregates, consistent
    * with the postings by construction. */
  def bm25Index(spark: SparkSession, index: String,
                version: Option[Long] = None): Bm25.Index =
    Bm25.fromPostings(TxTable.read(spark, index, version))

  /** Train and PIN the coarse quantizer on the corpus's current
    * content, storing it as its own (tiny) TxTable so the index is
    * durable end-to-end; create the empty assignment table.
    * Idempotent. Retraining is a REBUILD, not maintenance — a pinned
    * quantizer is what makes incremental assignment exact. */
  def initIvf(spark: SparkSession, corpus: String, index: String,
              centroidsTable: String, nCells: Int = 8,
              kmeansIters: Int = 2): Unit = {
    if (TxTable.latestVersion(centroidsTable).isEmpty) {
      val cents = AnnSearch.trainQuantizer(
        TxTable.read(spark, corpus), nCells, kmeansIters)
      import spark.implicits._
      val df = cents.toSeq.toDF("cell", "embedding")
      require(TxTable.create(df, centroidsTable, bucketKey = "cell",
        buckets = 1) || TxTable.latestVersion(centroidsTable).nonEmpty,
        s"could not initialize centroids table $centroidsTable")
    }
    init(spark, index, ivfSchemaDdl, "vec_id")
  }

  /** The pinned quantizer, loaded back (nCells rows — driver-bounded
    * by construction, like every codebook in [[AnnSearch]]). */
  def loadCentroids(spark: SparkSession,
                    centroidsTable: String): Array[(Int, Seq[Float])] =
    TxTable.read(spark, centroidsTable)
      .select("cell", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1)

  /** ANN top-k SERVED FROM THE MAINTAINED INDEX: the assignment
    * table routes (cell per vec_id), the corpus table supplies the
    * vectors — both TxTables bucketed on vec_id, so the
    * re-attachment join is co-partitioned on a cluster with
    * bucket-aware scans. No per-session re-assignment of the corpus:
    * the session cost is loading nCells centroids. Results are
    * identical to [[AnnSearch.ivfTopK]] over the same content and
    * pinned quantizer (spec-gated). */
  def searchIvf(spark: SparkSession, corpus: String, index: String,
                centroidsTable: String,
                queryPred: org.apache.spark.sql.Column, k: Int = 5,
                nProbe: Int = 2): DataFrame = {
    val cents = loadCentroids(spark, centroidsTable)
    val e = TxTable.read(spark, corpus).select("vec_id", "embedding")
    val assigned = TxTable.read(spark, index)
      .join(e, Seq("vec_id"))
      .select("vec_id", "embedding", "cell")
    AnnSearch.ivfTopKFrom(assigned, e.filter(queryPred), cents, k,
      nProbe)
  }

  /** Fold the corpus transition (v−1 → v) into the IVF assignment
    * index against the pinned centroids, exactly once per
    * (appId, v). Returns the index version after the apply. */
  def applyIvf(spark: SparkSession, corpus: String, index: String,
               centroids: Array[(Int, Seq[Float])], v: Long,
               appId: String = "graft_ivf_index",
               buckets: Int = 4): Long =
    applyDecomposable(spark, corpus, index, v, appId, "vec_id",
      buckets)(ins => AnnSearch.assignCells(
        ins.select("vec_id", "embedding"), centroids)
        .select("vec_id", "cell"))
}
