package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.TxTable

/** S25 — streaming CDC tail of a [[TxTable]]: the manifest log IS
  * the stream. Every committed version is one immutable JSON file
  * published into `_txlog/` by an atomic hard link, so a plain file
  * source globbing `_txlog/v*.json` observes commits exactly once,
  * in publish order, with no coordinator and no extra writes — the
  * public "table as a stream" idea (a streaming source over a
  * transaction log), derived from nothing but the commit log this
  * table already keeps. Temp files never match the glob, and a
  * half-published manifest cannot exist (the link either landed or
  * it didn't).
  *
  * Each micro-batch maps its newly-seen manifests to per-version
  * CHANGE FEEDS ([[TxTable.changes]] (v−1, v); version 0 is the
  * empty table, so the create commit streams as pure inserts) and
  * folds every feed into ONE signed delta row — count / char / id
  * sums weighted +1 per insert, −1 per delete — landed in a result
  * TxTable through [[TxTable.appendOnce]] keyed by the SOURCE
  * version as the transaction batch id. That makes maintenance
  * exactly-once per source commit even across crash replays and
  * regardless of how the file source groups manifests into
  * micro-batches: a replayed version finds its txn record and
  * no-ops. The maintained aggregate at any moment is the SUM of the
  * delta table — `q_corpus_ivm`'s fold, running online; a
  * compaction commit folds a zero row (its feed is empty by the
  * manifest diff), so maintenance jobs never perturb consumers.
  *
  * Scale: per source commit the work is that commit's churn (the
  * feed) plus one metadata CAS on the delta table; no executor-
  * memory state, no snapshot rescan — the 100 TB corpus-stats job
  * as a standing stream.
  */
object StreamingTxFeed {

  /** Schema of the maintained per-version delta table. */
  val deltaSchemaDdl: String =
    "version BIGINT,d_docs BIGINT,d_chars BIGINT,d_ids BIGINT"

  /** One signed delta row for `table`'s transition (v−1 → v),
    * computed batch-side from the change feed. */
  def deltaRow(spark: SparkSession, table: String, v: Long): DataFrame = {
    val isIns = col("_change") === "insert"
    val sign = when(isIns, 1L).otherwise(-1L)
    TxTable.changes(spark, table, v - 1, v)
      .agg(coalesce(sum(sign), lit(0L)).as("d_docs"),
        coalesce(sum(sign * length(col("text")).cast("long")), lit(0L))
          .as("d_chars"),
        coalesce(sum(sign * col("doc_id")), lit(0L)).as("d_ids"))
      .select(lit(v).as("version"), col("d_docs"), col("d_chars"),
        col("d_ids"))
  }

  /** Tail `table`'s commit log and maintain the per-version delta
    * table at `deltaTable` (created on first use), exactly once per
    * source version. */
  def start(spark: SparkSession, table: String, deltaTable: String,
            appId: String, checkpoint: String): StreamingQuery = {
    if (TxTable.latestVersion(deltaTable).isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(deltaSchemaDdl))
      require(TxTable.create(empty, deltaTable, bucketKey = "version",
        buckets = 1) || TxTable.latestVersion(deltaTable).nonEmpty,
        s"could not initialize delta table $deltaTable")
    }
    val manifests = spark.readStream.text(s"$table/_txlog/v*.json")
    manifests.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val versions = batch
          .select(regexp_extract(col("value"), """"version":(\d+)""", 1)
            .cast("long").as("v"))
          .where(col("v").isNotNull)
          .collect().map(_.getLong(0)).sorted
        // ascending order keeps appendOnce's high-water mark exact;
        // versions is O(commits in this batch) — metadata-sized
        for (v <- versions)
          TxTable.appendOnce(deltaRow(spark, table, v), deltaTable,
            appId, batchId = v, bucketKey = "version", buckets = 1)
        ()
      }
      .start()
  }

  /** The maintained aggregate: fold of every delta committed so far
    * (read from the delta table's current snapshot). */
  def maintained(spark: SparkSession, deltaTable: String): DataFrame =
    TxTable.read(spark, deltaTable)
      .agg(coalesce(sum(col("d_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("d_chars")), lit(0L)).as("n_chars"),
        coalesce(sum(col("d_ids")), lit(0L)).as("sum_ids"))
}
