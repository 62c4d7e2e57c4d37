package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.TxTable
import org.apache.spark.sql.functions._

/** S25: streaming CDC tail of the TxTable commit log. The manifest
  * log is the stream (file source over `_txlog/v*.json`); every
  * source version folds to exactly one delta row in the maintained
  * table, across micro-batch grouping, restarts AND a forced replay
  * (checkpoint commit-marker deletion, the S24 recipe). The
  * maintained fold must equal the direct head aggregate at every
  * point — q_corpus_ivm online. */
class StreamingTxFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), prefix).toString

  private def docs(ids: Long*) =
    ids.map(i => (i, s"t$i")).toDF("doc_id", "text")

  private def runOnce(table: String, delta: String, cp: String): Unit = {
    val q = StreamingTxFeed.start(spark, table, delta,
      appId = "s25_spec", checkpoint = cp)
    try q.processAllAvailable() finally q.stop()
  }

  private def deltaVersions(delta: String): Seq[Long] =
    TxTable.read(spark, delta).select("version").as[Long]
      .collect().sorted.toSeq

  private def direct(table: String): (Long, Long, Long) =
    TxTable.read(spark, table)
      .agg(count(lit(1)), coalesce(sum(length(col("text"))
        .cast("long")), lit(0L)), coalesce(sum(col("doc_id")), lit(0L)))
      .as[(Long, Long, Long)].head()

  private def maintained(delta: String): (Long, Long, Long) =
    StreamingTxFeed.maintained(spark, delta)
      .as[(Long, Long, Long)].head()

  test("exactly one delta row per source version across batching, " +
      "replay and restart; maintained fold == direct head aggregate") {
    val (table, delta, cp) = (tmp("s25_tbl_"), tmp("s25_dlt_"),
      tmp("s25_cp_"))
    assert(TxTable.create(docs(1L, 2L), table))          // v1
    runOnce(table, delta, cp)
    assert(deltaVersions(delta) == Seq(1L))
    assert(maintained(delta) == direct(table))

    TxTable.append(docs(3L), table)                      // v2
    TxTable.merge(spark, table,                          // v3
      Seq((1L, "t1-new"), (5L, "t5")).toDF("doc_id", "text"))
    runOnce(table, delta, cp)                            // one batch, 2 versions
    assert(deltaVersions(delta) == Seq(1L, 2L, 3L))
    assert(maintained(delta) == direct(table))

    assert(TxTable.compact(spark, table, buckets = 1).contains(4L))
    runOnce(table, delta, cp)
    assert(deltaVersions(delta) == Seq(1L, 2L, 3L, 4L))
    // the compaction delta is a ZERO row — maintenance is invisible
    val z = TxTable.read(spark, delta)
      .filter(col("version") === 4L)
      .select("d_docs", "d_chars", "d_ids")
      .as[(Long, Long, Long)].head()
    assert(z == ((0L, 0L, 0L)), s"compaction delta must be zero: $z")
    assert(maintained(delta) == direct(table))

    // forced replay: drop the newest checkpoint commit marker (and
    // its .crc shadow) so the restarted query re-delivers its last
    // micro-batch — appendOnce must no-op every replayed version
    val commits = Paths.get(cp, "commits")
    val names = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    val it = Files.list(commits).iterator()
    it.forEachRemaining(p =>
      if (!p.getFileName.toString.startsWith(".")) names += p)
    val victim = names.maxBy(_.getFileName.toString.toLong)
    Files.delete(victim)
    Files.deleteIfExists(
      commits.resolve(s".${victim.getFileName.toString}.crc"))
    val before = TxTable.latestVersion(delta).get
    runOnce(table, delta, cp)
    assert(deltaVersions(delta) == Seq(1L, 2L, 3L, 4L),
      "replay must not duplicate any version's delta")
    assert(TxTable.latestVersion(delta).get == before,
      "replayed versions must not commit new delta versions")

    // life goes on after the replay: a fresh commit streams through
    TxTable.append(docs(7L), table)                      // v5
    runOnce(table, delta, cp)
    assert(deltaVersions(delta) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(maintained(delta) == direct(table))
  }
}
