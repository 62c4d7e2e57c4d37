package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.TxTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** S24: exactly-once transactional streaming ingest into TxTable.
  * File source + foreachBatch (MemoryStream refuses checkpoint
  * recovery); replay is forced by deleting the checkpoint's last
  * commit marker, which makes the restarted query re-deliver its
  * final micro-batch — the sink must no-op it. */
class StreamingTxSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), prefix).toString

  // the file STREAM source lists top-level files only — land each
  // input as one flat parquet file in the watched dir
  private def writeInput(dir: String, name: String, ids: Seq[Long]): Unit = {
    val stage = tmp("s24_stage_")
    ids.map(i => (i, s"t$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).iterator()
    var moved = false
    part.forEachRemaining { p =>
      if (p.getFileName.toString.endsWith(".parquet")) {
        Files.move(p, Paths.get(dir, s"$name.parquet")); moved = true
      }
    }
    assert(moved, s"no parquet part produced under $stage")
  }

  private def runOnce(in: String, table: String, cp: String): Unit = {
    val q = StreamingTxSink.start(
      spark.readStream.schema(schema).parquet(in),
      table, appId = "s24_spec", checkpoint = cp)
    try q.processAllAvailable() finally q.stop()
  }

  private def tableIds(table: String): Seq[Long] =
    TxTable.read(spark, table).select("doc_id").as[Long]
      .collect().sorted.toSeq

  test("restart resumes; a forced replay of the last micro-batch " +
      "commits nothing twice; concurrent batch writers interleave") {
    val (in, table, cp) = (tmp("s24_in_"), tmp("s24_tbl_"), tmp("s24_cp_"))
    assert(TxTable.create(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), table))

    writeInput(in, "f1", Seq(1L, 2L))
    runOnce(in, table, cp)
    assert(tableIds(table) == Seq(1L, 2L))

    // a concurrent NON-streaming writer lands between micro-batches
    TxTable.append(Seq((50L, "t50")).toDF("doc_id", "text"), table)

    writeInput(in, "f2", Seq(3L))
    runOnce(in, table, cp)
    assert(tableIds(table) == Seq(1L, 2L, 3L, 50L),
      "stream commits must rebase over the concurrent append")

    // force replay: drop the newest checkpoint commit marker — the
    // restarted query re-delivers the f2 micro-batch to the sink
    val commits = Paths.get(cp, "commits")
    val newest = Files.list(commits).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    newest.forEachRemaining(p => if (!p.getFileName.toString
      .startsWith(".")) names += p)
    val victim = names.maxBy(_.getFileName.toString.toLong)
    Files.delete(victim)
    // the checksum FS keeps a .N.crc shadow — with it left behind,
    // the restarted query's re-commit rename fails
    Files.deleteIfExists(
      commits.resolve(s".${victim.getFileName.toString}.crc"))
    val versBefore = TxTable.latestVersion(table).get
    runOnce(in, table, cp)
    assert(tableIds(table) == Seq(1L, 2L, 3L, 50L),
      "replayed micro-batch must not duplicate rows")
    assert(TxTable.latestVersion(table).get == versBefore,
      "replayed micro-batch must not commit a new version")
    // the per-app high-water mark reflects the two real batches
    assert(TxTable.lastCommittedBatch(table, "s24_spec").contains(1L))
    // ingest history is pinnable: version 2 (first micro-batch) is
    // still exactly {1, 2}
    assert(TxTable.read(spark, table, Some(2L)).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
