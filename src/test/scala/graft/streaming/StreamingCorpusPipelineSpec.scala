package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.firehose.FirehoseFixture
import graft.sources.TxTable

/** S26 — the reference pipeline to TxTable, end-to-end: decode +
  * quality gate + duplicate screen + exactly-once commits, under
  * restart, forced mid-batch crash replay, and cross-file
  * redelivery. The q_pipeline_streaming key hash-gates the same run
  * against the DuckDB generator replay; this spec covers what the
  * gate cannot: crash injection and fold-equals-direct. */
class StreamingCorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), p).toString

  /** Expected kept events per the fixture contract: blocks 10–14,
    * noise (e≡3 mod 4) gated, block 10's redelivery deduped. */
  private val expected: Set[String] = Seq(
    (10, 3), (11, 4), (12, 5), (13, 2), (14, 3)).flatMap {
    case (b, n) => (0 until n).filter(_ % 4 != 3).map(e => s"ev-$b-$e")
  }.toSet

  private def run(staging: String, table: String, cp: String): Unit = {
    val q = StreamingCorpusPipeline.start(
      spark, staging, table, cp, appId = "s26_spec")
    try q.awaitTermination() finally q.stop()
  }

  private def ids(table: String): Set[String] =
    TxTable.read(spark, table).select("id").as[String].collect().toSet

  test("end-to-end: gate drops noise, dedup absorbs the redelivered " +
      "block, one version per file, fold == direct at every version") {
    val (staging, table, cp) =
      (tmp("s26_stage_"), tmp("s26_tbl_"), tmp("s26_cp_"))
    FirehoseFixture.writeStreaming(new java.io.File(staging))
    run(staging, table, cp)
    assert(TxTable.latestVersion(table).contains(5L),
      "create + one commit per staged file")
    assert(ids(table) == expected,
      s"content diverged: ${ids(table).toSeq.sorted}")
    // not one copy of the redelivered block leaked into v4's commit
    val v4feed = TxTable.changes(spark, table, 3L, 4L)
      .select("id").as[String].collect().toSet
    assert(v4feed == Set("ev-13-0", "ev-13-1"),
      s"redelivery must contribute nothing: $v4feed")
    // IVM fold over the feed == direct per-version reads
    (1L to 5L).foreach { v =>
      val direct = TxTable.read(spark, table, Some(v)).count()
      val folded = (1L to v).map(k =>
        TxTable.changes(spark, table, k - 1, k)
          .filter($"_change" === "insert").count()).sum
      assert(direct == folded, s"fold != direct at v$v: $folded/$direct")
    }
    // time travel into the ingest history
    assert(TxTable.read(spark, table, Some(2L)).count() == 6L)
  }

  test("forced Bloom saturation: the manifest-sized prescreen " +
      "rebuilds when committed rows cross capacity, keeps " +
      "no-false-negatives (zero duplicates), and the residue stays " +
      "bounded") {
    val (staging, table, cp) =
      (tmp("s26b_stage_"), tmp("s26b_tbl_"), tmp("s26b_cp_"))
    FirehoseFixture.writeStreaming(new java.io.File(staging))
    val diag = new StreamingCorpusPipeline.PipelineDiag
    // bloomMinCapacity = 2: the filter starts sized for 2 ids, and
    // every commit (6, then 4, ... kept events) drives committed
    // rows past capacity — each batch forces the saturation path
    val q = StreamingCorpusPipeline.start(spark, staging, table, cp,
      appId = "s26_bloom_spec", bloomMinCapacity = 2L,
      diag = Some(diag))
    try q.awaitTermination() finally q.stop()
    assert(diag.bloomRebuilds.get() >= 2L,
      s"forced saturation must rebuild: ${diag.bloomRebuilds.get()}")
    // no false negatives at any fill level: an existing id must never
    // classify "definitely new" — which would re-append it. Content
    // must therefore be EXACTLY the expected set, no duplicates.
    assert(ids(table) == expected,
      "saturated/rebuilt prescreen lost or duplicated events")
    val n = TxTable.read(spark, table).count()
    assert(n == expected.size.toLong,
      s"duplicate rows under saturation: $n != ${expected.size}")
    // residue bound: the maybe-class can never exceed the total
    // gated volume (14 kept + 3 redelivered = 17); a rebuilt,
    // rightly-sized filter keeps it at redeliveries + fpp noise
    assert(diag.residueRows.get() <= 17L,
      s"residue exceeded the gated volume: ${diag.residueRows.get()}")
    // the post-run filter is sized from the head manifest's O(1)
    // row count — present for every commit this pipeline wrote
    assert(TxTable.snapshot(table).get.totalRows.contains(
      expected.size.toLong))
  }

  test("batch/stream quality-verdict parity: the streaming gate IS " +
      "the shared QualityRules tree at log-event tuning") {
    import org.apache.spark.sql.functions._
    val msgs = Seq(
      "line 0 of block 10",            // keep
      "noise3",                        // too few words
      "a b " + "x" * 200,              // mean word len out of band
      Seq.fill(300)("w").mkString(" ") // too many words
    ).toDF("message")
    val gate = msgs.filter(StreamingCorpusPipeline.qualityKeep)
      .as[String].collect().toSeq
    val batch = msgs.filter(graft.operators.QualityRules.keeps(
        col("message"), graft.operators.QualityRules.LogEventProfile))
      .as[String].collect().toSeq
    assert(gate == batch, "stream gate must equal the batch tree")
    assert(gate == Seq("line 0 of block 10"),
      s"log profile verdicts off: $gate")
  }

  test("restart resumes from the checkpoint; a forced replay of the " +
      "last micro-batch commits nothing twice") {
    val (staging, table, cp) =
      (tmp("s26r_stage_"), tmp("s26r_tbl_"), tmp("s26r_cp_"))
    // stage only the first two files, drain, then stage the rest
    val full = tmp("s26r_full_")
    FirehoseFixture.writeStreaming(new java.io.File(full))
    def stage(name: String): Unit =
      Files.copy(Paths.get(full, name), Paths.get(staging, name),
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    stage("f1.gz"); stage("f2.log")
    run(staging, table, cp)
    assert(TxTable.latestVersion(table).contains(3L))
    stage("f3.gz"); stage("f4.gz.gz")
    run(staging, table, cp)
    assert(TxTable.latestVersion(table).contains(5L))
    assert(ids(table) == expected, "restart lost or duplicated events")

    // crash injection: drop the newest checkpoint commit marker — the
    // restarted query re-delivers its final micro-batch; appendOnce
    // must no-op it (no new version, no duplicate rows)
    val commits = Paths.get(cp, "commits")
    val names = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    Files.list(commits).iterator().forEachRemaining(p =>
      if (!p.getFileName.toString.startsWith(".")) names += p)
    val victim = names.maxBy(_.getFileName.toString.toLong)
    Files.delete(victim)
    Files.deleteIfExists(
      commits.resolve(s".${victim.getFileName.toString}.crc"))
    val versBefore = TxTable.latestVersion(table).get
    run(staging, table, cp)
    assert(TxTable.latestVersion(table).get == versBefore,
      "replayed micro-batch must not commit a new version")
    assert(ids(table) == expected,
      "replayed micro-batch must not duplicate or lose events")
  }
}
