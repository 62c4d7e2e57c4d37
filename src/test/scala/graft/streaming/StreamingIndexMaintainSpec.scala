package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.operators.Bm25
import graft.sources.TxTable
import org.apache.spark.sql.functions._

/** S27: live BM25 index maintenance off the streamed commit log.
  * After every stream drain the maintained postings table must equal
  * the from-scratch build over the corpus head — across micro-batch
  * groupings, restarts, a FORCED replay (checkpoint commit-marker
  * deletion, the S24/S25 recipe), and maintenance commits
  * (compaction folds zero). */
class StreamingIndexMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), prefix).toString

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def runOnce(corpus: String, index: String, cp: String): Unit = {
    val q = StreamingIndexMaintain.start(spark, corpus, index,
      appId = "s27_spec", checkpoint = cp)
    try q.processAllAvailable() finally q.stop()
  }

  private def maintained(index: String): Set[(Long, String, Long, Long)] =
    TxTable.read(spark, index).select("doc_id", "term", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().toSet

  private def rebuilt(corpus: String): Set[(Long, String, Long, Long)] =
    Bm25.postings(TxTable.read(spark, corpus).select("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect().toSet

  test("streamed maintenance tracks the corpus exactly across " +
      "commits, restarts and a forced checkpoint replay") {
    val (corpus, index, cp) = (tmp("s27_c_"), tmp("s27_i_"), tmp("s27_cp_"))
    assert(TxTable.create(docs(1L -> "a b", 2L -> "b c"), corpus))
    runOnce(corpus, index, cp)
    assert(maintained(index) == rebuilt(corpus))

    // several commits in ONE micro-batch: append + update + delete
    TxTable.append(docs(3L -> "c d"), corpus)                  // v2
    TxTable.merge(spark, corpus, docs(1L -> "a REPLACED"))     // v3
    assert(TxTable.delete(spark, corpus, col("doc_id") === 2L) == 4L)
    runOnce(corpus, index, cp)
    assert(maintained(index) == rebuilt(corpus))
    assert(maintained(index).filter(_._1 == 1L).map(_._2) ==
      Set("a", "REPLACED"))
    assert(maintained(index).forall(_._1 != 2L))

    // compaction folds zero: content unchanged
    assert(TxTable.compact(spark, corpus).contains(5L))
    val before = maintained(index)
    runOnce(corpus, index, cp)
    assert(maintained(index) == before)

    // forced replay: drop the newest checkpoint commit marker so the
    // restarted query re-delivers its last micro-batch — the ledger
    // guard must no-op every replayed version
    val commits = Paths.get(cp, "commits")
    val names = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    Files.list(commits).iterator().forEachRemaining(p =>
      if (!p.getFileName.toString.startsWith(".")) names += p)
    val victim = names.maxBy(_.getFileName.toString.toLong)
    Files.delete(victim)
    Files.deleteIfExists(
      commits.resolve(s".${victim.getFileName.toString}.crc"))
    val vBefore = TxTable.latestVersion(index).get
    runOnce(corpus, index, cp)
    assert(maintained(index) == rebuilt(corpus),
      "replay must not perturb the maintained index")
    assert(TxTable.latestVersion(index).get == vBefore,
      "replayed versions must not commit new index versions")

    // life goes on: a fresh commit streams through
    TxTable.append(docs(9L -> "z z z"), corpus)                // v6
    runOnce(corpus, index, cp)
    assert(maintained(index) == rebuilt(corpus))
    assert(maintained(index).exists(p => p._1 == 9L && p._3 == 3L))
  }

  test("the PQ code-table fold rides the same streamed tail: " +
      "maintained codes equal the pinned-artifact re-encode across " +
      "commits and a restart") {
    import graft.operators.{AnnSearch, IncrementalIndex}
    val (corpus, index, cents, books, cp) = (tmp("s27p_c_"),
      tmp("s27p_i_"), tmp("s27p_k_"), tmp("s27p_b_"), tmp("s27p_cp_"))
    def vecs(ids: Long*) =
      ids.map(i => (i, Seq.tabulate(64)(j =>
        math.sin(i * 2.3 + j * 0.7).toFloat))).toDF("vec_id", "embedding")
    assert(TxTable.create(vecs(0L to 9L: _*), corpus,
      bucketKey = "vec_id"))
    IncrementalIndex.initPq(spark, corpus, index, cents, books,
      nCells = 2, kmeansIters = 1, m = 8, codesPerSub = 4, dim = 64,
      pqIters = 1)
    val idx = IncrementalIndex.loadPqIndex(spark, cents, books)
    def runPq(): Unit = {
      val q = StreamingIndexMaintain.startPq(spark, corpus, index,
        cents, books, appId = "s27_pq", checkpoint = cp, m = 8,
        dim = 64)
      try q.processAllAvailable() finally q.stop()
    }
    def codes(): Set[(Long, Int, Seq[Byte])] =
      TxTable.read(spark, index).select("vec_id", "cell", "codes")
        .as[(Long, Int, Seq[Byte])].collect().toSet
    def reencoded(): Set[(Long, Int, Seq[Byte])] =
      AnnSearch.encodeIvfPq(TxTable.read(spark, corpus), idx,
        m = 8, dim = 64)
        .as[(Long, Int, Seq[Byte])].collect().toSet
    runPq()
    assert(codes() == reencoded())
    TxTable.append(vecs(10L to 14L: _*), corpus, bucketKey = "vec_id")
    assert(TxTable.deleteKeys(spark, corpus, Seq(3L, 11L).toDF("vec_id"),
      key = "vec_id", bucketKey = "vec_id") == 3L)
    runPq()
    assert(codes() == reencoded())
    assert(!codes().exists(c => c._1 == 3L || c._1 == 11L))
    // restart with the same checkpoint: nothing re-applies
    val vBefore = TxTable.latestVersion(index).get
    runPq()
    assert(TxTable.latestVersion(index).get == vBefore)
    assert(codes() == reencoded())
  }

  test("live MinHash band + SimHash fingerprint maintainers track " +
      "the corpus exactly (batch-fold parity), survive a forced " +
      "checkpoint replay, and serve the near-dup screen mid-stream") {
    import graft.operators.{ApproxDedup, IncrementalIndex}
    val (corpus, mIdx, sIdx, mCp, sCp) = (tmp("s27m_c_"), tmp("s27m_i_"),
      tmp("s27s_i_"), tmp("s27m_cp_"), tmp("s27s_cp_"))
    assert(TxTable.create(docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "sphinx of black quartz judge my vow"), corpus))
    def runBoth(): Unit = {
      val qm = StreamingIndexMaintain.startMinhash(spark, corpus, mIdx,
        appId = "s27_mh", checkpoint = mCp)
      val qs = StreamingIndexMaintain.startSimhash(spark, corpus, sIdx,
        appId = "s27_sh", checkpoint = sCp)
      try { qm.processAllAvailable(); qs.processAllAvailable() }
      finally { qm.stop(); qs.stop() }
    }
    def bands(): Set[(Long, Int, Long)] =
      TxTable.read(spark, mIdx).select("doc_id", "band_idx", "band_hash")
        .as[(Long, Int, Long)].collect().toSet
    def bandsRebuilt(): Set[(Long, Int, Long)] =
      IncrementalIndex.minhashBandRows(
        TxTable.read(spark, corpus).select("doc_id", "text"))
        .select("doc_id", "band_idx", "band_hash")
        .as[(Long, Int, Long)].collect().toSet
    def prints(): Set[(Long, Long)] =
      TxTable.read(spark, sIdx).select("doc_id", "simhash")
        .as[(Long, Long)].collect().toSet
    def printsRebuilt(): Set[(Long, Long)] =
      ApproxDedup.simhashOf(
        TxTable.read(spark, corpus).select("doc_id", "text"))
        .select("doc_id", "simhash")
        .as[(Long, Long)].collect().toSet

    runBoth()
    assert(bands() == bandsRebuilt(), "minhash batch-fold parity")
    assert(prints() == printsRebuilt(), "simhash batch-fold parity")

    // the maintained band state serves the ingest-time screen: a
    // near-duplicate of doc 1 routes through standing bands
    val probe = Seq(100L ->
      "the quick brown fox jumps over the lazy cat")
      .toDF("doc_id", "text")
    val hits = IncrementalIndex.screenMinhash(spark, corpus, mIdx,
      probe, threshold = 0.3)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(hits.contains((100L, 1L)),
      s"screen must flag the near-dup against standing state: $hits")

    // churn: update doc 2, delete doc 1; both indexes follow
    TxTable.merge(spark, corpus,
      docs(2L -> "a completely different payload now"))
    TxTable.delete(spark, corpus, col("doc_id") === 1L)
    runBoth()
    assert(bands() == bandsRebuilt(), "parity after update+delete")
    assert(prints() == printsRebuilt())
    assert(!bands().exists(_._1 == 1L) && !prints().exists(_._1 == 1L))
    // the retracted doc no longer screens — takedowns reach the
    // standing dedup state at stream latency
    val hitsAfter = IncrementalIndex.screenMinhash(spark, corpus, mIdx,
      probe, threshold = 0.3)
      .select("corpus_id").as[Long].collect().toSet
    assert(!hitsAfter.contains(1L),
      "deleted doc must leave the standing screen")

    // forced replay on the minhash tail: drop the newest commit
    // marker; the ledger no-ops every replayed version
    val commits = Paths.get(mCp, "commits")
    val names = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    Files.list(commits).iterator().forEachRemaining(p =>
      if (!p.getFileName.toString.startsWith(".")) names += p)
    val victim = names.maxBy(_.getFileName.toString.toLong)
    Files.delete(victim)
    Files.deleteIfExists(
      commits.resolve(s".${victim.getFileName.toString}.crc"))
    val vBefore = TxTable.latestVersion(mIdx).get
    runBoth()
    assert(bands() == bandsRebuilt(),
      "replay must not perturb the maintained bands")
    assert(TxTable.latestVersion(mIdx).get == vBefore,
      "replayed versions must not commit new index versions")
  }
}
