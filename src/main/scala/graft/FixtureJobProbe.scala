package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnSearch, ApproxDedup, Bm25, IncrementalIndex}
import graft.sources.TxTable

/** Diagnostic main: replays the two heavy maintained-index fixtures
  * (IndexQueries.docFixture / vecFixture) step by step through the
  * same public API and prints the Spark-job delta per step — the
  * per-job floor is what the driver host amplifies, so build_sec
  * cuts are planned against this breakdown.
  *
  * Usage: runMain graft.FixtureJobProbe <sfDir>
  */
object FixtureJobProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def step[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      // listener delivery is async; small settle for accurate deltas
      Thread.sleep(150)
      println(f"$name%-34s jobs=${jobs.get() - j0}%3d sec=${(System.nanoTime() - t0) / 1e9}%6.2f")
      r
    }
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")), p)
      .toString
    val s = spark

    println("=== docFixture replay ===")
    val (corpus, bm25, simhash, minhash) = (tmp("jp_corp_"),
      tmp("jp_post_"), tmp("jp_sh_"), tmp("jp_mh_"))
    val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
    step("create v1")(TxTable.create(
      docs.filter(col("doc_id") % 3 === 0), corpus))
    step("append v2")(TxTable.append(
      docs.filter(col("doc_id") % 3 === 1), corpus))
    val updates = docs.filter(col("doc_id") % 6 === 0)
      .select(col("doc_id"), col("lang"),
        concat(col("text"), lit(" v3")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 3 === 2 &&
        col("doc_id") < 60))
    step("merge v3")(TxTable.merge(s, corpus, updates))
    step("delete v4")(TxTable.delete(s, corpus,
      col("lang") === "de" || col("doc_id") % 7 === 3))
    step("compact v5")(TxTable.compact(s, corpus))
    step("init x3")(Seq(IncrementalIndex.initBm25(s, bm25),
      IncrementalIndex.initSimhash(s, simhash),
      IncrementalIndex.initMinhash(s, minhash)))
    val folds: Seq[(String, String, String, DataFrame => DataFrame)] =
      Seq(
        (bm25, "graft_bm25_index", "doc_id",
          ins => Bm25.postings(ins.select("doc_id", "text"))),
        (simhash, "graft_simhash_index", "doc_id",
          ins => ApproxDedup.simhashOf(ins.select("doc_id", "text"))),
        (minhash, "graft_minhash_index", "doc_id",
          ins => IncrementalIndex.minhashBandRows(
            ins.select("doc_id", "text"))))
    val feeds = step("feedRange 1-5")(
      IncrementalIndex.feedRange(s, corpus, 1L, 5L))
    for (v <- 1L to 5L)
      step(s"applyMany v$v (bm25 only)")(
        IncrementalIndex.applyMany(s, corpus, v, folds.take(1),
          feedOpt = Some(feeds(v))))
    step("netted catch-up (sh+mh)")(
      IncrementalIndex.applyManyNetted(s, corpus, 0L, 5L,
        folds.drop(1)))
    val head = step("head checkpoint")(
      TxTable.read(s, corpus).select("doc_id", "text")
        .localCheckpoint(true))
    step("gate bm25")(
      TxTable.read(s, bm25).count() + Bm25.postings(head).count())
    println("=== vecFixture replay ===")
    val (vcorp, ivf, pq) =
      (tmp("jp_vcorp_"), tmp("jp_ivf_"), tmp("jp_pq_"))
    val (cents, books) = (tmp("jp_cent_"), tmp("jp_book_"))
    val e = Tables.embeddings(s, d).filter(col("vec_id") < 300)
      .select("vec_id", "embedding")
    step("v create")(TxTable.create(
      e.filter(col("vec_id") % 3 === 0), vcorp, bucketKey = "vec_id"))
    step("initIvf (train k=8 i=1)")(IncrementalIndex.initIvf(
      s, vcorp, ivf, cents, nCells = 8, kmeansIters = 1))
    val quant = step("loadCentroids")(
      IncrementalIndex.loadCentroids(s, cents))
    step("initPq (m=8)")(IncrementalIndex.initPq(
      s, vcorp, pq, cents, books, nCells = 8, kmeansIters = 1,
      m = 8, codesPerSub = 16, dim = 64, pqIters = 1,
      coarse = Some(quant)))
    val pqIdx = step("loadPqIndex")(
      IncrementalIndex.loadPqIndex(s, cents, books))
    step("v append")(TxTable.append(
      e.filter(col("vec_id") % 3 === 1), vcorp, bucketKey = "vec_id"))
    step("v deleteKeys")(TxTable.deleteKeys(s, vcorp,
      e.filter(col("vec_id") % 5 === 0).select("vec_id"),
      key = "vec_id", bucketKey = "vec_id"))
    step("v compact")(TxTable.compact(s, vcorp, bucketKey = "vec_id"))
    val vfolds: Seq[(String, String, String, DataFrame => DataFrame)] =
      Seq(
        (ivf, "graft_ivf_index", "vec_id",
          ins => AnnSearch.assignCells(
            ins.select("vec_id", "embedding"), quant)
            .select("vec_id", "cell")),
        (pq, "graft_pq_index", "vec_id",
          ins => AnnSearch.encodeIvfPq(
            ins.select("vec_id", "embedding"), pqIdx, m = 8)))
    val vfeeds = step("v feedRange 1-4")(
      IncrementalIndex.feedRange(s, vcorp, 1L, 4L))
    for (v <- 1L to 4L)
      step(s"v applyMany v$v (2 folds)")(
        IncrementalIndex.applyMany(s, vcorp, v, vfolds,
          feedOpt = Some(vfeeds(v))))
    println(s"TOTAL jobs=${jobs.get()}")
    spark.stop()
  }
}
