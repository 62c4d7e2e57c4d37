package graft.streaming

import graft.SparkSpec
import graft.operators.HeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S17: streaming Misra–Gries heavy hitters on `transformWithState`.
  * Like the batch operator, the SUMMARY is split/order-dependent but
  * the guarantee is not: for any micro-batch split, candidates are a
  * superset of the true > n/(k+1) heavy hitters, counters
  * lower-bound true counts within n/(k+1), and candidates + exact
  * recount reproduce the batch `frequent` output exactly.
  * `transformWithState` requires the RocksDB state store, so every
  * test here runs the production provider (serialize/deserialize
  * round-trip of the MapState included).
  */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  /** Zipf-ish corpus: token i appears ~ n/i times. */
  private def corpus(seed: Int): Seq[TokenObs] = {
    val raw = (1 to 24).flatMap(i => Seq.fill(240 / i)(s"tok$i")) ++
      (1 to 300).map(i => s"rare$i")
    new scala.util.Random(seed).shuffle(raw).map(TokenObs("g", _))
  }

  private def exact(rows: Seq[TokenObs]): Map[String, Long] =
    rows.groupBy(_.token).view.mapValues(_.size.toLong).toMap

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Run the monitor over `chunks` micro-batches; return the final
    * (max n_seen) candidate summary. */
  private def streamFinal(rows: Seq[TokenObs], chunks: Int,
                          name: String): Map[String, Long] =
    withRocksDb {
      val parts = rows.grouped((rows.length + chunks - 1) / chunks).toSeq
      val ms = MemoryStream[TokenObs](spark)
      val q = StreamingHeavyHitters.monitor(ms.toDS(), K)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        parts.foreach { p => ms.addData(p); q.processAllAvailable() }
        val all = spark.table(name).as[MgCandidate].collect()
        val last = all.map(_.n_seen).max
        assert(last == rows.length.toLong, "n_seen tracks the stream")
        all.filter(_.n_seen == last).map(c => c.token -> c.mg_count).toMap
      } finally q.stop()
    }

  test("MG guarantee holds for any micro-batch split; candidates + " +
      "recount reproduce the batch frequent() exactly") {
    val rows = corpus(seed = 5)
    val truth = exact(rows)
    val n = rows.length.toLong
    val batchOut = HeavyHitters.frequent(
      rows.map(_.token).toDF("token"), K)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((chunks, tag) <- Seq(1 -> "one", 3 -> "three", 7 -> "seven")) {
      val summary = streamFinal(rows, chunks, s"s17_$tag")
      // bounded state
      assert(summary.size <= K)
      // counters never exceed truth; undercount bounded by n/(k+1)
      summary.foreach { case (t, c) =>
        assert(c <= truth(t), s"$t overcounted")
        assert(truth(t) - c <= n / (K + 1) + 1, s"$t undercount bound")
      }
      // superset screen: every true heavy hitter survives
      val heavy = truth.filter { case (_, c) => c * (K + 1) > n }.keySet
      assert(heavy.subsetOf(summary.keySet), s"split $chunks lost a hitter")
      // exact recount over candidates = the batch operator's output
      val recount = summary.keySet.toSeq
        .map(t => t -> truth(t))
        .filter { case (_, c) => c * (K + 1) > n }.toMap
      assert(recount == batchOut, s"split $chunks recount != batch")
    }
  }

  test("restart from checkpoint resumes the MapState summary") {
    // file source (MemoryStream does not support checkpoint
    // recovery): chunk 1 before the restart, chunk 2 after — the
    // RocksDB MapState must carry n_seen and the counters across.
    withRocksDb {
      import java.nio.file.Files
      val rows = corpus(seed = 11)
      val half = rows.length / 2
      val dir = Files.createTempDirectory("s17_src")
      val ckpt = Files.createTempDirectory("s17_ckpt").toString
      def writeChunk(name: String, rs: Seq[TokenObs]): Unit =
        Files.writeString(dir.resolve(name), rs.map(r =>
          s"""{"group":"${r.group}","token":"${r.token}"}""")
          .mkString("\n"))
      // foreachBatch sink: the memory sink is not fault-tolerant, so
      // a checkpointed query refuses to even START against it — this
      // is the recovery-capable sink shape (same as S13)
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[MgCandidate]()
      def start() = {
        val src = spark.readStream
          .schema(org.apache.spark.sql.Encoders.product[TokenObs].schema)
          .json(dir.toString).as[TokenObs]
        StreamingHeavyHitters.monitor(src, K)
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.Dataset[MgCandidate],
                           _: Long) =>
            df.collect().foreach(emitted.add)
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").start()
      }
      writeChunk("a.json", rows.take(half))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      writeChunk("b.json", rows.drop(half))
      val q2 = start()
      try {
        q2.processAllAvailable()
        // post-restart emissions carry a full-total n_seen, proving
        // the counter state was recovered, not recomputed
        import scala.jdk.CollectionConverters._
        assert(emitted.asScala.map(_.n_seen).max == rows.length.toLong,
          "n_seen survived the restart")
      } finally q2.stop()
    }
  }
}
