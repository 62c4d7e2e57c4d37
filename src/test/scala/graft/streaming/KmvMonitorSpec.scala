package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.PortableSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S16: streaming KMV distribution monitor. The parity here is
  * order-INDEPENDENT (stronger than S15's arrival-order contract):
  * the bottom-K sample is a commutative monoid, so the final state —
  * and therefore the final emitted quantiles — must equal the batch
  * operator's for ANY micro-batch split and any within-batch order.
  */
class KmvMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def obsFrame = Tables.documents(spark, sf)
    .select(col("lang").as("group"),
      col("doc_id").cast("string").as("key"),
      col("n_chars").cast("double").as("v"))

  private def batchEstimates: Map[String, (Long, Double, Double)] =
    PortableSketch.kmvQuantiles(
        PortableSketch.kmvSample(obsFrame, Seq("group"),
          col("key"), col("v")),
        Seq("group"), Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

  private def streamFinal(chunks: Int, seed: Int)
      : Map[String, KmvEstimate] = {
    val rows = obsFrame.as[KmvObs].collect()
    val shuffled = new scala.util.Random(seed).shuffle(rows.toSeq)
    val parts = shuffled.grouped(
      (shuffled.length + chunks - 1) / chunks).toSeq
    val ms = MemoryStream[KmvObs](spark)
    val name = s"s16_parity_${chunks}_$seed"
    val q = KmvMonitor.monitor(ms.toDS(), PortableSketch.K)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      parts.foreach { p => ms.addData(p); q.processAllAvailable() }
      spark.table(name).as[KmvEstimate].collect()
        .groupBy(_.group)
        .map { case (g, es) => g -> es.maxBy(_.n_seen) }
    } finally q.stop()
  }

  test("final stream state reproduces the batch sample's quantiles " +
    "on a shuffled 3-way split") {
    val batch = batchEstimates
    val streamed = streamFinal(chunks = 3, seed = 7)
    val totals = obsFrame.groupBy("group").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (g, e) =>
      assert(e.n_seen == totals(g), s"$g: n_seen")
      assert((e.n_sample, e.p50, e.p90) == batch(g),
        s"$g: stream $e != batch ${batch(g)}")
    }
  }

  test("parity holds for a different split and order (monoid " +
    "merge is split-invariant)") {
    val a = streamFinal(chunks = 2, seed = 1)
    val b = streamFinal(chunks = 5, seed = 99)
    assert(a.view.mapValues(e => (e.n_sample, e.p50, e.p90)).toMap ==
      b.view.mapValues(e => (e.n_sample, e.p50, e.p90)).toMap)
  }

  test("batch parity holds under the RocksDB state store") {
    // Same split-invariance contract, exercised through the
    // serialize/deserialize round-trip a production state store
    // imposes on the (nSeen, hs, vs) sample state.
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = batchEstimates
      val streamed = streamFinal(chunks = 4, seed = 31)
      streamed.foreach { case (g, e) =>
        assert((e.n_sample, e.p50, e.p90) == batch(g),
          s"$g under RocksDB: stream $e != batch ${batch(g)}")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("state stays bounded at K entries however long the stream") {
    // one group, 4 batches of 300 > K = 256: n_sample must cap at K
    val rows = (0 until 1200)
      .map(i => KmvObs("g", s"row$i", (i % 977).toDouble))
    val ms = MemoryStream[KmvObs](spark)
    val q = KmvMonitor.monitor(ms.toDS(), PortableSketch.K)
      .writeStream.format("memory").queryName("s16_bounded")
      .outputMode("update").start()
    try {
      rows.grouped(300).foreach { p =>
        ms.addData(p.toSeq); q.processAllAvailable()
      }
      val es = spark.table("s16_bounded").as[KmvEstimate].collect()
      assert(es.map(_.n_seen).max == 1200L)
      assert(es.forall(_.n_sample <= PortableSketch.K))
      assert(es.maxBy(_.n_seen).n_sample == PortableSketch.K)
    } finally q.stop()
  }
}
