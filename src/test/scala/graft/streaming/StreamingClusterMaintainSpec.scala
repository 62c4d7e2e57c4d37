package graft.streaming

import graft.SparkSpec
import graft.operators.ConnectedComponents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S19: streaming cluster maintenance — arriving near-dup edges get
  * live component labels from a per-shard union-find in RocksDB
  * state. The contract: after any micro-batch split and any arrival
  * order, every doc's final label equals the batch
  * [[ConnectedComponents]] assignment (min reachable id) over the
  * same edge set. Labels only ever DECREASE (min-root merging), so
  * "final label" = min emitted label per doc — no batch ordering
  * needed to read the memory sink.
  */
class StreamingClusterMaintainSpec extends SparkSpec {
  import spark.implicits._

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

  /** Seeded fixture: 120 docs registering via self-edges, plus a
    * near-dup pair set forming chains, triangles and big stars —
    * multi-hop merges across micro-batches are the point. */
  private def fixture(seed: Int): Seq[EdgeObs] = {
    val rnd = new scala.util.Random(seed)
    val regs = (0L until 120L).map(d => EdgeObs("s", d, d))
    val pairs = Seq.newBuilder[EdgeObs]
    // chains of 4: 0-1-2-3, 8-9-10-11, ... (merge order matters)
    for (base <- 0L until 120L by 8; i <- 0L until 3L)
      pairs += EdgeObs("s", base + i, base + i + 1)
    // long-range links joining some chains into bigger components
    for (_ <- 1 to 10) {
      val (a, b) = (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
      pairs += EdgeObs("s", a, b)
    }
    rnd.shuffle(regs ++ pairs.result())
  }

  private def batchLabels(edges: Seq[EdgeObs]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e.a, e.b)).distinct.toDF("id")
    val pairs = edges.filter(e => e.a != e.b)
      .map(e => (e.a, e.b)).toDF("src", "dst")
    ConnectedComponents.components(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def streamLabels(edges: Seq[EdgeObs], chunks: Int,
                           name: String): Map[Long, Long] =
    withRocksDb {
      val parts = edges.grouped((edges.length + chunks - 1) / chunks).toSeq
      val ms = MemoryStream[EdgeObs](spark)
      val q = StreamingClusterMaintain.assign(ms.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        parts.foreach { p => ms.addData(p); q.processAllAvailable() }
        spark.table(name).as[ClusterAssign].collect()
          .groupBy(_.doc_id)
          .view.mapValues(_.map(_.label).min).toMap
      } finally q.stop()
    }

  test("final labels equal batch connected components for any " +
      "micro-batch split and arrival order") {
    for ((seed, chunks) <- Seq((3, 1), (3, 4), (3, 9), (17, 5))) {
      val edges = fixture(seed)
      val expected = batchLabels(edges)
      val got = streamLabels(edges, chunks, s"s19_${seed}_$chunks")
      assert(got == expected,
        s"seed=$seed chunks=$chunks: streaming labels diverged " +
          s"(${got.toSet.diff(expected.toSet).take(5)} ...)")
    }
  }

  test("singletons keep their own id; labels only decrease over the " +
      "stream") {
    withRocksDb {
      val ms = MemoryStream[EdgeObs](spark)
      val q = StreamingClusterMaintain.assign(ms.toDS())
        .writeStream.format("memory").queryName("s19_mono")
        .outputMode("update").start()
      try {
        ms.addData(Seq(EdgeObs("s", 7, 7), EdgeObs("s", 9, 9)))
        q.processAllAvailable()
        ms.addData(Seq(EdgeObs("s", 9, 3))) // 3 registers AND merges
        q.processAllAvailable()
        val rows = spark.table("s19_mono").as[ClusterAssign].collect()
        val bySeq = rows.groupBy(_.doc_id)
          .view.mapValues(_.map(_.label).toSeq).toMap
        assert(bySeq(7L) == Seq(7L), "untouched singleton keeps its id")
        // 9 first labeled 9, then relabeled 3 by the merge
        assert(bySeq(9L).contains(9L) && bySeq(9L).min == 3L)
        assert(bySeq(3L).min == 3L)
      } finally q.stop()
    }
  }

  test("restart from checkpoint resumes the union-find state") {
    withRocksDb {
      import java.nio.file.Files
      val edges = fixture(seed = 29)
      val half = edges.length / 2
      val dir = Files.createTempDirectory("s19_src")
      val ckpt = Files.createTempDirectory("s19_ckpt").toString
      def writeChunk(name: String, es: Seq[EdgeObs]): Unit =
        Files.writeString(dir.resolve(name), es.map(e =>
          s"""{"shard":"${e.shard}","a":${e.a},"b":${e.b}}""")
          .mkString("\n"))
      val emitted =
        new java.util.concurrent.ConcurrentLinkedQueue[ClusterAssign]()
      def start() = {
        val src = spark.readStream
          .schema(org.apache.spark.sql.Encoders.product[EdgeObs].schema)
          .json(dir.toString).as[EdgeObs]
        StreamingClusterMaintain.assign(src)
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.Dataset[ClusterAssign],
                           _: Long) =>
            df.collect().foreach(emitted.add)
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").start()
      }
      writeChunk("a.json", edges.take(half))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      writeChunk("b.json", edges.drop(half))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      import scala.jdk.CollectionConverters._
      val got = emitted.asScala.toSeq.groupBy(_.doc_id)
        .view.mapValues(_.map(_.label).min).toMap
      assert(got == batchLabels(edges),
        "labels after restart must equal the batch components " +
          "(state recovered, not recomputed)")
    }
  }
}
