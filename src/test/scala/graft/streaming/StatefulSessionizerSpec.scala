package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StatefulSessionizerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming flatMapGroupsWithState closes sessions on gap") {
    val ms = MemoryStream[SessEvent](spark)
    val q = StatefulSessionizer.sessions(ms.toDS(), gapMs = 30 * 60 * 1000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("fmgs")
      .outputMode("append").start()
    try {
      ms.addData(SessEvent(1, 1, ts(0)), SessEvent(1, 2, ts(10)),
        SessEvent(2, 3, ts(5)))
      q.processAllAvailable()
      // no gap crossed yet: nothing closed
      assert(spark.table("fmgs").count() == 0)
      // user 1 reappears 2h later -> first session closes with 2 events
      ms.addData(SessEvent(1, 4, ts(130)))
      q.processAllAvailable()
      val closed = spark.table("fmgs").as[ClosedSession].collect()
      assert(closed.toSeq == Seq(ClosedSession(1, 2, ts(0), ts(10))))
    } finally q.stop()
  }

  test("gap close-out runs green on the RocksDB state store " +
      "(the 100 TB state-hygiene config)") {
    // At scale the per-user session state must NOT live on the JVM
    // heap: the RocksDB provider keeps state off-heap and spills to
    // local disk, and changelog checkpointing makes per-batch commits
    // incremental (upload the delta, not the full store). This runs
    // the exact S6 scenario under that production config.
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    val prevClog = spark.conf.getOption(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    try {
      val ms = MemoryStream[SessEvent](spark)
      val q = StatefulSessionizer.sessions(ms.toDS(),
          gapMs = 30 * 60 * 1000L,
          timeout = org.apache.spark.sql.streaming.GroupStateTimeout
            .NoTimeout())
        .writeStream.format("memory").queryName("fmgs_rocks")
        .outputMode("append").start()
      try {
        ms.addData(SessEvent(1, 1, ts(0)), SessEvent(1, 2, ts(10)),
          SessEvent(2, 3, ts(5)))
        q.processAllAvailable()
        assert(spark.table("fmgs_rocks").count() == 0)
        ms.addData(SessEvent(1, 4, ts(130)))
        q.processAllAvailable()
        val closed = spark.table("fmgs_rocks").as[ClosedSession].collect()
        assert(closed.toSeq == Seq(ClosedSession(1, 2, ts(0), ts(10))))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
      prevClog match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      }
    }
  }

  test("batch adapter agrees with the window-based sessionizer") {
    val d = "/root/testdata/sf0.001"
    val events = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"))
    val stateful = StatefulSessionizer.sessionsBatch(events)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val windowed = graft.SparkEntry.queries("q_events_sessionize")(spark, d)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1).toLong, r.getLong(2))).toMap
    assert(stateful == windowed)
  }
}
