package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S14: timer-driven session close-out — sessions emit when the
  * event-time timer passes the watermark, with NO arriving row for
  * the key in that batch (the property flatMapGroupsWithState's
  * data-driven path can't show). */
class SessionTimeoutSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("sessions emit on watermark progress alone, once, with exact bounds") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Timestamp)](spark)
      val q = SessionTimeout.sessions(ms.toDS(), gapMs = 10 * 60000L)
        .writeStream.format("memory").queryName("sto")
        .outputMode("append").start()
      try {
        // Timers fire in the batch AFTER the watermark passes them
        // (the watermark advances post-batch), so each close-out
        // needs one more watermark push.
        // user 1: events at 100,105min; user 2: one event at 102min
        ms.addData((1L, ts(100)), (1L, ts(105)), (2L, ts(102)))
        q.processAllAvailable()
        assert(spark.table("sto").count() == 0,
          "nothing times out while the watermark sits at the data")
        // push the watermark to 140 (u1 timer 115, u2 timer 112 now
        // BELOW it), then process one more batch so they fire — with
        // NO arriving rows for users 1/2
        ms.addData((4L, ts(140)))
        q.processAllAvailable()
        ms.addData((4L, ts(160)))
        q.processAllAvailable()
        val early = spark.table("sto").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1)
        assert(early.toSeq == Seq(
          (1L, 100 * 60000L, 105 * 60000L, 2L),
          (2L, 102 * 60000L, 102 * 60000L, 1L)),
          s"got ${early.toSeq}")
        // user 4's events merged into one open session (timer re-armed
        // at each event); push the watermark far past it twice
        ms.addData((5L, ts(260)))
        q.processAllAvailable()
        ms.addData((5L, ts(300)))
        q.processAllAvailable()
        val all = spark.table("sto").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1)
        assert(all.toSeq.contains((4L, 140 * 60000L, 160 * 60000L, 2L)),
          s"user 4's merged session must close exactly once: ${all.toSeq}")
        assert(all.count(_._1 == 4L) == 1 && !all.exists(_._1 == 5L),
          s"no duplicate emits, user 5 still open: ${all.toSeq}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
