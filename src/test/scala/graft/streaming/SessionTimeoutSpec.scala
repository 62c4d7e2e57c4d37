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
        // users 1/2 closed by TIMER with no arriving rows; user 4's
        // first session closed INLINE when the 160 event (gap 20min
        // > 10min) arrived in the same final batch
        assert(early.toSeq == Seq(
          (1L, 100 * 60000L, 105 * 60000L, 2L),
          (2L, 102 * 60000L, 102 * 60000L, 1L),
          (4L, 140 * 60000L, 140 * 60000L, 1L)),
          s"got ${early.toSeq}")
        // user 4's two events are 20min apart — MORE than the gap.
        // The 160 event arrived before the watermark passed the 150
        // timer, so the close happens INLINE on data arrival (batch
        // parity: a replay of the same events yields two sessions);
        // the second session closes by timer after the pushes.
        ms.addData((5L, ts(260)))
        q.processAllAvailable()
        ms.addData((5L, ts(300)))
        q.processAllAvailable()
        val all = spark.table("sto").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(x => (x._1, x._2))
        assert(all.filter(_._1 == 4L).toSeq == Seq(
          (4L, 140 * 60000L, 140 * 60000L, 1L),
          (4L, 160 * 60000L, 160 * 60000L, 1L)),
          s"gap-split must not depend on batch boundaries: ${all.toSeq}")
        // user 5's own two pushes (260, 300) gap-split inline as
        // well; the 300 session has no later event and stays open
        assert(all.filter(_._1 == 5L).toSeq == Seq(
          (5L, 260 * 60000L, 260 * 60000L, 1L)),
          s"user 5's last session must stay open: ${all.toSeq}")
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

  test("output is arrival-order independent and honors lateness-window " +
      "older events (stream-batch parity)") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Timestamp)](spark)
      val q = SessionTimeout.sessions(ms.toDS(), gapMs = 10 * 60000L,
        lateness = "60 minutes")
        .writeStream.format("memory").queryName("sto2")
        .outputMode("append").start()
      try {
        // user 1 arrives OUT of event-time order inside one batch,
        // spanning a split: sorted they are 100,105 | 120 — two
        // sessions regardless of arrival order. The watermark is
        // still at its initial 0 during this batch, so the first
        // session's presence in the sink proves an INLINE close (no
        // timer can have fired).
        ms.addData((1L, ts(120)), (1L, ts(100)), (1L, ts(105)))
        q.processAllAvailable()
        val afterB1 = spark.table("sto2").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        assert(afterB1.toSeq == Seq((1L, 100 * 60000L, 105 * 60000L, 2L)),
          s"first split closes inline, arrival order must not matter: " +
            s"${afterB1.toSeq}")
        // user 2: open session at 200; next batch brings 193, which
        // chains backward (200-193 = 7min ≤ gap), and 170, which
        // cannot reach even the chained start (193-170 = 23min >
        // gap) → detached EARLIER singleton, emitted inline.
        ms.addData((2L, ts(200)))
        q.processAllAvailable()
        ms.addData((2L, ts(170)), (2L, ts(193)))
        q.processAllAvailable()
        val inline = spark.table("sto2").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(x => (x._1, x._2))
        // u2's live timer sits at 210min, far above the 140min
        // watermark — the singleton's presence proves the inline path
        assert(inline.filter(_._1 == 2L).toSeq == Seq(
          (2L, 170 * 60000L, 170 * 60000L, 1L)),
          s"detached older singleton must emit inline: ${inline.toSeq}")
        // push the watermark far ahead twice so open sessions close
        // by timer: u1 (120) and u2 (193..200, backward-chained)
        ms.addData((9L, ts(400)))
        q.processAllAvailable()
        ms.addData((9L, ts(500)))
        q.processAllAvailable()
        val all = spark.table("sto2").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(x => (x._1, x._2))
        assert(all.filter(_._1 == 1L).toSeq == Seq(
          (1L, 100 * 60000L, 105 * 60000L, 2L),
          (1L, 120 * 60000L, 120 * 60000L, 1L)), s"${all.toSeq}")
        assert(all.filter(_._1 == 2L).toSeq == Seq(
          (2L, 170 * 60000L, 170 * 60000L, 1L),
          (2L, 193 * 60000L, 200 * 60000L, 2L)),
          s"193 must chain backward into the 200 session: ${all.toSeq}")
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
