package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One closed session: emitted ONLY when the user's inactivity timer
  * fires (S14), never on data arrival. */
case class TimedOutSession(user_id: Long, start_ms: Long, last_ms: Long,
                           n_events: Long)

/** Timer-driven session close-out via `transformWithState` event-time
  * TIMERS (S14) — the surface the rest of the streaming pack doesn't
  * touch: state that expires and EMITS on watermark progress alone,
  * with no arriving row for the key. `flatMapGroupsWithState`
  * (StatefulSessionizer) can only react when a group receives data or
  * via its coarse per-group timeout; here each key registers an
  * explicit event-time timer at `last + gap`, re-arms it on every new
  * event, and `handleExpiredTimer` emits the closed session and
  * clears state when the watermark passes it.
  *
  * Scale: state is one (start, last, n) triple + one timer per live
  * user, sharded with the shuffle; expiry work is driven by the timer
  * index, not a scan of all keys. Requires the RocksDB state store
  * provider (as all transformWithState operators do).
  */
class SessionTimeoutProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp),
      TimedOutSession] {
  @transient private var sess: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long)]("sess",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  /** Folds the batch's rows in EVENT-TIME order and closes sessions
    * inline whenever a gap exceeds `gapMs` — output is a function of
    * the event times alone, never of microbatch boundaries or arrival
    * order. (The previous cut merged any event into the open session
    * if it arrived before the watermark passed the pending timer: a
    * next-batch event with gap > gapMs produced ONE merged session
    * where a batch replay produces two.) The timer remains solely the
    * no-further-data close; every has-more-data close happens here.
    */
  override def handleInputRows(user: Long,
                               rows: Iterator[(Long, java.sql.Timestamp)],
                               timerValues: TimerValues)
      : Iterator[TimedOutSession] = {
    val evs = rows.map(_._2.getTime).toArray.sorted
    if (evs.isEmpty) return Iterator.empty
    var (start, last, n) =
      if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
    val prevTimer = if (n > 0) Some(last + gapMs) else None
    val out = scala.collection.mutable.ListBuffer.empty[TimedOutSession]
    var i = 0
    if (n == 0) { start = evs(0); last = evs(0); n = 1; i = 1 }
    else {
      // Events OLDER than the open session (possible under a lateness
      // allowance): chain backward while each bridges the gap to the
      // session start; what can't chain is a detached earlier cluster
      // that gap-splits among itself and emits now — those sessions
      // can never grow again (anything older still is sub-watermark).
      val nBefore = evs.indexWhere(_ >= start) match {
        case -1 => evs.length
        case x => x
      }
      var bi = nBefore - 1
      while (bi >= 0 && start - evs(bi) <= gapMs) {
        start = evs(bi); n += 1; bi -= 1
      }
      if (bi >= 0) {
        var (s0, l0, c0) = (evs(0), evs(0), 1L)
        for (j <- 1 to bi) {
          if (evs(j) - l0 > gapMs) {
            out += TimedOutSession(user, s0, l0, c0)
            s0 = evs(j); c0 = 0L
          }
          l0 = evs(j); c0 += 1
        }
        out += TimedOutSession(user, s0, l0, c0)
      }
      i = nBefore
    }
    while (i < evs.length) {
      val ms = evs(i)
      if (ms - last > gapMs) {
        out += TimedOutSession(user, start, last, n)
        start = ms; n = 0L
      }
      if (ms > last) last = ms
      n += 1
      i += 1
    }
    sess.update((start, last, n))
    // re-arm: one live timer per key
    prevTimer.foreach(getHandle.deleteTimer)
    getHandle.registerTimer(last + gapMs)
    out.iterator
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[TimedOutSession] = {
    if (!sess.exists()) Iterator.empty
    else {
      val (start, last, n) = sess.get()
      sess.clear()
      Iterator(TimedOutSession(user, start, last, n))
    }
  }
}

object SessionTimeout {
  /** events (user_id, event_ts: TimestampType) → closed sessions,
    * emitted on timer expiry as the watermark advances. */
  def sessions(events: Dataset[(Long, java.sql.Timestamp)],
               gapMs: Long = 30L * 60 * 1000,
               lateness: String = "0 seconds"): Dataset[TimedOutSession] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "event_ts")
      .withWatermark("event_ts", lateness)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(
        new SessionTimeoutProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())(
        Encoders.product[TimedOutSession])
  }
}
