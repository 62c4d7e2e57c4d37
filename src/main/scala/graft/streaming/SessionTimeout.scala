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

  override def handleInputRows(user: Long,
                               rows: Iterator[(Long, java.sql.Timestamp)],
                               timerValues: TimerValues)
      : Iterator[TimedOutSession] = {
    var (start, last, n) =
      if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
    val prevTimer = if (n > 0) Some(last + gapMs) else None
    rows.foreach { case (_, ts) =>
      val ms = ts.getTime
      start = math.min(start, ms); last = math.max(last, ms); n += 1
    }
    sess.update((start, last, n))
    // re-arm: one live timer per key
    prevTimer.foreach(getHandle.deleteTimer)
    getHandle.registerTimer(last + gapMs)
    Iterator.empty
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
