package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, ValueState}

/** Per-user running totals via Spark 4's `transformWithState` — the
  * successor to flatMapGroupsWithState with typed, composable state
  * variables. Emits one (user_id, events_so_far, value_sum_so_far)
  * row per user per micro-batch touched.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...RocksDBStateStoreProvider`) — the HDFS-backed default does not
  * support the transformWithState operator.
  *
  * State is one (Long, Double) per user — O(users), sharded with the
  * shuffle like every keyed state store.
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double)] {
  @transient private var totals: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)]("totals",
      Encoders.product[(Long, Double)], org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(user: Long,
                               rows: Iterator[(Long, Long, Double)],
                               timerValues: TimerValues)
      : Iterator[(Long, Long, Double)] = {
    var (n, sum) = if (totals.exists()) totals.get() else (0L, 0.0)
    rows.foreach { case (_, _, v) => n += 1; sum += v }
    totals.update((n, sum))
    Iterator((user, n, sum))
  }
}

object RunningTotals {
  /** events (user_id, event_id, value) → running totals stream. */
  def totals(events: Dataset[(Long, Long, Double)])
      : Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
