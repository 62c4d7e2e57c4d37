package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Input row for the stateful sessionizer. */
case class SessEvent(user_id: Long, event_id: Long, ts: Timestamp)

/** Closed session emitted when a user's inactivity gap elapses. */
case class ClosedSession(user_id: Long, n_events: Long,
                         start: Timestamp, end: Timestamp)

/** Per-user open-session state. */
case class SessState(n: Long, start: Long, last: Long)

/** Custom stateful streaming operator: gap-based sessionization via
  * `flatMapGroupsWithState` — the escape hatch for session semantics
  * `session_window` can't express (emit-on-close with arbitrary
  * per-session payload, custom timeout policy).
  *
  * State is one `SessState` per active user, keyed by the group —
  * the state store shards with the shuffle, expires via processing-
  * time timeout, and holds O(active users), not O(events): the shape
  * that stays bounded on an unbounded stream.
  *
  * 100 TB state hygiene: with hundreds of millions of live users the
  * state must not sit on the JVM heap (the default HDFS-backed
  * provider keeps its working map in memory). Production config —
  * verified green in StatefulSessionizerSpec:
  * `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider` (off-heap, local-disk-backed)
  * plus `...rocksdb.changelogCheckpointing.enabled = true` so each
  * commit uploads the batch's delta instead of re-snapshotting the
  * full store.
  */
object StatefulSessionizer {
  /** Sessionize: emits a ClosedSession whenever a user's gap exceeds
    * `gapMs` (on the next event) or — with
    * `ProcessingTimeTimeout` (the production default) — when the
    * state times out with no further events. Tests use `NoTimeout`
    * for determinism: with processing-time timeouts armed, the query
    * keeps scheduling wall-clock work and `processAllAvailable` never
    * settles. */
  def sessions(events: Dataset[SessEvent],
               gapMs: Long = 30 * 60 * 1000L,
               timeout: GroupStateTimeout =
                 GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val armTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append(), timeout) {
        (user: Long, rows: Iterator[SessEvent],
         state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.n,
              new Timestamp(s.start), new Timestamp(s.last)))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapMs =>
                  closed += ClosedSession(user, s.n,
                    new Timestamp(s.start), new Timestamp(s.last))
                  cur = Some(SessState(1, t, t))
                case Some(s) =>
                  cur = Some(SessState(s.n + 1, s.start, t))
                case None =>
                  cur = Some(SessState(1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (armTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch adapter for the same Dataset (groups are complete in batch
    * mode, so every session closes; useful for parity checks against
    * the window-based `q_events_sessionize`). One user's events fold
    * in one task — the sessionizer fits-one-task contract (a single
    * user's history is bounded; the scale path for unbounded keys is
    * the streaming state machine above, whose state is one open
    * session regardless of history length). */
  def sessionsBatch(events: DataFrame,
                    gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import events.sparkSession.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"))
      .as[SessEvent]
    typed.groupByKey(_.user_id).flatMapGroups {
      (user: Long, rows: Iterator[SessEvent]) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = Seq.newBuilder[ClosedSession]
        var cur: Option[SessState] = None
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last > gapMs =>
              out += ClosedSession(user, s.n,
                new Timestamp(s.start), new Timestamp(s.last))
              cur = Some(SessState(1, t, t))
            case Some(s) => cur = Some(SessState(s.n + 1, s.start, t))
            case None    => cur = Some(SessState(1, t, t))
          }
        }
        cur.foreach(s => out += ClosedSession(user, s.n,
          new Timestamp(s.start), new Timestamp(s.last)))
        out.result().iterator
    }.toDF()
  }
}
