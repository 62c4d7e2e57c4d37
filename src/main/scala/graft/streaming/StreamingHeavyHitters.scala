package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** One observed token on the stream. */
case class TokenObs(group: String, token: String)

/** Per-batch emission: the group's live Misra–Gries summary after
  * the micro-batch — every tracked candidate with its counter (a
  * LOWER bound on true frequency; true − counter ≤ n_seen/(k+1)). */
case class MgCandidate(group: String, n_seen: Long, token: String,
                       mg_count: Long)

/** Streaming heavy hitters (S17) — the live-corpus twin of
  * [[graft.operators.HeavyHitters]]: each group folds its token
  * stream through a k-counter Misra–Gries summary held as typed
  * state, emitting the candidate set + counters per micro-batch.
  * The batch operator's head detection (lm-score/boilerplate heads)
  * becomes a continuously-maintained monitor with O(k) state per
  * group.
  *
  * Built on `transformWithState` (the arbitrary-state v2 API, which
  * requires the RocksDB state store): the summary lives in a
  * [[MapState]] — ≤ k entries by the MG invariant, each arriving
  * token costs O(1) amortized (a decrement-all burns k+1 stream
  * occurrences, which is the classic error guarantee) — plus one
  * n_seen [[ValueState]] counter.
  *
  * Parity contract (StreamingHeavyHittersSpec): the summary after a
  * sequential fold is micro-batch-split-DEPENDENT in its internals
  * (like the batch operator's per-partition summaries), but the
  * guarantee is not: for ANY split, every token with true frequency
  * > n_seen/(k+1) over the stream prefix is in the candidate set,
  * counters never exceed true counts, and undercount is bounded by
  * n_seen/(k+1) — so candidates + an exact recount reproduce the
  * batch [[graft.operators.HeavyHitters.frequent]] output exactly.
  */
object StreamingHeavyHitters {

  class MgProcessor(k: Int)
      extends StatefulProcessor[String, TokenObs, MgCandidate] {
    @transient private var counters: MapState[String, Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long](
        "mg", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "n_seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(group: String, rows: Iterator[TokenObs],
        timers: TimerValues): Iterator[MgCandidate] = {
      // state is ≤ k entries by construction — load once, fold the
      // batch on-heap, write back the bounded survivor set
      val local = scala.collection.mutable.HashMap.empty[String, Long]
      counters.iterator().foreach { case (t, c) => local.update(t, c) }
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { r =>
        n += 1
        local.get(r.token) match {
          case Some(c) => local.update(r.token, c + 1)
          case None if local.size < k => local.update(r.token, 1L)
          case None =>
            local.mapValuesInPlace((_, c) => c - 1)
            local.filterInPlace((_, c) => c > 0)
        }
      }
      counters.clear()
      local.foreach { case (t, c) => counters.updateValue(t, c) }
      seen.update(n)
      // deterministic emission order so memory-sink reads are stable
      local.toSeq.sortBy(_._1).iterator
        .map { case (t, c) => MgCandidate(group, n, t, c) }
    }
  }

  def monitor(obs: Dataset[TokenObs], k: Int): Dataset[MgCandidate] = {
    require(k >= 1, "need at least one counter")
    import obs.sparkSession.implicits._
    obs.groupByKey(_.group)
      .transformWithState(new MgProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }
}
