package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** One observed value offered to the monitor; `key` is the portable
  * row identity the sample hashes (the batch operator's rowKey). */
case class KmvObs(group: String, key: String, v: Double)

/** Per-batch estimate emission: the group's live distribution after
  * the micro-batch — sample size, p50/p90 read off the sample by the
  * batch operator's rank selection. */
case class KmvEstimate(group: String, n_seen: Long, n_sample: Long,
                       p50: Double, p90: Double)

/** Bottom-K sample state: parallel (h, v) vectors, ≤ K entries. */
case class KmvMonitorState(nSeen: Long, hs: Seq[Long], vs: Seq[Double])

/** Streaming KMV distribution monitor (S16) — the streaming
  * complement of [[graft.operators.PortableSketch.kmvSample]]: values
  * arrive on a stream, each group maintains the bottom-K-by-md5
  * uniform sample as state and emits live quantile estimates per
  * micro-batch.
  *
  * Parity contract — STRONGER than S15's arrival-order coincidence:
  * the KMV sample is a commutative monoid (bottom-K of a union is
  * bottom-K of merged bottom-Ks, the min-wise stability proven in
  * PortableSketchSpec), so after any stream prefix the state sample
  * equals the BATCH kmvSample over exactly the rows seen so far —
  * for ANY split into micro-batches and ANY row order within them.
  * KmvMonitorSpec asserts this against the batch operator on a
  * shuffled 3-way split.
  *
  * State is ≤ K (h, v) pairs plus one counter per group — O(K·groups)
  * regardless of stream length; each arriving row costs one md5 and
  * an O(K log K) merge per batch. The same hash (`Md5Long.compute`,
  * = 60-bit `('0x'||substring(md5(x),1,15))::BIGINT`) keys batch and
  * stream, so the two sides are replayable against each other and
  * against any engine with md5.
  */
object KmvMonitor {

  /** The batch side's h60 (graft.operators.PortableSketch) computed
    * on the JVM: first 60 md5 bits of the key's UTF-8 form. */
  def h60(key: String): Long =
    graft.functions.Md5Long.compute(UTF8String.fromString(key), 15)

  /** The batch side's rank selection: sample element at 1-based rank
    * floor(q·(n−1)) + 1 in (v, h) order. */
  private def rankSelect(sorted: IndexedSeq[(Double, Long)],
                         q: Double): Double =
    sorted(math.floor(q * (sorted.length - 1)).toInt)._1

  def monitor(obs: Dataset[KmvObs], k: Int): Dataset[KmvEstimate] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.group)
      .flatMapGroupsWithState[KmvMonitorState, KmvEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[KmvObs],
         state: GroupState[KmvMonitorState]) =>
          val prev = state.getOption
            .getOrElse(KmvMonitorState(0L, Nil, Nil))
          var nSeen = prev.nSeen
          val arrived = rows.map { r => nSeen += 1; (h60(r.key), r.v) }
          // merge = bottom-K of (state sample ++ arrivals) in (h, v)
          // order — the same total order the batch operator sorts by
          val sample = ((prev.hs zip prev.vs) ++ arrived)
            .toIndexedSeq.sorted.take(k)
          state.update(KmvMonitorState(nSeen,
            sample.map(_._1), sample.map(_._2)))
          if (sample.isEmpty) Iterator.empty
          else {
            val byV = sample.map { case (h, v) => (v, h) }.sorted
            Iterator.single(KmvEstimate(g, nSeen, sample.length.toLong,
              rankSelect(byV, 0.5), rankSelect(byV, 0.9)))
          }
      }
  }
}
