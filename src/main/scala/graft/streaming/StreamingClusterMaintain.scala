package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** One near-dup edge on the ingest stream. A document REGISTERS by
  * its self-edge (a == b) — the arrival event — and LINKS to an
  * existing or co-arriving near-duplicate via a normal pair (the
  * output of the dedup screen, S12/q_dedup_incremental). `shard` is
  * the independence key: pairs never cross shards (per-language /
  * per-tenant corpora), which is what lets the state partition. */
case class EdgeObs(shard: String, a: Long, b: Long)

/** Per-batch emission: every document whose cluster label is NEW or
  * CHANGED by this micro-batch, with its current label (the min doc
  * id reachable in its component — the same representative the batch
  * [[graft.operators.ConnectedComponents]] assigns). */
case class ClusterAssign(shard: String, doc_id: Long, label: Long)

/** S19 — streaming cluster maintenance: arriving near-dup documents
  * get COMPONENT LABELS at ingest, completing the ingest-time dedup
  * story (S12 flags near-dups of the corpus, q_dedup_incremental
  * screens batches; this keeps the cluster assignment itself live).
  * The label contract is exactly batch connected components': every
  * doc's label is the minimum doc id reachable through the edge set
  * seen so far — so "keep one representative per cluster" decisions
  * made at ingest match what a batch re-run would decide.
  *
  * Mechanics: a per-shard UNION-FIND held in three [[MapState]]s —
  * `parent` (doc → current structural root, kept FULLY FLATTENED:
  * every entry points directly at its root), `members` (root →
  * component member list) and `label` (root → component min doc id).
  * An edge's two roots merge by SIZE: the smaller member list moves
  * (union-by-size, the textbook amortization — each doc's parent
  * entry is rewritten at most log(n) times over the stream's
  * lifetime because its component at least doubles per move), and
  * the winner's `label` takes the min of the two sides' labels.
  * Decoupling the emitted LABEL from the structural root is what
  * makes the amortization unconditional: merging structurally to the
  * min-ID root instead would let an adversarial arrival order (new
  * docs with descending ids, each linking to the existing cluster)
  * relabel and rewrite the ENTIRE component's parent entries every
  * batch — O(n²) state writes. Structural roots are order-dependent
  * internals; the emitted labels are a pure function of the edge SET
  * (component min), so micro-batch split and arrival order cannot
  * change them (StreamingClusterMaintainSpec pins parity with batch
  * ConnectedComponents for several splits).
  *
  * Scale shape: state is O(docs) per shard, each batch touches only
  * the components its edges reach, parent rewrites amortize to
  * log(n) per doc, and emissions are exactly the docs whose label
  * changed (when a smaller min id joins a large component, emitting
  * the whole component is contract-required — downstream holds
  * per-doc labels). Built on `transformWithState` (arbitrary-state
  * v2, RocksDB provider required), so it survives restarts from the
  * checkpoint like every other S-series operator.
  */
object StreamingClusterMaintain {

  /** Component member list (product-encodable state value). */
  case class Members(ids: Seq[Long])

  class UnionFindProcessor
      extends StatefulProcessor[String, EdgeObs, ClusterAssign] {
    @transient private var parent: MapState[Long, Long] = _
    @transient private var members: MapState[Long, Members] = _
    @transient private var label: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      parent = getHandle.getMapState[Long, Long](
        "parent", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      members = getHandle.getMapState[Long, Members](
        "members", Encoders.scalaLong, Encoders.product[Members],
        TTLConfig.NONE)
      label = getHandle.getMapState[Long, Long](
        "label", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(shard: String, rows: Iterator[EdgeObs],
        timers: TimerValues): Iterator[ClusterAssign] = {
      // Per-batch overlay: only the entries this batch touches are
      // read from / written back to RocksDB.
      val pOver = scala.collection.mutable.HashMap.empty[Long, Long]
      val mOver = scala.collection.mutable.HashMap.empty[Long, Vector[Long]]
      val lOver = scala.collection.mutable.HashMap.empty[Long, Long]
      val changed = scala.collection.mutable.HashMap.empty[Long, Long]
      def root(x: Long): Long = pOver.get(x).orElse {
        if (parent.containsKey(x)) Some(parent.getValue(x)) else None
      }.getOrElse {
        // first sighting: register as its own singleton component
        pOver.update(x, x); mOver.update(x, Vector(x))
        lOver.update(x, x)
        changed.update(x, x)
        x
      }
      def membersOf(r: Long): Vector[Long] = mOver.getOrElse(r,
        if (members.containsKey(r)) members.getValue(r).ids.toVector
        else Vector(r))
      def labelOf(r: Long): Long = lOver.getOrElse(r,
        if (label.containsKey(r)) label.getValue(r) else r)
      rows.foreach { e =>
        val (ra, rb) = (root(e.a), root(e.b))
        if (ra != rb) {
          // union-by-size: the SMALLER member list moves (ties break
          // to the lower root id, deterministically) — each doc's
          // parent entry rewrites at most log(n) times ever
          val (ma, mb) = (membersOf(ra), membersOf(rb))
          val (winner, loser, keep, moved) =
            if (ma.size > mb.size || (ma.size == mb.size && ra < rb))
              (ra, rb, ma, mb)
            else (rb, ra, mb, ma)
          val (lw, ll) = (labelOf(winner), labelOf(loser))
          val newLabel = math.min(lw, ll)
          moved.foreach(m => pOver.update(m, winner))
          // exactly ONE side's label changes (labels are distinct
          // component mins): emit that side's docs with the new label
          if (newLabel < lw) keep.foreach(m => changed.update(m, newLabel))
          if (newLabel < ll) moved.foreach(m => changed.update(m, newLabel))
          lOver.update(winner, newLabel)
          lOver.remove(loser)
          label.removeKey(loser)
          mOver.update(winner, keep ++ moved)
          mOver.remove(loser)
          members.removeKey(loser)
        }
      }
      pOver.foreach { case (d, r) => parent.updateValue(d, r) }
      mOver.foreach { case (r, ms) => members.updateValue(r, Members(ms)) }
      lOver.foreach { case (r, l) => label.updateValue(r, l) }
      // deterministic emission order for stable memory-sink reads
      changed.toSeq.sortBy(_._1).iterator
        .map { case (d, l) => ClusterAssign(shard, d, l) }
    }
  }

  /** Live cluster labels over an edge stream: emits every (doc,
    * label) the micro-batch created or changed; the latest emission
    * per doc IS its current cluster id. */
  def assign(edges: Dataset[EdgeObs]): Dataset[ClusterAssign] = {
    import edges.sparkSession.implicits._
    edges.groupByKey(_.shard)
      .transformWithState(new UnionFindProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
