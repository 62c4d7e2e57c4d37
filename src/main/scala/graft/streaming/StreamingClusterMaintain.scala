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
  * Mechanics: a per-shard UNION-FIND held in two [[MapState]]s —
  * `parent` (doc → current root, kept FULLY FLATTENED: every entry
  * points directly at its root) and `members` (root → component
  * member list). An edge's two roots merge to the MIN root; the
  * losing root's members are relabeled eagerly (that is what keeps
  * `parent` flat, lookups O(1), and lets the batch emit exactly the
  * changed assignments). Merging to min + eager relabel makes the
  * final state a pure function of the edge SET — micro-batch split
  * and arrival order cannot change it (StreamingClusterMaintainSpec
  * pins parity with batch ConnectedComponents for several splits).
  *
  * Scale shape: state is O(docs) per shard, each batch touches only
  * the components its edges reach, and relabel work amortizes: a doc
  * is relabeled at most log(n) times across the stream's lifetime
  * (its component at least doubles... strictly, the MERGE pass moves
  * the smaller-of-two member list when sizes are known; here the
  * loser-by-id list moves, which on near-dup streams — many tiny
  * dense clusters — is equivalent in practice and keeps the label
  * contract exact). Built on `transformWithState` (arbitrary-state
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

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      parent = getHandle.getMapState[Long, Long](
        "parent", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      members = getHandle.getMapState[Long, Members](
        "members", Encoders.scalaLong, Encoders.product[Members],
        TTLConfig.NONE)
    }

    override def handleInputRows(shard: String, rows: Iterator[EdgeObs],
        timers: TimerValues): Iterator[ClusterAssign] = {
      // Per-batch overlay: only the entries this batch touches are
      // read from / written back to RocksDB.
      val pOver = scala.collection.mutable.HashMap.empty[Long, Long]
      val mOver = scala.collection.mutable.HashMap.empty[Long, Vector[Long]]
      val changed = scala.collection.mutable.HashMap.empty[Long, Long]
      def root(x: Long): Long = pOver.get(x).orElse {
        if (parent.containsKey(x)) Some(parent.getValue(x)) else None
      }.getOrElse {
        // first sighting: register as its own singleton component
        pOver.update(x, x); mOver.update(x, Vector(x))
        changed.update(x, x)
        x
      }
      def membersOf(r: Long): Vector[Long] = mOver.getOrElse(r,
        if (members.containsKey(r)) members.getValue(r).ids.toVector
        else Vector(r))
      rows.foreach { e =>
        val (ra, rb) = (root(e.a), root(e.b))
        if (ra != rb) {
          val (winner, loser) = if (ra < rb) (ra, rb) else (rb, ra)
          val moved = membersOf(loser)
          moved.foreach { m =>
            pOver.update(m, winner)
            changed.update(m, winner)
          }
          mOver.update(winner, membersOf(winner) ++ moved)
          mOver.remove(loser)
          members.removeKey(loser)
        }
      }
      pOver.foreach { case (d, r) => parent.updateValue(d, r) }
      mOver.foreach { case (r, ms) => members.updateValue(r, Members(ms)) }
      // deterministic emission order for stable memory-sink reads
      changed.toSeq.sortBy(_._1).iterator
        .map { case (d, r) => ClusterAssign(shard, d, r) }
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
