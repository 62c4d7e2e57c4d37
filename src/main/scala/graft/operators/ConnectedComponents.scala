package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the step that turns near-duplicate PAIRS (MinHash/SimHash/Jaccard,
  * see [[ApproxDedup]]) into duplicate CLUSTERS so a training corpus
  * can keep exactly one representative per cluster. Pair emission
  * alone under-deletes: if A~B and B~C but A!~C, pairwise removal
  * keeps either A or C depending on scan order, while the cluster
  * view removes both non-representatives deterministically.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of
  * its own and its neighbors' labels; at fixpoint the label is the
  * minimum node id reachable in the component (a deterministic,
  * layout-independent cluster id). Rounds = component diameter.
  *
  * Scale shape (the point of doing this in Spark rather than driver
  * memory): each round is one shuffle of the symmetrized edge list
  * joined to the label frame plus a min-aggregate — O(E) per round,
  * nothing ever collected to the driver. Near-dup graphs have tiny
  * diameters (duplicate clusters are dense, so label propagation
  * converges in a handful of rounds even at corpus scale); for
  * adversarially long path graphs swap in the alternating
  * large-star/small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14), which this
  * iteration structure accommodates without changing callers.
  * Rounds run in BATCHES OF TWO per `localCheckpoint` + convergence
  * probe: lineage stays O(1) instead of growing a plan tree per
  * iteration (the classic iterative-Spark failure mode), convergence
  * is detected from a one-row aggregate (not a row fetch), and the
  * batching halves the per-round job-launch floor that dominates
  * these tiny-frame iterations at bench scale.
  *
  * Reference analogy: the reference engine's dedup surface stops at
  * per-file processed-marks (kinesis-to-humio.py:48-68); clustering
  * is part of the beyond-reference LLM-pipeline pack.
  */
object ConnectedComponents {

  /** Diagnostic: propagation/contraction rounds consumed by the most
    * recent [[components]] / [[starComponents]] call on this JVM —
    * read by the scale probe (graft.RoundsProbe) to prove round
    * counts are data-independent (diameter- resp. log-bounded, never
    * volume-bounded) when the corpus grows 30×. For [[components]]
    * the count has BATCH granularity (steps execute in pairs, so it
    * is always even and may overstate the minimal round count by
    * one) — consistent across runs, which is all the base-vs-30×
    * equality proof needs. Not part of any result contract. */
  val lastRounds = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** (id, comp) for every node in `nodes`, where comp = min node id
    * reachable through `edges` (nodes absent from `edges` keep their
    * own id — singleton clusters).
    *
    * @param nodes single-column frame of node ids (column `id`)
    * @param edges two-column frame (`src`, `dst`), undirected pairs
    * @param maxIter safety bound on propagation rounds; the fixpoint
    *                is reached at the component diameter
    */
  def components(nodes: DataFrame, edges: DataFrame,
                 maxIter: Int = 50): DataFrame = {
    // Symmetrize once: propagation below only follows src → dst.
    // Both directions come out of ONE pass over the pair frame via
    // explode(array(e, swap(e))) — the previous union-of-two-selects
    // shape planned the ENTIRE upstream pair DAG as two separate
    // union branches, re-executing it per direction (for the semantic
    // /embedding callers that DAG is the cell self-join + cosine
    // filter — the expensive part of the whole query; exchange reuse
    // recovers some of it, but the post-exchange join/filter work
    // still ran twice). Guide §1.2: don't compute things twice.
    // The pair dedup (each round's join must fan out once per
    // neighbor, not once per originally-emitted pair) runs AFTER the
    // repartition, inside its partitions: dropDuplicates(src, dst)
    // needs ClusteredDistribution(src, dst), which hashpartitioning
    // on src alone already satisfies (equal (src,dst) ⇒ equal src),
    // so the aggregate adds NO exchange — where the previous
    // distinct-then-repartition shape paid a second full O(E)
    // exchange just to move already-distinct rows onto the join key
    // (guide §2.4 "share one exchange").
    // Cache the symmetrized edge list PRE-PARTITIONED AND PRE-SORTED
    // on the propagation join key: InMemoryRelation preserves
    // outputPartitioning/outputOrdering, so every round's
    // sym ⋈ labels join reads the O(E) side with no per-round
    // Exchange or Sort — only the O(V) label frame shuffles each
    // round (guide §2.4; the partition-the-edge-list-once iterative
    // shape, same as [[PageRank]]/[[BfsHops]]).
    val sym = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .sortWithinPartitions("src")
      .persist()

    // One propagation step as a PLAN (no materialization): each
    // node's label drops to the min of its own and its neighbors'.
    // UNION + one groupBy, not join-aggregate-join: the node's own
    // label rides the aggregate as a tagged row (own = true), so the
    // min-combine and the "did it change" comparison come out of ONE
    // exchange on id — where the previous shape paid a groupBy(dst)
    // exchange AND a second lbl ⋈ nbrMin join behind it (guide §2.4;
    // the same frontier-fold shape [[BfsHops]] uses). `own` min is
    // well-defined: exactly one own row per id (labels carry one row
    // per node, an invariant of the loop).
    def step(lbl: DataFrame): DataFrame = {
      val nbr = sym
        .join(lbl, sym("src") === lbl("id"))
        .select(sym("dst").as("id"), col("comp"), lit(false).as("own"))
      lbl.select(col("id"), col("comp"), lit(true).as("own"))
        .union(nbr)
        .groupBy("id")
        .agg(min(col("comp")).as("newc"),
          min(when(col("own"), col("comp"))).as("oldc"))
        .select(col("id"), col("newc").as("comp"),
          (col("newc") < col("oldc")).as("changed"))
    }
    var labels = nodes.select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    // round + 2 <= maxIter: the batch consumes two rounds, and the
    // documented safety bound must never be exceeded (round < maxIter
    // would admit maxIter + 1 propagation rounds on odd bounds)
    while (!converged && round + 2 <= maxIter) {
      // TWO propagation rounds per checkpoint + convergence probe,
      // and ONE job for both: near-dup cluster runs at sf0.1 are
      // dominated by per-round job launch, not data volume.
      // Convergence from the SECOND step alone is sound: labels are
      // monotone non-increasing and the fixpoint is defined by
      // step(x) == x — if the second step changed nothing its input
      // was already the fixpoint, whatever the first did. The mid
      // frame is persisted LAZILY (no extra job): the batch's single
      // materialization computes it once and reuses it across its
      // two references. `next` takes a LAZY localCheckpoint — the
      // plan is severed to a LogicalRDD immediately, and the blocks
      // materialize as a side effect of the convergence aggregate
      // (which computes every partition), so the batch pays ONE job
      // where the eager checkpoint + probe pair paid two.
      val mid = step(labels).select("id", "comp").persist()
      val next = step(mid).localCheckpoint(false)
      val nChanged = next
        .agg(sum(when(col("changed"), 1L).otherwise(0L)))
        .first().getLong(0)
      mid.unpersist()
      labels = next.select("id", "comp")
      converged = nChanged == 0
      round += 2
    }
    lastRounds.set(round)
    // Partially-propagated labels would silently split true clusters
    // (several "representatives" survive dedup) — refuse rather than
    // return wrong assignments. Propagation needs diameter rounds;
    // for high-diameter graphs use starComponents.
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $round rounds " +
          "(component diameter exceeds maxIter); raise maxIter or use " +
          "starComponents, which needs O(log^2 n) rounds")
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the adversarial-graph alternative to
    * [[components]]: O(log² n) rounds regardless of diameter, where
    * label propagation needs diameter rounds (a 1M-node path graph
    * would take 1M propagation rounds but ~40 star rounds).
    *
    * Each round: large-star hangs every larger neighbor of u under
    * min(Γ(u) ∪ {u}); small-star re-hangs the not-larger neighbors.
    * Both are one groupBy + one join over the edge list — same O(E)
    * shuffle cost per round as propagation, strictly fewer rounds.
    * At fixpoint the edges form stars rooted at each component's
    * minimum id; StarVsPropagationSpec pins result equality with
    * [[components]].
    *
    * Convergence test compares (edge count, xor of edge hashes)
    * across rounds — two scalars, no edge-set join. A false-positive
    * needs a count AND 64-bit-xor collision (vanishingly unlikely)
    * and `maxIter` bounds the loop regardless.
    */
  def starComponents(nodes: DataFrame, edges: DataFrame,
                     maxIter: Int = 50): DataFrame = {
    // (count, xor of per-edge hashes) — order-insensitive fingerprint
    // (bit_xor, not sum: ANSI mode faults a wrapping long sum)
    def fingerprint(e: DataFrame): (Long, Long) = {
      val row = e
        .select(xxhash64(col("u"), col("v")).as("h"))
        .agg(count(lit(1)).as("n"),
          coalesce(expr("bit_xor(h)"), lit(0L)).as("x"))
        .first()
      (row.getLong(0), row.getLong(1))
    }
    var e = edges
      .select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var last = (-1L, 0L)
    var round = 0
    var converged = false
    // Job-count note (r15 optimization round): both single-action
    // variants of this loop were MEASURED SLOWER in steady jobs than
    // the eager-checkpoint pair below — `large` as a lazy persist
    // costs a TableCacheQueryStage job per reference chain (steady
    // 34 → 36-38 at sf0.01), and a lazily-persisted `small` grows
    // the analyzed plan geometrically (explain/planning OOM). The
    // eager localCheckpoint pair stays: per-round edge sets CHANGE,
    // so nothing here is loop-invariant cacheable.
    while (!converged && round < maxIter) {
      // large-star over the symmetric view: (u, v>u) re-hangs v under
      // m(u) = min(Γ(u) ∪ {u}).
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mU = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(mU, "u")
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint(true)
      // small-star over the canonical (u > v) view: every not-larger
      // neighbor (and u itself) hangs under m(u) = min neighbor.
      val canon = large // large-star output is already (bigger, smaller)
      val mA = canon.groupBy("u").agg(min(col("v")).as("m"))
      val small = canon.join(mA, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mA.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)
      e = small
      val fp = fingerprint(e)
      converged = fp == last
      last = fp
      round += 1
    }
    lastRounds.set(round)
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxIter rounds — " +
          "unexpected for any graph with < 2^sqrt(maxIter) nodes; " +
          "raise maxIter")
    // At fixpoint edges are (node, root) stars; isolated nodes keep
    // their own id.
    val lab = e.groupBy(col("u").as("id")).agg(min(col("v")).as("comp"))
    nodes.select(col(nodes.columns.head).as("id"))
      .join(lab, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Cluster assignment for a near-dup pair frame (`a_id`, `b_id`):
    * every id in `allIds` mapped to its cluster representative (min
    * reachable id) plus the cluster size.
    *
    * @param algo component algorithm — [[components]] (default) or
    *             [[starComponents]]; both return identical (id, comp)
    *             assignments (spec + shared oracle pin this) */
  def dedupClusters(allIds: DataFrame, pairs: DataFrame,
                    algo: (DataFrame, DataFrame) => DataFrame =
                      components(_, _)): DataFrame = {
    val comps = algo(
      allIds.select(col(allIds.columns.head).as("id")),
      pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
    comps
      .withColumn("cluster_size",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("comp")))
  }
}
