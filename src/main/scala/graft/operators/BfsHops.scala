package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance, unrolled to a fixed round count.
  *
  * Unweighted shortest-path distance from a source SET over a
  * directed edge list (feed both directions for undirected graphs).
  * Integer rounds and min-combines only, so a DuckDB oracle replays
  * the unrolled iterations as a CTE chain and hash-matches — the
  * same fixed-iteration discipline as [[PageRank]] and
  * [[KMeans]] (convergence loops belong in the driver).
  *
  * Scale: this is the Pregel frontier form, not the naive
  * relax-everything form. In unweighted BFS a node's final distance
  * is the round that first discovers it, so round k only needs to
  * expand nodes at distance exactly k-1 — the frontier — instead of
  * re-joining the whole reached set against the edge list every
  * round. Each round is then one equi-join (frontier × edges,
  * shuffled on the node key) plus one min-combine groupBy with
  * map-side partial aggregation; the frontier filter is a pushed
  * predicate on the accumulated distance frame. Nothing collects,
  * no windows; state per round is one (node, dist) row per reached
  * node, exactly what a 1000-executor iterative job wants to carry.
  */
object BfsHops {

  /** `edges`: (src, dst); `sources`: (node) — distance 0. Returns
    * (node, dist) for every node reached within `rounds` hops,
    * dist = the true unweighted shortest distance (≤ rounds). */
  def hops(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one round")
    // Per-round state stays eagerly localCheckpointed (without it
    // round k's plan re-embeds every earlier round's joins and both
    // planning and recomputation grow geometrically — the
    // [[PageRank]] lesson). The loop-INVARIANT edge list instead
    // caches PRE-PARTITIONED AND PRE-SORTED on the join key:
    // InMemoryRelation preserves outputPartitioning/outputOrdering,
    // so each round's frontier join reads the O(edges) side with no
    // per-round Exchange or Sort — only the frontier shuffles
    // (guide §2.4; the partition-the-edge-list-once iterative shape).
    val e = edges.repartition(edges("src"))
      .sortWithinPartitions("src")
      .persist()
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    for (k <- 1 to rounds) {
      val frontier = dist.filter(col("dist") === (k - 1))
      val relaxed = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"), lit(k.toLong).as("dist"))
      dist = dist.union(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    dist
  }
}
