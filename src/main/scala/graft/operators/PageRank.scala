package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in FIXED-POINT integer arithmetic.
  *
  * Float PageRank is not reproducible across engines (or even across
  * partitionings: the per-node contribution sum is a float fold in
  * shuffle order). Here ranks live in 10⁻¹² units as BIGINTs and
  * every operation is integer (floor) division or an exact integer
  * sum, so the ranks are BIT-IDENTICAL on any engine — the same
  * trick as the repo's rational TF-IDF / diversity surrogates, and
  * what lets a DuckDB oracle replay the iterations exactly.
  *
  * Per iteration: r'(v) = ⌊0.15·S/N⌋ + ⌊85·Σ_{u→v}⌊r(u)/deg(u)⌋/100⌋
  * with S = 10¹² (mass drift from flooring is bounded by one unit
  * per term and identical on both engines).
  *
  * Scale: each iteration is the canonical distributed PageRank step —
  * one equi-join of the edge list with the current rank vector
  * (shuffled on src) and one re-aggregation on dst. Nothing ever
  * collects; the rank vector is O(nodes) and the join is O(edges).
  * Iteration count is fixed by the caller (convergence-detection
  * loops belong in the driver, checkpointing every few rounds like
  * ConnectedComponents does).
  */
object PageRank {
  val Scale = 1000000000000L // 10^12 fixed-point units

  /** `edges` must be directed (src, dst) with every node appearing
    * as a src at least once (feed both directions for an undirected
    * graph — that also removes dangling nodes by construction). */
  def ranks(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    // Eager localCheckpoint on every frame the loop re-reads: without
    // it each iteration's plan tree re-embeds (and re-executes) the
    // upstream edge extraction, and the nested logical plan grows
    // geometrically — at sf0.1 the un-truncated form spent ~100 s in
    // driver-side planning + recomputation for a 600 k-edge graph.
    // Same discipline as [[ConnectedComponents]]; the per-iteration
    // rank checkpoint additionally pre-bakes each rank vector, so
    // deg is joined against a stored table, not a sub-DAG.
    val e = edges.localCheckpoint(true)
    // (node, deg) in ONE frame: every node is a src by contract, so
    // the degree aggregate already enumerates the node set — and
    // carrying deg inside the rank vector saves a second per-
    // iteration join (the rank frame is the broadcast side either
    // way; one broadcast instead of two per round).
    val nodesDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nFrame = nodesDeg.agg(count(lit(1)).as("n"))
    var r = nodesDeg.crossJoin(broadcast(nFrame))
      .select(col("node"), col("deg"), expr(s"$Scale div n").as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank div deg").as("c"))
      val inSum = contrib.groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("in_sum"))
      r = nodesDeg.join(inSum, Seq("node"), "left")
        .crossJoin(broadcast(nFrame))
        .select(col("node"), col("deg"), expr(
          s"(${15 * (Scale / 100)} div n) +" +
            " ((85 * coalesce(in_sum, 0L)) div 100)").as("rank"))
        .localCheckpoint(true)
    }
    r.select("node", "rank")
  }
}
