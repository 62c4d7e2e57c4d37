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
    // The edge list is joined on `src` once per iteration. Cache it
    // PRE-PARTITIONED AND PRE-SORTED on the join key: InMemoryRelation
    // preserves its cached plan's outputPartitioning/outputOrdering,
    // so every iteration's sort-merge join reads the edge side with
    // NO per-round Exchange and NO per-round Sort — only the O(nodes)
    // rank vector shuffles each round. (The previous localCheckpoint
    // stored raw RDD blocks whose partitioning the SQL layer cannot
    // see, so all three iterations re-shuffled and re-sorted the
    // O(edges) frame — guide §2.4's shared-exchange rule; on a
    // cluster this is the partition-the-edge-list-once shape every
    // iterative graph engine uses.) Lineage stays bounded: the
    // per-iteration rank checkpoint below still cuts the loop's plan
    // growth; the edge subtree is loop-invariant.
    val e = edges.repartition(col("src"))
      .sortWithinPartitions("src")
      .persist()
    // (node, deg) in ONE frame: every node is a src by contract, so
    // the degree aggregate already enumerates the node set — and
    // carrying deg inside the rank vector saves a second per-
    // iteration join (the rank frame is the broadcast side either
    // way; one broadcast instead of two per round).
    // (node, deg, base) in ONE frame: every node is a src by
    // contract, so the degree aggregate already enumerates the node
    // set — and baking both deg AND the teleport term ⌊0.15·S/N⌋ into
    // the checkpointed vector removes the per-iteration
    // crossJoin(broadcast(nFrame)) + node-count re-aggregation the
    // loop used to pay every round (one broadcast build + one agg
    // job × iterations).
    val nFrame = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .agg(count(lit(1)).as("n"))
    val nodesDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .crossJoin(broadcast(nFrame))
      .select(col("node"), col("deg"),
        expr(s"(${15 * (Scale / 100)} div n)").as("base"),
        expr(s"$Scale div n").as("rank0"))
      .localCheckpoint(true)
    var r = nodesDeg
      .select(col("node"), col("deg"), col("rank0").as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank div deg").as("c"))
      val inSum = contrib.groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("in_sum"))
      r = nodesDeg.join(inSum, Seq("node"), "left")
        .select(col("node"), col("deg"), expr(
          "base + ((85 * coalesce(in_sum, 0L)) div 100)").as("rank"))
        .localCheckpoint(true)
    }
    r.select("node", "rank")
  }
}
