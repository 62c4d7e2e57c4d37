package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation
  * (the MapReduce node-iterator of Suri & Vassilvitskii, WWW'11).
  *
  * Naive wedge enumeration explodes on hubs: a node of degree d
  * produces C(d,2) wedges, and real graphs have power-law hubs — the
  * "curse of the last reducer". Orienting every undirected edge from
  * its lower-(degree, id) endpoint to its higher one bounds every
  * out-degree by O(sqrt(edges)), so the wedge set — and the single
  * skewed task that would otherwise own the top hub — shrinks from
  * C(d_max, 2) to O(edges^1.5) total, evenly spread.
  *
  * The triangle SET is orientation-independent, which is what lets a
  * DuckDB oracle replay it with plain lexicographic orientation and
  * still hash-match: each triangle {u,v,w} is found exactly once
  * under any total order on nodes.
  *
  * Scale: two self-joins on the oriented edge list (wedge build on
  * src, wedge close on (v,w)), both equi-joins Catalyst plans as
  * shuffled hash/sort-merge; nothing collects, no windows. Output is
  * per-node participation counts, O(nodes).
  */
object TriangleCount {

  /** `edges` must be undirected, distinct, canonical pairs (a, b)
    * with a < b, both columns the same integral type. Returns
    * (node, triangles) for every node in at least one triangle. */
  def perNode(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
    val deg = und.groupBy(col("u").as("n")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): src is the strictly smaller endpoint key
    val oriented = und
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u").as("src"), col("v").as("dst"),
        col("dv").as("ddst"))
    // wedges (u; v, w) with k(v) < k(w), both out-neighbors of u
    val e1 = oriented.select(col("src"), col("dst").as("w1"),
      col("ddst").as("d1"))
    val e2 = oriented.select(col("src"), col("dst").as("w2"),
      col("ddst").as("d2"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("w1") < col("w2")))
      .select(col("src").as("tu"), col("w1").as("tv"),
        col("w2").as("tw"))
    // close the wedge against the oriented edge (v, w)
    val tris = wedges.join(
      oriented.select(col("src").as("tv"), col("dst").as("tw")),
      Seq("tv", "tw"))
    tris.select(explode(array(col("tu"), col("tv"), col("tw")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
