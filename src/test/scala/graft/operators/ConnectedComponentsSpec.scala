package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    parts: Int = 4): Map[Long, Long] =
    ConnectedComponents.components(
        nodes.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: label propagates across the full diameter") {
    // 0-1-2-3-4-5 chain: every node must reach label 0.
    val m = comps(0L to 5L, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(m == (0L to 5L).map(_ -> 0L).toMap)
  }

  test("two components + singleton, direction-independent") {
    // Edges given in arbitrary direction; 9 is isolated.
    val m = comps(Seq(1L, 2L, 3L, 7L, 8L, 9L),
      Seq((2L, 1L), (3L, 2L), (8L, 7L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("result is partition-layout independent") {
    val nodes = 0L until 40L
    val ring = (0L until 39L).map(i => (i, i + 1)) :+ (39L, 0L)
    assert(comps(nodes, ring, parts = 2) == comps(nodes, ring, parts = 7))
  }

  private def starComps(nodes: Seq[Long], edges: Seq[(Long, Long)],
                        parts: Int = 4): Map[Long, Long] =
    ConnectedComponents.starComponents(
        nodes.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction matches label propagation on adversarial shapes") {
    // Long path (the propagation worst case), ring, star, two
    // components with crossing id ranges, singletons, duplicate +
    // reversed edges.
    // (path length stays under components' default maxIter=50 —
    // propagation needs diameter rounds; the star side would handle
    // any length, as the 200-node test below proves)
    val cases: Seq[(Seq[Long], Seq[(Long, Long)])] = Seq(
      (0L to 40L, (0L until 40L).map(i => (i, i + 1))),           // path
      (0L to 29L, (0L until 29L).map(i => (i, i + 1)) :+ (29L, 0L)), // ring
      (0L to 10L, (1L to 10L).map(i => (0L, i))),                 // star
      (0L to 9L, Seq((9L, 1L), (1L, 5L), (8L, 0L), (0L, 4L), (4L, 8L),
        (5L, 9L), (5L, 1L), (1L, 9L))),                           // dups
      (0L to 5L, Seq.empty)                                       // isolated
    )
    for ((nodes, edges) <- cases) {
      val prop = comps(nodes, edges)
      val star = starComps(nodes, edges)
      assert(star == prop, s"mismatch on $edges")
    }
  }

  test("star contraction converges in O(log n) rounds on a path " +
      "(bounded by maxIter far below the diameter)") {
    // 200-node path: propagation needs 199 rounds; the contraction
    // must finish within 20 (log²-ish) — maxIter=20 would throw the
    // wrong answer otherwise, so equality here proves fast
    // convergence.
    val nodes = 0L to 199L
    val path = (0L until 199L).map(i => (i, i + 1))
    val star = ConnectedComponents.starComponents(
        nodes.toDF("id"), path.toDF("src", "dst"), maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == nodes.map(_ -> 0L).toMap)
  }

  test("dedupClusters sizes match the component partition") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val out = ConnectedComponents.dedupClusters(
        (1L to 7L).toDF("doc_id"), pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L) == ((1L, 3L)) && byId(2L) == ((1L, 3L)) && byId(3L) == ((1L, 3L)))
    assert(byId(5L) == ((5L, 2L)) && byId(6L) == ((5L, 2L)))
    assert(byId(4L) == ((4L, 1L)) && byId(7L) == ((7L, 1L)))
  }
}
