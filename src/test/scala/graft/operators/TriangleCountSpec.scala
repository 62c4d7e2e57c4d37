package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TriangleCountSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TriangleCount.perNode(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 has 4 triangles, every node in 3") {
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val c = counts(k4)
    assert(c == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a path has no triangles; closing it into a cycle with a " +
    "chord adds exactly one") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // 4-cycle + chord (1,3): triangles {1,2,3} and {1,3,4}
    val c = counts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)))
    assert(c == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("hub-heavy graph matches brute force and is partition-layout " +
    "independent") {
    // hub 0 connected to 1..12, plus a sparse ring among the spokes:
    // exactly the skew shape the degree orientation exists for
    val edges = (1L to 12L).map(i => (0L, i)) ++
      (1L to 11L).map(i => (i, i + 1))
    val brute = {
      val es = edges.map { case (a, b) => Set(a, b) }.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val tris = for {
        u <- nodes; v <- nodes if u < v; w <- nodes if v < w
        if es(Set(u, v)) && es(Set(v, w)) && es(Set(u, w))
      } yield Seq(u, v, w)
      tris.flatten.groupBy(identity).map { case (n, xs) =>
        n -> xs.size.toLong }
    }
    val c = counts(edges)
    assert(c == brute)
    val repart = TriangleCount.perNode(
      edges.toDF("a", "b").repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repart == c)
  }
}
