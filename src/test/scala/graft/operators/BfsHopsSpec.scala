package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfsHopsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
      rounds: Int): Map[Long, Long] =
    BfsHops.hops(edges.toDF("src", "dst"),
        sources.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // undirected helper: feed both directions
  private def undirected(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map(_.swap)

  test("path graph: distances are hop counts, beyond-horizon nodes " +
    "absent") {
    val path = undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val d = run(path, Seq(1L), rounds = 3)
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-source takes the min over sources; cycles don't " +
    "inflate distances") {
    val ring = undirected((1L to 6L).map(i => (i, i % 6 + 1)))
    val d = run(ring, Seq(1L, 4L), rounds = 3)
    assert(d == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 6L -> 1L,
      3L -> 1L, 5L -> 1L))
  }

  test("frontier expansion equals naive relax-everything") {
    val edges = undirected(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (2L, 7L), (8L, 9L)))
    def naive(rounds: Int): Map[Long, Long] = {
      var dist = Map(1L -> 0L)
      for (k <- 1 to rounds) {
        val relaxed = edges.flatMap { case (s, t) =>
          dist.get(s).map(_ => t -> k.toLong) }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (n, xs) => n -> xs.map(_._2).min }
      }
      dist
    }
    for (r <- 1 to 4)
      assert(run(edges, Seq(1L), r) == naive(r), s"rounds=$r")
  }

  test("duplicate sources and edges collapse") {
    val d = run(Seq((1L, 2L), (1L, 2L)), Seq(1L, 1L), rounds = 2)
    assert(d == Map(1L -> 0L, 2L -> 1L))
  }
}
