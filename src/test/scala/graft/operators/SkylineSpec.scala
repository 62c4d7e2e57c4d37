package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y) }
    }.toSet
  }

  private def run(pts: Seq[(Long, Long)], parts: Int = 1): Set[(Long, Long)] =
    Skyline.frontier2d(
      pts.distinct.toDF("x", "y").repartition(parts))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches brute-force dominance on a mixed cloud") {
    val pts = Seq[(Long, Long)](
      (1, 9), (2, 7), (3, 8), (4, 4), (5, 6), (6, 3), (7, 5),
      (8, 2), (9, 9), (2, 7), (10, 1), (4, 4), (3, 3), (6, 1))
    assert(run(pts) == brute(pts))
    // sanity on the expected shape: strictly decreasing y along x
    val f = run(pts).toSeq.sortBy(_._1)
    assert(f.sliding(2).forall {
      case Seq((x1, y1), (x2, y2)) => x1 < x2 && y1 > y2
      case _ => true
    })
  }

  test("same-x and same-y dominance are strict on the ≤ axis only") {
    // (1,5) dominates (1,7) (x equal, y strict); (2,3) dominates
    // (6,3) (y equal, x strict)
    assert(run(Seq((1L, 5L), (1L, 7L), (2L, 3L), (6L, 3L))) ==
      Set((1L, 5L), (2L, 3L)))
  }

  test("result is independent of input partitioning") {
    val pts = (1L to 200L).map(i => (i % 37, (i * i) % 41))
    val expect = brute(pts)
    assert(run(pts, 1) == expect)
    assert(run(pts, 7) == expect)
    assert(run(pts, 32) == expect)
  }

  test("extra columns ride through") {
    val df = Seq((1L, 5L, "a"), (2L, 2L, "b"), (3L, 9L, "c"))
      .toDF("x", "y", "tag")
    val out = Skyline.frontier2d(df).orderBy("x")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 5L, "a"), (2L, 2L, "b")))
  }
}
