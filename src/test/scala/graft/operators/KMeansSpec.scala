package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight blobs far apart, one seed planted near each; unit weights
  private val blobA = (0L until 10L).map(i => (10L + i % 3, 20L, 1L))
  private val blobB = (10L until 20L).map(i => (1000L + i % 3, 2000L, 1L))
  private val pts = (blobA ++ blobB)
    .groupBy(identity).map { case ((x, y, _), xs) =>
      (x, y, xs.size.toLong) }.toSeq.toDF("x", "y", "w")
  private val seeds = Seq((0, 0L, 0L), (1, 900L, 1900L))

  test("separated blobs converge to their exact weighted integer " +
    "means") {
    val out = KMeans.fit(pts, seeds, iterations = 2)
      .orderBy("cid").collect()
    assert(out.length == 2)
    val Row(_, n0: Long, cx0: Long, cy0: Long, _) = out(0)
    val Row(_, n1: Long, cx1: Long, cy1: Long, _) = out(1)
    assert(n0 == 10L && n1 == 10L)
    // blob A x sum: 4*10 + 3*11 + 3*12 = 109 -> floor(109/10) = 10
    // blob B x sum over i%3 of 10..19: 4*1000 + 3*1001 + 3*1002
    //   = 10009... i in 10..19 -> i%3 = 1,2,0,1,2,0,1,2,0,1: sum
    //   10010 -> exact mean 1001
    assert(cx0 == 10L && cy0 == 20L)
    assert(cx1 == 1001L && cy1 == 2000L)
  }

  test("sse is the exact weighted within-cluster scatter wrt the " +
    "assigning centroid") {
    // after iteration 1, centroids are the blob means; iteration 2's
    // sse is scatter around them: blob A x in {10 x4, 11 x3, 12 x3}
    // vs mean-floor 10 -> 3*1 + 3*4 = 15; blob B x counts
    // {1000 x3, 1001 x4, 1002 x3} around exact mean 1001 -> 3+3 = 6
    val out = KMeans.fit(pts, seeds, iterations = 2)
      .orderBy("cid").collect()
    assert(out.map(_.getLong(4)).toSeq == Seq(15L, 6L))
  }

  test("weights are equivalent to row multiplicity") {
    val weighted = Seq((4L, 0L, 5L), (10L, 0L, 1L)).toDF("x", "y", "w")
    val unrolled = (Seq.fill(5)((4L, 0L, 1L)) :+ ((10L, 0L, 1L)))
      .toDF("x", "y", "w")
    // 5x(4,0) + 1x(10,0): mean x = 30/6 = 5
    val a = KMeans.fit(weighted, Seq((0, 0L, 0L)), 2)
      .collect().toSeq
    // the unrolled frame still carries w=1 per row but duplicates
    // collapse identically through the weighted groupBy
    val b = KMeans.fit(unrolled.groupBy("x", "y")
        .agg(org.apache.spark.sql.functions.sum("w").as("w")),
      Seq((0, 0L, 0L)), 2).collect().toSeq
    assert(a == b)
    assert(a.head.getLong(2) == 5L)
  }

  test("ties break toward the lower cid identically under any " +
    "partitioning") {
    // a point equidistant from both seeds must go to cid 0
    val tie = Seq((5L, 0L, 1L)).toDF("x", "y", "w")
    val s = Seq((0, 0L, 0L), (1, 10L, 0L))
    val r = KMeans.fit(tie, s, 1).collect()
    assert(r.length == 1 && r.head.getInt(0) == 0)
    val a = KMeans.fit(pts, seeds, 2).orderBy("cid").collect().toSeq
    val b = KMeans.fit(pts.repartition(7), seeds, 2)
      .orderBy("cid").collect().toSeq
    assert(a == b)
  }
}
