package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // a small star graph: hub h trades with k spokes
  private def star(k: Int) = {
    val pairs = (1 to k).map(i => ("h", s"v$i")).toDF("a", "b")
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  test("rank mass is conserved up to flooring loss and the hub " +
    "outranks every spoke") {
    val k = 20
    val r = PageRank.ranks(star(k), iterations = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val total = r.values.sum
    // each floor loses < 1 unit; per iteration ≤ (nodes + edges +
    // nodes) floors, 3 iterations, tiny vs 10^12
    assert(total <= PageRank.Scale &&
      total > PageRank.Scale - 1000000L,
      s"mass not conserved: $total vs ${PageRank.Scale}")
    val hub = r("h")
    for (i <- 1 to k)
      assert(hub > r(s"v$i"), s"hub $hub <= spoke v$i ${r(s"v$i")}")
    // spokes are symmetric: identical ranks, exactly
    assert(r.filterKeys(_ != "h").values.toSet.size == 1)
  }

  test("ranks are partition-layout independent (integer arithmetic " +
    "has no fold-order sensitivity)") {
    val e = star(13)
    val a = PageRank.ranks(e, 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val b = PageRank.ranks(e.repartition(7), 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(a == b)
  }
}
