package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(tokens: Seq[String], k: Int): Map[String, Long] = {
    val n = tokens.length.toLong
    tokens.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      .filter { case (_, c) => c * (k + 1) > n }
  }

  private def run(tokens: Seq[String], k: Int,
      parts: Int = 4): Map[String, Long] =
    HeavyHitters.frequent(tokens.toDF("token").repartition(parts), k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("zipf-ish stream: output is exactly the > N/(k+1) set with " +
    "exact counts") {
    val tokens = (1 to 2000).flatMap(i =>
      Seq.fill(2000 / i)(s"w$i")).take(6000)
    for (k <- Seq(5, 20, 100))
      assert(run(tokens, k) == exact(tokens, k), s"k=$k")
  }

  test("uniform stream with no heavy hitter returns empty") {
    val tokens = (1 to 500).map(i => s"u$i")
    assert(run(tokens, 10).isEmpty)
  }

  test("result is partition-independent even though candidates " +
    "are not") {
    val tokens = (1 to 3000).map(i => s"w${i % 37 % (i % 11 + 1)}")
    val expect = exact(tokens, 8)
    assert(expect.nonEmpty)
    assert(run(tokens, 8, parts = 1) == expect)
    assert(run(tokens, 8, parts = 7) == expect)
    assert(run(tokens, 8, parts = 32) == expect)
  }

  test("k = 1 degrades to the strict majority element") {
    assert(run(Seq("a", "a", "a", "b", "c"), 1) == Map("a" -> 3L))
    assert(run(Seq("a", "a", "b", "b"), 1).isEmpty)
  }
}
