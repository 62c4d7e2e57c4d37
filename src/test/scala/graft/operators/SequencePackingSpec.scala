package graft.operators

import graft.SparkSpec

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  test("packWindows equals brute-force concat-and-chunk on 20 seeded " +
      "random shards") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 20) {
      val budget = 16 + rnd.nextInt(64)
      val rows = for {
        shard <- Seq("s1", "s2", "s3")
        i <- 0 until (1 + rnd.nextInt(30))
      } yield (shard, i.toLong, 1L + rnd.nextInt(40))
      val expected = rows.groupBy(_._1).flatMap { case (shard, rs) =>
        var cum = 0L
        rs.sortBy(_._2).map { case (_, ord, t) =>
          val start = cum; cum += t
          (shard, ord) -> ((start / budget).toInt, (start % budget).toInt)
        }
      }
      val got = SequencePacking.packWindows(
        rows.toDF("shard", "ord", "t").repartition(5),
        "shard", "ord", "t", budget)
        .collect()
        .map(r => (r.getAs[String]("shard"), r.getAs[Long]("ord")) ->
          ((r.getAs[Int]("window_id"), r.getAs[Int]("offset_in_window"))))
        .toMap
      assert(got == expected, s"round $round budget $budget")
    }
  }

  test("offsets stay inside the budget") {
    val df = SequencePacking.packWindows(
      Seq(("a", 1L, 5L), ("a", 2L, 100L), ("a", 3L, 7L))
        .toDF("shard", "ord", "t"),
      "shard", "ord", "t", budget = 32)
    assert(df.filter($"offset_in_window" >= 32 || $"offset_in_window" < 0)
      .count() == 0)
  }
}
