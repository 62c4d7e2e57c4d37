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

  test("packBinsFfd equals reference FFD on 20 seeded random shards, " +
      "independent of partitioning") {
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 20) {
      val budget = 32 + rnd.nextInt(96)
      val rows = for {
        shard <- Seq("s1", "s2", "s3")
        i <- 0 until (1 + rnd.nextInt(40))
      } yield (shard, i.toLong, 1L + rnd.nextInt(budget + 10))
      // reference FFD (shared-nothing reimplementation of the classic
      // algorithm, not the operator's code path)
      val expected = rows.groupBy(_._1).flatMap { case (shard, rs) =>
        val sorted = rs.map { case (_, i, t) => (i, t) }
          .sortBy { case (i, t) => (-t, i) }
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.map { case (i, t) =>
          val idx = loads.indexWhere(_ + t <= budget)
          val bin = if (idx >= 0) { loads(idx) += t; idx }
                    else { loads += t; loads.length - 1 }
          (shard, i) -> bin
        }
      }
      val got = SequencePacking.packBinsFfd(
        rows.toDF("shard", "id", "t").repartition(7),
        "shard", "id", "t", budget)
        .collect()
        .map(r => (r.getAs[String]("shard"), r.getAs[Long]("doc_id")) ->
          r.getAs[Int]("bin_id"))
        .toMap
      assert(got == expected, s"round $round budget $budget")
    }
  }

  test("packBinsFfd invariants: whole docs, capacity respected, " +
      "11/9-bound vs the concat-chunk window count") {
    val rnd = new scala.util.Random(29)
    val budget = 512
    val rows = (0 until 400).map(i =>
      ("s" + (i % 4), i.toLong, 1L + rnd.nextInt(budget)))
    val packed = SequencePacking.packBinsFfd(
      rows.toDF("shard", "id", "t"), "shard", "id", "t", budget)
      .collect()
      .map(r => (r.getAs[String]("shard"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("tokens"), r.getAs[Int]("bin_id")))
    // every document appears exactly once (whole, never split)
    assert(packed.map(p => (p._1, p._2)).distinct.length == rows.length)
    packed.groupBy(_._1).foreach { case (shard, ps) =>
      val binLoads = ps.groupBy(_._4).map { case (_, ds) => ds.map(_._3).sum }
      // no bin over budget (every doc here fits the budget)
      assert(binLoads.forall(_ <= budget), s"$shard over capacity")
      // FFD guarantee bins <= 11/9 * OPT + 1, asserted against a
      // certified LOWER bound on OPT: max(ceil(total/B), #docs > B/2)
      // — ceil(total/B) alone under-counts OPT (docs all sized
      // B/2 + 1 pack one per bin for ANY algorithm), so the 11/9
      // factor may only be applied on top of a sound bound.
      val total = ps.map(_._3).sum
      val optLb = math.max((total + budget - 1) / budget,
        ps.count(_._3 > budget / 2).toLong)
      assert(binLoads.size <= (11.0 * optLb) / 9.0 + 1,
        s"$shard: ${binLoads.size} bins vs OPT lower bound $optLb")
    }
  }

  test("packBinsFfd gives an oversize document a singleton bin") {
    val df = SequencePacking.packBinsFfd(
      Seq(("a", 1L, 900L), ("a", 2L, 30L), ("a", 3L, 40L))
        .toDF("shard", "id", "t"),
      "shard", "id", "t", budget = 100)
    val byBin = df.collect()
      .groupBy(_.getAs[Int]("bin_id"))
      .map { case (b, rs) => b -> rs.map(_.getAs[Long]("doc_id")).toSet }
    assert(byBin(0) == Set(1L))      // largest first, alone over budget
    assert(byBin(1) == Set(2L, 3L))  // the rest pack together
  }
}
