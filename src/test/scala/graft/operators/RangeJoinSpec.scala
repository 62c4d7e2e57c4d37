package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals brute force on 30 seeded random datasets") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 30) {
      val pts = Seq.tabulate(1 + rnd.nextInt(30)) { i =>
        (s"p$round-$i", rnd.nextInt(200).toLong)
      }
      val ivs = Seq.tabulate(1 + rnd.nextInt(15)) { i =>
        val s0 = rnd.nextInt(200).toLong
        (s"i$round-$i", s0, s0 + rnd.nextInt(25))
      }
      val expected = (for {
        (pid, t) <- pts
        (iid, s0, e0) <- ivs
        if t >= s0 && t <= e0
      } yield (pid, iid)).toSet
      for (band <- Seq(1L, 7L, 64L)) {
        val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "t"), ivs.toDF("iid", "s0", "e0"),
          "t", "s0", "e0", band)
          .select("pid", "iid").collect()
          .map(r => (r.getString(0), r.getString(1)))
        // exactly once per containment: set AND multiset equality
        assert(got.toSet == expected, s"round $round band $band")
        assert(got.length == expected.size,
          s"round $round band $band: duplicate pairs emitted")
      }
    }
  }

  test("extra equality keys restrict matches within the band") {
    val pts = Seq(("a", 10L, "k1"), ("b", 10L, "k2")).toDF("pid", "t", "k")
    val ivs = Seq(("i1", 5L, 15L, "k1")).toDF("iid", "s0", "e0", "k")
    val got = RangeJoin.pointInInterval(pts, ivs, "t", "s0", "e0",
        band = 10, keys = Seq("k"))
      .select("pid").as[String].collect().toSeq
    assert(got == Seq("a"))
  }

  test("negative domains band correctly (floor, not truncate)") {
    val pts = Seq(("p", -3L)).toDF("pid", "t")
    val ivs = Seq(("i", -5L, -1L)).toDF("iid", "s0", "e0")
    val got = RangeJoin.pointInInterval(pts, ivs, "t", "s0", "e0", band = 4)
      .count()
    assert(got == 1L)
  }

  test("intervalOverlap equals brute force, exactly once per pair") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 30) {
      val as = Seq.tabulate(1 + rnd.nextInt(20)) { i =>
        val s0 = rnd.nextInt(200).toLong
        (s"a$round-$i", s0, s0 + rnd.nextInt(30))
      }
      val bs = Seq.tabulate(1 + rnd.nextInt(20)) { i =>
        val s0 = rnd.nextInt(200).toLong
        (s"b$round-$i", s0, s0 + rnd.nextInt(30))
      }
      val expected = (for {
        (aid, as0, ae0) <- as
        (bid, bs0, be0) <- bs
        if as0 <= be0 && bs0 <= ae0
      } yield (aid, bid)).toSet
      for (band <- Seq(1L, 7L, 64L)) {
        val got = RangeJoin.intervalOverlap(
          as.toDF("aid", "as0", "ae0"), bs.toDF("bid", "bs0", "be0"),
          "as0", "ae0", "bs0", "be0", band)
          .select("aid", "bid").collect()
          .map(r => (r.getString(0), r.getString(1)))
        assert(got.toSet == expected, s"round $round band $band")
        assert(got.length == expected.size,
          s"round $round band $band: duplicate pairs emitted")
      }
    }
  }

  test("intervalOverlap negative domains and inclusive touch points") {
    val as = Seq(("a", -5L, -1L)).toDF("aid", "as0", "ae0")
    val bs = Seq(("b", -1L, 3L)).toDF("bid", "bs0", "be0")
    assert(RangeJoin.intervalOverlap(
      as, bs, "as0", "ae0", "bs0", "be0", band = 4).count() == 1L)
  }
}
