package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("leftAsof picks the most recent right row at-or-before, per key") {
    val left = Seq(
      (1L, 100L, "a1"), (1L, 200L, "a2"), (1L, 50L, "a0"),
      (2L, 100L, "a3"), (3L, 10L, "a4"))
      .toDF("k", "t", "a_tag")
    val right = Seq(
      (1L, 100L, "b@100"), (1L, 150L, "b@150"), (1L, 40L, "b@40"),
      (2L, 99L, "b@99"), (2L, 101L, "b@101"))
      .toDF("k", "t", "b_tag")
    val got = AsofJoin.leftAsof(left, right, "k", "t", Seq("b_tag"))
      .collect()
      .map(r => (r.getAs[String]("a_tag"), r.getAs[String]("b_tag"))).toMap
    assert(got == Map(
      "a0" -> "b@40",   // 40 <= 50
      "a1" -> "b@100",  // equal time matches (<= semantics)
      "a2" -> "b@150",  // most recent of {40,100,150}
      "a3" -> "b@99",   // 101 is in the future
      "a4" -> null))    // no right row at-or-before
  }

  test("property: leftAsof equals brute force on 50 seeded random datasets") {
    val rnd = new scala.util.Random(1234)
    for (round <- 1 to 50) {
      val nk = 1 + rnd.nextInt(4)
      val left = Seq.tabulate(1 + rnd.nextInt(20)) { i =>
        (rnd.nextInt(nk).toLong, rnd.nextInt(100).toLong, s"L$round-$i")
      }
      // duplicate (k, t) right rows allowed: ties resolve to the
      // greatest carried struct (here: max b_tag string)
      val right = Seq.tabulate(1 + rnd.nextInt(20)) { i =>
        (rnd.nextInt(nk).toLong, rnd.nextInt(20).toLong, s"R$round-$i")
      }
      val expected = left.map { l =>
        val prior = right.filter(r => r._1 == l._1 && r._2 <= l._2)
        l._3 -> (if (prior.isEmpty) null
                 else prior.maxBy(r => (r._2, r._3))._3)
      }.toMap
      val got = AsofJoin.leftAsof(
        left.toDF("k", "t", "a_tag"), right.toDF("k", "t", "b_tag"),
        "k", "t", Seq("b_tag"))
        .collect()
        .map(r => r.getAs[String]("a_tag") -> r.getAs[String]("b_tag"))
        .toMap
      assert(got == expected, s"round $round")
    }
  }

  test("property: leftAsofForward equals brute force on 50 seeded " +
      "random datasets") {
    val rnd = new scala.util.Random(5678)
    for (round <- 1 to 50) {
      val nk = 1 + rnd.nextInt(4)
      val left = Seq.tabulate(1 + rnd.nextInt(20)) { i =>
        (rnd.nextInt(nk).toLong, rnd.nextInt(100).toLong, s"L$round-$i")
      }
      val right = Seq.tabulate(1 + rnd.nextInt(20)) { i =>
        (rnd.nextInt(nk).toLong, rnd.nextInt(120).toLong, s"R$round-$i")
      }
      // forward: EARLIEST right at-or-after; (k,t) ties resolve to the
      // greatest carried struct, same convention as backward
      val expected = left.map { l =>
        val after = right.filter(r => r._1 == l._1 && r._2 >= l._2)
        l._3 -> (if (after.isEmpty) null
                 else {
                   val tMin = after.map(_._2).min
                   after.filter(_._2 == tMin).maxBy(_._3)._3
                 })
      }.toMap
      val got = AsofJoin.leftAsofForward(
        left.toDF("k", "t", "a_tag"), right.toDF("k", "t", "b_tag"),
        "k", "t", Seq("b_tag"))
        .collect()
        .map(r => r.getAs[String]("a_tag") -> r.getAs[String]("b_tag"))
        .toMap
      assert(got == expected, s"round $round")
    }
  }

  test("non-unique (key,time) right rows pick the same row under any " +
      "partitioning") {
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "a_tag")
    val dupes = Seq((1L, 90L, "bZ"), (1L, 90L, "bA"), (1L, 90L, "bM"))
    for (p <- Seq(1, 3, 7)) {
      val right = dupes.toDF("k", "t", "b_tag").repartition(p)
      val got = AsofJoin.leftAsof(left, right, "k", "t", Seq("b_tag"))
        .collect().map(_.getAs[String]("b_tag")).toSeq
      assert(got == Seq("bZ"), s"partitions=$p") // greatest struct wins
    }
  }

  test("q_join_asof agrees with a Scala brute-force as-of on real events") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
      .selectExpr("user_id", "event_id", "event_type", "value",
        "ts div 1000 AS ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val clicks = ev.filter(_._3 == "click")
    val purchases = ev.filter(_._3 == "purchase")
    val expected = clicks.map { c =>
      val prior = purchases
        .filter(p => p._1 == c._1 && p._5 <= c._5)
      val best = if (prior.isEmpty) None
        else Some(prior.maxBy(p => (p._5, -p._2)))
      c._2 -> best.map(_._2)
    }.toMap
    val got = graft.SparkEntry.queries("q_join_asof")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("a_event_id") ->
        Option(r.getAs[java.lang.Long]("b_event_id")).map(_.toLong)).toMap
    assert(got == expected)
  }
}
