package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a pathologically skewed key") {
    // 10k rows of one hot key + a tail, joined to a 3-row dim
    val large = ((1 to 10000).map(i => (1L, i)) ++
      (1 to 50).map(i => (2L, i)) ++ Seq((3L, 0)))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"))
      .toDF("k", "label")
    val plain = large.join(small, "k")
    val salted = ScaleJoins.saltedJoin(large, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salted shuffle key actually spreads the hot key
    val spread = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(8)).cast("int"))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(spread > 1, "hot key must land on multiple salts")
  }

  test("saltedJoin bounds the per-reducer row count on a Zipfian fixture") {
    // 200k-row power-law keys (s = 1.2, the q_text_lm_score class):
    // the plain join's hottest reducer carries the whole hot key;
    // salting must spread it so no reducer exceeds a salts-fraction
    // bound. This is the 1000-executor wall-clock argument in
    // deterministic form (SkewBench records the 60M-row version).
    val salts = 8
    val large = spark.range(200000)
      .withColumn("u",
        (pmod(xxhash64($"id"), lit(1 << 30)) + 1).cast("double")
          / lit((1 << 30).toDouble))
      .withColumn("k", least(lit(1000L), ceil(pow($"u", lit(-5.0))))
        .cast("long"))
      .select($"id", $"k")
    val small = spark.range(1, 1001).select($"id".as("k"),
      ($"id" * 7).as("w"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE coalescing merges these few-MB shuffles into ONE partition
    // (a small-bytes artifact — at scale partitions exceed the
    // advisory size and stay split), which would blind the
    // per-reducer measurement; 64 reducers give the hot key a
    // measurable concentration target
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      def maxPart(df: org.apache.spark.sql.DataFrame): Long = df
        .select(spark_partition_id().as("p"))
        .groupBy("p").agg(count(lit(1)).as("n"))
        .agg(max("n")).collect()(0).getLong(0)
      val plain = large.join(small, "k")
      val salted = ScaleJoins.saltedJoin(large, small, "k", salts)
      assert(salted.count() == plain.count())
      val hot = large.filter($"k" <= 2).count() // two hottest keys
      val (mp, ms) = (maxPart(plain), maxPart(salted))
      assert(mp >= hot / 2,
        s"plain join must concentrate a hot key on one reducer " +
          s"(max $mp, hot $hot)")
      assert(ms <= mp / 2,
        s"salted join must at least halve the reducer bound " +
          s"(plain $mp, salted $ms)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("aqeSkewJoin equals the plain join and the AQE skew split " +
      "fires on a Zipfian fixture") {
    // Same power-law fixture class as the salted-join test. The skew
    // thresholds are lowered to fixture scale (the defaults are sized
    // for 256 MB partitions); at production sizes the same split
    // fires with stock settings. Coalescing stays ON — the skew
    // split and partition coalescing compose in AQE.
    val large = spark.range(200000)
      .withColumn("u",
        (pmod(xxhash64($"id"), lit(1 << 30)) + 1).cast("double")
          / lit((1 << 30).toDouble))
      .withColumn("k", least(lit(1000L), ceil(pow($"u", lit(-5.0))))
        .cast("long"))
      .select($"id", $"k", concat(lit("pad_"), $"id").as("pad"))
    val small = spark.range(1, 1001).select($"id".as("k"),
      ($"id" * 7).as("w"))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // a partition is "skewed" past 32 kB AND 2x the median — the
      // hot key's partition is ~MBs here, every other one far smaller
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32768",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // 64 reducers: with the suite default of 4, the hot key's
      // partition also absorbs ~1/4 of the tail and never reaches
      // 2x the median — the same small-fixture artifact the salted
      // test works around
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plain = large.join(small, "k")
      val aqe = ScaleJoins.aqeSkewJoin(large, small, "k")
      assert(aqe.count() == plain.count())
      assert(aqe.exceptAll(plain).isEmpty && plain.exceptAll(aqe).isEmpty,
        "AQE skew join must be result-identical to the plain join")
      // the adaptive FINAL plan (post-execution) must carry the skew
      // split: SortMergeJoin prints (skew=true) once
      // OptimizeSkewedJoin has rewritten it. Execution must ride THIS
      // df's own QueryExecution (collect, not a write — a write
      // builds a fresh QueryExecution and the df's adaptive plan
      // would stay isFinalPlan=false).
      val df = ScaleJoins.aqeSkewJoin(large, small, "k")
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split did not fire; final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("frequencySplitJoin equals the plain join and bounds the tail") {
    // Zipfian term stream (one term carrying ~30% of the stream) and
    // a per-term model whose freq column is the stream frequency —
    // the q_text_tfidf shape (model df == stream key frequency by
    // construction).
    val stream = ((1 to 3000).map(i => (i.toLong, "the")) ++
      (1 to 7000).map(i => (i.toLong, s"t${i % 700}")))
      .toDF("doc_id", "term")
    val model = stream.groupBy("term").agg(count(lit(1)).as("freq"))
      .withColumn("payload", length($"term").cast("long"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = stream.join(model, "term")
      val split = ScaleJoins.frequencySplitJoin(
        stream, model, Seq("term"), "freq", fanout = 16L)
      assert(split.count() == plain.count())
      assert(split.exceptAll(plain).isEmpty &&
        plain.exceptAll(split).isEmpty,
        "frequency split must be result-identical to the plain join")
      // pigeonhole: the head has at most `fanout` keys
      val total = model.agg(sum("freq")).collect()(0).getLong(0)
      val headKeys = model.filter($"freq" * 16 > total).count()
      assert(headKeys >= 1 && headKeys <= 16,
        s"head must be non-empty and pigeonhole-bounded, got $headKeys")
      // shape: the head reaches the stream via BROADCAST joins (score
      // + anti-screen) even with auto-broadcast off — the explicit
      // hint is the point; the tail is the only shuffle join left
      val f = split.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(f).length >= 2,
        "head score + anti screen must both be broadcast joins")
      assert(f.contains("LeftAnti"),
        "head keys must be screened out of the tail by an anti-join")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("frequencySplitJoin property: equals the plain join on random " +
    "skew shapes, fanouts, and multi-column keys") {
    // Seeded-random trials (the BpeSpec discipline): power-law,
    // uniform, and single-key-only streams × fanouts {4, 64, 4096},
    // including a two-column key and model keys with no stream rows.
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 4; fanout <- Seq(4L, 64L, 4096L)) {
      val nKeys = 1 + rnd.nextInt(40)
      val stream = (1 to 2000).map { i =>
        // trial 1: heavy power-law; 2: uniform; 3: one key only;
        // 4: two hot keys + tail
        val k = trial match {
          case 1 => math.min(nKeys, 1 + (1 / math.max(1e-9,
            rnd.nextDouble() * rnd.nextDouble())).toInt % nKeys)
          case 2 => 1 + rnd.nextInt(nKeys)
          case 3 => 1
          case _ => if (rnd.nextBoolean()) 1 + (i % 2) else 1 + rnd.nextInt(nKeys)
        }
        (i.toLong, s"k$k", k % 3)
      }.toDF("id", "key", "sub")
      val model = stream.groupBy("key", "sub")
        .agg(count(lit(1)).as("freq"))
        .withColumn("payload", length($"key") * $"sub")
        // model rows absent from the stream must simply not match
        .unionByName(Seq(("never", 9, 1L, 0))
          .toDF("key", "sub", "freq", "payload"))
      val plain = stream.join(model, Seq("key", "sub"))
      val split = ScaleJoins.frequencySplitJoin(
        stream, model, Seq("key", "sub"), "freq", fanout)
      assert(split.exceptAll(plain).isEmpty &&
        plain.exceptAll(split).isEmpty,
        s"trial=$trial fanout=$fanout: result mismatch")
    }
  }

  test("bucketized join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      val customer = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      val bo = ScaleJoins.bucketize(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_orders_b", "o_custkey", 4)
      val bc = ScaleJoins.bucketize(
        customer.withColumnRenamed("c_custkey", "o_custkey")
          .select("o_custkey", "c_name"),
        "t_customer_b", "o_custkey", 4)
      val joined = bo.join(bc, "o_custkey")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: $shuffles")
      // and it is still correct
      assert(joined.count() ==
        orders.join(customer, $"o_custkey" === $"c_custkey").count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("runtimeFilteredJoin: the Bloom runtime filter is actually " +
      "injected, the result equals the plain join, and the conf " +
      "overrides do not leak") {
    val d = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = graft.Tables.customer(spark, d)
      .filter($"c_mktsegment" === "BUILDING")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val confKeys = ScaleJoins.runtimeFilterConfs.map(_._1)
    val before = confKeys.map(k => k -> spark.conf.getOption(k))

    // plan evidence: under the operator's exact confs, the optimized
    // plan carries the injected bloom probe on the application side
    ScaleJoins.runtimeFilterConfs.foreach { case (k, v) =>
      spark.conf.set(k, v) }
    val planStr =
      try orders.hint("merge").join(cust, "o_custkey")
        .queryExecution.optimizedPlan.toString
      finally before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    assert(planStr.contains("might_contain"),
      s"expected an injected Bloom runtime filter, plan:\n$planStr")

    val got = ScaleJoins.runtimeFilteredJoin(orders, cust, "o_custkey")
    // conf restore: the fixture-scale thresholds must not leak into
    // later plans in the session
    assert(confKeys.map(k => k -> spark.conf.getOption(k)) == before)
    val plain = orders.join(cust, "o_custkey")
    assert(got.count() == plain.count())
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }
}
