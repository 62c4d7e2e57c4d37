package graft

import org.apache.spark.sql.functions._

/** Error-bound pins for the sketch aggregates.
  *
  * The REGISTRY keys (q_agg_approx, q_agg_cms, q_sketch_incremental)
  * now run graft's portable sketches (operators/PortableSketch.scala)
  * and are DuckDB-hash-gated; this spec pins their error bounds
  * against the exact answers, and ALSO demonstrates Spark's native
  * sketch aggregates (HLL++ `approx_count_distinct`, GK
  * `approx_percentile`, `count_min_sketch`, DataSketches
  * `hll_sketch_agg`/`hll_union_agg`) — the engine-private fast path
  * a pure-Spark pipeline would use when cross-engine auditability
  * isn't required.
  */
class AggSketchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  // ---- portable sketches (the hash-gated registry keys) ----

  test("portable HLL estimate within 5% of exact, per group") {
    val rows = SparkEntry.queries("q_agg_approx")(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (est, exact) =
        (r.getAs[Long]("est_orders"), r.getAs[Long]("exact_orders"))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"group ${r.getString(0)}: $est vs $exact")
    }
  }

  test("portable sampled median lands between the exact p45 and p55") {
    val li = Tables.lineitem(spark, dir)
    val bounds = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.45)).as("lo"),
        percentile(col("l_quantity"), lit(0.55)).as("hi"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    SparkEntry.queries("q_agg_approx")(spark, dir).collect().foreach {
      r =>
        val (lo, hi) = bounds(r.getAs[String]("l_returnflag"))
        val m = r.getAs[Double]("approx_median")
        assert(m >= lo && m <= hi, s"median $m outside [$lo, $hi]")
    }
  }

  test("portable CMS: never undercounts, overcount within (e/W)*N") {
    val rows = SparkEntry.queries("q_agg_cms")(spark, dir).collect()
    assert(rows.length == 20)
    val n = Tables.lineitem(spark, dir).count()
    val epsN = math.ceil(math.E / operators.PortableSketch.W * n).toLong
    rows.foreach { r =>
      val (exact, est) =
        (r.getAs[Long]("exact_cnt"), r.getAs[Long]("est_cnt"))
      assert(r.getAs[Boolean]("never_undercounts") && est >= exact,
        s"CMS undercounted key ${r.getLong(0)}: $est < $exact")
      assert(est <= exact + epsN,
        s"key ${r.getLong(0)}: overcount $est > $exact + $epsN")
    }
    // hash-derived → deterministic run-to-run
    val again = SparkEntry.queries("q_agg_cms")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("est_cnt")).toSeq ==
      again.map(_.getAs[Long]("est_cnt")).toSeq)
  }

  test("incremental portable HLL estimates MAU within bound") {
    val rows = SparkEntry.queries("q_sketch_incremental")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Boolean]("within_bound"),
        s"month ${r.get(0)}: ${r.getAs[Long]("est_mau")} vs " +
          s"${r.getAs[Long]("exact_mau")} drifts past 5%")
  }

  // ---- native Spark sketches (engine-private fast path) ----

  test("native approx_count_distinct within 5% of exact, per group") {
    val li = Tables.lineitem(spark, dir)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01)
        .as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, x) <- exact)
      assert(math.abs(approx(g) - x).toDouble / x < 0.05,
        s"group $g: ${approx(g)} vs $x")
  }

  test("native sketches are partition-layout independent (HLL++)") {
    val a = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01)
        .as("a"))
      .orderBy("l_returnflag").collect().map(_.getLong(1)).toSeq
    val b = Tables.lineitem(spark, dir).repartition(17)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01)
        .as("a"))
      .orderBy("l_returnflag").collect().map(_.getLong(1)).toSeq
    assert(a == b)
  }

  test("native count_min_sketch: never undercounts over 20 probes") {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val bytes = li.select(
      expr("count_min_sketch(l_orderkey, 0.001d, 0.99d, 42)").as("cms"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = li.filter(col("l_orderkey") < 20)
      .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = li.count()
    (0L until 20L).foreach { k =>
      val (e, est) = (exact.getOrElse(k, 0L), cms.estimateCount(k))
      assert(est >= e, s"native CMS undercounted $k")
      assert(est <= e + math.ceil(0.001 * n).toLong)
    }
  }

  test("native DataSketches HLL: union of daily equals direct month") {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      date_trunc("day", timestamp_micros(expr("ts div 1000")))
        .as("day"))
    val viaUnion = ev.groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy(date_trunc("month", col("day")).as("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.get(0) -> r.getAs[Long]("est")).toMap
    val direct = ev
      .groupBy(date_trunc("month", col("day")).as("month"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect().map(r => r.get(0) -> r.getAs[Long]("est")).toMap
    assert(viaUnion == direct)
  }
}
