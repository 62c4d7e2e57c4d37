package graft

import org.apache.spark.sql.functions._

/** Error-bound pins for the sketch aggregates (q_agg_approx): no
  * cross-engine oracle exists for HLL++/GK sketches, so correctness
  * is "within documented error of the exact answer", per group, and
  * deterministic across partition layouts (both sketches are
  * RNG-free and merge-associative... up to merge order; HLL++ merges
  * are max-per-register, hence layout-independent).
  */
class AggSketchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact, per group") {
    val li = Tables.lineitem(spark, dir)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_agg_approx")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getAs[Long]("approx_orders")).toMap
    for ((g, x) <- exact) {
      val a = approx(g)
      assert(math.abs(a - x).toDouble / x < 0.05, s"group $g: $a vs $x")
    }
  }

  test("approx_percentile lands between the exact p45 and p55") {
    val li = Tables.lineitem(spark, dir)
    val bounds = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.45)).as("lo"),
        percentile(col("l_quantity"), lit(0.55)).as("hi"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = SparkEntry.queries("q_agg_approx")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getAs[Double]("approx_median")).toMap
    for ((g, (lo, hi)) <- bounds)
      assert(approx(g) >= lo && approx(g) <= hi,
        s"group $g: ${approx(g)} outside [$lo, $hi]")
  }

  test("sketches are partition-layout independent") {
    val a = SparkEntry.queries("q_agg_approx")(spark, dir).collect().toSeq
    val li = Tables.lineitem(spark, dir).repartition(17)
    val b = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.01)
          .as("approx_orders"),
        approx_percentile(col("l_quantity"), lit(0.5), lit(1000))
          .as("approx_median"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    assert(a.map(_.getAs[Long]("approx_orders")) ==
      b.map(_.getAs[Long]("approx_orders")))
    // The GK quantile sketch is merge-order sensitive, so bit equality
    // across layouts is NOT guaranteed — pin the error bound instead:
    // both layouts' medians must sit inside the exact p45..p55 band.
    val bounds = Tables.lineitem(spark, dir).groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.45)).as("lo"),
        percentile(col("l_quantity"), lit(0.55)).as("hi"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    for (rows <- Seq(a, b); r <- rows) {
      val (lo, hi) = bounds(r.getAs[String]("l_returnflag"))
      val m = r.getAs[Double]("approx_median")
      assert(m >= lo && m <= hi,
        s"median $m outside [$lo, $hi] for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("count-min sketch: never undercounts, overcount within eps*N") {
    val rows = SparkEntry.queries("q_agg_cms")(spark, dir).collect()
    assert(rows.length == 20)
    val n = Tables.lineitem(spark, dir).count()
    val epsN = math.ceil(0.001 * n).toLong
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_cnt"), r.getAs[Long]("est_cnt"))
      assert(r.getAs[Boolean]("never_undercounts") && est >= exact,
        s"CMS undercounted key ${r.getLong(0)}: $est < $exact")
      assert(est <= exact + epsN,
        s"key ${r.getLong(0)}: overcount $est > $exact + $epsN")
    }
    // fixed seed → deterministic estimates run-to-run
    val again = SparkEntry.queries("q_agg_cms")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("est_cnt")).toSeq ==
      again.map(_.getAs[Long]("est_cnt")).toSeq)
  }

  test("incremental HLL: union of daily sketches equals the direct " +
    "month sketch and estimates MAU within bound") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_sketch_incremental")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (est, exact) =
        (r.getAs[Long]("est_mau"), r.getAs[Long]("exact_mau"))
      assert(r.getAs[Boolean]("within_bound"),
        s"month ${r.get(0)}: estimate $est vs exact $exact drifts " +
          s"past 5%")
    }
    // union-of-daily ≡ sketch-over-the-whole-month: HLL union is
    // register-wise max, so incremental maintenance loses nothing
    // vs a full rescan — the property that makes the daily table
    // authoritative.
    val ev = graft.Tables.events(spark, dir).select(col("user_id"),
      date_trunc("month", timestamp_micros(expr("ts div 1000")))
        .as("month"))
    val direct = ev.groupBy("month")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("direct_est"))
      .collect().map(r => r.get(0) -> r.getAs[Long]("direct_est"))
      .toMap
    for (r <- rows)
      assert(r.getAs[Long]("est_mau") == direct(r.get(0)),
        s"month ${r.get(0)}: union-of-daily != direct sketch")
  }
}
