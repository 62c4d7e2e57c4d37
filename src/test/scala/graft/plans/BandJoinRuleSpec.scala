package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class BandJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points: DataFrame =
    (0L until 400L).map(i => (i, i * 7 - 1400)).toDF("pid", "t")

  private lazy val intervals: DataFrame =
    (0L until 120L).map { i =>
      val lo = i * 37 - 2200
      (i, lo, lo + (i % 5) * 40)
    }.toDF("iid", "lo", "hi")

  /** Run `build` with the rule installed and a band width set;
    * returns (result rows sorted, physical plan string). */
  private def withRule[T](width: Long)(build: => DataFrame): (Seq[String], String) = {
    spark.experimental.extraOptimizations = Seq(BandJoinRule)
    spark.conf.set(BandJoinRule.WidthConf, width.toString)
    try {
      val df = build
      val rows = df.collect().map(_.toString).sorted.toSeq
      (rows, df.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.unset(BandJoinRule.WidthConf)
      spark.experimental.extraOptimizations = Nil
    }
  }

  private def baseline(build: => DataFrame): Seq[String] =
    build.collect().map(_.toString).sorted.toSeq

  test("BETWEEN theta join rewrites to a banded equi-join with " +
      "identical results (negatives and empty intervals included)") {
    def q = points.join(intervals,
      points("t") >= intervals("lo") && points("t") <= intervals("hi"))
    val base = baseline(q)
    assert(baseline(q) == base) // deterministic baseline
    val (rows, plan) = withRule(64)(q)
    assert(rows == base, "rewritten results must equal the theta join")
    assert(plan.contains("__graft_band"), s"rule did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rewritten plan must not nest-loop:\n$plan")
  }

  test("strict bounds with reversed operand order rewrite and agree") {
    def q = points.join(intervals,
      intervals("lo") < points("t") && points("t") < intervals("hi"))
    val base = baseline(q)
    val (rows, plan) = withRule(50)(q)
    assert(rows == base)
    assert(plan.contains("__graft_band"))
  }

  test("point side on the right rewrites and agrees") {
    def q = intervals.join(points,
      points("t") >= intervals("lo") && points("t") <= intervals("hi"))
    val base = baseline(q)
    val (rows, plan) = withRule(64)(q)
    assert(rows == base)
    assert(plan.contains("__graft_band"))
  }

  test("null points and null bounds drop on both paths") {
    val np = Seq((1L, Some(10L)), (2L, None), (3L, Some(-50L)))
      .toDF("pid", "t")
    val ni = Seq((1L, Some(0L), Some(20L)), (2L, None, Some(99L)),
      (3L, Some(-60L), None)).toDF("iid", "lo", "hi")
    def q = np.join(ni,
      np("t") >= ni("lo") && np("t") <= ni("hi"))
    val base = baseline(q)
    val (rows, _) = withRule(16)(q)
    assert(rows == base)
    // only (pid 1, t=10) ∈ [0,20]; every null bound/point drops
    assert(base.size == 1)
  }

  test("integer-typed points and bounds rewrite through the Long cast") {
    val ip = (0 until 200).map(i => (i, i * 3 - 300)).toDF("pid", "t")
    val ii = (0 until 40).map { i =>
      val lo = i * 17 - 340; (i, lo, lo + 25)
    }.toDF("iid", "lo", "hi")
    def q = ip.join(ii, ip("t") >= ii("lo") && ip("t") <= ii("hi"))
    val base = baseline(q)
    val (rows, plan) = withRule(32)(q)
    assert(rows == base)
    assert(plan.contains("__graft_band"))
  }

  test("guard: a cross-side equality conjunct suppresses the rewrite") {
    def q = points.withColumn("k", points("pid") % 10)
      .join(intervals.withColumn("k2", intervals("iid") % 10),
        $"k" === $"k2" && $"t" >= $"lo" && $"t" <= $"hi")
    val base = baseline(q)
    val (rows, plan) = withRule(64)(q)
    assert(rows == base)
    assert(!plan.contains("__graft_band"),
      "equi-join candidates must be left to Spark's own planner")
  }

  test("guard: unset width leaves the theta join untouched") {
    spark.experimental.extraOptimizations = Seq(BandJoinRule)
    try {
      val plan = points.join(intervals,
        points("t") >= intervals("lo") && points("t") <= intervals("hi"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_band"))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("one-sided inequality (theta, not a band) is not rewritten") {
    def q = points.join(intervals, points("t") < intervals("lo"))
    val (rows, plan) = withRule(64)(q)
    assert(!plan.contains("__graft_band"))
    assert(rows == baseline(q))
  }
}
