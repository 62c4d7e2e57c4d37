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

  test("reversed bounds (lo > hi) emit zero bands, matching the " +
      "theta join's empty result for those rows") {
    val ri = Seq((1L, 100L, 0L), (2L, -50L, -10L), (3L, 5L, 5L))
      .toDF("iid", "lo", "hi")
    def q = points.join(ri,
      points("t") >= ri("lo") && points("t") <= ri("hi"))
    val base = baseline(q)
    val (rows, plan) = withRule(16)(q)
    assert(rows == base)
    assert(plan.contains("__graft_band"))
    // iid 1 ([100,0]) is empty under theta semantics — no row of the
    // result may reference it
    assert(!base.exists(_.endsWith("100,0]")))
  }

  test("an interval spanning more than the per-row cap raises a " +
      "descriptive error instead of materializing the bands") {
    val sentinel = Seq((1L, 0L, Long.MaxValue - 2))
      .toDF("iid", "lo", "hi")
    def q = points.join(sentinel,
      points("t") >= sentinel("lo") && points("t") <= sentinel("hi"))
    val err = intercept[Exception] {
      withRule(16)(q)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("BandJoinRule")),
      s"expected the rule's descriptive error, got: $err")
  }

  test("guard: a null-safe equality conjunct (<=>) suppresses the " +
      "rewrite like a plain equality") {
    def q = points.withColumn("k", points("pid") % 10)
      .join(intervals.withColumn("k2", intervals("iid") % 10),
        $"k" <=> $"k2" && $"t" >= $"lo" && $"t" <= $"hi")
    val base = baseline(q)
    val (rows, plan) = withRule(64)(q)
    assert(rows == base)
    assert(!plan.contains("__graft_band"))
  }

  test("builder-time path: a session created with GraftExtensions " +
      "applies the rule from the width conf alone") {
    import org.apache.spark.sql.SparkSession
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne orig, "builder must create a fresh session")
      import s2.implicits._
      val p2 = (0L until 100L).map(i => (i, i * 3)).toDF("pid", "t")
      val i2 = (0L until 20L).map(i => (i, i * 13, i * 13 + 30))
        .toDF("iid", "lo", "hi")
      def q2 = p2.join(i2, p2("t") >= i2("lo") && p2("t") <= i2("hi"))
      val before = q2.queryExecution.executedPlan.toString
      assert(!before.contains("__graft_band"), "no-op until conf set")
      val thetaRows = q2.collect().map(_.toString).sorted.toSeq
      s2.conf.set(BandJoinRule.WidthConf, "32")
      try {
        val df = q2
        val rows = df.collect().map(_.toString).sorted.toSeq
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("__graft_band"),
          s"extension-injected rule did not fire:\n$plan")
        assert(rows == thetaRows)
      } finally s2.conf.unset(BandJoinRule.WidthConf)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  private lazy val ivalsA: DataFrame =
    (0L until 150L).map { i =>
      val s = i * 11 - 800; (i, s, s + (i % 7) * 9)
    }.toDF("a_key", "a_s", "a_e")

  private lazy val ivalsB: DataFrame =
    (0L until 90L).map { i =>
      val s = i * 19 - 850; (i, s, s + (i % 5) * 16)
    }.toDF("b_key", "b_s", "b_e")

  test("interval-overlap theta join rewrites to the double-banded " +
      "equi-join with first-shared-band dedup, results identical") {
    def q = ivalsA.join(ivalsB,
      ivalsA("a_s") <= ivalsB("b_e") && ivalsB("b_s") <= ivalsA("a_e"))
    val base = baseline(q)
    val (rows, plan) = withRule(32)(q)
    assert(rows == base,
      s"overlap rewrite changed the result: ${rows.size} vs ${base.size}")
    assert(plan.contains("__graft_band_a") &&
      plan.contains("__graft_band_b"), s"overlap rule did not fire:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("interval-overlap with reversed endpoints still matches the " +
      "theta semantics (reversed rows can overlap)") {
    // a_e < a_s on some rows: under the overlap predicate such rows
    // can STILL pair (aS <= bE and bS <= aE can both hold) — zero
    // bands would lose them, which is why the overlap shape keeps
    // the raw (possibly descending) sequence
    val ra = Seq((1L, 10L, 5L), (2L, 0L, 40L), (3L, -30L, -60L))
      .toDF("a_key", "a_s", "a_e")
    def q = ra.join(ivalsB,
      ra("a_s") <= ivalsB("b_e") && ivalsB("b_s") <= ra("a_e"))
    val base = baseline(q)
    val (rows, plan) = withRule(16)(q)
    assert(rows == base)
    assert(plan.contains("__graft_band_a"))
    // a REVERSED row (a_key 1 or 3) must actually pair, or the test
    // no longer covers the descending-sequence branch it documents
    assert(base.exists(r => r.startsWith("[1,") || r.startsWith("[3,")),
      s"fixture must pair a reversed interval; got: $base")
  }

  test("overlap guard: the point-in-interval shape takes priority " +
      "when both bound conjuncts sit on one side") {
    def q = points.join(intervals,
      points("t") >= intervals("lo") && points("t") <= intervals("hi"))
    val (_, plan) = withRule(64)(q)
    assert(plan.contains("__graft_band_p") &&
      !plan.contains("__graft_band_a"))
  }

  test("one-sided inequality (theta, not a band) is not rewritten") {
    def q = points.join(intervals, points("t") < intervals("lo"))
    val (rows, plan) = withRule(64)(q)
    assert(!plan.contains("__graft_band"))
    assert(rows == baseline(q))
  }

  private def withRuleHybrid(width: Long)(build: => DataFrame)
  : (Seq[String], String) = {
    spark.conf.set(BandJoinRule.OverflowConf, "hybrid")
    try withRule(width)(build)
    finally spark.conf.unset(BandJoinRule.OverflowConf)
  }

  test("hybrid overflow: sentinel-wide intervals keep the theta " +
      "path, narrow ones stay banded, results match the theta join") {
    // two open-ended sentinels (one on each end of the long range)
    // among ordinary intervals — the exact class the error default
    // would refuse
    val mixed = intervals.union(
      Seq((900L, 0L, Long.MaxValue - 2),
        (901L, Long.MinValue + 2, 50L)).toDF("iid", "lo", "hi"))
    def q = points.join(mixed,
      points("t") >= mixed("lo") && points("t") <= mixed("hi"))
    val base = baseline(q)
    val (rows, plan) = withRuleHybrid(64)(q)
    assert(rows == base,
      s"hybrid result drifted: ${rows.size} vs ${base.size}")
    assert(plan.contains("__graft_band"), s"banded branch missing:\n$plan")
    assert(plan.contains("Union"), s"hybrid must union branches:\n$plan")
    // the fixpoint batch must converge after ONE split: a re-split of
    // the marker-guarded theta branch would nest further Unions
    assert(plan.linesIterator.count(_.trim.startsWith("Union")) == 1,
      s"rule re-split its own theta branch:\n$plan")
    // sentinel matches must actually flow through the theta branch
    assert(base.exists(_.contains("900,")),
      "fixture must produce sentinel matches")
  }

  test("hybrid overflow with no over-cap rows adds no duplicates " +
      "(the wide branch is empty, the union is a no-op)") {
    def q = points.join(intervals,
      points("t") >= intervals("lo") && points("t") <= intervals("hi"))
    val base = baseline(q)
    val (rows, plan) = withRuleHybrid(64)(q)
    assert(rows == base)
    assert(plan.contains("__graft_band"))
  }

  test("hybrid overflow: null bounds drop from both branches exactly " +
      "like the theta join") {
    val ni = Seq((1L, Some(0L), Some(20L)), (2L, None, Some(99L)),
      (3L, Some(-60L), None),
      (4L, Some(0L), Some(Long.MaxValue - 2))).toDF("iid", "lo", "hi")
    def q = points.join(ni,
      points("t") >= ni("lo") && points("t") <= ni("hi"))
    val base = baseline(q)
    val (rows, _) = withRuleHybrid(16)(q)
    assert(rows == base)
  }
}
