package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], parts: Int): Map[Long, Long] =
    PrefixSum.prefixSum(
      rows.toDF("k", "v").repartition(parts), col("v"), "ps", col("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("ps")).toMap

  private def expected(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.sortBy(_._1).scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (k, v)) => (k, acc + v)
    }.tail.toMap

  test("equals the single-window scan on mixed-sign values") {
    val rows = Seq[(Long, Long)](
      (5, 3), (1, -2), (9, 7), (3, 0), (7, -5), (2, 10), (8, 1),
      (4, -1), (6, 4), (10, -3))
    assert(run(rows, 1) == expected(rows))
    assert(run(rows, 7) == expected(rows))
  }

  test("partition-count invariant: carry-in compensates any range split") {
    val rows = (1L to 200L).map(k => (k, k % 13 - 6))
    val base = expected(rows)
    for (p <- Seq(1, 3, 32, 64)) assert(run(rows, p) == base)
  }

  test("preserves the input row set and existing columns") {
    val df = Seq((3L, 10L, "c"), (1L, 5L, "a"), (2L, 7L, "b"))
      .toDF("k", "v", "tag")
    val out = PrefixSum.prefixSum(df, col("v"), "ps", col("k"))
      .orderBy("k").collect()
    assert(out.map(_.getAs[String]("tag")).toSeq == Seq("a", "b", "c"))
    assert(out.map(_.getAs[Long]("ps")).toSeq == Seq(5L, 12L, 22L))
  }

  test("multi-column fold equals chained single-column calls and " +
      "shares one range shuffle") {
    val rows = Seq[(Long, Long, Long)](
      (5, 3, 1), (1, -2, 4), (9, 7, -2), (3, 0, 0), (7, -5, 9),
      (2, 10, -7), (8, 1, 3), (4, -1, 5), (6, 4, -6), (10, -3, 2))
    val df = rows.toDF("k", "a", "b").repartition(5)
    val multi = PrefixSum.prefixSums(df,
        Seq(col("a") -> "pa", col("b") -> "pb"), col("k"))
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("pa"),
        r.getAs[Long]("pb")))
    val chained = PrefixSum.prefixSum(
        PrefixSum.prefixSum(df, col("a"), "pa", col("k")),
        col("b"), "pb", col("k"))
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("pa"),
        r.getAs[Long]("pb")))
    assert(multi.toSeq == chained.toSeq)
    // k columns, ONE pass: exactly as many range exchanges as the
    // single-column operator (the chained form pays one per column)
    def ranges(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.toString.split("rangepartitioning").length - 1
    val one = ranges(PrefixSum.prefixSum(df, col("a"), "pa", col("k"))
      .queryExecution.executedPlan)
    val two = ranges(PrefixSum.prefixSums(df,
      Seq(col("a") -> "pa", col("b") -> "pb"), col("k"))
      .queryExecution.executedPlan)
    assert(two == one, s"multi-column fold re-shuffled: $two vs $one")
  }

  test("no unpartitioned window in the physical plan") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    // Descend into AQE wrappers — a bare plan.collect stops at
    // AdaptiveSparkPlanExec and would pass vacuously.
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: inner.flatMap(flatten)
    }
    val df = (1L to 50L).map(k => (k, k)).toDF("k", "v")
    val plan = PrefixSum.prefixSum(df, col("v"), "ps", col("k"))
      .queryExecution.executedPlan
    val windows = flatten(plan).collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the per-partition scan window")
    val bad = windows.filter(_.partitionSpec.isEmpty).map(_.nodeName)
    assert(bad.isEmpty, s"unpartitioned windows: $bad")
  }
}
