package graft.sinks

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}

/** Pins the two runtime scan-shrinking features the source pack
  * demonstrates: dynamic partition pruning (q_join_dpp) and nested
  * schema pruning (q_source_nested). */
class DppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case qs: QueryStageExec => Seq(qs.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("q_join_dpp: the dim filter reaches the partitioned fact scan " +
    "as a runtime dynamicpruning subquery") {
    val df = SparkEntry.queries("q_join_dpp")(spark, sf)
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec
        if f.relation.partitionSchema.exists(_.name == "lang") => f }
    assert(scans.nonEmpty, "no partitioned fact scan in the plan")
    val pf = scans.head.partitionFilters.map(_.sql.toLowerCase)
    assert(pf.exists(_.contains("dynamicpruning")),
      s"no dynamic pruning filter on the fact scan: $pf")
    assert(df.count() > 0)
  }

  test("q_source_nested: the scan reads only meta.lang, not the " +
    "whole struct") {
    val df = SparkEntry.queries("q_source_nested")(spark, sf)
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val read = scans.head.requiredSchema.catalogString
    assert(read.contains("lang") && !read.contains("source") &&
      !read.contains("n_chars"),
      s"nested pruning failed, ReadSchema: $read")
  }
}
