package graft.sinks

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Pins that the partitioned layout delivers PRUNING, not post-scan
  * filtering: the lang predicate must live in the scan's
  * partitionFilters (files of other languages are skipped at the
  * metadata level and never opened). */
class PartitionPruneSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case qs: QueryStageExec => Seq(qs.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("lang predicate becomes a PartitionFilter on the partitioned " +
    "corpus; non-matching files are not even listed into the scan") {
    val back = PartitionedCorpusSink.writeAndRead(
      Tables.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "n_chars", "lang"),
      "graft_part_corpus_spec", "lang")
    val pruned = back.filter(col("lang") === "en")
      .select("doc_id", "lang", "n_chars")
    val scans = flatten(pruned.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no file scan found")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(
      _.name == "lang")), s"lang not in partitionFilters: " +
      s"${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.references.exists(
      _.name == "lang")), "lang leaked into post-scan data filters")
    // the pruned scan must read strictly fewer files than the table
    val allFiles = flatten(back.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }.head
      .relation.location.inputFiles.length
    assert(scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
      .map(_.files.size).sum < allFiles,
      "partition filter did not reduce the file set")
    // and the data survives the round trip where it counts
    assert(pruned.count() ==
      Tables.documents(spark, "/root/testdata/sf0.001")
        .filter(col("lang") === "en").count())
  }
}
