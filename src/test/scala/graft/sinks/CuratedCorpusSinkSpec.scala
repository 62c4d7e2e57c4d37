package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** The curation pipeline's landing layout: a doc_id-bucketed,
  * within-bucket-sorted table must let downstream joins run with NO
  * Exchange and NO re-sort — the write pays the corpus's one shuffle,
  * every consumer reads for free. */
class CuratedCorpusSinkSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case qs: QueryStageExec => Seq(qs.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("consumer join over two sink-written tables: zero shuffles, " +
      "zero re-sorts, exact join result") {
    val curated = graft.queries.CurationQueries
      .curatedDocs(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars")
    val corpus = CuratedCorpusSink.write(curated,
      table = "graft_curated_sink_spec", buckets = 8)
    val enrich = CuratedCorpusSink.write(
      curated.select(col("doc_id"),
        (col("n_chars") * 2).as("enrichment")),
      table = "graft_enrich_sink_spec", buckets = 8)
    // disable broadcast: a broadcast join would dodge the layout —
    // the claim under test is the SHUFFLE join needing no shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // Since Spark 3.0 bucketed scans don't advertise the written sort
    // order by default (SPARK-28632: the one-file-per-bucket check was
    // moved behind this flag); the sink's aligned repartition
    // guarantees one file per bucket, so turning it on is sound and
    // eliminates the SMJ's per-bucket re-sorts too.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
      "true")
    try {
      val joined = corpus.join(enrich, "doc_id")
      val rows = joined.collect()
      assert(rows.nonEmpty, "curated corpus must survive the pipeline")
      val nodes = flatten(joined.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"bucketed join must not shuffle:\n" +
          joined.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[SortExec]),
        s"bucketed+sorted scan must not re-sort:\n" +
          joined.queryExecution.executedPlan)
      // layout changed nothing semantically: same rows as the
      // straight logical join
      val expect = curated.join(
        curated.select(col("doc_id"),
          (col("n_chars") * 2).as("enrichment")), "doc_id")
        .collect().map(_.toSeq.toSet).toSet
      assert(rows.map(_.toSeq.toSet).toSet == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS graft_curated_sink_spec")
      spark.sql("DROP TABLE IF EXISTS graft_enrich_sink_spec")
    }
  }
}
