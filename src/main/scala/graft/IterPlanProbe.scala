package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: the per-ITERATION join plan of the iterative
  * graph operators, before/after the r15 edge-frame change. The
  * operators checkpoint per round, so the RETURNED frame's explain
  * shows only `Scan ExistingRDD` — the loop-internal plan the
  * optimization targets is only visible on the iteration frame
  * itself. This probe builds ONE propagation step over both
  * edge-frame shapes (the pre-r15 raw localCheckpoint RDD and the
  * r15 partitioned+sorted cache) and dumps both executed plans, so
  * the committed plan diff shows exactly what changed: the edge
  * side's per-round Exchange+Sort collapsing into an
  * InMemoryTableScan that already satisfies the join's distribution
  * and ordering requirements.
  *
  * Usage: runMain graft.IterPlanProbe <sfDir> <outDir>
  */
object IterPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "plans/r15"
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // the pagerank edge list (orders x lineitem distinct pairs, both
    // directions) — same build as GraphQueries.buildEdges
    val pairs = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sfDir)
          .select("l_orderkey", "l_suppkey").distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("a"),
        (col("l_suppkey").cast("long") * 2 + 1).as("b"))
      .distinct()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))

    def oneStep(e: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val r = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .withColumn("rank", lit(graft.operators.PageRank.Scale))
        .localCheckpoint(true)
      val step = e.join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("in_sum"))
      step.write.format("noop").mode("overwrite").save()
      val plan = step.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"pagerank_iteration_$tag.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[iterplan] wrote $outDir/pagerank_iteration_$tag.txt")
    }
    // BEFORE shape (pre-r15): raw RDD blocks — partitioning invisible
    // to the SQL layer, every iteration re-shuffles + re-sorts e.
    oneStep(edges.localCheckpoint(true), "before")
    // AFTER shape (r15): partitioned + sorted cache.
    oneStep(edges.repartition(col("src")).sortWithinPartitions("src")
      .persist(), "after")

    // One CONNECTED-COMPONENTS label-propagation step over both step
    // shapes (r15 session 2): BEFORE is the join → groupBy(dst) →
    // left-join-back form (three shuffle boundaries per step); AFTER
    // is the union + single groupBy(id) form ConnectedComponents
    // .components now uses — the own-label rides the aggregate as a
    // tagged row, so the min-combine and the changed flag come out
    // of ONE exchange and the second join disappears.
    {
      val sym = edges.repartition(col("src")).sortWithinPartitions("src")
        .persist()
      val lbl = sym.select(col("src").as("id"))
        .distinct().withColumn("comp", col("id"))
        .localCheckpoint(true)
      def dump(step: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        step.write.format("noop").mode("overwrite").save()
        val plan = step.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"cc_step_$tag.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[iterplan] wrote $outDir/cc_step_$tag.txt")
      }
      val nbrMin = sym.join(lbl, sym("src") === lbl("id"))
        .groupBy(sym("dst").as("id"))
        .agg(min(col("comp")).as("nbr"))
      dump(lbl.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"),
          (col("nbr") < col("comp")).as("changed")), "before")
      val nbr = sym.join(lbl, sym("src") === lbl("id"))
        .select(sym("dst").as("id"), col("comp"), lit(false).as("own"))
      dump(lbl.select(col("id"), col("comp"), lit(true).as("own"))
        .union(nbr)
        .groupBy("id")
        .agg(min(col("comp")).as("newc"),
          min(when(col("own"), col("comp"))).as("oldc"))
        .select(col("id"), col("newc").as("comp"),
          (col("newc") < col("oldc")).as("changed")), "after")
    }
    // The SYM EDGE-FRAME BUILD of ConnectedComponents.components
    // (r15 session 3), over the same asymmetric pair frame the real
    // callers pass (here: the trading pairs, one direction). BEFORE
    // is union-of-two-selects → distinct() → repartition(src): the
    // upstream pair DAG is planned as TWO union branches (executed
    // per direction) and the build pays TWO full O(E) exchanges (the
    // distinct's hash(src,dst) exchange plus the repartition's
    // hash(src) exchange). AFTER emits both directions from ONE pass
    // via explode(array(e, swap(e))) and runs the pair dedup INSIDE
    // the repartitioned partitions — dropDuplicates(src, dst) needs
    // ClusteredDistribution(src, dst), which hashpartitioning(src)
    // already satisfies, so the aggregate adds no exchange: one scan
    // of the pair DAG, ONE O(E) exchange total.
    {
      def dumpBuild(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"cc_symbuild_$tag.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[iterplan] wrote $outDir/cc_symbuild_$tag.txt")
      }
      val p = pairs.select(col("a").as("src"), col("b").as("dst"))
      dumpBuild(p.select(col("src"), col("dst"))
        .union(p.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().repartition(col("src"))
        .sortWithinPartitions("src"), "before")
      dumpBuild(p.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("src")).dropDuplicates("src", "dst")
        .sortWithinPartitions("src"), "after")
    }
    spark.stop()
  }
}
