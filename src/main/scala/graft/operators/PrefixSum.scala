package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum — the scan primitive behind
  * cumulative metrics that must NOT serialize the frame through one
  * task (the unpartitioned-window antipattern the plan gate bans).
  *
  * Shape (same two-pass discipline as
  * [[graft.queries.AnalyticsQueries]]'s `globalRank`, which ranks
  * instead of summing): range-shuffle the frame by the order keys so
  * ranges are contiguous per partition, window-scan WITHIN each
  * partition (partitioned by `spark_partition_id`, never global),
  * then add each partition's carry-in — the sum of all earlier
  * partitions' totals. The totals frame's size is the PARTITION
  * COUNT (cluster config, not data), so it is collapsed to ONE row
  * holding a sorted (pid, total) array, the running carries are
  * computed inside that row with an indexed `transform` (O(P²) adds
  * on P = #partitions entries — thousands at worst, on one task),
  * and the result explodes back to a P-row frame for a broadcast
  * equi-join. No window without a partition, no nested-loop join:
  * every data row is touched by exactly two narrow passes.
  *
  * `orderKeys` must be a strict total order within the frame
  * (callers tiebreak on a unique key) or the within-partition scan
  * order — and so the prefix — would be nondeterministic.
  */
object PrefixSum {

  /** Adds `outCol` = cumulative sum of `valueCol` over `orderKeys`
    * order (inclusive of the current row). Internal columns are
    * dropped; the input row set is unchanged.
    */
  def prefixSum(df: DataFrame, valueCol: Column, outCol: String,
      orderKeys: Column*): DataFrame =
    prefixSums(df, Seq(valueCol -> outCol), orderKeys: _*)

  /** Multi-column variant: every (valueCol -> outCol) scan shares
    * ONE range shuffle, ONE per-partition totals frame and ONE
    * carry join — k prefix sums cost exactly what one costs (the
    * q_corpus_ivm fold was 3 chained single-column calls = 3x the
    * two-pass machinery before this). Carries ride a single struct
    * array; the within-partition windows reuse one WindowExec. */
  def prefixSums(df: DataFrame, vals: Seq[(Column, String)],
      orderKeys: Column*): DataFrame = {
    val vcols = vals.zipWithIndex.map { case ((v, _), i) => (s"_v$i", v) }
    // persist(): ranged feeds BOTH the per-partition totals and the
    // final carry join, and repartitionByRange additionally samples
    // its child for bounds — unmaterialized, the caller's whole
    // upstream plan executes once per consumer (2-3×). Lazy persist
    // materializes it exactly once with the range partitioning
    // intact, so the carry join and the within-partition window read
    // the cache with no further exchange (same fix as globalRank /
    // Skyline; guide §5's cache-when-reused rule).
    val ranged = vcols.foldLeft(
        df.repartitionByRange(orderKeys: _*)
          .withColumn("_pid", spark_partition_id())) {
        case (d, (n, v)) => d.withColumn(n, v)
      }.persist()
    val totals = ranged.groupBy("_pid")
      .agg(sum(col(vcols.head._1)).as("_pt0"),
        vcols.tail.zipWithIndex.map { case ((n, _), i) =>
          sum(col(n)).as(s"_pt${i + 1}") }: _*)
    // one row, one ≤ #shuffle-partitions-long array (see scaladoc)
    val ptFields = vcols.indices.map(i => s"_pt$i")
    val carryFields = vcols.indices.map { i =>
      s"aggregate(slice(ts, 1, i), 0L, (a, x) -> a + x._pt$i) AS _carry$i"
    }.mkString(",\n")
    val carry = totals
      .agg(sort_array(collect_list(struct(col("_pid") +:
        ptFields.map(col): _*))).as("ts"))
      .select(explode(expr(
        s"""transform(ts, (t, i) -> struct(
           |  t._pid AS _pid,
           |$carryFields))""".stripMargin)).as("c"))
      .select(col("c._pid").as("_pid") +:
        vcols.indices.map(i => col(s"c._carry$i").as(s"_carry$i")): _*)
    val w = Window.partitionBy("_pid").orderBy(orderKeys: _*)
    val joined = ranged.join(broadcast(carry), "_pid")
    val out = vals.zipWithIndex.foldLeft(joined) {
      case (d, ((_, outCol), i)) =>
        d.withColumn(outCol, col(s"_carry$i") + sum(col(s"_v$i")).over(w))
    }
    out.drop("_pid" +: vcols.indices.flatMap(i =>
      Seq(s"_v$i", s"_carry$i")): _*)
  }
}
