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
      orderKeys: Column*): DataFrame = {
    val ranged = df.repartitionByRange(orderKeys: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", valueCol)
    val totals = ranged.groupBy("_pid").agg(sum(col("_v")).as("_pt"))
    // one row, one ≤ #shuffle-partitions-long array (see scaladoc)
    val carry = totals
      .agg(sort_array(collect_list(struct(col("_pid"), col("_pt"))))
        .as("ts"))
      .select(explode(expr(
        """transform(ts, (t, i) -> struct(
          |  t._pid AS _pid,
          |  aggregate(slice(ts, 1, i), 0L, (a, x) -> a + x._pt)
          |    AS _carry))""".stripMargin)).as("c"))
      .select(col("c._pid").as("_pid"), col("c._carry").as("_carry"))
    val w = Window.partitionBy("_pid").orderBy(orderKeys: _*)
    ranged.join(broadcast(carry), "_pid")
      .withColumn(outCol, col("_carry") + sum(col("_v")).over(w))
      .drop("_pid", "_v", "_carry")
  }
}
