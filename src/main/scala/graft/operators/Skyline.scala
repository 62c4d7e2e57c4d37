package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier, minimize both axes).
  *
  * A point survives iff no other point is ≤ on both coordinates and
  * < on at least one. On DISTINCT points sorted lexicographically by
  * (x, y), that collapses to a prefix test: a point is dominated iff
  * some lexicographic predecessor has y ≤ its y — so the frontier is
  * "keep while running-min-of-y strictly decreases", an O(n log n)
  * sort problem, not the O(n²) pairwise dominance join a naive
  * NOT-EXISTS encodes.
  *
  * Scale shape: the obvious implementation is a single global-order
  * window (min(y) over ORDER BY x, y) — exactly the unpartitioned
  * WindowExec this repo's plan guard rejects, because it serializes
  * the whole point set through one task. Instead:
  * range-partition by (x, y) so partition i holds a contiguous
  * lexicographic slice, take the running min WITHIN each partition
  * (partitioned window, parallel), and bridge partitions with each
  * earlier partition's min-y — a #partitions-row frame folded into
  * exclusive prefix minima via the same broadcast theta self-join as
  * [[graft.queries.AnalyticsQueries]]'s globalRank (bounded by
  * cluster config, never by data). The frontier predicate then reads
  * min(local prefix min, earlier-partition prefix min) — identical
  * to the global-window result on any partitioning, which is what
  * lets a DuckDB oracle replay it with the plain single-window form.
  *
  * Callers pass distinct (x, y) pairs (with a multiplicity column if
  * they care); collapsing duplicates first is both the determinism
  * move (strict total order, no window ties) and the scale move (the
  * sort runs over the distinct feature space).
  */
object Skyline {

  /** `pts`: DISTINCT (x, y) integral pairs, any extra columns
    * carried through. Returns the subset on the minimize-minimize
    * Pareto frontier. */
  def frontier2d(pts: DataFrame): DataFrame = {
    // persist(): ranged feeds BOTH the running-min window and the
    // per-partition minima, and repartitionByRange samples its child
    // for bounds — unmaterialized, the caller's distinct-collapse
    // executes once per consumer (the r15 before-plan held 24
    // Exchanges for a 2-shuffle computation). Lazy persist runs the
    // upstream exactly once and keeps the range partitioning for the
    // window (guide §5's cache-when-reused rule).
    val ranged = pts.repartitionByRange(col("x"), col("y"))
      .withColumn("_pid", spark_partition_id())
      .persist()
    val prefix = Window.partitionBy("_pid").orderBy("x", "y")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("_lmin", min(col("y")).over(prefix))
    val mins = ranged.groupBy("_pid").agg(min(col("y")).as("_pmin"))
    val pre = mins
      .join(broadcast(mins.select(col("_pid").as("_pid2"),
        col("_pmin").as("_pmin2"))), col("_pid2") < col("_pid"), "left")
      .groupBy("_pid").agg(min(col("_pmin2")).as("_premin"))
    // least() skips NULLs (empty prefixes), so _best is the min over
    // every lexicographic predecessor anywhere in the frame — NULL
    // only for the global first point, which is always frontier
    local.join(broadcast(pre), "_pid")
      .withColumn("_best", least(col("_lmin"), col("_premin")))
      .filter(col("_best").isNull || col("_best") > col("y"))
      .drop("_pid", "_lmin", "_premin", "_best")
  }
}
