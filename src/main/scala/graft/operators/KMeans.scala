package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed WEIGHTED Lloyd's k-means in pure INTEGER arithmetic.
  *
  * Float k-means is not replayable across engines (centroid means
  * are float folds in shuffle order). Here features are BIGINTs,
  * distances are exact integer squared-L2, and centroid updates are
  * floor divisions (sum div count) — every iteration is bit-identical
  * on any engine, so a DuckDB oracle can replay the unrolled
  * iterations and hash-match, the same discipline as [[PageRank]].
  * Ties in assignment break deterministically by (dist, cid) via a
  * lexicographic struct-min, mirroring the oracle's
  * ROW_NUMBER() OVER (ORDER BY dist, cid).
  *
  * The operator is weighted: callers collapse their point set to
  * distinct feature tuples with multiplicities first (`groupBy(x, y)
  * .count`). That is not just a determinism convenience (no per-row
  * id needed, so no id-collision hazards) — it is the scale move:
  * the assign/update rounds then run over the distinct feature
  * space, which for discretized features is orders of magnitude
  * smaller than the row count at 100 TB.
  *
  * Scale: per iteration the centroid table collapses to ONE row
  * holding an array of k (cid, cx, cy) structs, broadcast to every
  * task; the assignment is then a map-only
  * `array_min(transform(...))` over that array — a codegen'd scalar
  * expression, no join fan-out, no shuffle. The only shuffle per
  * iteration is the k-group update aggregation (map-side partial
  * combine reduces each task to ≤ k rows first). No windows, no
  * driver collect — the centroid array never leaves the cluster, it
  * just stays tiny. Fixed iteration count by contract (convergence
  * loops belong in the driver, as with PageRank /
  * ConnectedComponents).
  */
object KMeans {

  /** `points`: (x, y, w) — distinct non-negative BIGINT feature
    * pairs with BIGINT multiplicities. `seeds`: initial
    * (cid, cx, cy). Returns one row per surviving cluster after
    * `iterations` assign+update rounds: (cid, n_pts, cx, cy, sse)
    * where n_pts sums the weights, cx/cy are the post-update
    * weighted centroid, and sse is the exact weighted squared
    * distance to the PRE-update centroid (the one the assignment
    * used). */
  def fit(points: DataFrame, seeds: Seq[(Int, Long, Long)],
      iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = points.sparkSession
    import spark.implicits._
    // The point set is scanned once per iteration; checkpointing it
    // keeps each scan a stored-table read instead of re-executing the
    // caller's distinct-collapse (or whatever built it) every round.
    val pts = points.localCheckpoint(true)
    var centroids = seeds.toDF("cid", "cx", "cy")
      .select(col("cid"), col("cx").cast("long"), col("cy").cast("long"))
    var out: DataFrame = null
    for (_ <- 1 to iterations) {
      // one row, one array column: [(cid, cx, cy); k] — the order of
      // collect_list is partition-dependent, but array_min below is
      // order-insensitive, so determinism survives
      val cArr = centroids.agg(collect_list(
        struct(col("cid"), col("cx"), col("cy"))).as("cs"))
      val assigned = pts.crossJoin(broadcast(cArr))
        .withColumn("m", array_min(transform(col("cs"), c =>
          struct(
            ((col("x") - c.getField("cx")) *
              (col("x") - c.getField("cx")) +
              (col("y") - c.getField("cy")) *
                (col("y") - c.getField("cy"))).as("dist"),
            c.getField("cid").as("cid")))))
        .select(col("x"), col("y"), col("w"),
          col("m.cid").as("cid"), col("m.dist").as("dist"))
      // ≤ k rows — checkpointing severs the loop lineage so iteration
      // i+1's plan broadcasts a stored k-row table instead of
      // re-embedding (and re-executing) iteration i's full
      // assign+update sub-DAG (the [[PageRank]] lesson). Checkpoint
      // the FULL update row (all five columns), not a cid/cx/cy
      // projection: the caller's action consumes `out`, and a
      // projected checkpoint made the last iteration's assign+update
      // execute twice — once (column-pruned) for the checkpoint,
      // once more in full for the final action. All five columns are
      // ≤ k rows either way; the extra two aggregates are free next
      // to a second full pass over the point set. LAZY checkpoint:
      // the plan is severed to a LogicalRDD immediately and the
      // blocks materialize inside the next iteration's centroid-
      // broadcast build (resp. the caller's action) — one dedicated
      // job per iteration saved; safe because each iteration's `out`
      // has exactly one downstream consumer before the next
      // checkpoint lands.
      out = assigned.groupBy("cid")
        .agg(sum(col("w")).as("n_pts"),
          expr("sum(x * w) div sum(w)").as("cx"),
          expr("sum(y * w) div sum(w)").as("cy"),
          sum(col("dist") * col("w")).as("sse"))
        .localCheckpoint(false)
      centroids = out.select("cid", "cx", "cy")
    }
    out
  }
}
