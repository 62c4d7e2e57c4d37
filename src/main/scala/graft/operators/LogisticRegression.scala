package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed WEIGHTED logistic-regression training in pure
  * fixed-point INTEGER arithmetic — the trainable quality-classifier
  * shape of an LLM data pipeline (fastText-style "keep/drop" filters
  * are linear models over cheap document statistics; training one ON
  * the cluster, over the full corpus, is the operator here).
  *
  * Float gradient descent is not replayable across engines (the
  * gradient is a float fold in shuffle order, and libm's exp() in the
  * sigmoid differs per engine). Here every quantity is a scaled
  * BIGINT: weights carry `S` = 1e6 fixed-point units, the sigmoid is
  * the standard hard-sigmoid surrogate clamp(z/8 + 1/2, 0, 1) —
  * exact integer clamp and divide, no exp — and gradients are exact
  * DECIMAL(38,0) sums (order-independent), so a DuckDB oracle can
  * replay the unrolled iterations and hash-match, the same
  * discipline as [[KMeans]] / [[PageRank]]. Integral division is
  * wrapped in an explicit truncate-toward-zero CASE because Spark's
  * `div` truncates while DuckDB's `//` floors — the one place the
  * engines' integer semantics disagree; the sigmoid's divide clamps
  * its numerator non-negative first for the same reason.
  *
  * The operator is weighted: callers collapse the corpus to distinct
  * (x1, x2, y) feature cells with multiplicities first. As with
  * k-means that is the scale move — iterations cost the distinct
  * feature space (≤ |x1 range| × |x2 range| × 2 rows), not the
  * corpus row count.
  *
  * Scale: per iteration the weight vector is ONE row, broadcast to
  * every task; the gradient is one no-grouping aggregation to a
  * single row (map-side partial combine collapses each task first).
  * No shuffle of the cell frame, no window, no driver collect — the
  * weights never leave the cluster. Fixed iteration count by
  * contract (convergence loops belong in the driver, as with
  * [[PageRank]] / [[ConnectedComponents]]).
  */
object LogisticRegression {

  /** Fixed-point scale: weights, sigmoid outputs and errors are in
    * units of 1/S. */
  val S = 1000000L

  /** `cells`: (x1, x2, y, w) — distinct small-integer feature pairs
    * with 0/1 BIGINT labels and BIGINT multiplicities. Runs
    * `iterations` full-batch gradient steps at learning rate
    * 1/lrDiv (in mean-gradient units) from w = (0, 0, 0), then
    * scores the cells with the final weights. Returns ONE row:
    * (w0, w1, w2, n_docs, n_pos, n_pred_pos, n_correct) — the
    * trained scaled weights plus an exact integer confusion summary
    * (predict positive iff hard-sigmoid ≥ 1/2).
    */
  def fit(cells: DataFrame, lrDiv: Long, iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = cells.sparkSession
    import spark.implicits._
    val pts = cells.localCheckpoint(true)
    // hard sigmoid in S units: clamp((z + 4S) div 8, 0, S); GREATEST
    // first makes the divide non-negative, so floor == truncate on
    // both engines
    val pE = s"least(${S}L, greatest(0L, " +
      s"w0 + w1 * x1 + w2 * x2 + ${4 * S}L) div 8)"
    def tdivE(g: String, d: String): String =
      s"case when $g >= 0 then $g div ($d) " +
        s"else -((-$g) div ($d)) end"
    // every weights frame ends in a no-grouping aggregate (identity
    // max over its single row) so the plan gate can PROVE the
    // crossJoin build side is one row — the same static shape
    // [[KMeans]]'s collect_list centroid array has
    def scalarize(df: DataFrame): DataFrame =
      df.agg(max("w0").as("w0"), max("w1").as("w1"), max("w2").as("w2"))
    var weights = scalarize(Seq((0L, 0L, 0L)).toDF("w0", "w1", "w2"))
    for (_ <- 1 to iterations) {
      // one scalar row broadcast onto the cell frame — the
      // allow-listed single-row cross pattern
      val grad = pts.crossJoin(broadcast(weights))
        .withColumn("e", expr(s"$pE - y * ${S}L"))
        .selectExpr(
          "sum(cast(w as decimal(38,0)) * e) as g0",
          "sum(cast(w as decimal(38,0)) * e * x1) as g1",
          "sum(cast(w as decimal(38,0)) * e * x2) as g2",
          "sum(w) as n")
      // both frames are single rows; the update is scalar arithmetic
      weights = grad.crossJoin(broadcast(weights))
        .selectExpr(
          s"w0 - ${tdivE("g0", s"n * ${lrDiv}L")} as w0",
          s"w1 - ${tdivE("g1", s"n * ${lrDiv}L")} as w1",
          s"w2 - ${tdivE("g2", s"n * ${lrDiv}L")} as w2")
        // LAZY: lineage severed to a LogicalRDD immediately; the
        // single row materializes inside the next broadcast build
        // instead of paying a dedicated per-iteration job
        .localCheckpoint(false)
      weights = scalarize(weights)
    }
    pts.crossJoin(broadcast(weights))
      .withColumn("pred",
        expr(s"case when $pE >= ${S / 2}L then 1L else 0L end"))
      .groupBy("w0", "w1", "w2")
      .agg(sum("w").as("n_docs"),
        sum(col("w") * col("y")).as("n_pos"),
        sum(col("w") * col("pred")).as("n_pred_pos"),
        sum(when(col("pred") === col("y"), col("w")).otherwise(0L))
          .as("n_correct"))
  }
}
