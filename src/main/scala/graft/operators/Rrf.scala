package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09) — THE
  * shared hybrid-retrieval scoring core: `q_retrieval_fusion`
  * (batch) and S23 ([[graft.streaming.StreamingHybridRetrieval]])
  * both score through this object, so the sparse⊕dense ranking a
  * document gets at ingest is arithmetically THE SAME ranking a
  * batch re-run would give it — no forked formulas to drift apart.
  *
  * Determinism: 1/(K+rank) on exact integer ranks is one correctly
  * rounded IEEE division; the two-term add is a single IEEE op.
  * Both forms below execute exactly that on JVM doubles —
  * [[RrfSpec]] pins bit-equality of the Column and scalar kernels
  * EXHAUSTIVELY over every rank pair to depth 1000 (including the
  * one-sided absent cases), which is the whole input domain any
  * bounded fusion depth can produce.
  */
object Rrf {
  /** The standard RRF constant. */
  val K = 60

  /** Scalar kernel (streaming folds): absent ranker contributes 0. */
  def score(rb: Option[Int], rc: Option[Int]): Double =
    rb.map(r => 1.0 / (K + r).toDouble).getOrElse(0.0) +
      rc.map(r => 1.0 / (K + r).toDouble).getOrElse(0.0)

  /** Column twin (batch plans): same ops on the same domain —
    * null rank (outer-join miss) contributes 0. */
  def scoreCol(rb: Column, rc: Column): Column =
    coalesce(lit(1.0) / (lit(K) + rb).cast("double"), lit(0.0)) +
      coalesce(lit(1.0) / (lit(K) + rc).cast("double"), lit(0.0))
}
