package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, backed by the
  * native codegen'd [[DotProductFF]] expression (a tight JVM loop
  * inside whole-stage codegen — the interpreted
  * `aggregate(zip_with(...))` formulation it replaced was the bench
  * hot spot).
  *
  * All accumulation is sequential in DOUBLE, which makes the result
  * bit-deterministic (IEEE-754 ops are exactly rounded) — required
  * for DuckDB oracle hash-matching and reproducible dedup decisions
  * at scale.
  */
object VectorFns {
  /** Σ aᵢ·bᵢ accumulated sequentially in double (float inputs). */
  def dot(a: Column, b: Column): Column = HashExpressions.dotFF(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = dot / (‖a‖·‖b‖) — mirrors the
    * `list_inner_product`-based formulation used by the DuckDB
    * oracle. For pairwise workloads prefer precomputing the norms
    * per side before the join (see SimilarityQueries) — same bits,
    * one third the work. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine from a precomputed-norm pair: `dot / (normA · normB)`.
    * Identical expression shape (sqrt before multiply) to
    * [[cosine]], so results are bit-equal. */
  def cosineWithNorms(a: Column, b: Column,
                      normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
