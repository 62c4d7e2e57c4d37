package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen-friendly higher-order functions (`zip_with` /
  * `aggregate`) — no UDFs, so Catalyst can still prune/push around
  * them and no serialization boundary is introduced.
  *
  * All accumulation is sequential in DOUBLE, which makes the result
  * bit-deterministic for a given element order (IEEE-754 ops are
  * exactly rounded) — required for DuckDB oracle hash-matching and
  * for reproducible dedup decisions at scale.
  */
object VectorFns {
  /** Σ aᵢ·bᵢ accumulated sequentially in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = dot / (‖a‖·‖b‖) — mirrors
    * `list_inner_product`-based formulation used by the DuckDB oracle. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
