package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave key for multi-dimensional data layout.
  *
  * At 100 TB the question "which files can this query skip?" is
  * decided by layout: sorting by one column gives perfect pruning on
  * that column and none on any other, while clustering by the
  * Z-order curve — interleaving the bits of two columns — keeps
  * points close in BOTH dimensions close on the curve, so per-file
  * min/max statistics stay tight on both columns and a 2-D predicate
  * prunes most of the corpus (the Delta/Iceberg OPTIMIZE ZORDER
  * layout idea, computed here as a plain column).
  *
  * The interleave is the classic mask-spread bit twiddle (four
  * shift-or-mask steps spread 16 bits to even positions), built
  * entirely from codegen'd built-ins (`shiftleft`, `bitwiseAND`,
  * `bitwiseOR`) — no UDF, stays inside WholeStageCodegen, and every
  * step is exact 64-bit integer arithmetic that DuckDB replays
  * bit-for-bit with `<<`/`&`/`|`.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` (a BIGINT column) to the even bit
    * positions 0, 2, 4, …, 30. */
  def spread16(v: Column): Column = {
    val m0 = v.bitwiseAND(lit(65535L))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(16711935L))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(252645135L))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(858993459L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(1431655765L))
  }

  /** 32-bit Morton key of two 16-bit dimensions: x on even bits,
    * y on odd bits. Monotone on the Z-curve: prefixes of the key are
    * quadtree cells, so `z >> 2k` buckets are aligned square tiles. */
  def z16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
