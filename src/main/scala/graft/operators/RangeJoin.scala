package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: inner-join point rows to the interval rows that
  * contain them, as an EQUI-join Spark can hash-partition — not the
  * BroadcastNestedLoopJoin / cartesian plan a raw
  * `t BETWEEN start AND end` predicate degenerates to when there is no
  * selective equality key.
  *
  * Mechanics: pick a band width ≈ the typical interval length. Each
  * point lands in exactly one band (`floor(t / band)`); each interval
  * explodes to every band it overlaps (length/band + 1 rows, ~2 for
  * well-chosen bands). The equi-join on (band, keys...) then prunes
  * candidates to same-band pairs, and the residual BETWEEN filter
  * keeps true containments. Each (point, interval) pair meets exactly
  * once — in the point's band — so no dedup pass is needed.
  *
  * Scale: shuffle is a plain hash partition on the band (plus any
  * equality keys); interval row expansion is bounded by
  * (interval length / band + 1). At 100 TB this behaves like any
  * equi-join — AQE-eligible, skew-salvageable — where the naive plan
  * is O(|points| × |intervals|).
  */
object RangeJoin {
  /** Inner join of `points` to every containing interval.
    *
    * @param points    rows with a numeric point column `t`
    * @param intervals rows with numeric `start`/`end` columns
    *                  (inclusive bounds); column names must not clash
    *                  with `points` except for `keys`
    * @param band      band width in the units of `t`; choose ≈ the
    *                  typical interval length
    * @param keys      extra equality keys joined alongside the band
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      t: String, start: String, end: String,
                      band: Long, keys: Seq[String] = Nil): DataFrame = {
    require(band > 0, "band must be positive")
    val banded = points.withColumn("__band",
      floor(col(t) / band).cast("long"))
    val expanded = intervals.withColumn("__band",
      explode(sequence(
        floor(col(start) / band).cast("long"),
        floor(col(end) / band).cast("long"))))
    banded.join(expanded, ("__band" +: keys).toSeq)
      .filter(col(t) >= col(start) && col(t) <= col(end))
      .drop("__band")
  }

  /** Inner join of interval set `a` to every OVERLAPPING interval in
    * set `b` (inclusive bounds: overlap ⟺ aStart ≤ bEnd ∧
    * bStart ≤ aEnd) — the interval×interval companion to
    * [[pointInInterval]], as an equi-join on shared bands.
    *
    * A pair can share MANY bands, so candidates meet more than once;
    * deduplication happens before the overlap verification by keeping
    * only the pair's FIRST shared band (`max(floor(aStart/band),
    * floor(bStart/band))` — both sides can compute it per candidate
    * row, no distinct() shuffle needed). Row expansion per interval
    * is length/band + 1; the shuffle is a hash partition on the band
    * — the same 100 TB shape as the point variant, where the naive
    * plan is the O(n·m) theta join.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      band: Long, keys: Seq[String] = Nil): DataFrame = {
    require(band > 0, "band must be positive")
    def bandOf(c: Column): Column = floor(c / band).cast("long")
    val ea = a.withColumn("__band",
      explode(sequence(bandOf(col(aStart)), bandOf(col(aEnd)))))
    val eb = b.withColumn("__band",
      explode(sequence(bandOf(col(bStart)), bandOf(col(bEnd)))))
    ea.join(eb, ("__band" +: keys).toSeq)
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      // first-shared-band guard: emit each overlapping pair exactly
      // once without a distinct() pass over the candidate stream
      .filter(col("__band") ===
        greatest(bandOf(col(aStart)), bandOf(col(bStart))))
      .drop("__band")
  }
}
