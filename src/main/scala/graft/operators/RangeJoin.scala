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
}
