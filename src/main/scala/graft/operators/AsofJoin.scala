package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` within the same key — the temporal join
  * the reference lacks entirely (its events pass through with raw
  * timestamps) and Spark has no native operator for.
  *
  * Implementation is the union-and-window formulation (option (a) of
  * SURVEY §2's preference order — compose existing ops): tag both
  * sides, union, and take `last(right value, ignoreNulls)` over a
  * running window ordered by (time, side) with the right side first
  * at equal times (so `<=` matches). One shuffle on the join key,
  * one in-partition sort — the same cost as a single window
  * function, versus the O(n·m) range join a naive BETWEEN would
  * produce. Scales like any partitioned window: state is one row,
  * partitions shard by key.
  */
object AsofJoin {
  /** Left as-of join.
    *
    * @param left      rows to enrich; must contain `key` and `time`
    * @param right     lookup rows; must contain `key` and `time`
    * @param key       equality key column name
    * @param time      event-time column name (same name both sides)
    * @param rightCols right columns to carry (renamed as-is onto the
    *                  output, null when no right row is at-or-before)
    */
  def leftAsof(left: DataFrame, right: DataFrame, key: String, time: String,
               rightCols: Seq[String]): DataFrame =
    asofImpl(left, right, key, time, rightCols, forward = false)

  /** Forward as-of join: for each left row, the EARLIEST right row
    * with `rightTime >= leftTime` — the "next quote / next reading"
    * lookup. Same union-and-window shape scanned in descending time
    * order (the running `last` then sees exactly the at-or-after
    * right rows, closest first). */
  def leftAsofForward(left: DataFrame, right: DataFrame, key: String,
                      time: String, rightCols: Seq[String]): DataFrame =
    asofImpl(left, right, key, time, rightCols, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       time: String, rightCols: Seq[String],
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    // Right columns travel as ONE struct so the window fill picks the
    // most recent right ROW atomically — per-column last(ignoreNulls)
    // would blend values from different right rows whenever a carried
    // column is null in some right row.
    val tagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filterNot(Seq(key, time).contains).map(col) :+
        lit(null).cast(rightStructType).as("__r"): _*)
      .unionByName(
        right
          .withColumn("__side", lit(0))
          .select(Seq(col(key), col(time), col("__side")) ++
            leftCols.filterNot(Seq(key, time).contains)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
            struct(rightCols.map(col): _*).as("__r"): _*))
    // right rows sort before left rows at equal time ⇒ `<=` semantics.
    // The trailing __r ordering is the deterministic tie-breaker for
    // right rows sharing (key, time): the greatest carried struct
    // (field-lexicographic) wins, instead of whichever row the sort
    // happened to place last. Skipped when a carried column is
    // unorderable (e.g. MapType — Spark rejects it in a sort order);
    // such callers keep the documented unique-(key,time) precondition.
    val tieBreak =
      if (rightStructType.fields.forall(f =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType)))
        Seq(col("__r").asc_nulls_first)
      else Seq.empty
    // Forward flips only the time direction: right-before-left at
    // equal times keeps the inclusive (>= / <=) semantics in both
    // scans, and the __r tie-break convention is unchanged.
    val timeOrd = if (forward) col(time).desc else col(time).asc
    val w = Window.partitionBy(key)
      .orderBy(timeOrd +: col("__side").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = tagged.withColumn("__r",
      last(col("__r"), ignoreNulls = true).over(w))
    rightCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("__r").getField(c))
    }.filter(col("__side") === 1).drop("__side", "__r")
  }
}
