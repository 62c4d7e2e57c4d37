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
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filterNot(Seq(key, time).contains).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
          : _*)
      .unionByName(
        right
          .withColumn("__side", lit(0))
          .select(Seq(col(key), col(time), col("__side")) ++
            leftCols.filterNot(Seq(key, time).contains)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
            rightCols.map(col): _*))
    // right rows sort before left rows at equal time ⇒ `<=` semantics
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }
}
