package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("key")
      .orderBy(col("score").desc, col("tie").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("key", "rn", "tie", "score")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("key")
      .agg(TopKAgg.topK(struct(col("tie"), col("score")),
        col("score"), col("tie"), k).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("key"), (col("pos") + 1).cast("int").as("rn"),
        col("r.tie").as("tie"), col("r.score").as("score"))

  test("agrees with the window formulation on 20 seeded random datasets") {
    val rnd = new scala.util.Random(99)
    for (round <- 1 to 20) {
      val k = 1 + rnd.nextInt(5)
      // duplicate scores force the tiebreak path; tie is unique
      val rows = Seq.tabulate(50 + rnd.nextInt(200)) { i =>
        (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(20).toDouble)
      }
      for (parts <- Seq(1, 7)) {
        val df = rows.toDF("key", "tie", "score").repartition(parts)
        val expected = windowTopK(df, k).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
          .sortBy(identity).toSeq
        val got = aggTopK(df, k).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
          .sortBy(identity).toSeq
        assert(got == expected, s"round $round k=$k parts=$parts")
      }
    }
  }

  test("partial aggregation runs map-side (ObjectHashAggregate partial)") {
    val df = Seq((1L, 1L, 1.0), (2L, 2L, 2.0)).toDF("key", "tie", "score")
    val plan = aggTopK(df.repartition(2), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "TypedImperativeAggregate should plan as ObjectHashAggregate")
    assert(plan.contains("partial_top_k_structs") ||
      plan.contains("partial top_k_structs"),
      s"expected a partial aggregation phase in:\n$plan")
  }

  test("groups smaller than k return all their rows, ordered") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 7.0)).toDF("key", "tie", "score")
    val got = aggTopK(df, 5).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((1, 11L, 7.0), (2, 10L, 5.0)))
  }
}
