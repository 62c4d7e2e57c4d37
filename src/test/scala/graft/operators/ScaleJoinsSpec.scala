package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a pathologically skewed key") {
    // 10k rows of one hot key + a tail, joined to a 3-row dim
    val large = ((1 to 10000).map(i => (1L, i)) ++
      (1 to 50).map(i => (2L, i)) ++ Seq((3L, 0)))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"))
      .toDF("k", "label")
    val plain = large.join(small, "k")
    val salted = ScaleJoins.saltedJoin(large, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salted shuffle key actually spreads the hot key
    val spread = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(8)).cast("int"))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(spread > 1, "hot key must land on multiple salts")
  }

  test("bucketized join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      val customer = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      val bo = ScaleJoins.bucketize(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_orders_b", "o_custkey", 4)
      val bc = ScaleJoins.bucketize(
        customer.withColumnRenamed("c_custkey", "o_custkey")
          .select("o_custkey", "c_name"),
        "t_customer_b", "o_custkey", 4)
      val joined = bo.join(bc, "o_custkey")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: $shuffles")
      // and it is still correct
      assert(joined.count() ==
        orders.join(customer, $"o_custkey" === $"c_custkey").count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
