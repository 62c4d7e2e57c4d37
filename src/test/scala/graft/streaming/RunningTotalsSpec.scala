package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState (Spark 4 arbitrary-state API) smoke: running
  * per-user totals accumulate across micro-batches on RocksDB state.
  */
class RunningTotalsSpec extends SparkSpec {
  import spark.implicits._

  test("running totals accumulate across micro-batches") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Long, Double)](spark)
      val q = RunningTotals.totals(ms.toDS())
        .toDF("user_id", "n", "sum")
        .writeStream.format("memory").queryName("rt")
        .outputMode("update").start()
      try {
        ms.addData((1L, 1L, 10.0), (1L, 2L, 5.0), (2L, 3L, 1.0))
        q.processAllAvailable()
        ms.addData((1L, 4L, 2.5))
        q.processAllAvailable()
        val byBatchLast = spark.table("rt").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        // user 1: batch1 -> (2, 15.0); batch2 -> (3, 17.5); user 2: (1, 1.0)
        assert(byBatchLast.contains((1L, 2L, 15.0)))
        assert(byBatchLast.contains((1L, 3L, 17.5)))
        assert(byBatchLast.contains((2L, 1L, 1.0)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
