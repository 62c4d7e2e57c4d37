package graft

/** Pins the tie-ordering bug class: every row-level oracle query must
  * produce IDENTICAL ordered output regardless of partitioning —
  * ordering by a non-unique key passes single-config runs by luck
  * (both engines leave ties in file order) and breaks when the
  * driver's parallelism differs.
  */
class DeterminismSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  // row-level lineitem queries (the table with non-unique keys)
  private val rowLevel =
    Seq("q_scan_project", "q_filter_pred", "q_date_funcs", "q_date_arith",
      // round-3 row-level additions (unique-key ordered, pinned anyway)
      "q_win_ignore_nulls", "q_bitwise", "q_topn_per_group_agg",
      "q_pack_sequences", "q_range_join", "q_agg_mode",
      // the KMV sample must select the same bottom-K multiset at any
      // partitioning (the (h, v) total-order argument)
      "q_agg_quantile_sketch")

  test("row-level query output is identical across partition counts") {
    for (q <- rowLevel) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      val runs = Seq("3", "13").map { parts =>
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
      assert(runs(0) == runs(1),
        s"$q output depends on partitioning — non-total ORDER BY")
    }
  }
}
