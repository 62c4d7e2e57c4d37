package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Scan / filter / join / set-op / sort query pack.
  *
  * Semantics mirror the reference's dataflow building blocks
  * (`kinesis-to-humio.py:181-218` listing scan, `:196` filter,
  * `:210-216` anti-join dedup, `:292` sort) generalized to the full
  * relational surface declared in SURVEY.md §2.3.
  *
  * Every query is deterministic: total ORDER BY on a unique key
  * suffix, decimal casts before double aggregation (SURVEY §7.4) so
  * the DuckDB oracle hash-matches.
  *
  * Scale notes: joins to the small dims (region/nation) are
  * broadcast; large joins shuffle on their equi-keys and are
  * AQE-eligible; top-k compiles to TakeOrderedAndProject (no global
  * sort materialization).
  */
object RelationalQueries {
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // NOTE: the synthetic lineitem's (l_orderkey, l_linenumber) is NOT
    // unique, so row-level lineitem queries order by ALL output
    // columns — any rows still tied are fully identical, making the
    // ordered hash engine-independent (two-column ordering only
    // worked by both engines leaving ties in file order).
    "q_scan_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")),

    "q_filter_pred" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") <  lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_shipdate")),

    // R4 semantics (kinesis-to-humio.py:210-216): anti-join against a
    // "processed" subset.
    "q_files_antijoin" -> ((s, d) => {
      val processed = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      Tables.orders(s, d)
        .join(processed, col("o_custkey") === col("c_custkey"), "left_anti")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    }),

    "q_join_inner" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")),

    "q_join_broadcast" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")),

    "q_join_left" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)),

    "q_join_right" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"),
          "right")
        .select("c_custkey", "o_orderkey")
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)),

    "q_join_full" -> ((s, d) => {
      // full outer over key ranges that only partially overlap, so
      // both null sides appear
      val o = Tables.orders(s, d).filter(col("o_custkey") < 100)
        .select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, d).filter(col("c_custkey") > 50)
        .select("c_custkey", "c_name")
      o.join(c, col("o_custkey") === col("c_custkey"), "full")
        .select("o_orderkey", "o_custkey", "c_custkey")
        .orderBy(col("o_orderkey").asc_nulls_first,
          col("c_custkey").asc_nulls_first)
    }),

    "q_join_cross" -> ((s, d) =>
      Tables.region(s, d).crossJoin(
        Tables.nation(s, d).filter(col("n_nationkey") < 5))
        .select("r_regionkey", "r_name", "n_nationkey")
        .orderBy("r_regionkey", "n_nationkey")),

    "q_join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Non-equi (theta) join: falls to BroadcastNestedLoopJoin with the
    // 25-row nation side broadcast — the only sane physical plan.
    "q_join_theta" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_custkey") % 7 === 0)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") < col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_nationkey", "n_name")
        .orderBy("c_custkey", "n_nationkey")),

    // The skew-salted join registered against the PLAIN join's oracle:
    // result equality with `join(key)` is the operator's contract
    // (the salt spreads each hot key over N reducers; see ScaleJoins).
    "q_join_salted" -> ((s, d) =>
      graft.operators.ScaleJoins.saltedJoin(
        Tables.orders(s, d).select("o_orderkey", "o_custkey",
          "o_totalprice"),
        Tables.customer(s, d).select("c_custkey", "c_mktsegment")
          .withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey", salts = 8)
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
        .orderBy("o_orderkey")),

    // The AQE twin of q_join_salted: the SAME join/oracle as a plain
    // sort-merge shuffle join (merge hint), relying on the adaptive
    // skew-join split instead of manual salting. Registered so the
    // gate proves AQE's runtime re-plan preserves the exact result;
    // ScaleJoinsSpec asserts the split actually fires on a Zipfian
    // fixture (thresholds lowered to fixture scale). Documents the
    // boundary: salting stays necessary only where AQE can't split —
    // co-partitioning contracts, both-sides skew, aggregations.
    "q_join_skew_aqe" -> ((s, d) =>
      graft.operators.ScaleJoins.aqeSkewJoin(
        Tables.orders(s, d).select("o_orderkey", "o_custkey",
          "o_totalprice"),
        Tables.customer(s, d).select("c_custkey", "c_mktsegment")
          .withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey")
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
        .orderBy("o_orderkey")),

    // Runtime-Bloom-filtered fact⋈dim: customer's selective segment
    // filter becomes a Bloom subquery that prunes orders BEFORE the
    // shuffle (row-level DPP — see ScaleJoins.runtimeFilteredJoin for
    // the 100 TB shuffle-shrink argument). Same plain-join oracle:
    // Bloom false positives are caught by the join, false negatives
    // don't exist, so the result is exactly the filtered join.
    "q_join_bloom" -> ((s, d) =>
      graft.operators.ScaleJoins.runtimeFilteredJoin(
        Tables.orders(s, d).select("o_orderkey", "o_custkey",
          "o_totalprice"),
        Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_mktsegment")
          .withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey")
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
        .orderBy("o_orderkey")),

    // Catalyst won't push an aggregate through a join on its own, so
    // the revenue partial-aggregate by l_orderkey happens BEFORE the
    // orders join: the fact table is shuffled once (narrow: key +
    // decimal + count), and the per-order rollup — |orders| rows, ~4×
    // narrower than the raw join output — is what flows through the
    // rest of the plan. Customer is broadcast. At 100× scale this
    // shape shuffles lineitem once instead of twice-at-full-width.
    "q_join_multiway" -> ((s, d) => {
      val perOrder = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(
          // Decimal-first multiply: exact on both engines (casting the
          // double product instead rounds differently — see AggQueries).
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .as("rev"),
          count(lit(1)).as("n"))
      perOrder
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          // Exact decimal total → double only on the output surface
          // (decimal outputs fail the driver's pandas hash compare).
          sum(col("rev")).cast("double").as("revenue"),
          sum(col("n")).as("cnt"))
        .orderBy("c_mktsegment")
    }),

    // Keyset-free pagination: ORDER BY + OFFSET + LIMIT. (At scale,
    // prefer keyset pagination — WHERE key > last_seen — since OFFSET
    // must still sort/skip; this pins the surface's correctness.)
    "q_offset_limit" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(50)
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "q_sort_limit_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "q_set_union" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .union(c.filter(col("c_acctbal") > 4000).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    }),

    // Bag-semantics union (Spark union == SQL UNION ALL): duplicates
    // preserved; total order on (key, n) after a counting wrap keeps
    // the oracle hash stable.
    "q_set_union_all" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .union(c.filter(col("c_acctbal") > 4000).select("c_custkey"))
        .groupBy("c_custkey").agg(count(lit(1)).as("n"))
        .orderBy("c_custkey")
    }),

    "q_set_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .intersect(c.filter(col("c_acctbal") > 4000).select("c_custkey"))
        .orderBy("c_custkey")
    }),

    "q_set_except" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .except(c.filter(col("c_acctbal") > 4000).select("c_custkey"))
        .orderBy("c_custkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 30
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_shipdate""".stripMargin,
    "q_files_antijoin" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, o_orderkey
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT o_orderkey, o_custkey, c_custkey
        |FROM (SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey < 100) o
        |FULL JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey > 50) c
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey NULLS FIRST, c_custkey NULLS FIRST""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey
        |FROM region CROSS JOIN (SELECT * FROM nation WHERE n_nationkey < 5) n
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_theta" ->
      """SELECT c_custkey, c_nationkey, n_nationkey, n_name
        |FROM customer, nation
        |WHERE c_custkey % 7 = 0 AND c_nationkey < n_nationkey
        |ORDER BY c_custkey, n_nationkey""".stripMargin,
    "q_join_salted" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // Same contract as q_join_salted: the physical strategy (AQE skew
    // split vs manual salt) must not change the result.
    "q_join_skew_aqe" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // Same contract again: the runtime Bloom filter must not change
    // the filtered join's result.
    "q_join_bloom" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_multiway" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2))))
        |       AS DOUBLE) AS revenue,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_offset_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25 OFFSET 50""".stripMargin,
    "q_set_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 4000
        |ORDER BY c_custkey""".stripMargin,
    "q_set_union_all" ->
      """SELECT c_custkey, COUNT(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 4000)
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 4000
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 4000
        |ORDER BY c_custkey""".stripMargin
  )
}
