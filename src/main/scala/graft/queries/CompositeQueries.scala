package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.operators.RangeJoin

/** Composite / advanced-relational pack: TPC-H-shaped multi-join
  * analytics, subqueries, filtered aggregation, string aggregation,
  * value-range window frames, distribution windows, HAVING,
  * top-N-per-group, multiset set-ops, unpivot, and the banded range
  * join ([[graft.operators.RangeJoin]]).
  *
  * These generalize the reference's single count-and-forward dataflow
  * (`kinesis-to-humio.py:114-117,133`) to the full analytics surface a
  * replacement engine needs. Determinism follows SURVEY §7.4 and the
  * round-2/3 rules: exact decimal math internally, DOUBLE on the
  * output surface, total ORDER BY with unique-key tiebreaks.
  *
  * Scale notes per query are inline; the common themes: pre-aggregate
  * below joins where Catalyst won't do it automatically, broadcast
  * dimension-sized sides, keep every window partitioned, and express
  * range predicates as banded equi-joins.
  */
object CompositeQueries {
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def revenue: Column =
    sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 shape (shipping priority): revenue of not-yet-shipped
    // lineitems for BUILDING customers' pre-cutoff orders, top 10.
    // Scale shape: lineitem is filtered + pre-aggregated by order
    // BEFORE the orders join (one narrow fact shuffle); the filtered
    // customer key set is broadcast; the top-10 compiles to
    // TakeOrderedAndProject (no global sort materialization).
    "q_tpch_q3" -> ((s, d) => {
      val cutoff = lit("1995-03-15").cast("timestamp_ntz")
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
      Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
        .groupBy("l_orderkey").agg(revenue.as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("rev").cast("double").as("revenue"),
          col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5 shape (local-supplier volume): revenue per nation where
    // the supplier and the ordering customer share a nation, 1995.
    // supplier and nation are broadcast dims; lineitem shuffles once
    // on l_orderkey, then once on o_custkey — the minimum for this
    // dataflow.
    "q_tpch_q5" -> ((s, d) => {
      val in95 =
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") <  lit("1996-01-01").cast("timestamp_ntz")
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).filter(in95),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(revenue.cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // TPC-H Q6 shape (forecast revenue change): pure filter-aggregate,
    // single scalar out — every predicate reaches the parquet scan.
    "q_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") <  lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q14 shape (promo revenue share): one-month lineitem slice
    // joined to part, promo share of revenue as a percentage. Scale
    // shape: the part side is pruned to (p_partkey, is_promo) before
    // a broadcast join — the two-column projection keeps the build
    // side broadcastable orders of magnitude past where the full part
    // table would spill (beyond that, AQE falls back to a shuffle
    // join on the same plan). Exact decimal sums; the output ratio is
    // a RATIONAL of exact decimals, so it surfaces micro-quantized
    // (rule 10: scale-0 round + one bare IEEE division, never
    // round(ratio, 9)).
    "q_tpch_q14" -> ((s, d) => {
      val promoPart = Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_type").startsWith("PROMO").as("is_promo"))
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-09-01").cast("timestamp_ntz") &&
          col("l_shipdate") <  lit("1995-10-01").cast("timestamp_ntz"))
        .join(broadcast(promoPart), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("is_promo"),
            dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).as("promo"),
          revenue.as("total"))
        .select(
          (round(lit(100.0) * col("promo").cast("double") /
            col("total").cast("double") * lit(1e9), 0) / lit(1e9))
            .as("promo_pct"),
          col("total").cast("double").as("revenue"))
    }),

    // TPC-H Q19 shape (disjunctive brand/size/quantity baskets): the
    // OR-of-conjunctions references BOTH join sides, so the predicate
    // itself cannot move below the join — but Catalyst extracts the
    // per-side disjunction envelopes (brand IN (...) ∧ size ≤ 30 to
    // the part scan, quantity bounds to the lineitem scan), so each
    // scan still prunes before the broadcast join. PlanSpec pins the
    // extraction.
    "q_tpch_q19" -> ((s, d) => {
      val basket =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20, 30))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .filter(basket)
        .agg(revenue.cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // LATERAL correlated subquery (SQL surface): per-customer top-2
    // orders via a dependent ORDER BY/LIMIT subquery. Catalyst
    // decorrelates this into a ranked window over one orders shuffle
    // — no per-customer re-scan survives in the physical plan, which
    // is the property that makes LATERAL usable at scale.
    "q_lateral_topn" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("cust_lat")
      Tables.orders(s, d).createOrReplaceTempView("ord_lat")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM cust_lat c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM ord_lat o
          |         WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    }),

    // TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    // keep the supplier(s) hitting the global maximum. The "view +
    // scalar MAX subquery" of the spec compiles to one fact
    // aggregation reused on both sides of a broadcast-able
    // single-row cross-comparison — Spark caches nothing here; the
    // per-supplier aggregate is small (|suppliers| rows), so the
    // max+filter costs one extra exchange of that small frame, never
    // a second fact scan at plan level (the revenue frame feeds both
    // consumers). Revenue surfaces as exact-decimal → DOUBLE; the
    // max-selection compares the DECIMAL values (exact, no float
    // ties).
    "q_tpch_q15" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") <  lit("1995-04-01").cast("timestamp_ntz"))
        .groupBy("l_suppkey")
        .agg(revenue.as("total_rev"))
      val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.join(broadcast(maxRev), col("total_rev") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q10 shape (returned items): per-customer revenue of 'R'
    // lineitems against a one-quarter order window, top 20. Two-level
    // aggregation: returned revenue rolls up per order FIRST (narrow
    // fact shuffle), re-aggregates per customer after the orders
    // join; customer and nation broadcast.
    "q_tpch_q10" -> ((s, d) => {
      val quarter =
        col("o_orderdate") >= lit("1995-10-01").cast("timestamp_ntz") &&
        col("o_orderdate") <  lit("1996-01-01").cast("timestamp_ntz")
      val perOrder = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .groupBy("l_orderkey").agg(revenue.as("rev"))
      perOrder
        .join(Tables.orders(s, d).filter(quarter),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("rev")).as("rev"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"),
          col("rev").cast("double").as("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q18 shape (large orders): orders whose total quantity
    // clears a threshold — the aggregate-HAVING feeds a semi-join-like
    // enrichment, top 100.
    "q_tpch_q18" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 150)
      big
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("qty").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // Uncorrelated scalar subquery (SQL surface — the idiomatic Spark
    // route; Catalyst plans the subquery as a separate broadcast
    // stage). Average computed as exact-decimal-sum ÷ count so both
    // engines derive the identical double threshold.
    "q_subquery_scalar" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_sq
          |WHERE o_totalprice >
          |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |               AS DOUBLE) / COUNT(*) FROM orders_sq)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // Correlated EXISTS with a payload predicate (rewritten by
    // Catalyst into a left-semi hash join — no per-row subquery
    // execution).
    "q_subquery_exists" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_sq")
      Tables.orders(s, d).createOrReplaceTempView("orders_sq2")
      s.sql(
        """SELECT c_custkey, c_name FROM customer_sq c
          |WHERE EXISTS (SELECT 1 FROM orders_sq2 o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderpriority = '1-URGENT')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // NOT IN over a NULLABLE subquery — the null-aware anti-join
    // (three-valued NOT IN: any NULL in the subquery empties the
    // result unless handled; Spark plans a null-aware BHJ, a distinct
    // physical operator from the plain left_anti of q_files_antijoin).
    // The filter keeps NULLs out so rows survive — the PLAN is still
    // the null-aware one because the subquery output is nullable.
    "q_anti_null_aware" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_naaj")
      Tables.customer(s, d).createOrReplaceTempView("customer_naaj")
      s.sql(
        """SELECT o_orderkey, o_custkey FROM orders_naaj
          |WHERE o_custkey NOT IN
          |  (SELECT nullif(c_custkey, 7) FROM customer_naaj
          |   WHERE c_mktsegment = 'BUILDING'
          |     AND nullif(c_custkey, 7) IS NOT NULL)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // Correlated scalar-aggregate subquery: per-row COUNT(*) lookup,
    // rewritten by Catalyst into an aggregate + left join.
    "q_subquery_corr_agg" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_csa")
      Tables.orders(s, d).createOrReplaceTempView("orders_csa")
      s.sql(
        """SELECT c_custkey, c_name,
          |  (SELECT COUNT(*) FROM orders_csa o
          |   WHERE o.o_custkey = c.c_custkey) AS n_orders
          |FROM customer_csa c
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Conditional aggregation: FILTER-style partial counts/sums in one
    // pass over the fact table (one hash aggregate, no self-joins).
    "q_agg_filtered" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_quantity") > 25, 1)).as("n_big"),
          sum(when(col("l_discount") > 0.05, dec(col("l_extendedprice"))))
            .cast("double").as("disc_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // String aggregation with deterministic element order (sorted
    // before joining — collect_list order is partition-dependent,
    // sorted output is not).
    "q_string_agg" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",")
            .as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name")),

    // Value-range window frame: peers within ±100 of each order's
    // totalprice, per customer — RANGE BETWEEN semantics (vs the ROWS
    // frames elsewhere). Partitioned window: shards by o_custkey.
    "q_win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
        .rangeBetween(-100L, 100L)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).cast("int").as("n_near"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Distribution windows: percent_rank/cume_dist are rank-based, so
    // equal-value ties are deterministic without a tiebreak column.
    "q_win_percent" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_custkey")
    }),

    // Boolean aggregates: every/any (bool_and/bool_or) per group.
    "q_bool_agg" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          every(col("c_acctbal") > -1000).as("all_above"),
          some(col("c_acctbal") > 9000).as("any_rich"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")),

    // nth_value over an unbounded frame (vs first/last elsewhere).
    "q_win_nth" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // HAVING (post-aggregation filter).
    "q_having" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("c_acctbal"))).cast("double").as("bal"))
        .filter(col("n") >= 2)
        .orderBy("c_nationkey")),

    // Top-N per group (QUALIFY shape): row_number with a unique
    // tiebreak, filtered — the standard distributed top-k-per-key.
    "q_topn_per_group" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w).cast("int"))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rn")
    }),

    // Same result as q_topn_per_group via the native bounded top-k
    // AGGREGATE ([[graft.functions.TopKAgg]]): map-side partial heaps
    // keep ≤3 rows per (segment, mapper) so the shuffle carries k
    // rows per key per task — no full-partition sort, no full-width
    // shuffle. Same oracle SQL as the window formulation: the two
    // plans must agree row-for-row.
    "q_topn_per_group_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(graft.functions.TopKAgg.topK(
          struct(col("o_orderkey"), col("o_totalprice")),
          col("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("c_mktsegment"),
          posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("c_mktsegment"),
          (col("pos") + 1).cast("int").as("rn"),
          col("r.o_orderkey").as("o_orderkey"),
          col("r.o_totalprice").as("o_totalprice"))
        .orderBy("c_mktsegment", "rn")),

    // Multiset intersection/difference (INTERSECT ALL / EXCEPT ALL):
    // duplicate-preserving set-ops, wrapped in a counting group so the
    // bag is hashable deterministically.
    "q_set_intersect_all" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
        .intersectAll(c.filter(col("c_acctbal") > 4000)
          .select("c_nationkey"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    }),

    "q_set_except_all" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
        .exceptAll(c.filter(col("c_acctbal") > 4000)
          .select("c_nationkey"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    }),

    // Unpivot (wide → long): pure per-row row expansion, no shuffle
    // before the harness ORDER BY.
    "q_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retail"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retail")), "metric", "value")
        .orderBy("p_partkey", "metric")),

    // Banded range join: orders placed within each sampled order's
    // 7-day window — a keyless interval-containment join planned as an
    // equi-join on the band (see RangeJoin; PlanSpec asserts no
    // nested-loop/cartesian operator appears).
    "q_range_join" -> ((s, d) => {
      def day(c: Column): Column =
        datediff(to_date(c), lit("1992-01-01").cast("date")).cast("long")
      val pts = Tables.orders(s, d)
        .select(day(col("o_orderdate")).as("p_day"))
      val ivs = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("i_key"),
          day(col("o_orderdate")).as("s_day"))
        .withColumn("e_day", col("s_day") + 6)
      RangeJoin.pointInInterval(pts, ivs, "p_day", "s_day", "e_day",
          band = 7)
        .groupBy("i_key").agg(count(lit(1)).as("n_in_window"))
        .orderBy("i_key")
    }),

    // The SAME point-in-window semantics as q_range_join, but the
    // join is written as the NAIVE theta predicate (p_day BETWEEN
    // s_day AND e_day — the form Spark plans as an O(n·m)
    // BroadcastNestedLoopJoin) and rewritten into the banded
    // equi-join by the engine's own Catalyst rule
    // ([[graft.plans.BandJoinRule]]), applied here with an explicit
    // width so no session conf leaks across registry queries. The
    // gate's plan scan proves the point: this query passes the
    // no-nested-loop-join check BECAUSE the optimizer rule, not a
    // hand-built dataflow, produced the plan. Session-extension
    // installation (`spark.sql.extensions` → GraftExtensions +
    // spark.graft.bandJoin.width) is exercised in BandJoinRuleSpec.
    "q_join_band_auto" -> ((s, d) => {
      def day(c: Column): Column =
        datediff(to_date(c), lit("1992-01-01").cast("date")).cast("long")
      val pts = Tables.orders(s, d)
        .select(day(col("o_orderdate")).as("p_day"))
      val ivs = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("i_key"),
          day(col("o_orderdate")).as("s_day"))
        .withColumn("e_day", col("s_day") + 6)
      val naive = pts.join(ivs,
        pts("p_day") >= ivs("s_day") && pts("p_day") <= ivs("e_day"))
      org.apache.spark.sql.GraftColumnBridge.ofRows(s,
          graft.plans.BandJoinRule.rewrite(
            org.apache.spark.sql.GraftColumnBridge.analyzed(naive), 7L))
        .groupBy("i_key").agg(count(lit(1)).as("n_in_window"))
        .orderBy("i_key")
    }),

    // Interval×interval overlap join (two sampled order-window sets,
    // 7- and 14-day windows) — banded equi-join with a first-shared-
    // band guard instead of the O(n·m) theta join; see
    // [[RangeJoin.intervalOverlap]]. The per-a overlap profile is the
    // output (count + first partner), the usual shape for conflict /
    // co-occurrence detection over time ranges.
    "q_join_interval" -> ((s, d) => {
      val (a, b) = overlapFixture(s, d)
      RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e",
          band = 7)
        .groupBy("a_key").agg(count(lit(1)).as("n_overlaps"),
          min(col("b_key")).as("first_b"))
        .orderBy("a_key")
    }),

    // q_join_interval's twin under the OPTIMIZER-RULE path: the
    // overlap condition written as the naive two-conjunct theta join
    // (the BNLJ shape) and rewritten by BandJoinRule's interval-
    // overlap branch — double-banded equi-join + first-shared-band
    // dedup, produced by Catalyst instead of hand dataflow. Shares
    // q_join_interval's oracle verbatim: the twin gates assert the
    // same semantics by construction.
    "q_join_interval_auto" -> ((s, d) => {
      val (a, b) = overlapFixture(s, d)
      val naive = a.join(b,
        a("a_s") <= b("b_e") && b("b_s") <= a("a_e"))
      org.apache.spark.sql.GraftColumnBridge.ofRows(s,
          graft.plans.BandJoinRule.rewrite(
            org.apache.spark.sql.GraftColumnBridge.analyzed(naive), 7L))
        .groupBy("a_key").agg(count(lit(1)).as("n_overlaps"),
          min(col("b_key")).as("first_b"))
        .orderBy("a_key")
    })
  )

  /** The interval fixture shared by q_join_interval and
    * q_join_interval_auto — one builder so the twin gates (whose
    * oracle is the shared [[intervalOverlapOracle]]) cannot drift:
    * 7-day windows on every 97th order, 14-day on every 89th. */
  private def overlapFixture(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    def day(c: Column): Column =
      datediff(to_date(c), lit("1992-01-01").cast("date")).cast("long")
    val a = Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("a_key"),
        day(col("o_orderdate")).as("a_s"))
      .withColumn("a_e", col("a_s") + 6)
    val b = Tables.orders(s, d)
      .filter(col("o_orderkey") % 89 === 0)
      .select(col("o_orderkey").as("b_key"),
        day(col("o_orderdate")).as("b_s"))
      .withColumn("b_e", col("b_s") + 13)
    (a, b)
  }

  /** Shared by q_join_interval and q_join_interval_auto: both gates
    * assert the same overlap semantics (the plain theta join — each
    * banded pair survives exactly one band by the first-shared-band
    * guard, whoever builds the bands). */
  private val intervalOverlapOracle: String =
    """WITH a AS (
      |  SELECT o_orderkey AS a_key,
      |    date_diff('day', DATE '1992-01-01',
      |              CAST(o_orderdate AS DATE)) AS a_s,
      |    date_diff('day', DATE '1992-01-01',
      |              CAST(o_orderdate AS DATE)) + 6 AS a_e
      |  FROM orders WHERE o_orderkey % 97 = 0),
      |b AS (
      |  SELECT o_orderkey AS b_key,
      |    date_diff('day', DATE '1992-01-01',
      |              CAST(o_orderdate AS DATE)) AS b_s,
      |    date_diff('day', DATE '1992-01-01',
      |              CAST(o_orderdate AS DATE)) + 13 AS b_e
      |  FROM orders WHERE o_orderkey % 89 = 0)
      |SELECT a_key, COUNT(*) AS n_overlaps, MIN(b_key) AS first_b
      |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
      |GROUP BY a_key ORDER BY a_key""".stripMargin

  /** Shared by q_range_join and q_join_band_auto: both gates assert
    * the same point-in-window semantics. */
  private val rangeJoinOracle: String =
    """SELECT i_key, COUNT(*) AS n_in_window FROM
      |  (SELECT o_orderkey AS i_key,
      |     date_diff('day', DATE '1992-01-01',
      |               CAST(o_orderdate AS DATE)) AS s_day
      |   FROM orders WHERE o_orderkey % 97 = 0) i
      |JOIN
      |  (SELECT date_diff('day', DATE '1992-01-01',
      |               CAST(o_orderdate AS DATE)) AS p_day
      |   FROM orders) p
      |ON p.p_day BETWEEN i.s_day AND i.s_day + 6
      |GROUP BY i_key ORDER BY i_key""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  o_orderdate
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q14" ->
      """SELECT
        |  round(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN
        |      CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 1e9, 0)
        |    / 1e9 AS promo_pct,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate <  TIMESTAMP '1995-10-01'""".stripMargin,
    "q_tpch_q19" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate <  TIMESTAMP '1995-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  c_acctbal, n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-10-01'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(qty AS DOUBLE) AS sum_qty
        |FROM (SELECT l_orderkey,
        |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |               AS DOUBLE) / COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_null_aware" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT nullif(c_custkey, 7) FROM customer
        |   WHERE c_mktsegment = 'BUILDING'
        |     AND nullif(c_custkey, 7) IS NOT NULL)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_corr_agg" ->
      """SELECT c_custkey, c_name,
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,
    "q_agg_filtered" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |       FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_string_agg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_win_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(COUNT(*) OVER
        |    (PARTITION BY o_custkey ORDER BY o_totalprice
        |     RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS INT)
        |    AS n_near
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_percent" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
    "q_bool_agg" ->
      """SELECT c_mktsegment,
        |  bool_and(c_acctbal > -1000) AS all_above,
        |  bool_or(c_acctbal > 9000) AS any_rich,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_win_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  nth_value(o_orderkey, 2) OVER
        |    (PARTITION BY o_custkey
        |     ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING
        |              AND UNBOUNDED FOLLOWING) AS second_order
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_having" ->
      """SELECT c_nationkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY c_nationkey
        |HAVING COUNT(*) >= 2 ORDER BY c_nationkey""".stripMargin,
    "q_topn_per_group" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER
        |      (PARTITION BY c_mktsegment
        |       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q_topn_per_group_agg" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER
        |      (PARTITION BY c_mktsegment
        |       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q_set_intersect_all" ->
      """SELECT c_nationkey, COUNT(*) AS n FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT ALL
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 4000)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_set_except_all" ->
      """SELECT c_nationkey, COUNT(*) AS n FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT ALL
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 4000)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'size' AS metric,
        |         CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retail' AS metric, p_retailprice FROM part)
        |ORDER BY p_partkey, metric""".stripMargin,
    "q_range_join" -> rangeJoinOracle,
    // the SAME oracle string on purpose: the two queries assert
    // identical semantics, differing only in WHO builds the banded
    // plan (hand dataflow vs the Catalyst rule) — sharing the val
    // makes it impossible for the twin gates to drift apart
    "q_join_band_auto" -> rangeJoinOracle,
    // The banded engine plan is set-equal to this plain overlap
    // theta join (each pair survives exactly one band by the
    // first-shared-band guard).
    "q_join_interval" -> intervalOverlapOracle,
    // verbatim twin of q_join_interval (same shared-semantics
    // contract as the q_range_join / q_join_band_auto pair)
    "q_join_interval_auto" -> intervalOverlapOracle
  )
}
