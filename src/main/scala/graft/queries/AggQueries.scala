package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Aggregation pack: hash aggregate, distinct, rollup/cube/grouping
  * sets. The reference only counts (`kinesis-to-humio.py:114-117,133`,
  * R17); this generalizes to the full grouped-aggregation surface of
  * SURVEY.md §2.3.
  *
  * Determinism (SURVEY §7.4): doubles are cast to DECIMAL(18,2)
  * *before* summing on both engines (summation order differs between
  * Spark partial/final aggregation and DuckDB); averages are computed
  * as exact-decimal-sum → double ÷ count, which is bit-deterministic
  * IEEE arithmetic on both sides.
  *
  * Scale: all of these are partial-aggregate (map-side combine) +
  * final aggregate over a hash shuffle on the group keys — the plan
  * Spark picks natively for groupBy/rollup/cube; no row explosion
  * beyond the grouping-set expansion itself.
  */
object AggQueries {
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  // Exact decimal sum internally; DOUBLE on the output surface. The
  // driver's gate compares DuckDB results fetched as float64 against
  // Spark parquet read by pandas — a DECIMAL output column arrives as
  // decimal.Decimal objects and never hash-matches, even when values
  // are identical. Converting the exact decimal sum to double is the
  // same correctly-rounded operation on both engines.
  private def sumDec(c: Column): Column = sum(dec(c)).cast("double")
  private def avgViaSum(c: Column): Column =
    sum(dec(c)).cast("double") / count(lit(1))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped hash aggregate.
    "q_agg_hash" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumDec(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_base_price"),
          // Operands are cast to decimal BEFORE multiplying: decimal
          // multiplication is exact on both engines, whereas casting
          // the double product rounds differently (Spark exact-binary
          // HALF_UP vs DuckDB scaled-double rounding). The exact
          // scale-4 product sum is converted straight to double — no
          // intermediate downscale, whose .xx5 tie-break differs
          // across engines.
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          avgViaSum(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // min/max/count over a supplier⋈lineitem join (exact double
    // min/max — no summation-order sensitivity).
    "q_agg_minmax" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          min(col("l_shipdate")).as("first_ship"),
          max(col("l_shipdate")).as("last_ship"),
          count(lit(1)).as("n_items"))
        .orderBy("s_suppkey")),

    // Exact interpolated percentiles (Spark `percentile` ==
    // DuckDB `quantile_cont`, both linear interpolation on the sorted
    // set — NOT approx_percentile, which is banned for oracle queries).
    "q_agg_percentile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          percentile(col("l_quantity"), lit(0.25)).as("p25_qty"),
          percentile(col("l_quantity"), lit(0.75)).as("p75_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Variance/stddev via exact decimal sums (Σx, Σx² are exact
    // decimals; the final combination is plain IEEE double arithmetic
    // on both engines) — built-in stddev's partial-aggregation order
    // would differ between engines.
    "q_agg_var" -> ((s, d) => {
      val x = col("l_quantity").cast(DecimalType(18, 2))
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(x).cast("double").as("s1"),
          sum(x * x).cast("double").as("s2"),
          count(lit(1)).cast("double").as("n"))
        .select(col("l_returnflag"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
            .as("var_pop"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n"))
            .as("stddev_pop"),
          col("n").cast("long").as("n"))
        .orderBy("l_returnflag")
    }),

    // Deterministic mode: most frequent value per group, ties broken
    // by smallest value (built-in mode()'s tie choice is
    // engine-dependent) — count + top-1 window.
    "q_agg_mode" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("cnt"))
        .orderBy("l_returnflag")
    }),

    // Fixed-bound histogram: bucket index is pure integer arithmetic
    // (no data-dependent bounds), one hash aggregate.
    "q_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy((floor(col("o_totalprice") / 20000) * 20000)
          .cast("long").as("bucket_lo"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket_lo")),

    // Correlation/covariance via exact decimal sums (Σx, Σy, Σxy,
    // Σx², Σy², n are exact; the final combination is plain IEEE
    // double arithmetic on both engines) — built-in corr()'s
    // partial-aggregation order differs across engines, this shape
    // is bit-deterministic (the q_agg_var pattern extended).
    "q_agg_corr" -> ((s, d) => {
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"),
          count(lit(1)).cast("double").as("n"))
        .select(col("l_returnflag"),
          // round(…, 9): the multi-op double combination can differ
          // by 1 ulp across engines (FMA contraction in DuckDB's
          // C++ build) — the q_sim_topk rounding pattern.
          round((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"),
            9).as("covar_pop"),
          round((col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
             sqrt(col("syy") - col("sy") * col("sy") / col("n"))),
            9).as("corr"),
          col("n").cast("long").as("n"))
        .orderBy("l_returnflag")
    }),

    // OLS regression aggregates from the same exact-decimal sufficient
    // statistics as q_agg_corr (slope and intercept both in closed
    // form over the raw sums — no chained rounding), round(…,9) on
    // the output surface against cross-engine FMA drift.
    "q_agg_regression" -> ((s, d) => {
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          count(lit(1)).cast("double").as("n"))
        .select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 9).as("slope"),
          round((col("sy") * col("sxx") - col("sx") * col("sxy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 9)
            .as("intercept"),
          col("n").cast("long").as("n"))
        .orderBy("l_returnflag")
    }),

    // Two-phase salted aggregation — the skew pattern for aggregates
    // whose per-key input a map-side combine cannot compress enough
    // (one hot key would otherwise serialize its final reduce on a
    // single task). Salt by a uniform hash, partial-aggregate per
    // (key, salt), re-aggregate per key; exact decimal sums are
    // associative, so the result is bit-equal to the plain GROUP BY
    // the oracle runs (the q_join_salted result-equality contract).
    "q_agg_salted" -> ((s, d) => {
      val partial = Tables.lineitem(s, d)
        .withColumn("__salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16L)))
        .groupBy(col("l_returnflag"), col("__salt"))
        .agg(sum(dec(col("l_quantity"))).as("pq"),
          count(lit(1)).as("pn"))
      partial.groupBy("l_returnflag")
        .agg(sum(col("pq")).cast("double").as("sum_qty"),
          sum(col("pn")).as("n"))
        .orderBy("l_returnflag")
    }),

    "q_agg_distinct" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")),

    // Multiple DISTINCT aggregates in one pass: Catalyst plans this
    // via Expand (one row replica per distinct-set) + two-level
    // aggregation — a distinct physical shape from single-distinct.
    "q_multi_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // Sketch aggregates — the scale path for distinct counts and
    // quantiles: a register/sample table is a mergeable partial
    // aggregate (map-side combine, fixed-size state), where exact
    // countDistinct shuffles every distinct value and exact
    // percentile collects the full column per group. This key uses
    // graft's PORTABLE HLL (md5-derived registers, integer harmonic
    // sums, a proven-portable ln domain — PortableSketch scaladoc),
    // so DuckDB replays the estimate bit-for-bit and the key is
    // hash-gated; Spark's native HLL++/GK sketches remain the
    // engine-private fast path, demonstrated + error-bound-pinned in
    // AggSketchSpec. The "approximate median" is the exact median of
    // a deterministic md5 10% row sample — the portable analogue of
    // a quantile sketch (sample, not full column, crosses the wire).
    "q_agg_approx" -> ((s, d) => {
      import graft.operators.PortableSketch
      val li = Tables.lineitem(s, d)
      val est = PortableSketch.hllEstimate(
        PortableSketch.hllRegisters(li, col("l_orderkey"),
          Seq("l_returnflag")),
        Seq("l_returnflag")).withColumnRenamed("est", "est_orders")
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
          count(lit(1)).as("n"))
      val med = li.filter(PortableSketch.h60(
          concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))) % 10 === 0)
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("approx_median"))
      est.join(exact, Seq("l_returnflag"))
        .join(med, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("est_orders"),
          col("exact_orders"), col("approx_median"), col("n"))
        .orderBy("l_returnflag")
    }),

    // Count-min sketch point-frequency estimates over graft's
    // PORTABLE CMS (md5-derived row hashes, cell-count table): the
    // sketch folds distributedly (the explode→count shape map-side
    // combines to ≤ D·W cells per partition — the property that
    // makes CMS usable over a 100 TB stream), the ≤ 8192-cell table
    // broadcasts to the probe join, and 20 probe keys read their
    // estimates against the exact counts. CMS guarantees est ≥ exact
    // and (w.h.p.) est ≤ exact + (e/W)·N — both surfaced as columns,
    // hard-asserted in AggSketchSpec, and the whole computation is
    // integer-only, so DuckDB replays it exactly (hash-gated).
    // Spark's native count_min_sketch byte sketch is demonstrated in
    // AggSketchSpec alongside.
    "q_agg_cms" -> ((s, d) => {
      import graft.operators.PortableSketch
      val li = Tables.lineitem(s, d)
      val cells = PortableSketch.cmsCells(li, col("l_orderkey"))
      val probes = s.range(0, 20).toDF("l_orderkey")
      val est = PortableSketch.cmsEstimate(cells, probes, "l_orderkey")
      val exact = li.filter(col("l_orderkey") < 20)
        .groupBy("l_orderkey").agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("l_orderkey"), "left")
        .select(col("l_orderkey"),
          coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
          col("est_cnt"),
          (col("est_cnt") >= coalesce(col("exact_cnt"), lit(0L)))
            .as("never_undercounts"))
        .orderBy("l_orderkey")
    }),

    // Portable KMV quantile sketch — the DISTRIBUTION member of the
    // portable sketch family (HLL distinct counts, CMS point
    // frequencies): per-group bottom-K-by-md5 uniform row sample,
    // quantiles read off the sample by deterministic rank selection.
    // Exactly mergeable (bottom-K of a union = bottom-K of the
    // concatenated bottom-Ks; PortableSketchSpec) and hash-gated —
    // DuckDB replays hashes, sample, and selection bit-for-bit. The
    // row key concatenates INTEGER columns only (double-to-string is
    // not cross-engine portable). Scale: the rank filter compiles to
    // WindowGroupLimit (per-partition prune to K before the
    // shuffle), so the shuffle carries samples, never data — vs
    // exact percentile_approx this is the auditable-interchange
    // variant, same as the HLL/CMS tables.
    "q_agg_quantile_sketch" -> ((s, d) => {
      import graft.operators.PortableSketch
      val keyed = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          concat_ws(":", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long")).as("rk"),
          col("l_extendedprice").as("v"))
      val sample = PortableSketch.kmvSample(keyed,
        Seq("l_returnflag"), col("rk"), col("v"))
      PortableSketch.kmvQuantiles(sample, Seq("l_returnflag"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .orderBy("l_returnflag")
    }),

    // Incremental QUANTILE maintenance — the KMV analogue of
    // q_sketch_incremental's daily-HLL union: fine-grained
    // per-(returnflag, linestatus) samples are built once, then any
    // coarser grouping rolls up by kmvMerge (bottom-K of the union
    // on the ORIGINAL hashes — no re-hash, no fact rescan). Min-wise
    // stability makes the merged sample IDENTICAL to sampling the
    // coarse group directly (PortableSketchSpec asserts it against
    // q_agg_quantile_sketch), so this query's hash gate doubles as
    // the mergeability proof under the driver oracle.
    "q_sketch_quantile_merge" -> ((s, d) => {
      import graft.operators.PortableSketch
      val keyed = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          concat_ws(":", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long")).as("rk"),
          col("l_extendedprice").as("v"))
      val fine = PortableSketch.kmvSample(keyed,
        Seq("l_returnflag", "l_linestatus"), col("rk"), col("v"))
      val merged = PortableSketch.kmvMerge(fine, Seq("l_returnflag"))
      PortableSketch.kmvQuantiles(merged, Seq("l_returnflag"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .orderBy("l_returnflag")
    }),

    // KMV set-similarity — the SET-OPERATIONS member of the portable
    // sketch family (HLL counts / CMS frequencies / KMV quantiles):
    // Jaccard + union/intersection cardinality estimates for two key
    // sets from one bottom-k pass over the hashed union (minwise
    // resemblance; Beyer et al. SIGMOD'07 kth-minimum estimator).
    // Here: how much does the 1995 customer base overlap 1996's —
    // the audience-overlap / corpus-shard-overlap question that at
    // 100 TB cannot afford an exact distinct intersection. Each side
    // reduces to distinct hashes map-side; past that only k rows
    // move. Deterministic md5 hashing + one fixed double chain ⇒
    // DuckDB replays every estimate bit-for-bit (hash-gated);
    // PortableSketchSpec pins |Ĵ − J| against the exact overlap.
    "q_sketch_jaccard" -> ((s, d) => {
      import graft.operators.PortableSketch
      def buyers(yr: String, next: String) = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(yr).cast("timestamp_ntz") &&
          col("o_orderdate") < lit(next).cast("timestamp_ntz"))
        .select("o_custkey")
      PortableSketch.kmvSetSimilarity(
        buyers("1995-01-01", "1996-01-01"),
        buyers("1996-01-01", "1997-01-01"), "o_custkey")
    }),

    // Incremental sketch maintenance — the 100 TB distinct-count
    // pattern: per-DAY HLL register frames are built once (one pass
    // over the day's events), then ANY range rolls up by sketch
    // UNION — register-wise MAX — without rescanning the facts:
    // here the month's MAU from 30 daily frames. Union-of-daily ≡
    // sketch-of-month (max is associative; asserted in
    // PortableSketchSpec, with the estimate within HLL's error bound
    // of the exact MAU). At scale the daily register table is
    // ≤ 4096 rows/day and the union is a |days|·m-row aggregation.
    // Uses graft's PORTABLE HLL, so DuckDB replays daily registers,
    // the union, and the estimate bit-for-bit → hash-gated (the
    // native DataSketches hll_sketch_agg/hll_union_agg path is
    // demonstrated in AggSketchSpec).
    "q_sketch_incremental" -> ((s, d) => {
      import graft.operators.PortableSketch
      val ev = Tables.events(s, d).select(col("user_id"),
        date_trunc("day", timestamp_micros(expr("ts div 1000")))
          .as("day"))
      val daily = PortableSketch.hllRegisters(ev, col("user_id"),
        Seq("day"))
      val monthly = PortableSketch.hllUnion(daily,
        Seq(date_trunc("month", col("day")) -> "month"))
      val est = PortableSketch.hllEstimate(monthly, Seq("month"))
        .withColumnRenamed("est", "est_mau")
      val exact = ev
        .groupBy(date_trunc("month", col("day")).as("month"))
        .agg(countDistinct("user_id").as("exact_mau"),
          countDistinct("day").as("n_days"))
      est.join(exact, Seq("month"))
        .select(col("month"), col("n_days"), col("est_mau"),
          col("exact_mau"),
          (abs(col("est_mau") - col("exact_mau")).cast("double") /
            col("exact_mau").cast("double") <= 0.05)
            .as("within_bound"))
        .orderBy("month")
    }),

    // ROLLUP over a join: the Dataset-API rollup trips Spark's
    // ambiguous-self-join check against the Expand's duplicated
    // grouping attributes when combined with grouping() + orderBy, so
    // this one uses the SQL surface (same Catalyst plan).
    "q_agg_rollup" -> ((s, d) => {
      custNationRegion(s, d).createOrReplaceTempView("cnr_rollup")
      s.sql(
        """SELECT r_name, n_name, COUNT(*) AS cnt,
          |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_bal,
          |  CAST(GROUPING(r_name) AS INT) AS g_r,
          |  CAST(GROUPING(n_name) AS INT) AS g_n
          |FROM cnr_rollup
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
          |""".stripMargin)
    }),

    "q_agg_cube" -> ((s, d) => {
      val g = Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          sumDec(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderstatus")).cast("int").as("g_s"),
          grouping(col("o_orderpriority")).cast("int").as("g_p"))
      g.orderBy(g("g_s"), g("g_p"),
        g("o_orderstatus").asc_nulls_first,
        g("o_orderpriority").asc_nulls_first)
    }),

    // Pivot: explicit value list keeps the output schema static (and
    // matches DuckDB's PIVOT columns); count nulls filled with 0 to
    // align with DuckDB's count-of-empty-group = 0.
    "q_agg_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("o_orderstatus")),

    // GROUPING SETS has no Dataset-API builder — SQL surface is the
    // idiomatic Spark route.
    "q_agg_grouping_sets" -> ((s, d) => {
      custNationRegion(s, d).createOrReplaceTempView("cnr_gs")
      s.sql(
        """SELECT r_name, n_name, COUNT(*) AS cnt,
          |  CAST(GROUPING(r_name) AS INT) AS g_r,
          |  CAST(GROUPING(n_name) AS INT) AS g_n
          |FROM cnr_gs
          |GROUP BY GROUPING SETS ((r_name), (n_name), ())
          |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
          |""".stripMargin)
    })
  )

  private def custNationRegion(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))

  private val cnrFrom =
    """FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.25) AS p25_qty,
        |  quantile_cont(l_quantity, 0.75) AS p75_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_var" ->
      """SELECT l_returnflag,
        |  (s2 - s1 * s1 / n) / n AS var_pop,
        |  sqrt((s2 - s1 * s1 / n) / n) AS stddev_pop,
        |  CAST(n AS BIGINT) AS n
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "q_multi_distinct" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderpriority) AS n_prio,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY COUNT(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 20000) * 20000 AS BIGINT)
        |    AS bucket_lo,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket_lo""".stripMargin,
    "q_agg_corr" ->
      """SELECT l_returnflag,
        |  round((sxy - sx * sy / n) / n, 9) AS covar_pop,
        |  round((sxy - sx * sy / n) /
        |    (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 9) AS corr,
        |  CAST(n AS BIGINT) AS n
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_regression" ->
      """SELECT l_returnflag,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
        |  round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 9)
        |    AS intercept,
        |  CAST(n AS BIGINT) AS n
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    // Plain GROUP BY: the salted two-phase engine plan must be
    // result-identical (decimal sums are associative).
    "q_agg_salted" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_minmax" ->
      """SELECT s_suppkey, s_name,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  MIN(l_shipdate) AS first_ship,
        |  MAX(l_shipdate) AS last_ship,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,
    "q_agg_distinct" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
        |  COUNT(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_agg_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  CAST(GROUPING(r_name) AS INT) AS g_r,
        |  CAST(GROUPING(n_name) AS INT) AS g_n
        |$cnrFrom
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_agg_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_grouping_sets" ->
      s"""SELECT r_name, n_name, COUNT(*) AS cnt,
        |  CAST(GROUPING(r_name) AS INT) AS g_r,
        |  CAST(GROUPING(n_name) AS INT) AS g_n
        |$cnrFrom
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    // Portable-HLL replay: the oracle rebuilds the identical register
    // frame from the same md5 bits (PortableSketch.duckRegistersSql
    // emits the SAME integer rank ladder both engines run) and
    // applies the SAME estimate expression — see PortableSketch for
    // the domain-wide portability proof of the one ln branch.
    "q_agg_approx" -> {
      val ps = graft.operators.PortableSketch
      s"""WITH regs AS (
        |  ${ps.duckRegistersSql("CAST(l_orderkey AS VARCHAR)",
             Seq("l_returnflag"), "lineitem")}),
        |est AS (
        |  ${ps.duckEstimateSql(Seq("l_returnflag"), "regs")}),
        |exact AS (
        |  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
        |         COUNT(*) AS n
        |  FROM lineitem GROUP BY 1),
        |med AS (
        |  SELECT l_returnflag,
        |         quantile_cont(l_quantity, 0.5) AS approx_median
        |  FROM lineitem
        |  WHERE ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |           CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
        |  GROUP BY 1)
        |SELECT e.l_returnflag, e.est AS est_orders, x.exact_orders,
        |       m.approx_median, x.n
        |FROM est e JOIN exact x USING (l_returnflag)
        |           JOIN med m USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin
    },
    // Portable-KMV replay: same md5 bottom-K sample, same (v, h)
    // rank selection; FLOOR(q·(n−1)) is the same IEEE double on both
    // engines for n ≤ K.
    "q_agg_quantile_sketch" ->
      """WITH keyed AS (
        |  SELECT l_returnflag,
        |    concat_ws(':', l_orderkey, l_linenumber, l_partkey,
        |              l_suppkey, CAST(l_quantity AS BIGINT)) AS rk,
        |    l_extendedprice AS v
        |  FROM lineitem),
        |h AS (
        |  SELECT l_returnflag,
        |    ('0x' || substring(md5(rk), 1, 15))::BIGINT AS h, v
        |  FROM keyed),
        |s AS (
        |  SELECT l_returnflag, h, v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY h, v) AS rn
        |  FROM h),
        |k AS (SELECT l_returnflag, h, v FROM s WHERE rn <= 256),
        |o AS (
        |  SELECT l_returnflag, v,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY v, h) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM k)
        |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_sample,
        |  MAX(CASE WHEN rn = FLOOR(0.5 * (n - 1)) + 1 THEN v END)
        |    AS p50,
        |  MAX(CASE WHEN rn = FLOOR(0.9 * (n - 1)) + 1 THEN v END)
        |    AS p90,
        |  MAX(CASE WHEN rn = FLOOR(0.99 * (n - 1)) + 1 THEN v END)
        |    AS p99
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,
    // Full KMV resemblance replay: distinct md5 hashes per side,
    // bottom-256 of the union, membership flags, and the SAME fixed
    // double chains (matches/k_used; 255·2⁶⁰/(h_k+1); product with
    // the ROUNDED union_est) — bit-equal to kmvSetSimilarity.
    "q_sketch_jaccard" ->
      """WITH a AS (
        |  SELECT DISTINCT ('0x' || substring(md5(
        |      CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate <  TIMESTAMP '1996-01-01'),
        |b AS (
        |  SELECT DISTINCT ('0x' || substring(md5(
        |      CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01'),
        |u AS (
        |  SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
        |  ORDER BY h LIMIT 256),
        |f AS (
        |  SELECT u.h,
        |    CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS ib
        |  FROM u LEFT JOIN a ON a.h = u.h LEFT JOIN b ON b.h = u.h),
        |g AS (
        |  SELECT CAST(COUNT(*) AS INT) AS k_used,
        |    CAST(SUM(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
        |      AS INT) AS matches,
        |    MAX(h) AS h_k
        |  FROM f),
        |e AS (
        |  SELECT k_used, matches, h_k,
        |    CAST(matches AS DOUBLE) / CAST(k_used AS DOUBLE)
        |      AS jaccard_est,
        |    CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
        |      ELSE 255.0 * 1152921504606846976.0 /
        |           (CAST(h_k AS DOUBLE) + 1.0) END AS union_est
        |  FROM g)
        |SELECT k_used, matches, h_k, jaccard_est, union_est,
        |  CAST(matches AS DOUBLE) / CAST(k_used AS DOUBLE)
        |    * union_est AS inter_est
        |FROM e""".stripMargin,
    // Two-stage KMV replay: fine bottom-K per (flag, status), then
    // bottom-K of the union per flag on the same hashes.
    "q_sketch_quantile_merge" ->
      """WITH keyed AS (
        |  SELECT l_returnflag, l_linestatus,
        |    concat_ws(':', l_orderkey, l_linenumber, l_partkey,
        |              l_suppkey, CAST(l_quantity AS BIGINT)) AS rk,
        |    l_extendedprice AS v
        |  FROM lineitem),
        |h AS (
        |  SELECT l_returnflag, l_linestatus,
        |    ('0x' || substring(md5(rk), 1, 15))::BIGINT AS h, v
        |  FROM keyed),
        |s1 AS (
        |  SELECT l_returnflag, l_linestatus, h, v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
        |      ORDER BY h, v) AS rn
        |  FROM h),
        |fine AS (SELECT l_returnflag, h, v FROM s1 WHERE rn <= 256),
        |s2 AS (
        |  SELECT l_returnflag, h, v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY h, v) AS rn
        |  FROM fine),
        |k AS (SELECT l_returnflag, h, v FROM s2 WHERE rn <= 256),
        |o AS (
        |  SELECT l_returnflag, v,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY v, h) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM k)
        |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_sample,
        |  MAX(CASE WHEN rn = FLOOR(0.5 * (n - 1)) + 1 THEN v END)
        |    AS p50,
        |  MAX(CASE WHEN rn = FLOOR(0.9 * (n - 1)) + 1 THEN v END)
        |    AS p90,
        |  MAX(CASE WHEN rn = FLOOR(0.99 * (n - 1)) + 1 THEN v END)
        |    AS p99
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,
    // Portable-CMS replay: integer-only cell counts + min-over-rows.
    "q_agg_cms" -> {
      val (dd, ww) = (graft.operators.PortableSketch.D,
        graft.operators.PortableSketch.W)
      s"""WITH js AS (SELECT range AS j FROM range($dd)),
        |cells AS (
        |  SELECT j, ('0x' || substring(md5(CAST(j AS VARCHAR) || ':' ||
        |           CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT % $ww
        |           AS bucket,
        |         COUNT(*) AS cnt
        |  FROM lineitem CROSS JOIN js GROUP BY 1, 2),
        |probes AS (
        |  SELECT p.range AS l_orderkey, js.j,
        |    ('0x' || substring(md5(CAST(js.j AS VARCHAR) || ':' ||
        |      CAST(p.range AS VARCHAR)), 1, 15))::BIGINT % $ww AS bucket
        |  FROM range(20) p CROSS JOIN js),
        |est AS (
        |  SELECT l_orderkey, MIN(COALESCE(cnt, 0)) AS est_cnt
        |  FROM probes LEFT JOIN cells USING (j, bucket) GROUP BY 1),
        |exact AS (
        |  SELECT l_orderkey, COUNT(*) AS exact_cnt FROM lineitem
        |  WHERE l_orderkey < 20 GROUP BY 1)
        |SELECT e.l_orderkey, COALESCE(x.exact_cnt, 0) AS exact_cnt,
        |  e.est_cnt,
        |  e.est_cnt >= COALESCE(x.exact_cnt, 0) AS never_undercounts
        |FROM est e LEFT JOIN exact x USING (l_orderkey)
        |ORDER BY l_orderkey""".stripMargin
    },
    // Portable-HLL union replay: daily registers → register-wise MAX
    // roll-up → the same estimate expression.
    "q_sketch_incremental" -> {
      val ps = graft.operators.PortableSketch
      s"""WITH ev AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', make_timestamp(epoch_us(ts)))
        |         AS TIMESTAMP) AS day
        |  FROM events),
        |daily AS (
        |  ${ps.duckRegistersSql("CAST(user_id AS VARCHAR)",
             Seq("day"), "ev")}),
        |monthly AS (
        |  SELECT CAST(date_trunc('month', day) AS TIMESTAMP) AS month,
        |         reg, MAX(r) AS r
        |  FROM daily GROUP BY 1, 2),
        |est AS (
        |  ${ps.duckEstimateSql(Seq("month"), "monthly")}),
        |exact AS (
        |  SELECT CAST(date_trunc('month', day) AS TIMESTAMP) AS month,
        |         COUNT(DISTINCT user_id) AS exact_mau,
        |         COUNT(DISTINCT day) AS n_days
        |  FROM ev GROUP BY 1)
        |SELECT e.month, x.n_days, e.est AS est_mau, x.exact_mau,
        |  CAST(abs(e.est - x.exact_mau) AS DOUBLE) /
        |    CAST(x.exact_mau AS DOUBLE) <= 0.05 AS within_bound
        |FROM est e JOIN exact x USING (month)
        |ORDER BY month""".stripMargin
    }
  )
}
