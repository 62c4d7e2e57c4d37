package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Window-function pack: rank family, running frames, lead/lag, and
  * batch sessionization (gap > 30 min ⇒ new session) — SURVEY.md §2.3
  * Q23–Q26 + `q_events_sessionize`.
  *
  * Event time: `events.ts` is epoch-nanos LongType (see
  * [[graft.Tables]]); all arithmetic here uses `ts_us = ts div 1000`
  * to match DuckDB's microsecond truncation of the same parquet
  * column exactly.
  *
  * Scale: each window is a single hash-shuffle on its partition key +
  * in-partition sort; no window here is unpartitioned (which would
  * serialize on one task at 100 TB).
  */
object WindowQueries {
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).cast("int").as("rnk"),
          dense_rank().over(w).cast("int").as("drnk"),
          row_number().over(w).cast("int").as("rn"))
        .orderBy("o_orderkey")
    }),

    "q_win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          // Exact decimal prefix sum; double only on the output
          // surface (decimal outputs fail the driver's pandas hash).
          sum(dec(col("o_totalprice"))).over(w).cast("double")
            .as("run_sum"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_lead_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
        .orderBy("user_id", "event_id")
    }),

    "q_win_ntile" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).cast("int").as("quartile"))
        .orderBy("c_custkey")
    }),

    "q_win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"))
        .orderBy("o_orderkey")
    }),

    // Centered moving average (±1 row): exact decimal window sum ÷
    // window count — the summation-order-safe moving-aggregate shape.
    "q_win_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-1, 1)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(dec(col("o_totalprice"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("mov_avg"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Batch event-time windowing: the same window() operator the
    // streaming pack uses, on the batch surface — one hash aggregate
    // on (bucket, type). Event time is µs (ts div 1000, the DuckDB
    // truncation contract); sums are exact-decimal → double.
    "q_events_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("ets"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        // NTZ on the output surface: an instant-typed TIMESTAMP writes
        // tz-adjusted parquet (pandas reads it tz-aware) while the
        // oracle's make_timestamp is naive — same wall-clock under the
        // session's UTC, different pandas dtypes.
        .select(col("window.start").cast("timestamp_ntz").as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")),

    // IGNORE NULLS window variants: last non-null over a running
    // frame (gap-fill / forward-fill — the standard way to propagate
    // the latest observation) and lag over a sparse column.
    "q_win_ignore_nulls" -> ((s, d) => {
      val sparse = when(col("o_orderkey") % 3 === 0, col("o_totalprice"))
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("sparse_price", sparse)
        .select(col("o_custkey"), col("o_orderkey"),
          col("sparse_price"),
          last(col("sparse_price"), ignoreNulls = true).over(w)
            .as("filled_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // As-of join: clicks enriched with the most recent prior purchase
    // of the same user — the union-and-window formulation (see
    // [[graft.operators.AsofJoin]]); oracle is DuckDB's native ASOF
    // LEFT JOIN. Purchases are pre-deduped per (user, ts) so the
    // at-or-before pick is unique on both engines.
    "q_join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("a_event_id"))
      val wDedup = Window.partitionBy("user_id", "ts_us").orderBy("event_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("b_event_id"), col("value").as("b_value"))
      graft.operators.AsofJoin
        .leftAsof(clicks, purchases, "user_id", "ts_us",
          Seq("b_event_id", "b_value"))
        .orderBy("a_event_id")
    }),

    // Forward as-of: each click enriched with the user's NEXT
    // purchase at-or-after it (same descending-scan window; see
    // [[graft.operators.AsofJoin.leftAsofForward]]).
    "q_join_asof_fwd" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("a_event_id"))
      val wDedup = Window.partitionBy("user_id", "ts_us").orderBy("event_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("b_event_id"), col("value").as("b_value"))
      graft.operators.AsofJoin
        .leftAsofForward(clicks, purchases, "user_id", "ts_us",
          Seq("b_event_id", "b_value"))
        .orderBy("a_event_id")
    }),

    // Gap-based sessionization: lag + cumulative-sum of new-session
    // flags — the classic two-window formulation.
    "q_events_sessionize" -> ((s, d) => {
      val byTime = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val cum = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = 30L * 60 * 1000 * 1000
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("new_sess",
          when(col("ts_us") - lag(col("ts_us"), 1).over(byTime) > gapUs ||
            lag(col("ts_us"), 1).over(byTime).isNull, 1).otherwise(0))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          sum(col("new_sess")).over(cum).cast("int").as("session_id"))
        .orderBy("user_id", "event_id")
    }),

    // Native session_window in BATCH (the lag+cumsum sessionizer
    // above is the portable formulation; this is Spark's built-in
    // gap-merge operator — one hash-shuffle on user_id, sessions
    // merged inside each partition). Oracle reproduces the merge with
    // gap logic: session end = last event + gap, by definition.
    "q_events_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("ets", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"), session_window(col("ets"), "30 minutes"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("s_start"),
          col("session_window.end").cast("timestamp_ntz").as("s_end"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")),

    // Running COUNT(DISTINCT) over a window — which neither engine
    // supports natively — via the first-occurrence decomposition:
    // mark each (user, type)'s first event, then a running sum of
    // the marks counts distinct types seen so far. The mark window
    // is partitioned by user_id (NOT (user, type), which would cost
    // a second shuffle) and ordered type-first: within a user each
    // type is one contiguous run, so `lag(event_type) != event_type`
    // IS the first occurrence. One Exchange, two in-partition sorts
    // — survives any user count; the naive size(collect_set() OVER)
    // carries a growing set per row and has no DuckDB equivalent.
    "q_win_distinct_running" -> ((s, d) => {
      val wByType = Window.partitionBy("user_id")
        .orderBy("event_type", "ts_us", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_us"))
        .withColumn("first_seen",
          when(lag(col("event_type"), 1).over(wByType).isNull ||
            lag(col("event_type"), 1).over(wByType) =!= col("event_type"),
            1).otherwise(0))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_us"),
          sum(col("first_seen")).over(wRun).cast("int").as("n_types_seen"))
        .orderBy("user_id", "event_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(RANK() OVER w AS INT) AS rnk,
        |  CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_win_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS DOUBLE) AS run_sum
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_lead_lag" ->
      """SELECT user_id, event_id, value,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value,
        |  ts_us - LAG(ts_us, 1) OVER w AS gap_us
        |FROM (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_win_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS mov_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_events_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', make_timestamp(ts_us))
        |    AS w_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT event_type, value, epoch_us(ts) AS ts_us FROM events)
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "q_win_ignore_nulls" ->
      """SELECT o_custkey, o_orderkey, sparse_price,
        |  last_value(sparse_price IGNORE NULLS) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_price
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END
        |          AS sparse_price
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_join_asof" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT user_id, ts_us, event_id AS a_event_id
        |      FROM e WHERE event_type = 'click'),
        |b AS (SELECT user_id, ts_us, b_event_id, b_value FROM (
        |        SELECT user_id, ts_us, event_id AS b_event_id,
        |               value AS b_value,
        |               row_number() OVER (PARTITION BY user_id, ts_us
        |                                  ORDER BY event_id) AS rn
        |        FROM e WHERE event_type = 'purchase') WHERE rn = 1)
        |SELECT a.user_id, a.ts_us, a.a_event_id, b.b_event_id, b.b_value
        |FROM a ASOF LEFT JOIN b
        |  ON a.user_id = b.user_id AND a.ts_us >= b.ts_us
        |ORDER BY a_event_id""".stripMargin,
    "q_join_asof_fwd" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT user_id, ts_us, event_id AS a_event_id
        |      FROM e WHERE event_type = 'click'),
        |b AS (SELECT user_id, ts_us, b_event_id, b_value FROM (
        |        SELECT user_id, ts_us, event_id AS b_event_id,
        |               value AS b_value,
        |               row_number() OVER (PARTITION BY user_id, ts_us
        |                                  ORDER BY event_id) AS rn
        |        FROM e WHERE event_type = 'purchase') WHERE rn = 1)
        |SELECT a.user_id, a.ts_us, a.a_event_id, b.b_event_id, b.b_value
        |FROM a ASOF LEFT JOIN b
        |  ON a.user_id = b.user_id AND a.ts_us <= b.ts_us
        |ORDER BY a_event_id""".stripMargin,
    "q_events_sessionize" ->
      """SELECT user_id, event_id, ts_us,
        |  CAST(SUM(new_sess) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |    AS session_id
        |FROM (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM (
        |    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |      LAG(epoch_us(ts), 1) OVER
        |        (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |        AS prev_us
        |    FROM events))
        |ORDER BY user_id, event_id""".stripMargin,
    // session_window semantics: sessions merge while the gap to the
    // previous event is ≤ 30 min (INCLUSIVE at the exact boundary —
    // SessionWindowBoundarySpec pins that Spark merges an event
    // arriving exactly `gap` later and splits 1 µs after); start =
    // first event, end = last event + 30 min.
    "q_events_session_window" ->
      """WITH s AS (
        |  SELECT user_id, value, ts_us,
        |    SUM(new_sess) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM (
        |    SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        |      CASE WHEN LAG(epoch_us(ts), 1) OVER
        |             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |             IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
        |             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |             > 1800000000
        |           THEN 1 ELSE 0 END AS new_sess
        |    FROM events))
        |SELECT user_id,
        |  make_timestamp(MIN(ts_us)) AS s_start,
        |  make_timestamp(MAX(ts_us) + 1800000000) AS s_end,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, s_start""".stripMargin,
    // Same first-occurrence decomposition; (ts_us, event_id) is a
    // strict total order (event_id unique), so the lag marks and the
    // running sum replay identically.
    "q_win_distinct_running" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    CASE WHEN LAG(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY event_type, ts_us, event_id)
        |           IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS first_seen
        |  FROM e)
        |SELECT user_id, event_id, event_type, ts_us,
        |  CAST(SUM(first_seen) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |    AS n_types_seen
        |FROM f ORDER BY user_id, event_id""".stripMargin
  )
}
