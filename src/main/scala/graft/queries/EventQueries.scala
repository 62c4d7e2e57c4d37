package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Event-analytics pack: ordered funnels, cohort retention, and
  * time-series gap-fill — the product-analytics surface layered on
  * the same events table the sessionizer uses.
  *
  * Event time: `events.ts` is epoch-nanos LongType (see
  * [[graft.Tables]]); all arithmetic uses `ts div 1000` (µs) to match
  * DuckDB's microsecond truncation of the same column (SURVEY §7.4).
  *
  * Scale notes inline; common theme: everything is keyed by user_id
  * (or cohort), so each step is one hash-shuffle — no unpartitioned
  * window, no driver materialization, and the per-user frames a
  * 100 TB event log would produce stay independent tasks.
  */
object EventQueries {

  private def withUs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", expr("ts div 1000"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered funnel view → click → purchase: a user advances a stage
    // only with a LATER event of the next type (strict event-time
    // order, the defining property vs a mere type-count). One pass:
    // three chained conditional-min window aggregates over the SAME
    // user_id partitioning (unbounded frames, no sort) — the event
    // log shuffles once, the per-user collapse reuses that
    // partitioning, and the final 1-row count is a map-side partial
    // agg. The previous formulation scanned events 3× and joined
    // twice (r4 bench: 4.5 s driver vs ~1 s for this plan).
    "q_events_funnel" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      val ev = withUs(Tables.events(s, d))
        .select("user_id", "event_type", "ts_us")
      ev
        .withColumn("t1", min(when(col("event_type") === "view",
          col("ts_us"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("ts_us") > col("t1"), col("ts_us"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("ts_us") > col("t2"), col("ts_us"))).over(w))
        .groupBy("user_id")
        .agg(first("t1").as("t1"), first("t2").as("t2"),
          first("t3").as("t3"))
        .agg(count(col("t1")).as("n_view"),
          count(col("t2")).as("n_click_after"),
          count(col("t3")).as("n_purchase_after"))
    }),

    // Weekly cohort retention: users bucketed by first-seen week,
    // counted per (cohort, weeks-since-cohort) of activity. Two
    // aggregations on user_id + one broadcast-sized join — the
    // (cohort_week, week_no) matrix is tiny however large the log.
    "q_events_retention" -> ((s, d) => {
      // cohort week as a whole-partition window MIN instead of a
      // separate aggregate + join-back: one scan of the log and one
      // user_id exchange replace the former two scans + distinct
      // exchange + cohort exchange + join (same rows out — the join
      // attached exactly this per-user min). The (user, wk, cohort)
      // dedup then needs NO further exchange: hash(user_id) already
      // clusters its keys (guide §2.4 share-one-exchange).
      val wU = Window.partitionBy("user_id")
      withUs(Tables.events(s, d))
        .withColumn("wk",
          date_trunc("week", timestamp_micros(col("ts_us"))))
        .select(col("user_id"), col("wk"),
          min("wk").over(wU).as("cohort_wk"))
        .distinct()
        .withColumn("week_no",
          ((unix_timestamp(col("wk")) - unix_timestamp(col("cohort_wk")))
            / (7L * 24 * 3600)).cast("int"))
        .groupBy("cohort_wk", "week_no")
        .agg(countDistinct("user_id").as("n_users"))
        .select(col("cohort_wk").cast("timestamp_ntz").as("cohort_wk"),
          col("week_no"), col("n_users"))
        .orderBy("cohort_wk", "week_no")
    }),

    // Rolling one-hour window per user: a time-RANGE frame over the
    // µs event-time axis (counts + exact-decimal sum of the trailing
    // hour at every event). RANGE on the long µs column, not ROWS —
    // the frame adapts to event density, the defining property of a
    // time-window aggregate. One partitioned window, no self-join.
    "q_events_rolling" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600L * 1000 * 1000, 0)
      withUs(Tables.events(s, d))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("sum_1h"))
        .orderBy("event_id")
    }),

    // Time-weighted average: each observation weighted by its holding
    // duration (until the next event), the correct summary for
    // irregularly-sampled series (a plain AVG over-weights bursts).
    // value×duration products are exact decimals (value DECIMAL(18,2)
    // × integer µs), so the sum is associative and engine-portable;
    // one double division + round(9) on the output surface.
    "q_events_twa" -> ((s, d) => {
      val nextTs = lead(col("ts_us"), 1).over(
        Window.partitionBy("user_id").orderBy("ts_us", "event_id"))
      withUs(Tables.events(s, d))
        .withColumn("dt", nextTs - col("ts_us"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(
          sum(col("value").cast(DecimalType(18, 2)) *
            col("dt").cast(DecimalType(18, 0))).as("wsum"),
          sum(col("dt")).as("span_us"),
          count(lit(1)).as("n_holds"))
        .select(col("user_id"),
          // wsum exceeds 2^53 in cent·µs units, so DECIMAL→DOUBLE
          // conversion is 1-ulp engine-dependent (Spark's one-step
          // BigDecimal vs DuckDB's int128·10⁻² two-step). Surface
          // the EXACT integer W·100 as BIGINT instead: int→double
          // is a single correctly-rounded step on both engines, and
          // the bare IEEE division of bit-identical inputs needs no
          // final round (SURVEY 7.4 rule 10)
          ((col("wsum") * 100).cast("long").cast("double") /
            (col("span_us") * 100).cast("double")).as("twa"),
          col("span_us"), col("n_holds"))
        .orderBy("user_id")
    }),

    // Hourly gap-fill with forward fill: each user's observation
    // series resampled onto a dense hourly grid between their first
    // and last event, missing hours carrying the last seen value.
    // sequence()+explode generates each user's grid inside their own
    // task (no driver-side calendar), and the fill is one partitioned
    // IGNORE NULLS window — the standard last-observation-carried-
    // forward shape. Bounded to 10 users to keep the gate output
    // proportionate; the plan is user-count invariant.
    "q_events_gapfill" -> ((s, d) => {
      val ev = withUs(Tables.events(s, d))
        .filter(col("user_id") < 10)
        // integer div (the §7.4 event-time rule): double-div + cast
        // truncates toward zero while DuckDB's // floors — divergent
        // for pre-epoch timestamps.
        .withColumn("hour_no", expr("ts_us div 3600000000"))
      // last observation within each (user, hour), event_id tiebreak
      val perHour = ev
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "hour_no")
            .orderBy(col("ts_us").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select("user_id", "hour_no", "value")
      val grids = ev.groupBy("user_id")
        .agg(min("hour_no").as("h0"), max("hour_no").as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"))).as("hour_no"))
      val ffill = Window.partitionBy("user_id").orderBy("hour_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grids.join(perHour, Seq("user_id", "hour_no"), "left")
        .select(col("user_id"), col("hour_no"),
          last(col("value"), ignoreNulls = true).over(ffill).as("filled"))
        .orderBy("user_id", "hour_no")
    }),

    // CEP-style pattern matching: each user's event history becomes a
    // string of type initials (event-time order), and sequence
    // patterns are RE2-portable regexes over it — `vc+p` counts
    // non-overlapping view→click⁺→purchase funnels, `s.*e` flags an
    // error anywhere after signup. The regex-over-sequence trick is
    // the poor man's MATCH_RECOGNIZE, and the per-user string is the
    // same fits-one-task precondition as every sessionizer here.
    // Scale: one user_id shuffle, then per-row regex — no joins, no
    // further shuffles.
    "q_events_pattern" -> ((s, d) =>
      withUs(Tables.events(s, d))
        .groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("ts_us"),
          col("event_id"), col("event_type")))).as("h"))
        .select(col("user_id"),
          concat_ws("", expr(
            "transform(h, e -> substring(e.event_type, 1, 1))"))
            .as("seq"))
        .select(col("user_id"),
          length(col("seq")).cast("long").as("n_events"),
          regexp_count(col("seq"), lit("vc+p")).cast("long")
            .as("n_funnels"),
          col("seq").rlike("s.*e").as("error_after_signup"))
        .orderBy("user_id")),

    // Winsorization (p05/p95 clipping) — the outlier-control step a
    // value column gets before training-statistics jobs. Thresholds
    // come from ONE exact-percentile aggregate (broadcast single
    // row); the clip is a per-row projection. Per-user audit output:
    // events clipped and the winsorized mean (clipped values rounded
    // to 6 before the exact decimal sum — the q_sim_matrix rule,
    // since clamp outputs mix raw doubles with the interpolated
    // percentile threshold).
    "q_events_winsorize" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "value")
      val bounds = ev.agg(
        percentile(col("value"), lit(0.05)).as("lo"),
        percentile(col("value"), lit(0.95)).as("hi"))
      ev.crossJoin(broadcast(bounds))
        .select(col("user_id"),
          when(col("value") < col("lo"), col("lo"))
            .when(col("value") > col("hi"), col("hi"))
            .otherwise(col("value")).as("w"),
          (col("value") < col("lo") || col("value") > col("hi"))
            .cast("long").as("clipped"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("clipped")).as("n_clipped"),
          // micro-integer surface: round(x·1e6, 0) is cross-engine
          // exact (no decimal-scale rounding), the summed micros are
          // exact BIGINTs, and the mean is two sequential IEEE
          // divisions — a rational mean surfaced through round(x, 6)
          // hits .5e-6 grid boundaries where Spark HALF_UP and
          // DuckDB scaled-double rounding disagree (caught by the
          // sf0.1 gate: 1/1500 rows)
          (sum(round(col("w") * lit(1e6), 0).cast("long")).cast("double") /
            count(lit(1)) / lit(1e6)).as("mean_winsorized"))
        .orderBy("user_id")
    }),

    // First/last-touch attribution: each purchase credits the
    // earliest and the latest view/click STRICTLY BEFORE it (the
    // marketing-attribution primitive). One user_id shuffle; the
    // running min/max window frames reuse that partitioning. The
    // argmin/argmax is the sortable-string trick: zero-padded
    // (ts_us, event_id) prefix makes lexicographic MIN/MAX equal
    // numeric order — byte-identical in both engines, and the
    // event_id pad keeps the order strict under ts ties.
    "q_events_attrib" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tk = when(col("event_type").isin("view", "click"),
        concat(lpad(col("ts_us").cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 12, "0"),
          col("event_type")))
      withUs(Tables.events(s, d))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_us"), tk.as("tk"))
        .withColumn("fk", min(col("tk")).over(w))
        .withColumn("lk", max(col("tk")).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          substring(col("fk"), 1, 20).cast("long").as("ft_us"),
          substring(col("fk"), 33, 100).as("ft_type"),
          substring(col("lk"), 1, 20).cast("long").as("lt_us"),
          substring(col("lk"), 33, 100).as("lt_type"))
        .orderBy("event_id")
    }),

    // Concurrent-interval counting by boundary sweep: lineitems
    // pending shipment per day, from the [o_orderdate, l_shipdate]
    // interval of each lineitem. The classic formulation self-joins
    // intervals (O(n·m) — dies at any scale); the sweep emits +1/−1
    // boundary deltas, collapses them to one row per day, and takes
    // a DISTRIBUTED prefix sum over day order ([[PrefixSum]]: range
    // shuffle + per-partition scan + broadcast carry-in). Rows
    // crossing the scan are |distinct days|, and no window sees more
    // than one partition.
    "q_events_overlap" -> ((s, d) => {
      val iv = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
      val deltas = iv
        .select(to_date(col("o_orderdate")).as("day"), lit(1L).as("delta"))
        .unionAll(iv.select(
          date_add(to_date(col("l_shipdate")), 1).as("day"),
          lit(-1L).as("delta")))
        .groupBy("day").agg(sum(col("delta")).as("delta"))
      graft.operators.PrefixSum
        .prefixSum(deltas, col("delta"), "in_transit", col("day"))
        .select("day", "delta", "in_transit")
        .orderBy("day")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |           FROM events),
        |t1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE event_type = 'click' AND ts_us > t1
        |       GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE event_type = 'purchase' AND ts_us > t2
        |       GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM t1) AS n_view,
        |       (SELECT COUNT(*) FROM t2) AS n_click_after,
        |       (SELECT COUNT(*) FROM t3) AS n_purchase_after""".stripMargin,
    "q_events_retention" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |  FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
        |SELECT cohort_wk,
        |  CAST((epoch(wk) - epoch(cohort_wk)) / (7 * 24 * 3600) AS INT)
        |    AS week_no,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY cohort_wk, week_no
        |ORDER BY cohort_wk, week_no""".stripMargin,
    "q_events_rolling" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_events_twa" ->
      """SELECT user_id,
        |  CAST(CAST(wsum * 100 AS BIGINT) AS DOUBLE)
        |    / CAST(span_us * 100 AS DOUBLE) AS twa,
        |  span_us, n_holds
        |FROM (
        |  SELECT user_id,
        |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(dt AS DECIMAL(18,0)))
        |      AS wsum,
        |    CAST(SUM(dt) AS BIGINT) AS span_us,
        |    COUNT(*) AS n_holds
        |  FROM (
        |    SELECT user_id, value,
        |      LEAD(epoch_us(ts), 1) OVER w - epoch_us(ts) AS dt
        |    FROM events
        |    WINDOW w AS (PARTITION BY user_id
        |                 ORDER BY epoch_us(ts), event_id))
        |  WHERE dt IS NOT NULL
        |  GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,
    "q_events_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 3600000000 AS hour_no
        |  FROM events WHERE user_id < 10),
        |per_hour AS (
        |  SELECT user_id, hour_no, value FROM (
        |    SELECT user_id, hour_no, value,
        |      row_number() OVER (PARTITION BY user_id, hour_no
        |        ORDER BY ts_us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1)) AS hour_no
        |  FROM (SELECT user_id, MIN(hour_no) AS h0, MAX(hour_no) AS h1
        |        FROM e GROUP BY user_id))
        |SELECT g.user_id, g.hour_no,
        |  last_value(p.value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour_no
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM grid g LEFT JOIN per_hour p
        |  ON g.user_id = p.user_id AND g.hour_no = p.hour_no
        |ORDER BY g.user_id, g.hour_no""".stripMargin,
    "q_events_pattern" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |               ORDER BY epoch_us(ts), event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'vc+p')) AS BIGINT)
        |    AS n_funnels,
        |  regexp_matches(seq, 's.*e') AS error_after_signup
        |FROM seqs ORDER BY user_id""".stripMargin,
    "q_events_winsorize" ->
      """WITH bounds AS (
        |  SELECT quantile_cont(value, 0.05) AS lo,
        |         quantile_cont(value, 0.95) AS hi
        |  FROM events),
        |w AS (
        |  SELECT user_id,
        |    CASE WHEN value < lo THEN lo
        |         WHEN value > hi THEN hi ELSE value END AS w,
        |    CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END
        |      AS clipped
        |  FROM events, bounds)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(clipped) AS BIGINT) AS n_clipped,
        |  CAST(SUM(CAST(ROUND(w * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
        |    / COUNT(*) / 1000000.0 AS mean_winsorized
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same sortable-string argmin/argmax: ASCII digit padding makes
    // string MIN/MAX equal numeric (ts_us, event_id) order in both
    // engines; substring parse-back is position-identical.
    "q_events_attrib" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_type IN ('view', 'click') THEN
        |      lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
        |      lpad(CAST(event_id AS VARCHAR), 12, '0') || event_type
        |    END AS tk
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    MIN(tk) OVER win AS fk, MAX(tk) OVER win AS lk
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_us,
        |  CAST(substring(fk, 1, 20) AS BIGINT) AS ft_us,
        |  substring(fk, 33) AS ft_type,
        |  CAST(substring(lk, 1, 20) AS BIGINT) AS lt_us,
        |  substring(lk, 33) AS lt_type
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    // Single cumulative window over per-day deltas — the form the
    // engine's range-partitioned carry-in scan is provably equal to
    // (prefix sums are associative; partition boundaries only move
    // which pass adds which term).
    "q_events_overlap" ->
      """WITH iv AS (
        |  SELECT o_orderdate, l_shipdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM iv
        |  UNION ALL
        |  SELECT CAST(l_shipdate AS DATE) + 1 AS day, -1 AS delta
        |  FROM iv),
        |g AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS delta
        |      FROM d GROUP BY day)
        |SELECT day, delta,
        |  CAST(SUM(delta) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS in_transit
        |FROM g ORDER BY day""".stripMargin
  )
}
