package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.operators.TextAnalysis

/** Product-analytics and corpus-diagnostics pack: activity ratios
  * (DAU/MAU), statistical anomaly screens, embedding-space
  * diagnostics, character-distribution quality signals, a composite
  * keep/drop quality gate, and the corpus mixture report a training
  * run starts from.
  *
  * Everything here is oracle-gated. The determinism discipline
  * (SURVEY §7.4) shows up two ways worth naming:
  *   - ratios are divisions of EXACT quantities (longs, or
  *     decimal-sum-derived doubles), computed with the identical
  *     expression tree in both engines — never a re-association;
  *   - the char-distribution signal is Simpson diversity (1 − Σp²),
  *     not Shannon entropy: p is rational so Σp² is exact integer
  *     arithmetic until one final division, whereas entropy's
  *     p·log p terms inherit libm ulp differences between JVM
  *     `Math.log` and DuckDB's C `log` and cannot hash-match
  *     reliably.
  *
  * Event time follows [[EventQueries]]: `ts div 1000` µs (SURVEY
  * §7.4), `epoch_us(ts)` on the oracle side.
  */
object AnalyticsQueries {
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  private def withUs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", expr("ts div 1000"))

  /** Exact 1-based global rank over a strict total order, computed
    * WITHOUT a global single-task window: range-partition on the
    * sort key (each partition owns a contiguous slice of the total
    * order), count rows per partition, turn those counts into
    * exclusive prefix offsets with a broadcast theta self-join over
    * the #partitions-row counts frame (bounded by cluster config,
    * never by data — and no unpartitioned WindowExec anywhere), and
    * add each row's per-partition row_number to its partition's
    * offset. Two narrow shuffles of the input frame; no task ever
    * holds more than its range slice. `keys` must define a strict
    * total order (callers tiebreak on a unique id).
    */
  private def globalRank(df: DataFrame, rankCol: String,
      keys: Column*): DataFrame = {
    // persist(): the ranged frame has TWO consumers (the per-partition
    // counts and the final rank join), and repartitionByRange itself
    // samples its child for bounds — without a materialization the
    // WHOLE upstream plan executes once per consumer per pass, and
    // NESTED ranks (q_events_rfm chains three) re-execute the base
    // aggregation exponentially (the r15 before-plan carried 210
    // Exchange nodes; the measured steady cost was 45 Spark jobs).
    // Lazy persist, not localCheckpoint: no extra job — the first
    // consumer materializes, the second reads the cache, and the
    // cached data KEEPS the range partitioning so the rank window
    // needs no further exchange. At scale this is guide-§5 caching:
    // recomputing a full scan+shuffle chain twice always costs more
    // than reading back one materialized copy of the ranged frame.
    val ranged = df.repartitionByRange(keys: _*)
      .withColumn("_pid", spark_partition_id())
      .persist()
    val cnts = ranged.groupBy("_pid").agg(count(lit(1)).as("_pc"))
    val offs = cnts
      .join(broadcast(cnts.select(col("_pid").as("_pid2"),
        col("_pc").as("_pc2"))), col("_pid2") < col("_pid"), "left")
      .groupBy("_pid").agg(coalesce(sum(col("_pc2")), lit(0L)).as("_off"))
    val w = Window.partitionBy("_pid").orderBy(keys: _*)
    ranged.join(broadcast(offs), "_pid")
      .withColumn(rankCol, col("_off") + row_number().over(w))
      .drop("_pid", "_off")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DAU/MAU engagement: daily active users joined to their month's
    // active-user count; stickiness = dau/mau. Two count-distinct
    // aggregations (day grain, month grain) + a broadcast join of the
    // tiny month frame — the daily matrix stays |days| rows at any
    // log size, and the distinct-user state shards by (day, user)
    // during partial aggregation.
    "q_events_dau" -> ((s, d) => {
      val ev = withUs(Tables.events(s, d))
        .select(col("user_id"),
          date_trunc("day", timestamp_micros(col("ts_us"))).as("day"),
          date_trunc("month", timestamp_micros(col("ts_us"))).as("month"))
      val daily = ev.groupBy("day", "month")
        .agg(countDistinct("user_id").as("dau"),
          count(lit(1)).as("n_events"))
      val monthly = ev.groupBy(col("month").as("m_month"))
        .agg(countDistinct("user_id").as("mau"))
      daily
        .join(broadcast(monthly), col("month") === col("m_month"))
        .select(col("day"), col("dau"), col("n_events"), col("mau"),
          // bare IEEE division of exact ints (SURVEY 7.4 rule 10:
          // integer-ratio surfaces through round(x, 9) hit grid
          // boundaries where the engines round differently)
          (col("dau").cast("double") / col("mau").cast("double"))
            .as("stickiness"))
        .orderBy("day")
    }),

    // Statistical anomaly screen: per-user mean/std over event values
    // from exact decimal sufficient statistics (Σv, Σv² — one
    // map-side-combined pass), then flag events beyond 2σ. The z
    // computation is double math on identical exact-derived operands
    // with the identical expression tree in both engines
    // (mean = Σ/n; var = Σ²/n − mean²). The stats frame scales with
    // |users|, so it carries NO broadcast hint — the planner
    // broadcasts it while it fits (as here) and falls back to a
    // shuffle join on user_id at the 100M-user scale where a forced
    // broadcast would OOM the executors.
    "q_events_anomaly" -> ((s, d) => {
      val ev = withUs(Tables.events(s, d))
        .select("user_id", "event_id", "value", "ts_us")
      val stats = ev.groupBy(col("user_id").as("su_id"))
        .agg(
          (sum(dec(col("value"))).cast("double") / count(lit(1)))
            .as("mean"),
          (sum((dec(col("value")) * dec(col("value")))
            .cast(DecimalType(28, 4))).cast("double") / count(lit(1)))
            .as("meansq"),
          count(lit(1)).as("n"))
        .withColumn("std",
          sqrt(col("meansq") - col("mean") * col("mean")))
        .filter(col("n") >= 30 && col("std") > 0)
      ev.join(stats, col("user_id") === col("su_id"))
        .withColumn("z", (col("value") - col("mean")) / col("std"))
        .filter(abs(col("z")) > 2.0)
        .select(col("user_id"), col("event_id"), col("value"),
          round(col("z"), 9).as("z"))
        .orderBy("user_id", "event_id")
    }),

    // Embedding-space diagnostics: per-vector L2 norm, extrema, and
    // component signs. Per-row projection over the array column —
    // zero shuffle; the fold is an in-order left fold on both engines
    // (Spark `aggregate` HOF; DuckDB `list_reduce`), and IEEE
    // addition starting from 0.0 makes the two folds bit-identical.
    // At 100 TB this is the shape embedding QA runs as: narrow
    // projection, pushed column pruning (only `embedding` read).
    "q_embed_norm" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).cast("int").as("dim"),
          round(sqrt(expr(
            "aggregate(embedding, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))")),
            9).as("l2_norm"),
          round(expr(
            "aggregate(embedding, cast(0 as double), (acc, x) -> greatest(acc, abs(cast(x as double))))"),
            9).as("max_abs"),
          expr("size(filter(embedding, x -> cast(x as double) > 0D))")
            .cast("int").as("n_pos"))
        .orderBy("vec_id")),

    // Character-distribution quality: Simpson diversity 1 − Σp² and
    // distinct-char count per document. Σ(cnt²) and total² are exact
    // BIGINT arithmetic; ONE double division at the end (see object
    // doc for why this beats Shannon entropy as an oracle-gated
    // signal). Shape: explode to (doc, char) → two-level partial
    // aggregation; the char alphabet bounds the intermediate at
    // |docs|×|alphabet| rows however long the documents get.
    "q_text_diversity" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .groupBy("doc_id", "ch")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).cast("int").as("distinct_chars"),
          sum(col("cnt") * col("cnt")).as("sumsq"),
          sum(col("cnt")).as("total"))
        .select(col("doc_id"), col("distinct_chars"),
          // exact ints through 1.0 - a/b: every IEEE op is
          // deterministic, and a final round(·, 9) on the rational
          // result is a boundary hazard (SURVEY 7.4 rule 10)
          (lit(1.0) - col("sumsq").cast("double") /
            (col("total") * col("total")).cast("double"))
            .as("char_diversity"))
        .orderBy("doc_id")),

    // Composite quality gate: the keep/drop decision a curation
    // pipeline actually emits — first failing rule wins, with the
    // measured signals alongside for audit. All signals are exact
    // counts or single divisions of exact counts; the verdict CASE
    // is ordered identically in both engines. Per-row projection:
    // no shuffle except the output sort.
    "q_quality_gate" -> ((s, d) => {
      val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      val total = length(col("text"))
      val alphaRatio = alpha.cast("double") / total.cast("double")
      val wsTokens = TextAnalysis.wsTokenCount(col("text")).cast("int")
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), col("lang"),
          alphaRatio.as("alpha_ratio"), wsTokens.as("ws_tokens"))
        .withColumn("verdict",
          when(col("n_chars") < 100, "too_short")
            .when(col("n_chars") > 500, "too_long")
            .when(col("ws_tokens") < 10, "too_few_tokens")
            .when(col("alpha_ratio") < 0.6, "low_alpha")
            .otherwise("keep"))
        .select(col("doc_id"), col("n_chars"), col("ws_tokens"),
          // bare int-ratio; the 0.6 gate above also compares the
          // unrounded value on both engines (SURVEY 7.4 rule 10)
          col("alpha_ratio"),
          col("verdict"))
        .orderBy("doc_id")
    }),

    // Key-skew diagnostics: the distribution report you run on a
    // join key BEFORE deciding whether to salt it ([[graft.operators
    // .ScaleJoins]]). Per-key counts collapse map-side; quantiles
    // come from the counts-of-counts HISTOGRAM (cnt → #keys with
    // that cnt), whose size is the number of DISTINCT multiplicities
    // — tens of rows at any fact-table size — so the one global
    // cumulative window runs over a frame that never grows with the
    // data (a global window over per-key rows would serialize
    // billions of keys on one task). Rank positions are ceil(q·n) on
    // exact longs — no interpolation, no float percentile — so the
    // report is hash-identical on any engine.
    "q_skew_report" -> ((s, d) => {
      val cnts = Tables.lineitem(s, d)
        .groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
      val coc = cnts.groupBy("cnt").agg(count(lit(1)).as("freq"))
      val cum = coc.withColumn("cum",
        sum(col("freq")).over(Window.orderBy(col("cnt").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val stats = cnts.agg(
        count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"),
        sum(col("cnt")).as("total_rows"))
      val quantile = (q: Double, name: String) =>
        cum.crossJoin(broadcast(stats))
          .filter(col("cum") >= ceil(lit(q) * col("n_keys")))
          .agg(min(col("cnt")).as(name))
      quantile(0.5, "p50_cnt")
        .crossJoin(quantile(0.9, "p90_cnt"))
        .crossJoin(quantile(0.99, "p99_cnt"))
        .crossJoin(broadcast(stats))
        .select(col("n_keys"), col("total_rows"), col("max_cnt"),
          col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
          // two sequential exact-input IEEE divisions, no final
          // round (SURVEY 7.4 rule 10)
          (col("max_cnt").cast("double") /
            (col("total_rows").cast("double") /
              col("n_keys").cast("double"))).as("skew_ratio"))
    }),

    // Event path mining: top-10 three-step event-type transitions —
    // the "what do users do next" sequence query. Per-user total
    // order (ts, event_id) feeds two lead() windows on ONE user_id
    // shuffle; transition triples partial-aggregate map-side; top-10
    // is TakeOrderedAndProject.
    "q_events_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      withUs(Tables.events(s, d))
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc)
        .limit(10)
    }),

    // Fuzzy entity matching (block-then-verify): a deterministically
    // corrupted copy of every customer name (last two chars
    // digit-swapped) is matched back against the clean names —
    // prefix blocking turns the all-pairs O(n²) into an equi-join on
    // the block key, and the levenshtein verify runs only within
    // blocks. Both engines implement the same classic DP, so the
    // integer distances (and the match set) are exactly equal. At
    // 100 TB this is the entity-resolution shape: candidate
    // generation by equi-join on a blocking key, bounded verify.
    // The verify kernel is the THRESHOLD form (Spark's 3-arg
    // levenshtein): banded DP that early-exits once the distance
    // provably exceeds k — O(k·n) per pair instead of O(n·m), the
    // registry's former CPU-per-row ceiling at 10× (BENCH_10X). It
    // returns -1 past the bound, so `dist BETWEEN 0 AND 1` keeps the
    // match set (and the oracle hash) identical to the unbounded
    // filter.
    "q_fuzzy_match" -> ((s, d) => {
      val corrupt = (c: Column) => concat(substring(c, 1, 17),
        translate(substring(c, 18, 1), "0123456789", "1032547698"))
      val clean = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
      val dirty = Tables.customer(s, d)
        .select(col("c_custkey").as("d_custkey"),
          corrupt(col("c_name")).as("d_name"))
      dirty.join(clean,
          substring(col("d_name"), 1, 17) === substring(col("c_name"), 1, 17))
        .withColumn("dist", levenshtein(col("d_name"), col("c_name"), 1))
        .filter(col("dist").between(0, 1))
        .select("d_custkey", "c_custkey", "dist")
        .orderBy("d_custkey", "c_custkey")
    }),

    // Keyword extraction: top-3 terms per document by a TF-IDF-shaped
    // score. The score is the RATIONAL surrogate tf·N/df (exact
    // integer product, one double division) rather than tf·ln(N/df):
    // log is monotone in N/df, so per-document rankings are identical
    // for any fixed N — and the rational form hash-matches across
    // engines where ln's libm ulps cannot (the q_text_diversity
    // argument). Shape: explode → (doc,term) count → term df join →
    // per-doc ranked window; the df table is vocabulary-sized.
    //
    // Scale / SKEW: term document-frequency is Zipfian, so the
    // tf ⋈ df join must not shuffle raw term keys (the
    // q_text_lm_score class) — it goes through [[graft.operators
    // .ScaleJoins.frequencySplitJoin]], whose model frame's own df
    // column IS the stream key frequency (df = #(doc,term) rows per
    // term by construction): the pigeonhole head (> 1/4096 of the
    // stream, ≤ 4096 terms) broadcasts, and every key reaching the
    // tail shuffle is ≤ |tf|/4096. Result-identical to the plain
    // join, so the oracle hash is unchanged.
    "q_text_keywords" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select("doc_id", "text")
        // tokenization CPU spread across the cluster, not file
        // splits (sub-128 MB corpus file = one split = one task);
        // tf and df each re-tokenize — two parallel passes beat
        // materializing the token stream at corpus scale
        .repartition(col("doc_id"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = toks.distinct().groupBy("term").agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term").asc)
      graft.operators.ScaleJoins
        .frequencySplitJoin(tf, df, Seq("term"), "df",
          graft.queries.CorpusQueries.lmHeadFanout)
        .crossJoin(broadcast(n))
        .withColumn("score",
          (col("tf") * col("n_docs")).cast("double") /
            col("df").cast("double"))
        .withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          round(col("score"), 9).as("score"), col("rk"))
        .orderBy("doc_id", "rk")
    }),

    // Longest activity streak per user — the gaps-and-islands
    // pattern: distinct active days, then `day − row_number()` is
    // constant exactly within a run of consecutive days, so one
    // groupBy on that island key measures every streak. Day numbers
    // are integer µs-division (no timestamp/timezone surface at
    // all); two narrow shuffles on user_id.
    "q_events_streak" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("day_no")
      val days = withUs(Tables.events(s, d))
        .select(col("user_id"),
          expr("ts_us div 86400000000").as("day_no"))
        .distinct()
      val islands = days
        .withColumn("island", col("day_no") - row_number().over(w))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("streak"))
      islands.groupBy("user_id")
        .agg(sum(col("streak")).as("active_days"),
          max(col("streak")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    }),

    // RFM segmentation: recency / frequency / monetary quintiles per
    // user — the classic customer-value segmentation. Per-user
    // aggregates are exact (max ts, count, decimal sum). Quintiles
    // are NOT ntile() windows — a global ntile serializes every user
    // through one task — but reproduce ntile's semantics exactly:
    // each dimension's strict total order (value, user_id tiebreak)
    // gets an exact DISTRIBUTED rank via [[globalRank]] (range
    // shuffle + bounded per-partition offsets), then the closed form
    // bucket(rank, n) = ntile's first-(n mod k)-buckets-get-one-extra
    // rule assigns the quintile. Output is bit-identical to the
    // ntile(5) oracle; no operator sees more than one partition's
    // rows. The corpus-max reference time is a broadcast single row.
    "q_events_rfm" -> ((s, d) => {
      val ev = withUs(Tables.events(s, d))
      val per = ev.groupBy("user_id")
        .agg(max(col("ts_us")).as("last_us"),
          count(lit(1)).as("frequency"),
          sum(dec(col("value"))).cast("double").as("monetary"))
      val ref = ev.agg(max(col("ts_us")).as("ref_us"))
      val base = per.crossJoin(broadcast(ref))
        .withColumn("recency_us", col("ref_us") - col("last_us"))
      val nUsers = per.agg(count(lit(1)).as("_n"))
      // ntile(k) from a 1-based exact rank: q = n div k buckets of
      // size q+1 first (n mod k of them), size q after. Integer
      // ceil((a)/(b)) = (a + b - 1) div b; IF short-circuits, so the
      // q = 0 (n < k) case never evaluates the div-by-q branch.
      val ntileOf = (rank: String) => expr(
        s"CAST(IF($rank <= (_n % 5) * ((_n div 5) + 1), " +
          s"($rank + (_n div 5)) div ((_n div 5) + 1), " +
          s"(_n % 5) + ($rank - (_n % 5) * ((_n div 5) + 1) + " +
          s"(_n div 5) - 1) div (_n div 5)) AS INT)")
      val ranked = globalRank(globalRank(globalRank(base,
        "r_rank", col("recency_us").asc, col("user_id").asc),
        "f_rank", col("frequency").desc, col("user_id").asc),
        "m_rank", col("monetary").desc, col("user_id").asc)
      ranked.crossJoin(broadcast(nUsers))
        .withColumn("r_q", ntileOf("r_rank"))
        .withColumn("f_q", ntileOf("f_rank"))
        .withColumn("m_q", ntileOf("m_rank"))
        .select(col("user_id"), col("recency_us"), col("frequency"),
          col("monetary"), col("r_q"), col("f_q"), col("m_q"),
          concat(col("r_q"), col("f_q"), col("m_q")).as("segment"))
        .orderBy("user_id")
    }),

    // Exponentially weighted moving average per user (α = 0.3):
    // EMA is inherently recursive, so it runs as an in-order fold
    // over each user's event-time-sorted value list — Spark's
    // `aggregate` HOF seeded with x₀, DuckDB's `list_reduce` (which
    // inits with the first element): the SAME left fold, hence
    // bit-identical doubles. State per user is one list; at scale
    // this shards by user like every sessionization — and a user's
    // history must fit a task, the same precondition every
    // collect_list-based operator documents.
    "q_events_ema" -> ((s, d) => {
      val ev = withUs(Tables.events(s, d))
      ev.groupBy("user_id")
        .agg(array_sort(collect_list(
          struct(col("ts_us"), col("event_id"), col("value")))).as("h"))
        .select(col("user_id"),
          size(col("h")).cast("int").as("n_events"),
          round(expr(
            "aggregate(slice(transform(h, e -> e.value), 2, size(h) - 1)," +
              " transform(h, e -> e.value)[0]," +
              " (acc, x) -> 0.3D * x + 0.7D * acc)"), 9).as("ema"))
        .orderBy("user_id")
    }),

    // Markov transition matrix over event types: P(next | current)
    // from one lead() pass — counts are exact longs, each probability
    // is ONE double division, and the matrix is |types|² rows at any
    // log size (the cumulative window runs over that tiny frame).
    "q_events_markov" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wCur = Window.partitionBy("cur")
      withUs(Tables.events(s, d))
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"))
        .withColumn("next", lead(col("event_type"), 1).over(w))
        .filter(col("next").isNotNull)
        .groupBy(col("event_type").as("cur"), col("next"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("total", sum(col("cnt")).over(wCur))
        .select(col("cur"), col("next"), col("cnt"),
          (col("cnt").cast("double") / col("total").cast("double"))
            .as("prob"))
        .orderBy("cur", "next")
    }),

    // Label-pair similarity matrix: mean cosine between embedding
    // classes over the bounded id range (the brute-force-baseline
    // convention of q_sim_topk). Per-pair cosines round to 6 decimals
    // BEFORE the exact decimal sum, so the group means are
    // order-independent and cross-engine identical (the q_agg_corr
    // rule applied to float kernels). The symmetric cell key
    // (least, greatest) folds both pair directions together.
    "q_sim_matrix" -> ((s, d) => {
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val a = e.select(col("vec_id").as("a_id"), col("label").as("la"),
        col("embedding").as("va"))
      val b = e.select(col("vec_id").as("b_id"), col("label").as("lb"),
        col("embedding").as("vb"))
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("cos",
          round(graft.functions.VectorFns.cosine(col("va"), col("vb")), 6))
        .groupBy(least(col("la"), col("lb")).as("label_lo"),
          greatest(col("la"), col("lb")).as("label_hi"))
        .agg(count(lit(1)).as("n_pairs"),
          (sum(col("cos").cast(DecimalType(18, 12))).cast("double") /
            count(lit(1))).as("mean_cos"))
        .select(col("label_lo"), col("label_hi"), col("n_pairs"),
          col("mean_cos"))
        .orderBy("label_lo", "label_hi")
    }),

    // SCD2 validity intervals from a changelog: each event's value
    // holds until the user's next event — the slowly-changing-
    // dimension reconstruction every warehouse needs when only a
    // change stream is stored. One lead() window on a per-user total
    // order; at scale this is one shuffle of the changelog, and the
    // interval form is what makes point-in-time joins range-joinable
    // ([[graft.operators.RangeJoin]]).
    "q_events_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      withUs(Tables.events(s, d))
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts_us"))
        .withColumn("valid_from_us", col("ts_us"))
        .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
        .withColumn("is_current", col("valid_to_us").isNull)
        .select("user_id", "event_id", "value", "valid_from_us",
          "valid_to_us", "is_current")
        .orderBy("user_id", "valid_from_us", "event_id")
    }),

    // Corpus mixture report: the (lang, source) composition table a
    // training-mixture decision starts from — doc counts, token
    // totals, and each cell's share of corpus tokens. Group sizes
    // are exact longs; shares are one double division against the
    // broadcast single-row corpus total. The report is |langs|×
    // |sources| rows at any corpus size.
    "q_corpus_mixture" -> ((s, d) => {
      val perDoc = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          TextAnalysis.wsTokenCount(col("text")).as("toks"))
      val cells = perDoc.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
      val totals = perDoc.agg(sum(col("toks")).as("corpus_tokens"))
      cells.crossJoin(broadcast(totals))
        .select(col("lang"), col("source"), col("n_docs"), col("tokens"),
          (col("tokens").cast("double") /
            col("corpus_tokens").cast("double")).as("token_share"))
        .orderBy("lang", "source")
    }),

    // Integer-arithmetic weighted Lloyd's k-means over (quantity,
    // floor-dollar price): two unrolled assign+update rounds from
    // fixed literal seeds, replayed exactly by the oracle's CTE
    // chain. The point set collapses to distinct feature pairs with
    // multiplicities first — the iterations then cost the distinct
    // feature space, not the row count. The LLM-pipeline reading:
    // the same kernel is the IVF/PQ codebook trainer
    // ([[graft.operators.AnnSearch]]) under a hash gate instead of a
    // recall floor. See [[graft.operators.KMeans]] for why every
    // step is exact integer.
    "q_ml_kmeans" -> ((s, d) => {
      val pts = Tables.lineitem(s, d)
        .select(col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice")).cast("long").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("w"))
      graft.operators.KMeans.fit(pts,
        Seq((0, 10L, 15000L), (1, 20L, 35000L),
          (2, 30L, 55000L), (3, 40L, 75000L)),
        iterations = 2)
        .orderBy("cid")
    }),

    // Fixed-point distributed logistic regression: train a linear
    // "is this document English?" classifier on cheap per-doc
    // statistics (chars, tokens — the fastText-style quality-filter
    // feature shape), two unrolled full-batch gradient steps from
    // w = 0, replayed exactly by the oracle's CTE chain. The corpus
    // collapses to distinct (x1, x2, y) cells with multiplicities
    // first, so the iterations cost the feature grid, not the row
    // count. See [[graft.operators.LogisticRegression]] for why
    // every step is exact integer (hard sigmoid, decimal gradient
    // sums, truncate-toward-zero division).
    "q_ml_logreg" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .selectExpr("n_chars div 100 as x1",
          "size(split(text, ' ')) div 10 as x2",
          "case when lang = 'en' then 1L else 0L end as y")
        .groupBy("x1", "x2", "y").agg(count(lit(1)).as("w"))
      graft.operators.LogisticRegression
        .fit(cells, lrDiv = 16L, iterations = 2)
        .orderBy("w0")
    }),

    // The APPLY half of the classifier loop: fixed scaled weights —
    // the model-registry row a production filter loads — score every
    // document map-side (broadcast-free scalar arithmetic, the same
    // hard sigmoid as the trainer) and roll up per-language keep
    // rates. Pure scan→project→aggregate: no shuffle beyond the
    // per-language cells, the exact shape a 100 TB quality-filter
    // pass has. Mean score is an exact integer floor-division of the
    // (order-independent) sum — no double folds.
    "q_ml_logreg_apply" -> ((s, d) => {
      val S = graft.operators.LogisticRegression.S
      val scored = Tables.documents(s, d)
        .selectExpr("lang", "n_chars div 100 as x1",
          "size(split(text, ' ')) div 10 as x2")
        .withColumn("p", expr(
          s"least(${S}L, greatest(0L, -600000L + 400000L * x1 " +
            s"- 150000L * x2 + ${4 * S}L) div 8)"))
      scored.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("p") >= S / 2, 1L).otherwise(0L)).as("n_keep"),
          sum(col("p")).as("sp"))
        .select(col("lang"), col("n_docs"), col("n_keep"),
          (col("n_keep").cast("double") /
            col("n_docs").cast("double")).as("keep_frac"),
          expr("sp div n_docs").as("mean_p"))
        .orderBy("lang")
    }),

    // Pareto frontier of (price, quantity), minimize both: the line
    // items no other line item beats on both axes. [[graft.operators
    // .Skyline]] computes it with range-partitioned running minima
    // bridged by a #partitions-row prefix-min frame — never a global
    // window — while the oracle replays the single-window form the
    // distributed plan is provably equal to. Frontier x values are
    // unique (y strictly decreases along the frontier), so the
    // ORDER BY x is a strict total order on both sides.
    "q_skyline_2d" -> ((s, d) => {
      val pts = Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice")).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("w"))
      graft.operators.Skyline.frontier2d(pts).orderBy("x")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_events_dau" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', make_timestamp(epoch_us(ts)))
        |         AS TIMESTAMP) AS day,
        |    CAST(date_trunc('month', make_timestamp(epoch_us(ts)))
        |         AS TIMESTAMP) AS month
        |  FROM events),
        |daily AS (
        |  SELECT day, month, COUNT(DISTINCT user_id) AS dau,
        |         COUNT(*) AS n_events
        |  FROM ev GROUP BY day, month),
        |monthly AS (
        |  SELECT month AS m_month, COUNT(DISTINCT user_id) AS mau
        |  FROM ev GROUP BY month)
        |SELECT day, dau, n_events, mau,
        |  CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness
        |FROM daily JOIN monthly ON month = m_month
        |ORDER BY day""".stripMargin,
    "q_events_anomaly" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, value FROM events),
        |stats AS (
        |  SELECT user_id AS su_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |      AS mean,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) *
        |                  CAST(value AS DECIMAL(18,2))
        |                  AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)
        |      AS meansq,
        |    COUNT(*) AS n
        |  FROM ev GROUP BY user_id)
        |SELECT user_id, event_id, value,
        |  ROUND((value - mean) / sqrt(meansq - mean * mean), 9) AS z
        |FROM ev JOIN stats ON user_id = su_id
        |WHERE n >= 30 AND sqrt(meansq - mean * mean) > 0
        |  AND abs((value - mean) / sqrt(meansq - mean * mean)) > 2.0
        |ORDER BY user_id, event_id""".stripMargin,
    "q_embed_norm" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INT) AS dim,
        |  ROUND(sqrt(list_reduce(
        |    list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |    (acc, x) -> acc + x)), 9) AS l2_norm,
        |  ROUND(list_reduce(
        |    list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
        |    (acc, x) -> greatest(acc, x)), 9) AS max_abs,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
    "q_text_diversity" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
        |  FROM documents),
        |counts AS (
        |  SELECT doc_id, ch, COUNT(*) AS cnt
        |  FROM chars WHERE ch <> '' GROUP BY doc_id, ch)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS INT) AS distinct_chars,
        |  1.0 - CAST(SUM(cnt * cnt) AS DOUBLE) /
        |        CAST(SUM(cnt) * SUM(cnt) AS DOUBLE)
        |    AS char_diversity
        |FROM counts GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_quality_gate" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |       AS DOUBLE) / CAST(len(text) AS DOUBLE)
        |    AS alpha_ratio,
        |  CASE
        |    WHEN n_chars < 100 THEN 'too_short'
        |    WHEN n_chars > 500 THEN 'too_long'
        |    WHEN len(string_split(text, ' ')) < 10 THEN 'too_few_tokens'
        |    WHEN CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |              AS DOUBLE) / CAST(len(text) AS DOUBLE) < 0.6
        |      THEN 'low_alpha'
        |    ELSE 'keep'
        |  END AS verdict
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_skew_report" ->
      """WITH cnts AS (
        |  SELECT l_orderkey, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_orderkey),
        |cum AS (
        |  SELECT cnt, SUM(freq) OVER (ORDER BY cnt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT cnt, COUNT(*) AS freq FROM cnts GROUP BY cnt)),
        |stats AS (
        |  SELECT COUNT(*) AS n_keys, MAX(cnt) AS max_cnt,
        |         CAST(SUM(cnt) AS BIGINT) AS total_rows
        |  FROM cnts)
        |SELECT n_keys, total_rows, max_cnt,
        |  (SELECT MIN(cnt) FROM cum, stats
        |   WHERE cum >= ceil(0.5 * n_keys)) AS p50_cnt,
        |  (SELECT MIN(cnt) FROM cum, stats
        |   WHERE cum >= ceil(0.9 * n_keys)) AS p90_cnt,
        |  (SELECT MIN(cnt) FROM cum, stats
        |   WHERE cum >= ceil(0.99 * n_keys)) AS p99_cnt,
        |  CAST(max_cnt AS DOUBLE) /
        |    (CAST(total_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
        |    AS skew_ratio
        |FROM stats""".stripMargin,
    "q_events_paths" ->
      """WITH seq AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |       COUNT(*) AS n
        |FROM seq
        |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1
        |ORDER BY n DESC, path
        |LIMIT 10""".stripMargin,
    "q_fuzzy_match" ->
      """WITH clean AS (
        |  SELECT c_custkey, c_name FROM customer),
        |dirty AS (
        |  SELECT c_custkey AS d_custkey,
        |    substring(c_name, 1, 17) ||
        |    translate(substring(c_name, 18, 1),
        |              '0123456789', '1032547698') AS d_name
        |  FROM customer)
        |SELECT d_custkey, c_custkey,
        |       levenshtein(d_name, c_name) AS dist
        |FROM dirty JOIN clean
        |  ON substring(d_name, 1, 17) = substring(c_name, 1, 17)
        |WHERE levenshtein(d_name, c_name) <= 1
        |ORDER BY d_custkey, c_custkey""".stripMargin,
    "q_text_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf
        |  FROM toks GROUP BY doc_id, term),
        |df AS (
        |  SELECT term, COUNT(*) AS df FROM (
        |    SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score
        |  FROM tf JOIN df USING (term), n),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS INT) AS rk
        |  FROM scored)
        |SELECT doc_id, term, tf, df, ROUND(score, 9) AS score, rk
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "q_events_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_no
        |  FROM events),
        |islands AS (
        |  SELECT user_id,
        |    day_no - row_number() OVER (PARTITION BY user_id
        |                                ORDER BY day_no) AS island
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, island, COUNT(*) AS streak
        |  FROM islands GROUP BY user_id, island)
        |SELECT user_id, CAST(SUM(streak) AS BIGINT) AS active_days,
        |  MAX(streak) AS longest_streak, COUNT(*) AS n_streaks
        |FROM streaks GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q_events_rfm" ->
      """WITH per AS (
        |  SELECT user_id, MAX(epoch_us(ts)) AS last_us,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM events GROUP BY user_id),
        |ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events)
        |SELECT user_id, ref_us - last_us AS recency_us, frequency,
        |  monetary,
        |  ntile(5) OVER (ORDER BY ref_us - last_us, user_id) AS r_q,
        |  ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_q,
        |  ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_q,
        |  CAST(ntile(5) OVER (ORDER BY ref_us - last_us, user_id)
        |       AS VARCHAR) ||
        |  CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
        |       AS VARCHAR) ||
        |  CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id)
        |       AS VARCHAR) AS segment
        |FROM per, ref
        |ORDER BY user_id""".stripMargin,
    "q_events_ema" ->
      """WITH h AS (
        |  SELECT user_id,
        |    array_agg(value ORDER BY epoch_us(ts), event_id) AS vals
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(vals) AS INT) AS n_events,
        |  ROUND(list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc), 9)
        |    AS ema
        |FROM h
        |ORDER BY user_id""".stripMargin,
    "q_events_markov" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next
        |  FROM events),
        |cnts AS (
        |  SELECT cur, next, COUNT(*) AS cnt
        |  FROM seq WHERE next IS NOT NULL GROUP BY cur, next)
        |SELECT cur, next, cnt,
        |  CAST(cnt AS DOUBLE) /
        |    CAST(SUM(cnt) OVER (PARTITION BY cur) AS DOUBLE)
        |    AS prob
        |FROM cnts
        |ORDER BY cur, next""".stripMargin,
    "q_sim_matrix" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT least(a.label, b.label) AS label_lo,
        |         greatest(a.label, b.label) AS label_hi,
        |    CAST(round(list_inner_product(a.v, b.v) /
        |      (sqrt(list_inner_product(a.v, a.v)) *
        |       sqrt(list_inner_product(b.v, b.v))), 6)
        |      AS DECIMAL(18,12)) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT label_lo, label_hi, COUNT(*) AS n_pairs,
        |  CAST(SUM(cos) AS DOUBLE) / COUNT(*) AS mean_cos
        |FROM pairs GROUP BY label_lo, label_hi
        |ORDER BY label_lo, label_hi""".stripMargin,
    "q_events_scd2" ->
      """SELECT user_id, event_id, value,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts), 1) OVER w AS valid_to_us,
        |  lead(epoch_us(ts), 1) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "q_corpus_mixture" ->
      """WITH per_doc AS (
        |  SELECT lang, source,
        |         len(string_split(text, ' ')) AS toks
        |  FROM documents),
        |cells AS (
        |  SELECT lang, source, COUNT(*) AS n_docs,
        |         CAST(SUM(toks) AS BIGINT) AS tokens
        |  FROM per_doc GROUP BY lang, source),
        |totals AS (SELECT SUM(toks) AS corpus_tokens FROM per_doc)
        |SELECT lang, source, n_docs, tokens,
        |  CAST(tokens AS DOUBLE) / CAST(corpus_tokens AS DOUBLE)
        |    AS token_share
        |FROM cells, totals
        |ORDER BY lang, source""".stripMargin,
    // Unrolled-iteration replay of the integer k-means: row_number
    // (dist, cid) is the same tie-break as Spark's lexicographic
    // struct-min; all arithmetic is BIGINT so both engines are exact.
    "q_ml_kmeans" ->
      """WITH pts AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |         CAST(FLOOR(l_extendedprice) AS BIGINT) AS y,
        |         COUNT(*) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c0(cid, cx, cy) AS (
        |  VALUES (0, 10, 15000), (1, 20, 35000),
        |         (2, 30, 55000), (3, 40, 75000)),
        |a1 AS (
        |  SELECT x, y, w, cid, dist,
        |         ROW_NUMBER() OVER (PARTITION BY x, y
        |           ORDER BY dist, cid) AS rn
        |  FROM (SELECT p.x, p.y, p.w, c.cid,
        |          (p.x - c.cx) * (p.x - c.cx) +
        |          (p.y - c.cy) * (p.y - c.cy) AS dist
        |        FROM pts p CROSS JOIN c0 c)),
        |c1 AS (
        |  SELECT cid,
        |    CAST(SUM(x * w) AS BIGINT) // CAST(SUM(w) AS BIGINT) AS cx,
        |    CAST(SUM(y * w) AS BIGINT) // CAST(SUM(w) AS BIGINT) AS cy
        |  FROM a1 WHERE rn = 1 GROUP BY cid),
        |a2 AS (
        |  SELECT x, y, w, cid, dist,
        |         ROW_NUMBER() OVER (PARTITION BY x, y
        |           ORDER BY dist, cid) AS rn
        |  FROM (SELECT p.x, p.y, p.w, c.cid,
        |          (p.x - c.cx) * (p.x - c.cx) +
        |          (p.y - c.cy) * (p.y - c.cy) AS dist
        |        FROM pts p CROSS JOIN c1 c))
        |SELECT cid, CAST(SUM(w) AS BIGINT) AS n_pts,
        |  CAST(SUM(x * w) AS BIGINT) // CAST(SUM(w) AS BIGINT) AS cx,
        |  CAST(SUM(y * w) AS BIGINT) // CAST(SUM(w) AS BIGINT) AS cy,
        |  CAST(SUM(dist * w) AS BIGINT) AS sse
        |FROM a2 WHERE rn = 1 GROUP BY cid ORDER BY cid""".stripMargin,
    // Unrolled-iteration replay of the fixed-point logistic trainer:
    // hard sigmoid = LEAST/GREATEST + non-negative floor division
    // (== truncation), gradients as exact HUGEINT sums, and the
    // truncate-toward-zero CASE around `//` because DuckDB floors
    // where Spark's `div` truncates.
    "q_ml_logreg" ->
      """WITH feat AS (
        |  SELECT n_chars // 100 AS x1,
        |         len(string_split(text, ' ')) // 10 AS x2,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |         COUNT(*) AS w
        |  FROM documents GROUP BY 1, 2, 3),
        |c0(w0, w1, w2) AS (
        |  VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |          CAST(0 AS BIGINT))),
        |e1 AS (
        |  SELECT f.*,
        |    LEAST(1000000, GREATEST(0,
        |      w0 + w1 * x1 + w2 * x2 + 4000000) // 8)
        |      - y * 1000000 AS e
        |  FROM feat f, c0),
        |g1 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * e) AS g0,
        |         SUM(CAST(w AS HUGEINT) * e * x1) AS g1,
        |         SUM(CAST(w AS HUGEINT) * e * x2) AS g2,
        |         CAST(SUM(w) AS BIGINT) AS n
        |  FROM e1),
        |c1 AS (
        |  SELECT
        |    CAST(w0 - (CASE WHEN g0 >= 0 THEN g0 // (n * 16)
        |      ELSE -((-g0) // (n * 16)) END) AS BIGINT) AS w0,
        |    CAST(w1 - (CASE WHEN g1 >= 0 THEN g1 // (n * 16)
        |      ELSE -((-g1) // (n * 16)) END) AS BIGINT) AS w1,
        |    CAST(w2 - (CASE WHEN g2 >= 0 THEN g2 // (n * 16)
        |      ELSE -((-g2) // (n * 16)) END) AS BIGINT) AS w2
        |  FROM g1, c0),
        |e2 AS (
        |  SELECT f.*,
        |    LEAST(1000000, GREATEST(0,
        |      w0 + w1 * x1 + w2 * x2 + 4000000) // 8)
        |      - y * 1000000 AS e
        |  FROM feat f, c1),
        |g2 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * e) AS g0,
        |         SUM(CAST(w AS HUGEINT) * e * x1) AS g1,
        |         SUM(CAST(w AS HUGEINT) * e * x2) AS g2,
        |         CAST(SUM(w) AS BIGINT) AS n
        |  FROM e2),
        |c2 AS (
        |  SELECT
        |    CAST(w0 - (CASE WHEN g0 >= 0 THEN g0 // (n * 16)
        |      ELSE -((-g0) // (n * 16)) END) AS BIGINT) AS w0,
        |    CAST(w1 - (CASE WHEN g1 >= 0 THEN g1 // (n * 16)
        |      ELSE -((-g1) // (n * 16)) END) AS BIGINT) AS w1,
        |    CAST(w2 - (CASE WHEN g2 >= 0 THEN g2 // (n * 16)
        |      ELSE -((-g2) // (n * 16)) END) AS BIGINT) AS w2
        |  FROM g2, c1)
        |SELECT w0, w1, w2,
        |  CAST(SUM(w) AS BIGINT) AS n_docs,
        |  CAST(SUM(w * y) AS BIGINT) AS n_pos,
        |  CAST(SUM(w * pred) AS BIGINT) AS n_pred_pos,
        |  CAST(SUM(CASE WHEN pred = y THEN w ELSE 0 END) AS BIGINT)
        |    AS n_correct
        |FROM (SELECT f.*, c.w0, c.w1, c.w2,
        |        CASE WHEN LEAST(1000000, GREATEST(0,
        |            c.w0 + c.w1 * x1 + c.w2 * x2 + 4000000) // 8)
        |          >= 500000 THEN 1 ELSE 0 END AS pred
        |      FROM feat f, c2 c)
        |GROUP BY 1, 2, 3
        |ORDER BY w0""".stripMargin,
    // Same hard sigmoid with registry-literal weights; SUM/COUNT and
    // the floor division are exact integers on both engines.
    "q_ml_logreg_apply" ->
      """WITH f AS (
        |  SELECT lang, n_chars // 100 AS x1,
        |         len(string_split(text, ' ')) // 10 AS x2
        |  FROM documents),
        |sc AS (
        |  SELECT lang,
        |    LEAST(1000000, GREATEST(0,
        |      -600000 + 400000 * x1 - 150000 * x2 + 4000000) // 8)
        |      AS p
        |  FROM f),
        |g AS (
        |  SELECT lang, COUNT(*) AS n,
        |    SUM(CASE WHEN p >= 500000 THEN 1 ELSE 0 END) AS nk,
        |    SUM(p) AS sp
        |  FROM sc GROUP BY 1)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs,
        |  CAST(nk AS BIGINT) AS n_keep,
        |  CAST(nk AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS keep_frac,
        |  CAST(sp // n AS BIGINT) AS mean_p
        |FROM g ORDER BY lang""".stripMargin,
    // Single global-order window over distinct pairs — the form the
    // engine's range-partitioned prefix-min plan is equal to on any
    // partitioning (dominance on distinct points = some lexicographic
    // predecessor has y <= mine).
    "q_skyline_2d" ->
      """WITH pts AS (
        |  SELECT CAST(FLOOR(l_extendedprice) AS BIGINT) AS x,
        |         CAST(l_quantity AS BIGINT) AS y,
        |         COUNT(*) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |scan AS (
        |  SELECT x, y, w,
        |    MIN(y) OVER (ORDER BY x, y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
        |  FROM pts)
        |SELECT x, y, CAST(w AS BIGINT) AS w FROM scan
        |WHERE m IS NULL OR m > y ORDER BY x""".stripMargin
  )
}
