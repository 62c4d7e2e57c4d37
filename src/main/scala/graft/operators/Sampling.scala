package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Two families, both reproducible run-to-run and partition-layout
  * independent (unlike `DataFrame.sample`, whose output depends on
  * partition boundaries and a per-partition RNG):
  *
  *  - '''Systematic stratified sampling''': every k-th row per
  *    stratum in a stable key order — exact per-stratum fractions,
  *    expressible on any engine (used by the DuckDB oracle).
  *  - '''Hash splits''': assign each row to train/val/test by a
  *    64-bit hash of its key — O(1) per row, no shuffle, stable under
  *    any layout, and adding rows never reassigns existing ones. This
  *    is the 100 TB path: a window-free projection.
  *
  * Scale: the stratified variant costs one window (hash-shuffle on
  * the stratum + in-partition sort); the hash split costs nothing but
  * the hash. Prefer hash splits whenever exact fractions aren't
  * required.
  */
object Sampling {
  /** Every `k`-th row per stratum, ordered by `ord` within the
    * stratum (1st, k+1th, ... — exact ceil(n/k) rows per stratum). */
  def stratifiedEveryKth(df: DataFrame, stratum: String, ord: String,
                         k: Int): DataFrame = {
    require(k > 0)
    val w = Window.partitionBy(stratum).orderBy(ord)
    df.withColumn("__rn", row_number().over(w))
      .filter((col("__rn") - 1) % k === 0)
      .drop("__rn")
  }

  /** Split bucket in [0, buckets) from a stable 64-bit key hash.
    * `pmod` keeps negatives out; xxhash64 is seed-stable across
    * sessions and partitionings. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(xxhash64(key), lit(buckets.toLong)).cast("int")

  /** Cross-engine-portable bucket: first 32 bits of md5 over the
    * key's UTF-8 string form, mod `buckets`. Any engine with md5 can
    * reproduce the assignment exactly (DuckDB:
    * `('0x' || substring(md5(key), 1, 8))::BIGINT % buckets`), which
    * makes hash-split membership auditable outside Spark — the
    * property a training-data lineage pipeline actually needs from a
    * split. ~2× the cost of [[hashBucket]]'s xxhash64; both are
    * shuffle-free per-row projections. */
  def md5Bucket(key: Column, buckets: Int): Column =
    (graft.functions.HashExpressions.md5Long(key.cast("string"), 8)
      % buckets).cast("int")

  /** Label rows train/val/test by hash bucket: buckets [0, trainPct)
    * → train, [trainPct, trainPct+valPct) → val, rest → test, out of
    * 100 buckets. */
  def split(df: DataFrame, key: String, trainPct: Int = 90,
            valPct: Int = 5): DataFrame =
    splitBy(df, hashBucket(col(key), 100), trainPct, valPct)

  /** [[split]] with the portable [[md5Bucket]] assignment. */
  def splitPortable(df: DataFrame, key: String, trainPct: Int = 90,
                    valPct: Int = 5): DataFrame =
    splitBy(df, md5Bucket(col(key), 100), trainPct, valPct)

  private def splitBy(df: DataFrame, bucket: Column, trainPct: Int,
                      valPct: Int): DataFrame = {
    require(trainPct + valPct <= 100)
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic data-mixture downsampling: keep each row iff its
    * portable hash bucket falls below the row's group rate (percent,
    * 0–100), with rates supplied as a (groupCol, rate) config frame —
    * how mixture weights actually arrive in a training pipeline.
    *
    * The rates frame is broadcast (it's a handful of sources/
    * languages), so sampling adds zero shuffles to the scan; the
    * md5 bucket makes the kept-set stable under reruns, partition
    * layout, and incremental appends, and auditable from any engine
    * with md5 ([[md5Bucket]]).
    */
  /** @param defaultRate keep-rate for rows whose group has no entry
    *                     in `rates` — an inner join would silently
    *                     DELETE unconfigured groups, the opposite of
    *                     a safe default for a downsampler. */
  def sampleByRates(df: DataFrame, key: String, groupCol: String,
                    rates: DataFrame, defaultRate: Int = 100): DataFrame =
    df.join(broadcast(rates), Seq(groupCol), "left")
      .filter(md5Bucket(col(key), 100) <
        coalesce(col("rate"), lit(defaultRate)))
      .drop("rate")

  /** Reproducible global training-order shuffle WITHOUT a global
    * sort: each row gets a portable md5 `shuffle_key`, a `shard`
    * (key mod `shards`), and its position within the shard
    * (`row_number` over a shard-partitioned window ordered by key).
    * Consumers read shards in id order, rows in position order —
    * a deterministic permutation of the corpus that any engine with
    * md5 can reproduce row-for-row.
    *
    * Scale: one hash shuffle on `shard` + per-shard sorts, exactly
    * like any partitioned window — shards bound the sort width, so
    * 100 TB shuffles as `shards` independent sorts instead of one
    * global range sort. More shards = more parallelism. */
  def shuffleShards(df: DataFrame, key: String,
                    shards: Int = 16): DataFrame = {
    require(shards > 0)
    // first 32 md5 bits: non-negative, so % == pmod on both engines
    val k = graft.functions.HashExpressions.md5Long(
      col(key).cast("string"), 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("shuffle_key"), col(key))
    df.withColumn("shuffle_key", k)
      .withColumn("shard", (col("shuffle_key") % shards).cast("int"))
      .withColumn("pos", row_number().over(w))
  }

  /** Token-budget admission — the "take N tokens of wiki, M of web"
    * step every pretraining mixture ends with: within each group,
    * admit rows in deterministic portable-md5 key order until the
    * group's token budget is reached (the first row CROSSING the
    * budget is still admitted, so every non-empty budget yields at
    * least one row and budgets are met, not undershot). The md5 order
    * makes the admitted set reproducible run-to-run, layout-
    * independent, and auditable from any engine with md5 — and, like
    * [[shuffleShards]], already shuffled for training.
    *
    * `budgets` must carry `groupCols` plus a `token_budget` column;
    * it is broadcast (mixture configs are a handful of cells). Rows
    * in groups absent from `budgets` are dropped — an explicit
    * mixture config admits nothing it doesn't name.
    *
    * Scale: one hash shuffle on the group key + per-group sort (the
    * partitioned-window shape). Admission is inherently sequential in
    * the chosen order WITHIN a group, so a group's rows must sort in
    * one task's spill budget — with (lang, source)-grained cells that
    * is the same precondition as every partitioned window here. If a
    * single cell outgrows a task, the two-pass per-shard-offset trick
    * (`AnalyticsQueries.globalRank`) computes the same cumulative
    * sums with range slices; not needed at cell grain.
    */
  def admitByTokenBudget(df: DataFrame, key: String,
                         groupCols: Seq[String], tokens: Column,
                         budgets: DataFrame): DataFrame = {
    val k = graft.functions.HashExpressions.md5Long(
      col(key).cast("string"), 8)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__admit_key"), col(key))
    df.withColumn("__admit_key", k)
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(w).cast("long"))
      .join(broadcast(budgets), groupCols)
      .filter(col("cum_tokens") - col("n_tokens") < col("token_budget"))
      .drop("__admit_key", "token_budget")
  }

  /** Portable uniform in (0, 1] from the row key: the same 32 md5
    * bits the bucket/shuffle functions use, shifted off zero so it's
    * a valid base for `pow(u, 1/w)`. Any engine with md5 reproduces
    * it exactly. */
  def md5Uniform(key: Column): Column =
    (graft.functions.HashExpressions.md5Long(key.cast("string"), 8)
      .cast("double") + 1.0) / 4294967297.0

  /** Uniform k-sample per group — the distributed, order-free
    * equivalent of running one reservoir (Vitter's Algorithm R) per
    * group: every row draws a stable uniform key from its id
    * ([[md5Uniform]]'s md5 bits) and each group keeps its k smallest
    * keys. Keeping the k smallest of n i.i.d. uniforms is exactly a
    * uniform n-choose-k draw, so the marginal distribution matches
    * the sequential reservoir — without the sequential scan, and
    * DETERMINISTIC: reproducible run-to-run, partition-layout
    * independent, auditable from any engine with md5 (unlike
    * `df.sample`/`sampleBy`'s per-partition RNG).
    *
    * `pos` (1..k, the rank of the row's key within its group) comes
    * out for free and gives consumers a stable sub-sampling order:
    * `pos <= j` is the same draw at a smaller k.
    *
    * Scale: one hash shuffle on the group key; the `row_number <= k`
    * filter is recognized by Spark's WindowGroupLimit rule, which
    * inserts a per-partition top-k (heap, not sort) BEFORE the
    * shuffle — so each map task forwards at most k rows per group
    * it sees, never the group's full contents. */
  def reservoirPerGroup(df: DataFrame, key: String, group: String,
                        k: Int): DataFrame = {
    require(k > 0)
    val rk = graft.functions.HashExpressions.md5Long(
      col(key).cast("string"), 8)
    val w = Window.partitionBy(group).orderBy(col("__rsv_key"), col(key))
    df.withColumn("__rsv_key", rk)
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
      .drop("__rsv_key")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * A-Res): rank rows by `u^(1/w)` with u = [[md5Uniform]] and take
    * the global top-k — each row's selection probability is
    * proportional to its weight, and the draw is DETERMINISTIC
    * (md5-keyed, so reproducible run-to-run, layout-independent, and
    * auditable from any engine — the property `DataFrame.sample`'s
    * per-partition RNG cannot give a lineage-tracked corpus).
    *
    * Scale: a per-row projection + `TakeOrderedAndProject` (per-
    * partition top-k heaps, driver merges k rows) — no global sort,
    * no shuffle of the data itself. The classic reservoir formulation
    * is sequential; ranking by the same keys is its order-free
    * equivalent (Efraimidis & Spirakis 2006, Inf. Proc. Letters).
    */
  def weightedTopK(df: DataFrame, key: Column, weight: Column,
                   k: Int): DataFrame = {
    require(k > 0)
    df.withColumn("es_key", pow(md5Uniform(key), lit(1.0) / weight))
      .orderBy(col("es_key").desc, key.asc)
      .limit(k)
  }
}
