package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every document in a large RAW pool by how
  * much its hashed-token distribution looks like a small TARGET
  * corpus, then keep the highest-scoring docs — the standard way a
  * pretraining pipeline skims "wiki-like" data out of a web crawl.
  *
  * The importance weight of a document is the log-likelihood ratio of
  * its hashed bag-of-tokens under two smoothed unigram bucket models:
  *
  *   log w(doc) = Σ_b cnt_doc(b) · ln( p_target(b) / p_raw(b) )
  *
  * with add-one smoothing, p(b) = (cnt(b)+1) / (N+B) over B hash
  * buckets (the paper's hashed n-gram generative model, unigram
  * instantiation).
  *
  * Determinism / portability: tokens map to buckets with the portable
  * md5 hash ([[graft.functions.HashExpressions.md5Long]], the same
  * bits DuckDB reproduces); the per-bucket log-ratio — the ONLY
  * transcendental in the engine — is micro-quantized once per bucket
  * (`round(ln(·)·1e6)` as BIGINT), so each document's score is an
  * exact integer dot product: order-independent, layout-independent,
  * and replayable bit-for-bit by the oracle. A cross-engine ulp
  * difference in `ln` flips a score only when ln(ratio)·1e6 lands
  * within ~1e-9 of a rounding boundary in one of the ≤B cells —
  * the same accepted risk class as the engine's `round(x, 9)`
  * division discipline.
  *
  * Scale: both bucket-count model frames are ≤ B rows (B=1024 here) —
  * they build with map-side partial aggregation over the token
  * stream and BROADCAST onto the per-(doc, bucket) frame, so scoring
  * adds zero wide shuffles beyond the one hash shuffle that collapses
  * (doc, bucket) counts (8-byte keys, map-side combine eats repeated
  * tokens first). Token Zipf skew is irrelevant: hot tokens collapse
  * per map task before any shuffle, and the model join is broadcast.
  * Selection is a `TakeOrderedAndProject` top-k, not a global sort.
  * Two corpus passes total (fit the bucket counts, then score) —
  * the same constant-pass shape the paper's own pipeline uses at
  * web scale.
  */
object ImportanceResampling {

  /** (id, bkt) token-bucket occurrences of `df`'s `textCol`. */
  private def tokenBuckets(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .select(col(idCol),
        (graft.functions.HashExpressions.md5Long(col("__w"), 8)
          % buckets).as("bkt"))

  /** The trained model over the FULL bucket domain [0, buckets):
    * one (bkt, lr_micro) row per bucket — `lr_micro` is the
    * micro-quantized log-ratio ln(p_target(b)/p_raw(b))·1e6 as
    * BIGINT. Total over the domain (not just observed buckets) so a
    * later scorer — batch or streaming — can look up ANY token,
    * including ones absent from both training corpora (those smooth
    * to ct=cr=0). Always ≤ `buckets` rows: broadcast-sized by
    * construction, the codebook contract of the ANN family. */
  def bucketModel(target: DataFrame, pool: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    val b = lit(buckets.toLong)
    val spark = target.sparkSession
    val tCnt = tokenBuckets(target, idCol, textCol, buckets)
      .groupBy("bkt").agg(count(lit(1)).as("ct"))
    val rCnt = tokenBuckets(pool, idCol, textCol, buckets)
      .groupBy("bkt").agg(count(lit(1)).as("cr"))
    // single-row totals → the allow-listed broadcast-scalar cross
    val tot = tCnt.agg(sum(col("ct")).as("nt"))
      .crossJoin(rCnt.agg(sum(col("cr")).as("nr")))
    // Double multiply keeps the ratio overflow-free at any corpus
    // size (exact to 2^53 and evaluated by the identical IEEE
    // expression tree on both engines).
    spark.range(buckets).select(col("id").as("bkt"))
      .join(tCnt, Seq("bkt"), "left")
      .join(rCnt, Seq("bkt"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bkt"),
        round(log(
          ((coalesce(col("ct"), lit(0L)) + 1L).cast("double") *
            (col("nr") + b).cast("double")) /
          ((coalesce(col("cr"), lit(0L)) + 1L).cast("double") *
            (col("nt") + b).cast("double"))) * 1e6, 0)
          .cast("long").as("lr_micro"))
  }

  /** Per-pool-document DSIR importance scores: one row per `pool`
    * doc with `n_toks` (its token count) and `score` (the
    * micro-quantized log-likelihood ratio, BIGINT micro-nats —
    * higher = more target-like). `target` and `pool` both carry
    * (`idCol`, `textCol`). */
  def dsirScores(target: DataFrame, pool: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    val rTok = tokenBuckets(pool, idCol, textCol, buckets)
    val lr = bucketModel(target, pool, idCol, textCol, buckets)
    val docBkt = rTok.groupBy(idCol, "bkt").agg(count(lit(1)).as("c"))
    docBkt.join(broadcast(lr), "bkt")
      .groupBy(idCol)
      .agg(sum(col("c")).cast("long").as("n_toks"),
        sum(col("c") * col("lr_micro")).cast("long").as("score"))
  }

  /** DSIR selection: the `k` most target-like pool documents by
    * [[dsirScores]], ties to the lowest id — the paper's top-k
    * variant of the final resampling step, kept deterministic. */
  def dsirTopK(target: DataFrame, pool: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024): DataFrame =
    dsirScores(target, pool, idCol, textCol, buckets)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** DSIR's ACTUAL resampling step (Xie et al. 2023 §3): sample k
    * docs without replacement with probability ∝ exp(log w) via the
    * Gumbel-top-k trick — perturb each log-weight with Gumbel noise
    * g = −ln(−ln(u)) and take the k largest perturbed keys. Against
    * [[dsirTopK]] (pure argmax), the resample keeps tail diversity:
    * near-duplicate high scorers no longer crowd out everything
    * else.
    *
    * Deterministic and portable: u is the doc-keyed md5 uniform
    * ([[Sampling.md5Uniform]] — never 0 or 1 by construction, so the
    * double ln chain is finite), the noise is micro-quantized to
    * BIGINT like the bucket log-ratios (same accepted ulp class),
    * and the sample key is the exact integer sum score + g_micro —
    * both already in micro-nats, i.e. temperature τ = 1, the paper's
    * default. Any engine with md5 + ln replays the draw exactly.
    *
    * Scale: adds one per-row projection to [[dsirScores]] and the
    * same `TakeOrderedAndProject` top-k — still no extra shuffle. */
  def dsirResample(target: DataFrame, pool: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024): DataFrame = {
    val u = Sampling.md5Uniform(col(idCol))
    dsirScores(target, pool, idCol, textCol, buckets)
      .withColumn("gumbel_micro",
        round(-log(-log(u)) * 1e6, 0).cast("long"))
      .withColumn("sample_key", col("score") + col("gumbel_micro"))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }
}
