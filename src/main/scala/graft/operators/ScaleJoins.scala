package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the failure modes that only appear at scale:
  * key skew and repeated co-located joins. Semantically each helper
  * is exactly an inner equi-join — the specs assert result equality
  * with the plain `join` — but the physical shape changes.
  *
  * At 100 TB these are the difference between a job that finishes and
  * one straggler task holding 4 TB of one hot key: AQE's skew-join
  * handles moderate skew automatically, salting handles the
  * pathological single-hot-key case AQE can't split (a skewed
  * *build* side duplicated per salt), and bucketing amortizes the
  * shuffle of a fact table that is joined on the same key by many
  * downstream queries.
  */
object ScaleJoins {
  /** Salted inner equi-join for a skewed `large` side: the hot keys
    * in `large` get a random-free deterministic salt from a row hash,
    * the `small` side is exploded ×`salts` so every salted key finds
    * its match. Result == `large.join(small, key)` exactly; the
    * shuffle spreads each hot key over `salts` reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    // Deterministic per-row salt (no rand(): reproducible plans &
    // retries — a failed task re-derives identical salts).
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salts))
        .cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** AQE-native skew twin of [[saltedJoin]]: the SAME inner equi-join
    * left as a plain sort-merge shuffle join (merge hint — no
    * broadcast, no manual salt) so Spark's adaptive skew-join split
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default) can carve
    * oversized shuffle partitions at runtime. Result ==
    * `large.join(small, key)` exactly; ScaleJoinsSpec pins both the
    * equality and — on a Zipfian fixture with the skew thresholds
    * lowered to fixture scale — that the split actually fires
    * (`skew=true` in the adaptive final plan).
    *
    * When is manual salting still needed? AQE splits the STREAM side
    * of a sort-merge join by cloning matching build partitions, so it
    * covers the common one-hot-fact-key case for free. It cannot help
    * when the join must stay hash-partitioned for a downstream
    * stage's co-partitioning contract, when the skew is on BOTH
    * sides of the same key (pair fan-out, not partition size), or in
    * aggregation pipelines (AQE skew handling is join-only) — those
    * remain [[saltedJoin]] / two-phase-agg territory.
    */
  def aqeSkewJoin(large: DataFrame, small: DataFrame,
                  key: String): DataFrame =
    large.hint("merge").join(small, key)

  /** Frequency-split ("head/tail") inner equi-join of a Zipfian-keyed
    * `stream` against a per-key `model` frame — the named form of the
    * q_text_lm_score skew discipline, for any stream whose join key
    * is power-law distributed (tokens, n-grams, URLs, user ids).
    *
    * `model` must carry, in `freqCol`, each key's occurrence count in
    * `stream` (for model frames built by aggregating the stream —
    * document frequencies, n-gram counts — that column already
    * exists, so no extra pass). The split is a provable pigeonhole
    * bound: the HEAD (keys carrying > 1/fanout of the stream) has at
    * most `fanout` rows, so it broadcasts; head keys are screened out
    * of the tail by a broadcast anti-join, so every key reaching the
    * shuffle join carries ≤ |stream|/fanout rows — no reducer can
    * receive more than 1/fanout of the stream for one key, at ANY
    * corpus size. Result == `stream.join(model, keys)` exactly (the
    * head∪tail partition covers the model once), so oracle hashes are
    * unchanged by construction — ScaleJoinsSpec asserts the equality.
    */
  def frequencySplitJoin(stream: DataFrame, model: DataFrame,
      keys: Seq[String], freqCol: String, fanout: Long): DataFrame = {
    // single-row total → the allow-listed broadcast-scalar cross
    val total = model.agg(sum(col(freqCol)).as("__n_total"))
    val mT = model.crossJoin(broadcast(total))
    val head = mT.filter(col(freqCol) * fanout > col("__n_total"))
      .drop("__n_total")
    val tail = mT.filter(col(freqCol) * fanout <= col("__n_total"))
      .drop("__n_total")
    stream.join(broadcast(head), keys)
      .unionByName(
        stream.join(broadcast(head.select(keys.map(col): _*)), keys,
            "left_anti")
          .join(tail, keys))
  }

  /** The optimizer confs that let Spark's runtime Bloom-filter
    * injection (`InjectRuntimeFilter`) fire at fixture scale: the
    * feature itself is on by default; only the application-side size
    * gate (10 GB by default — i.e. "only bother for genuinely large
    * scans", which a test fixture never is) needs lowering, and the
    * broadcast threshold must be off: `InjectRuntimeFilter` refuses
    * any join whose creation side is broadcast-able by size (a
    * broadcast join reads the small side once and needs no runtime
    * filter), and every fixture-scale dim IS broadcast-able — at
    * 100 TB the filtered dim exceeds the 10 MB threshold on its own.
    * Shared with ScaleJoinsSpec so the spec pins exactly what the
    * operator runs under. */
  val runtimeFilterConfs: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
      -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** Runtime-Bloom-filtered inner equi-join — the row-level sibling
    * of dynamic partition pruning, and the third member of the skew/
    * scale-join family (vs [[saltedJoin]]/[[aqeSkewJoin]], which
    * reshape the shuffle, this one SHRINKS it): when `small` carries
    * a selective filter, Spark builds a Bloom filter of its join keys
    * in a subquery and applies `might_contain` to `large` BEFORE
    * `large` is shuffled, so non-matching rows never enter the
    * exchange. At 100 TB this is the difference between shuffling the
    * whole fact table and shuffling the ~1% that survives the dim
    * filter — with zero query rewrite.
    *
    * Result == `large.join(small, key)` exactly (a Bloom filter has
    * no false negatives; false positives are caught by the join) —
    * registered against the plain-join oracle, the
    * q_join_salted/q_join_skew_aqe precedent.
    *
    * Mechanics: injection happens at optimization time under the
    * [[runtimeFilterConfs]] gates, so the join is planned AND
    * materialized (eager local checkpoint) inside a set/restore of
    * those confs — scoping the fixture-scale threshold override to
    * this one query instead of leaking it into every later plan in
    * the session. On a real cluster the thresholds are left at their
    * defaults cluster-wide and this helper degenerates to the plain
    * join call. ScaleJoinsSpec pins that `might_contain` actually
    * appears in the optimized plan and that results match the plain
    * join.
    */
  def runtimeFilteredJoin(large: DataFrame, small: DataFrame,
                          key: String): DataFrame = {
    val conf = large.sparkSession.conf
    val saved = runtimeFilterConfs.map { case (k, _) =>
      k -> conf.getOption(k) }
    runtimeFilterConfs.foreach { case (k, v) => conf.set(k, v) }
    try {
      // merge hint: keep the join a shuffle join — a broadcast join
      // already reads the small side once and needs no runtime filter
      // (InjectRuntimeFilter skips it).
      large.hint("merge").join(small, key).localCheckpoint(true)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** Write both sides bucketed by the join key so subsequent joins
    * are shuffle-free (SortMergeJoin over pre-bucketed scans). Needs
    * a table catalog — callers pass distinct table names; returns the
    * reloaded, bucket-aware frames.
    */
  def bucketize(df: DataFrame, table: String, key: String,
                buckets: Int): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path",
        s"${System.getProperty("java.io.tmpdir")}/graft_buckets/$table")
      .mode("overwrite")
      .saveAsTable(table)
    spark.table(table)
  }
}
