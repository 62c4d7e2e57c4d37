package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation/benchmark set — the standard
  * "n-gram overlap" check (GPT-3 appendix C / PaLM-style 8-gram to
  * 13-gram screens) run as a distributed join.
  *
  * Scale shape: each side explodes to DISTINCT per-doc n-gram HASHES
  * (8-byte longs from [[graft.functions.NgramHashes64]], never gram
  * strings), the equi-join shuffles on the hash, and the aggregate
  * folds back to one row per contaminated training doc. Cost is
  * O(tokens) rows shuffled at fixed 16-byte width — the benchmark
  * side is tiny in practice, so at cluster scale the join broadcasts
  * it and the training side never shuffles at all. Counts of shared
  * grams are hash-invariant (equal hashes ⇔ equal grams absent
  * xxhash64 collision), which is what makes the result checkable by
  * a string-based oracle.
  */
object Contamination {

  /** One row per training doc sharing ≥1 n-gram with the benchmark:
    * (doc_id, n_shared_grams = distinct shared grams,
    * n_bench_docs = distinct benchmark docs hit). */
  def overlap(train: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    def grams(df: DataFrame, idAs: String) = df
      .select(col("doc_id").as(idAs),
        explode(array_distinct(
          ApproxDedup.shingleHashes64(col("text"), n))).as("gram"))
    // train-side shingling is the bulk CPU; spread it across the
    // cluster rather than file splits (the benchmark side is tiny by
    // definition — eval sets — and needs no shuffle)
    grams(train.repartition(col("doc_id")), "doc_id")
      .join(grams(benchmark, "bench_id"), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  /** [[overlap]] with a Bloom-filter pre-screen on the training side:
    * the benchmark's gram hashes fold into one Bloom filter (Spark's
    * native `BloomFilterAggregate` — codegen'd `might_contain`, no
    * UDF serialization boundary), the filter ships to every task as a
    * literal, and only grams that *might* be contaminated enter the
    * exact-confirm join. Result-identical to [[overlap]] (false
    * positives are killed by the join; a Bloom filter has no false
    * negatives), so the same DuckDB oracle gates both.
    *
    * Scale: this is the 100 TB shape for decontamination — the
    * training corpus's gram stream is reduced by (1 − fpp · ~1)
    * before the shuffle, so the join moves only true-overlap +
    * fpp-sized traffic instead of every training gram. The benchmark
    * side is tiny by definition (eval sets, not corpora): its
    * single-row Bloom build costs one pass over benchmark grams, and
    * the driver holds only the filter bytes (`maxNumBits/8` ≤ 8 MB
    * by construction — same order as AnnSearch's broadcast
    * centroids).
    */
  def overlapBloom(train: DataFrame, benchmark: DataFrame, n: Int,
                   fpp: Double = 0.01): DataFrame = {
    def grams(df: DataFrame, idAs: String) = df
      .select(col("doc_id").as(idAs),
        explode(array_distinct(
          ApproxDedup.shingleHashes64(col("text"), n))).as("gram"))
    // The benchmark side is consumed THREE times (the sizing count,
    // the Bloom build, the exact-confirm join) — persist the gram
    // stream and its distinct once, or the shingling CPU runs 3×
    // (guide §1.2; lazy, dies with the query via clearCache).
    val benchGrams = grams(benchmark, "bench_id").persist()
    val items = benchGrams.select("gram").distinct().persist()
    // The benchmark gram count sizes the filter: m = -n·ln(p)/ln²2
    // bits, capped at Spark's runtime-filter ceiling (8 MB).
    val est = math.max(items.count(), 1L)
    val numBits = math.min(
      math.ceil(-est * math.log(fpp) / (math.log(2) * math.log(2))).toLong,
      67108864L)
    val bloomAgg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(col("gram")),
        Literal(est), Literal(numBits)).toAggregateExpression())
    // One small driver row: the serialized filter becomes a foldable
    // literal, which is what BloomFilterMightContain requires (and
    // what lets it constant-fold into codegen on the fact side).
    val bloomBytes = items.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = GraftColumnBridge.column(
      BloomFilterMightContain(Literal(bloomBytes),
        GraftColumnBridge.expression(col("gram"))))
    grams(train.repartition(col("doc_id")), "doc_id") // CPU-spread
      .filter(mightContain)
      .join(benchGrams, "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }
}
