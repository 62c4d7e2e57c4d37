package graft.operators

import org.apache.spark.sql.DataFrame
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
    grams(train, "doc_id")
      .join(grams(benchmark, "bench_id"), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }
}
