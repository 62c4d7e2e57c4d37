package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-partitioned landing layout (`partitionBy` directories) — the
  * complement of [[CuratedCorpusSink]]'s bucketed layout: buckets
  * co-locate JOIN keys; directory partitions let PREDICATES skip
  * files entirely. A corpus landed as `lang=<v>/...` serves every
  * per-language consumer (mixture sampling, lang-specific filters,
  * per-lang training shards) by reading ONLY that language's files —
  * at 100 TB, a `lang = 'en'` reader touches the en directories and
  * nothing else, and the skipped bytes never leave storage.
  *
  * PartitionPruneSpec pins the plan: the lang predicate lands in the
  * scan's `PartitionFilters` (metadata-level file skipping), not in
  * its data filters — pruning, not post-scan filtering.
  *
  * Partition-column choice is a real design decision at scale:
  * directory partitioning wants LOW-cardinality columns (languages,
  * sources, dates — tens to thousands of directories). High-
  * cardinality keys belong in buckets ([[CuratedCorpusSink]]) or
  * sort order, never directories (millions of tiny files kill every
  * object store's listing path).
  */
object PartitionedCorpusSink {
  /** Write `df` partitioned by `partCol` under java.io.tmpdir/`name`
    * (overwritten per call — the path is shared across SF fixtures),
    * and return the read-back frame. */
  def writeAndRead(df: DataFrame, name: String,
                   partCol: String): DataFrame = {
    val spark = df.sparkSession
    val dir = s"${System.getProperty("java.io.tmpdir")}/$name"
    df.write.mode("overwrite").partitionBy(partCol).parquet(dir)
    spark.read.parquet(dir)
  }
}
