package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed/sorted landing table for a curated corpus — the tail of
  * the curation pipeline (reference writes flat objects,
  * kinesis-to-humio.py:147-158; here the layout itself carries the
  * partitioning contract). The write hash-buckets on `doc_id` and
  * sorts within each bucket, paying the corpus's one shuffle AT WRITE
  * TIME so every downstream consumer — enrichment joins, dedup
  * refreshes against the canonical set, training-shard readers — scans
  * it with NO Exchange: the bucket layout satisfies the join's
  * distribution requirement outright.
  *
  * The pre-write `repartition(buckets, doc_id)` aligns tasks with
  * buckets (same hash), so each bucket lands as ONE file and Spark
  * trusts the written sort order too (multi-file buckets force a
  * defensive re-sort in the consumer). At 100 TB: buckets scale with
  * the cluster (thousands), each a training shard readable in
  * isolation, and the per-bucket sort gives cheap doc_id range scans.
  */
object CuratedCorpusSink {
  def write(curated: DataFrame, table: String,
            buckets: Int = 16): DataFrame = {
    val spark = curated.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    curated
      .repartition(buckets, col("doc_id"))
      .write.format("parquet")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .option("path",
        s"${System.getProperty("java.io.tmpdir")}/graft_buckets/$table")
      .mode("overwrite")
      .saveAsTable(table)
    spark.table(table)
  }
}
