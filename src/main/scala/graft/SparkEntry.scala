package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see SURVEY.md §2.3 for the operator inventory
  * each query key exercises, and SURVEY.md §7.4 for the determinism
  * rules that make every oracle pair hash-match DuckDB.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Runs the multiway-join revenue rollup (lineitem ⋈ orders
    * ⋈ customer). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      AggQueries.queries ++
      WindowQueries.queries ++
      ScalarQueries.queries ++
      TextQueries.queries ++
      SimilarityQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by
    * DuckDB on the same parquet tables. Omitted keys get the driver's
    * weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++
      AggQueries.oracleSql ++
      WindowQueries.oracleSql ++
      ScalarQueries.oracleSql ++
      TextQueries.oracleSql ++
      SimilarityQueries.oracleSql
}
