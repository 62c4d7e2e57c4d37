package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * $SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query
  * wall-clock seconds.
  *
  * Each query is materialized with a `noop`-format write so the full
  * plan (projections, sorts, window frames) executes end-to-end —
  * `count()` would let Catalyst prune everything but the row count.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM + parquet footers once so per-query numbers measure
    // the plan, not first-touch classloading; generate the firehose
    // fixtures here so their single-threaded driver-side creation
    // never lands inside a timed query.
    queries.PipelineQueries.fixtureDir
    queries.PipelineQueries.largeFixtureDir
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // Touch every benchmark table once (file listing + footer read) so
    // the alphabetically-first query of each table doesn't absorb the
    // cold metadata I/O. count() stays metadata-only — data pages are
    // still read inside the timed queries.
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      Tables(spark, sfDir, t).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // -1 sentinel on failure so the JSON can't pass a broken query
      // off as a fast one.
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
