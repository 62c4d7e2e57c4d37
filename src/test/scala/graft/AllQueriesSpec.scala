package graft

/** Execution smoke over the FULL registry: the oracle gate covers
  * hash-matched keys, but rows-only keys (hash-based dedup/ANN,
  * firehose, sketches, splits) would only fail at driver time —
  * this spec runs every registered query end-to-end at sf0.001.
  */
class AllQueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("every oracleSql key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
