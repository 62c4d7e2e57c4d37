package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd [[Md5Long]] must equal the interpreted
  * `conv(substring(md5(s), 1, k), 16, 10)` chain BIT-FOR-BIT — that
  * chain is what every DuckDB oracle replays, so any divergence
  * would silently break the hash gate for the whole portable-hash
  * family (sketches, sampling, line dedup, simhash). */
class Md5LongSpec extends SparkSpec {

  private def fixtures = {
    import spark.implicits._
    (Seq("", "a", "abc", "hello world", "0:12345", "3:999999",
      "a b c d e f g h i j", "éü中文", // multi-byte UTF-8
      "x" * 1000) ++ (0 until 200).map(i => s"key_$i")).toDF("s")
  }

  test("md5Long(s, 15) equals the conv(substring(md5)) oracle chain " +
      "on ASCII, multi-byte, empty, and long strings") {
    val out = fixtures.select(
      HashExpressions.md5Long(col("s"), 15).as("native"),
      conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("interp")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("md5Long(s, 8) equals the 32-bit oracle chain") {
    val out = fixtures.select(
      HashExpressions.md5Long(col("s"), 8).as("native"),
      conv(substring(md5(col("s").cast("binary")), 1, 8), 16, 10)
        .cast("long").as("interp")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("values are non-negative and fit the declared bit width") {
    val rows = fixtures.select(
      HashExpressions.md5Long(col("s"), 15).as("h60"),
      HashExpressions.md5Long(col("s"), 8).as("h32")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 60))
      assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << 32))
    }
  }

  test("whole-stage codegen keeps the expression inline (no fallback)") {
    // a range-derived frame (LocalTableScan never codegens, with or
    // without the expression — it would vacuously fail the check)
    val plan = spark.range(100)
      .select(HashExpressions.md5Long(
        concat(lit("k"), col("id").cast("string")), 15).as("h"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix is how simpleString marks WholeStageCodegen
    // membership; a codegen fallback would print a bare Project
    assert(plan.contains("*(1) Project"), plan)
  }
}
