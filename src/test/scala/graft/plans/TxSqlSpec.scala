package graft.plans

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.TxTable
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.parser.ParseException
import org.apache.spark.sql.functions._

/** The TxTable SQL surface ([[TxSqlSupport]]) end-to-end on the
  * extension-installed shared session: tx.`path` reads, Spark-native
  * VERSION/TIMESTAMP AS OF time travel, DELETE FROM routing, the
  * RESTORE/VACUUM parser statements, refusal paths (malformed
  * statements raise ParseException, bad versions fail cleanly), and
  * delegation transparency (non-tx SQL is untouched). */
class TxSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), "txsql_")
      .toString

  private def docs(ids: Long*) =
    ids.map(i => (i, s"t$i")).toDF("doc_id", "text")

  private def idsAt(sql: String): Seq[Long] =
    spark.sql(sql).select("doc_id").as[Long].collect().sorted.toSeq

  test("tx.`path` resolves to the head; VERSION AS OF time-travels") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t))
    TxTable.append(docs(3L), t)
    assert(idsAt(s"SELECT doc_id FROM tx.`$t`") == Seq(1L, 2L, 3L))
    assert(idsAt(s"SELECT doc_id FROM tx.`$t` VERSION AS OF 1") ==
      Seq(1L, 2L))
    // aliased + aggregated + joined like any relation
    val n = spark.sql(
      s"""SELECT COUNT(*) AS n FROM tx.`$t` a
         |JOIN tx.`$t` VERSION AS OF 1 b USING (doc_id)""".stripMargin)
      .head.getLong(0)
    assert(n == 2L)
  }

  test("TIMESTAMP AS OF pins the newest version at or before the " +
      "instant") {
    val t = freshDir()
    assert(TxTable.create(docs(1L), t))
    Thread.sleep(1100) // past FS mtime granularity
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(1100)
    TxTable.append(docs(2L), t)
    val ts = new java.sql.Timestamp(betweenMs).toString
    assert(idsAt(
      s"SELECT doc_id FROM tx.`$t` TIMESTAMP AS OF '$ts'") == Seq(1L))
  }

  test("DELETE FROM tx routes to the copy-on-write delete and " +
      "returns the committed version; no-match delete holds the head") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L, 3L, 4L), t))
    val v = spark.sql(s"DELETE FROM tx.`$t` WHERE doc_id % 2 = 0")
      .head.getLong(0)
    assert(v == 2L)
    assert(idsAt(s"SELECT doc_id FROM tx.`$t`") == Seq(1L, 3L))
    // nothing matches -> no new version (TxTable.delete contract)
    val v2 = spark.sql(s"DELETE FROM tx.`$t` WHERE doc_id > 100")
      .head.getLong(0)
    assert(v2 == 2L)
    assert(TxTable.latestVersion(t).contains(2L))
  }

  test("RESTORE TO VERSION and TO TIMESTAMP AS OF roll content back " +
      "as a new commit") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t))
    Thread.sleep(1100)
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(1100)
    TxTable.append(docs(3L), t)
    spark.sql(s"DELETE FROM tx.`$t` WHERE doc_id = 1")
    val v4 = spark.sql(s"RESTORE TABLE tx.`$t` TO VERSION 2")
      .head.getLong(0)
    assert(v4 == 4L)
    assert(idsAt(s"SELECT doc_id FROM tx.`$t`") == Seq(1L, 2L, 3L))
    // timestamp form (optional TABLE keyword omitted): back to v1
    val ts = new java.sql.Timestamp(afterV1).toString
    val v5 = spark.sql(
      s"RESTORE tx.`$t` TO TIMESTAMP AS OF '$ts'").head.getLong(0)
    assert(v5 == 5L)
    assert(idsAt(s"SELECT doc_id FROM tx.`$t`") == Seq(1L, 2L))
    // pre-restore history is intact
    assert(idsAt(s"SELECT doc_id FROM tx.`$t` VERSION AS OF 3") ==
      Seq(2L, 3L))
  }

  test("VACUUM RETAIN expires history, reports counts, re-vacuum " +
      "no-ops") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L, 3L), t))
    spark.sql(s"DELETE FROM tx.`$t` WHERE doc_id = 2") // v2 rewrite
    TxTable.compact(spark, t) // v3
    val r = spark.sql(
      s"VACUUM tx.`$t` RETAIN 2 VERSIONS GRACE 0 MILLISECONDS").head
    assert(r.getLong(0) == 1L, s"one manifest (v1) must expire: $r")
    assert(r.getLong(1) >= 1L, s"v1's dead files must be reaped: $r")
    val again = spark.sql(s"VACUUM tx.`$t` RETAIN 2 VERSIONS").head
    assert(again.getLong(0) == 0L && again.getLong(1) == 0L)
    // retained versions still read; expired one fails cleanly
    assert(idsAt(s"SELECT doc_id FROM tx.`$t` VERSION AS OF 2") ==
      Seq(1L, 3L))
    intercept[Exception] {
      spark.sql(s"SELECT doc_id FROM tx.`$t` VERSION AS OF 1").collect()
    }
  }

  test("malformed RESTORE/VACUUM statements raise ParseException; " +
      "non-tx SQL delegates untouched") {
    intercept[ParseException] {
      spark.sql("RESTORE TABLE tx.`/tmp/x` TO VERSION")
    }
    intercept[ParseException] {
      spark.sql("VACUUM tx.`/tmp/x` RETAIN two VERSIONS")
    }
    intercept[ParseException] {
      spark.sql("RESTORE tx.`/tmp/x` INTO VERSION 3")
    }
    // vanilla statements ride the delegate
    assert(spark.sql("SELECT 1 AS one").head.getInt(0) == 1)
    // vanilla RESTORE (no tx reference) falls through to the stock
    // parser's own syntax error, not ours
    intercept[ParseException] { spark.sql("RESTORE somewhere") }
  }

  test("bad version / missing table fail cleanly through the SQL " +
      "face") {
    val t = freshDir()
    assert(TxTable.create(docs(1L), t))
    val eVer = intercept[Exception] {
      spark.sql(s"SELECT * FROM tx.`$t` VERSION AS OF 99").collect()
    }
    assert(eVer.getMessage.contains("99"))
    val eTbl = intercept[Exception] {
      spark.sql("SELECT * FROM tx.`/nonexistent/graft/table`").collect()
    }
    assert(eTbl.getMessage != null)
    // DELETE against a non-tx relation keeps Spark's own rejection
    // (a view/parquet relation does not support DELETE)
    docs(7L).createOrReplaceTempView("txsql_plain_view")
    intercept[Exception] {
      spark.sql("DELETE FROM txsql_plain_view WHERE doc_id = 7")
    }
  }

  test("DELETE predicate resolves against the table schema at run " +
      "time (columns, functions, NULL-safe semantics)") {
    val t = freshDir()
    assert(TxTable.create(
      Seq((1L, "keep"), (2L, null), (3L, "drop")).toDF("doc_id", "text"),
      t))
    // NULL predicate rows stay (SQL DELETE semantics)
    spark.sql(s"DELETE FROM tx.`$t` WHERE length(text) = 4 " +
      "AND text LIKE 'd%'")
    assert(idsAt(s"SELECT doc_id FROM tx.`$t`") == Seq(1L, 2L))
  }
}
