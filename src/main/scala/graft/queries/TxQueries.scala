package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.TxTable

/** Transactional-table queries: the snapshot-isolated commit log
  * ([[graft.sources.TxTable]]) exercised end-to-end under the hash
  * gate. The fixture builds a four-version table from the
  * `documents` fixture — create, append, copy-on-write MERGE,
  * compaction — and the gated key reads EVERY version back (time
  * travel), proving the manifest log preserves each historical
  * state byte-exactly and that compaction is content-neutral. The
  * DuckDB oracle replays the logical content of each version
  * directly from `documents` — if any commit leaked rows, lost an
  * update, or compaction changed content, the per-version aggregates
  * diverge.
  *
  * Versions (all derived deterministically from `documents`):
  *   v1 create : doc_id % 3 = 0
  *   v2 append : doc_id % 3 = 1
  *   v3 merge  : update text -> text || ' v3' where doc_id % 6 = 0;
  *               insert doc_id % 3 = 2 AND doc_id < 60
  *   v4 compact: content-identical rewrite of v3
  */
object TxQueries {

  /** Build-once-per-JVM fixture table (unique tmp dir per JVM run, so
    * stale tables from previous processes can't skew version
    * numbers). Registered through DerivedCache.memoValue so Bench
    * attributes the one-time build to build_sec, like every other
    * shared index. */
  private def fixtureTable(s: SparkSession, d: String): String =
    graft.operators.DerivedCache.memoValue(s, s"tx_table_fixture:$d") {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")),
        "graft_txtable_").toString
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      require(TxTable.create(
        docs.filter(col("doc_id") % 3 === 0), dir), "create lost its CAS")
      TxTable.append(docs.filter(col("doc_id") % 3 === 1), dir)
      val updates = docs.filter(col("doc_id") % 6 === 0)
        .select(col("doc_id"), col("lang"),
          concat(col("text"), lit(" v3")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 2 &&
          col("doc_id") < 60))
      TxTable.merge(s, dir, updates)
      require(TxTable.compact(s, dir).contains(4L),
        "compact must land as v4")
      dir
    }

  /** Second fixture for the schema-evolution key: v1 create (3
    * columns), v2 appendEvolve adding a `source` column — built once
    * per JVM through DerivedCache like the main fixture. */
  private def evoTable(s: SparkSession, d: String): String =
    graft.operators.DerivedCache.memoValue(s, s"tx_evo_fixture:$d") {
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")),
        "graft_txevo_").toString
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      require(TxTable.create(
        docs.filter(col("doc_id") % 3 === 0), dir), "create lost its CAS")
      TxTable.appendEvolve(docs.filter(col("doc_id") % 3 === 1)
        .withColumn("source", concat(lit("s:"), col("lang"))), dir)
      dir
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-version aggregate fingerprint over the full manifest
    // history: rows, chars, id-sum at every pinned version. Scale:
    // each version read is a plain parquet scan of that manifest's
    // files; the aggregates are single-pass map-combined.
    "q_corpus_snapshot" -> ((s, d) => {
      val t = fixtureTable(s, d)
      (1L to 4L).map { v =>
        TxTable.read(s, t, Some(v))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("long")).as("n_chars"),
            sum(col("doc_id")).as("sum_ids"))
          .select(lit(v).as("version"), col("n_docs"),
            col("n_chars"), col("sum_ids"))
      }.reduce(_ unionByName _)
        .orderBy("version")
    }),

    // Row-level change feed (CDC) across the same manifest history:
    // per-transition insert/delete counts and fingerprint sums for
    // the adjacent pairs AND the composed (1→4) range. The gate
    // proves, against an independent EXCEPT ALL replay in DuckDB,
    // that (a) an append's feed is exactly the appended rows, (b) a
    // copy-on-write MERGE nets out to delete(old)+insert(new) per
    // updated key plus plain inserts — rewrite noise cancels, (c) a
    // compaction emits ZERO changes (the 3→4 row hashes as explicit
    // zeros), and (d) a multi-version range feed equals the net diff
    // (catch-up consumers skip intermediate rewrites). Scale: each
    // feed reads only the transition's touched files; the append
    // transition takes the shuffle-free fast path.
    "q_corpus_changes" -> ((s, d) => {
      val t = fixtureTable(s, d)
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).map { case (f, v) =>
        val isIns = col("_change") === "insert"
        TxTable.changes(s, t, f, v).agg(
          coalesce(sum(when(isIns, 1L)), lit(0L)).as("n_insert"),
          coalesce(sum(when(!isIns, 1L)), lit(0L)).as("n_delete"),
          coalesce(sum(when(isIns, col("doc_id"))), lit(0L))
            .as("insert_id_sum"),
          coalesce(sum(when(!isIns, col("doc_id"))), lit(0L))
            .as("delete_id_sum"),
          coalesce(sum(when(isIns, length(col("text")).cast("long"))),
            lit(0L)).as("insert_chars"))
          .select(lit(f).as("from_version"), lit(v).as("to_version"),
            col("n_insert"), col("n_delete"), col("insert_id_sum"),
            col("delete_id_sum"), col("insert_chars"))
      }.reduce(_ unionByName _)
        .orderBy("from_version", "to_version")
    }),

    // INCREMENTAL VIEW MAINTENANCE over the change feed: per-version
    // corpus aggregates maintained WITHOUT ever rescanning a
    // snapshot past v1 — each transition's feed aggregates to ONE
    // signed delta row (insert = +1, delete = −1; sums over an
    // abelian group commute with the diff), and the per-commit
    // deltas fold in version order via the distributed PrefixSum
    // primitive (no unpartitioned window). The gate is the IVM
    // theorem made executable: the maintained state at every version
    // hash-equals q_corpus_snapshot's DIRECT per-version replay. At
    // 100 TB this is the nightly-stats pattern: the feed costs the
    // day's churn, the fold costs one row per commit.
    "q_corpus_ivm" -> ((s, d) => {
      val t = fixtureTable(s, d)
      val base = TxTable.read(s, t, Some(1L))
        .select(lit(1L).as("version"), lit(1L).as("w"),
          col("doc_id"), col("text"))
      val feeds = (1L to 3L).map { k =>
        TxTable.changes(s, t, k, k + 1)
          .select(lit(k + 1).as("version"),
            when(col("_change") === "insert", 1L).otherwise(-1L).as("w"),
            col("doc_id"), col("text"))
      }
      val deltas = (base +: feeds).reduce(_ unionByName _)
        .groupBy("version")
        .agg(sum(col("w")).as("d_docs"),
          sum(col("w") * length(col("text")).cast("long")).as("d_chars"),
          sum(col("w") * col("doc_id")).as("d_ids"))
      // version spine: an empty feed (the compaction transition)
      // contributes no delta row but must still carry a version
      val padded = s.range(1L, 5L).select(col("id").as("version"))
        .join(deltas, Seq("version"), "left")
        .select(col("version"),
          coalesce(col("d_docs"), lit(0L)).as("d_docs"),
          coalesce(col("d_chars"), lit(0L)).as("d_chars"),
          coalesce(col("d_ids"), lit(0L)).as("d_ids"))
      val folded = graft.operators.PrefixSum.prefixSums(padded,
        Seq(col("d_docs") -> "n_docs", col("d_chars") -> "n_chars",
          col("d_ids") -> "sum_ids"), col("version"))
      folded.select("version", "n_docs", "n_chars", "sum_ids")
        .orderBy("version")
    }),

    // SCHEMA EVOLUTION under the hash gate: v2 widened the table
    // with a `source` column (appendEvolve — no data rewrite; old
    // files read the new column as NULL), and v1 stays SCHEMA-PINNED
    // (time travel must not leak the evolved column — asserted at
    // plan-build time). The per-version fingerprints prove old rows
    // carry NULL source (n_source counts non-nulls) and history
    // replays with its own schema.
    "q_corpus_schema_evolution" -> ((s, d) => {
      val t = evoTable(s, d)
      val v1 = TxTable.read(s, t, Some(1L))
      require(!v1.columns.contains("source"),
        "time travel leaked a column that did not exist at v1")
      val v2 = TxTable.read(s, t, Some(2L))
      val r1 = v1.agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .select(lit(1L).as("version"), col("n_docs"), col("n_chars"),
          lit(0L).as("n_source"))
      val r2 = v2.agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          count(col("source")).as("n_source"))
        .select(lit(2L).as("version"), col("n_docs"), col("n_chars"),
          col("n_source"))
      r1.unionByName(r2).orderBy("version")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // Replays each version's LOGICAL content straight from
    // `documents`: v1/v2 are modulo slices, v3 applies the merge
    // (update ... ' v3' on doc_id%6=0 over the v2 key set, plus the
    // %3=2, <60 inserts), v4 equals v3 (compaction is
    // content-neutral).
    "q_corpus_snapshot" ->
      """WITH v1 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        |v2 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 IN (0, 1)),
        |v3 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN text || ' v3' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 3 IN (0, 1)
        |  UNION ALL
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 3 = 2 AND doc_id < 60),
        |versions AS (
        |  SELECT 1 AS version, * FROM v1
        |  UNION ALL SELECT 2, * FROM v2
        |  UNION ALL SELECT 3, * FROM v3
        |  UNION ALL SELECT 4, * FROM v3)
        |SELECT CAST(version AS BIGINT) AS version,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM versions GROUP BY version
        |ORDER BY version""".stripMargin,

    // Independent CDC replay: rebuild each version's logical content
    // (WITH lang, mirroring the engine's full-row multiset diff),
    // diff adjacent versions and the (1→4) range with EXCEPT ALL
    // both ways, and aggregate the same per-transition fingerprints.
    // v4 = v3 (compaction), so the 3→4 row must be all zeros.
    "q_corpus_changes" ->
      """WITH v1 AS (
        |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 3 = 0),
        |v2 AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE doc_id % 3 IN (0, 1)),
        |v3 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 6 = 0 THEN text || ' v3' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 3 IN (0, 1)
        |  UNION ALL
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE doc_id % 3 = 2 AND doc_id < 60),
        |i12 AS (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1),
        |d12 AS (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2),
        |i23 AS (SELECT * FROM v3 EXCEPT ALL SELECT * FROM v2),
        |d23 AS (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v3),
        |i14 AS (SELECT * FROM v3 EXCEPT ALL SELECT * FROM v1),
        |d14 AS (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v3)
        |SELECT CAST(1 AS BIGINT) AS from_version,
        |  CAST(2 AS BIGINT) AS to_version,
        |  (SELECT COUNT(*) FROM i12) AS n_insert,
        |  (SELECT COUNT(*) FROM d12) AS n_delete,
        |  CAST(COALESCE((SELECT SUM(doc_id) FROM i12), 0) AS BIGINT)
        |    AS insert_id_sum,
        |  CAST(COALESCE((SELECT SUM(doc_id) FROM d12), 0) AS BIGINT)
        |    AS delete_id_sum,
        |  CAST(COALESCE((SELECT SUM(length(text)) FROM i12), 0) AS BIGINT)
        |    AS insert_chars
        |UNION ALL
        |SELECT 2, 3,
        |  (SELECT COUNT(*) FROM i23), (SELECT COUNT(*) FROM d23),
        |  CAST(COALESCE((SELECT SUM(doc_id) FROM i23), 0) AS BIGINT),
        |  CAST(COALESCE((SELECT SUM(doc_id) FROM d23), 0) AS BIGINT),
        |  CAST(COALESCE((SELECT SUM(length(text)) FROM i23), 0) AS BIGINT)
        |UNION ALL
        |SELECT 3, 4, 0, 0, 0, 0, 0
        |UNION ALL
        |SELECT 1, 4,
        |  (SELECT COUNT(*) FROM i14), (SELECT COUNT(*) FROM d14),
        |  CAST(COALESCE((SELECT SUM(doc_id) FROM i14), 0) AS BIGINT),
        |  CAST(COALESCE((SELECT SUM(doc_id) FROM d14), 0) AS BIGINT),
        |  CAST(COALESCE((SELECT SUM(length(text)) FROM i14), 0) AS BIGINT)
        |ORDER BY from_version, to_version""".stripMargin,

    // The IVM gate replays the DIRECT per-version aggregates — the
    // same oracle as q_corpus_snapshot. Equality of the two keys'
    // hashes against one oracle IS the maintained-state == direct
    // theorem under the driver gate.
    "q_corpus_ivm" ->
      """WITH v1 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        |v3 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN text || ' v3' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 3 IN (0, 1)
        |  UNION ALL
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 3 = 2 AND doc_id < 60),
        |versions AS (
        |  SELECT 1 AS version, * FROM v1
        |  UNION ALL SELECT 2, doc_id, text FROM documents
        |    WHERE doc_id % 3 IN (0, 1)
        |  UNION ALL SELECT 3, * FROM v3
        |  UNION ALL SELECT 4, * FROM v3)
        |SELECT CAST(version AS BIGINT) AS version,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM versions GROUP BY version
        |ORDER BY version""".stripMargin,

    // Evolution replay: v1 = the %3=0 slice with NO source column
    // (n_source pinned 0), v2 = %3 IN (0,1) where only the appended
    // %3=1 rows carry a non-null source.
    "q_corpus_schema_evolution" ->
      """SELECT CAST(1 AS BIGINT) AS version, COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  CAST(0 AS BIGINT) AS n_source
        |FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT 2, COUNT(*), CAST(SUM(length(text)) AS BIGINT),
        |  CAST(SUM(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT)
        |FROM documents WHERE doc_id % 3 IN (0, 1)
        |ORDER BY version""".stripMargin,
  )
}
