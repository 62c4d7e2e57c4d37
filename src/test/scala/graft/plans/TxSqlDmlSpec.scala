package graft.plans

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.TxTable
import org.apache.spark.sql.functions._

/** The SQL WRITE path for tx tables: INSERT INTO / INSERT OVERWRITE
  * (positional and BY NAME), row-level UPDATE (the copy-on-write
  * [[TxTable.update]] verb), canonical MERGE INTO — plus the refusal
  * paths (partition specs, column lists, nested assignments,
  * non-canonical merge clauses) failing with clear messages instead
  * of silent approximations. */
class TxSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), "txdml_")
      .toString

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def contents(t: String): Map[Long, String] =
    TxTable.read(spark, t).select("doc_id", "text")
      .as[(Long, String)].collect().toMap

  test("INSERT INTO appends (positional rename+cast and BY NAME); " +
      "INSERT OVERWRITE replaces content, history intact") {
    val t = freshDir()
    assert(TxTable.create(docs(1L -> "a"), t))
    // positional: different output names, int id cast to long
    val v2 = spark.sql(
      s"INSERT INTO tx.`$t` SELECT 2 AS i, 'b' AS s").head.getLong(0)
    assert(v2 == 2L)
    // BY NAME: shuffled column order
    val v3 = spark.sql(
      s"INSERT INTO tx.`$t` BY NAME SELECT 'c' AS text, 3L AS doc_id")
      .head.getLong(0)
    assert(v3 == 3L)
    assert(contents(t) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    val v4 = spark.sql(
      s"INSERT OVERWRITE tx.`$t` SELECT 9L, 'z'").head.getLong(0)
    assert(v4 == 4L)
    assert(contents(t) == Map(9L -> "z"))
    assert(TxTable.read(spark, t, Some(3L)).count() == 3L,
      "overwritten history must stay time-travelable")
  }

  test("UPDATE rewrites matching rows in place: SET expressions see " +
      "the OLD row, NULL predicates leave rows untouched, values " +
      "cast to the column type") {
    val t = freshDir()
    assert(TxTable.create(
      Seq((1L, "x", 10L), (2L, null, 20L), (3L, "y", 30L))
        .toDF("doc_id", "text", "n"), t))
    val v = spark.sql(
      s"""UPDATE tx.`$t` SET n = n + 1, text = concat(text, '!')
         |WHERE length(text) = 1""".stripMargin).head.getLong(0)
    assert(v == 2L)
    val rows = TxTable.read(spark, t)
      .select("doc_id", "text", "n").as[(Long, String, Long)]
      .collect().toSet
    // row 2's NULL text fails the predicate -> untouched
    assert(rows == Set((1L, "x!", 11L), (2L, null, 20L), (3L, "y!", 31L)))
    // no-match UPDATE commits nothing
    assert(spark.sql(s"UPDATE tx.`$t` SET n = 0 WHERE doc_id > 99")
      .head.getLong(0) == 2L)
    assert(TxTable.latestVersion(t).contains(2L))
    // UPDATE without WHERE touches every row
    assert(spark.sql(s"UPDATE tx.`$t` SET n = 7").head.getLong(0) == 3L)
    assert(TxTable.read(spark, t).select("n").as[Long]
      .collect().toSet == Set(7L))
  }

  test("canonical MERGE INTO upserts whole rows; update feeds " +
      "surface in the change feed") {
    val t = freshDir()
    assert(TxTable.create(docs(1L -> "old", 2L -> "keep"), t))
    val v = spark.sql(
      s"""MERGE INTO tx.`$t` t
         |USING (SELECT 1L AS doc_id, 'new' AS text
         |       UNION ALL SELECT 5L, 'ins') s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head.getLong(0)
    assert(v == 2L)
    assert(contents(t) == Map(1L -> "new", 2L -> "keep", 5L -> "ins"))
    val feed = TxTable.changes(spark, t, 1L, 2L)
      .select("_change", "doc_id").as[(String, Long)].collect().toSet
    assert(feed == Set(("delete", 1L), ("insert", 1L), ("insert", 5L)))
  }

  test("refusal paths: partition specs, column lists, nested " +
      "assignments, and non-canonical merge clauses fail loudly") {
    val t = freshDir()
    assert(TxTable.create(docs(1L -> "a"), t))
    intercept[Exception] {
      spark.sql(s"INSERT INTO tx.`$t` PARTITION (p=1) SELECT 2L, 'b'")
    }
    intercept[Exception] {
      spark.sql(s"INSERT INTO tx.`$t` (doc_id) SELECT 2L")
    }
    intercept[Exception] { // non-canonical: matched DELETE
      spark.sql(
        s"""MERGE INTO tx.`$t` t USING (SELECT 1L AS doc_id, 'x' AS text) s
           |ON t.doc_id = s.doc_id
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    intercept[Exception] { // non-equality merge condition
      spark.sql(
        s"""MERGE INTO tx.`$t` t USING (SELECT 1L AS doc_id, 'x' AS text) s
           |ON t.doc_id < s.doc_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    // table unchanged by any refused statement
    assert(contents(t) == Map(1L -> "a"))
    assert(TxTable.latestVersion(t).contains(1L))
  }

  test("DML works on tables without a doc_id column (bucket key " +
      "derived from the table schema)") {
    val t = freshDir()
    assert(TxTable.create(
      Seq(("a", 1L), ("b", 2L)).toDF("id", "v"), t,
      bucketKey = "id"))
    assert(spark.sql(s"INSERT INTO tx.`$t` SELECT 'c', 3L")
      .head.getLong(0) == 2L)
    assert(spark.sql(s"UPDATE tx.`$t` SET v = v * 10 WHERE id = 'a'")
      .head.getLong(0) == 3L)
    assert(spark.sql(s"DELETE FROM tx.`$t` WHERE id = 'b'")
      .head.getLong(0) == 4L)
    val rows = TxTable.read(spark, t).select("id", "v")
      .as[(String, Long)].collect().toSet
    assert(rows == Set(("a", 10L), ("c", 3L)))
  }

  test("CREATE TABLE tx AS SELECT births a table through SQL; " +
      "IF NOT EXISTS no-ops; plain re-create errors") {
    val t = freshDir() + "/ctas" // not yet created on disk
    val v1 = spark.sql(
      s"CREATE TABLE tx.`$t` AS SELECT 1L AS doc_id, 'a' AS text")
      .head.getLong(0)
    assert(v1 == 1L)
    assert(contents(t) == Map(1L -> "a"))
    // full pure-SQL lifecycle on the SQL-born table
    spark.sql(s"INSERT INTO tx.`$t` SELECT 2L, 'b'")
    assert(spark.sql(
      s"CREATE TABLE IF NOT EXISTS tx.`$t` AS SELECT 9L AS doc_id, " +
        "'x' AS text").head.getLong(0) == 2L,
      "IF NOT EXISTS must no-op and report the current head")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE tx.`$t` AS SELECT 9L AS doc_id, " +
        "'x' AS text")
    }
    assert(contents(t) == Map(1L -> "a", 2L -> "b"))
  }

  test("DESCRIBE HISTORY lists retained versions newest first with " +
      "ops and exact row counts") {
    val t = freshDir()
    assert(TxTable.create(docs(1L -> "a", 2L -> "b"), t))
    spark.sql(s"DELETE FROM tx.`$t` WHERE doc_id = 2")
    TxTable.compact(spark, t)
    val h = spark.sql(s"DESCRIBE HISTORY tx.`$t`")
      .select("version", "op", "n_rows")
      .as[(Long, String, Long)].collect().toSeq
    assert(h == Seq((3L, "compact", 1L), (2L, "delete", 1L),
      (1L, "create", 2L)), s"unexpected history: $h")
    // ts and file counts are present and sane
    val full = spark.sql(s"DESCRIBE HISTORY tx.`$t`").collect()
    assert(full.forall(r => r.getLong(2) > 0L && r.getLong(3) >= 1L))
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("DESCRIBE HISTORY tx.`unterminated")
    }
  }

  test("a MERGE source may itself read tx tables (nested resolution " +
      "in the command's own analysis)") {
    val (t, src) = (freshDir(), freshDir())
    assert(TxTable.create(docs(1L -> "old"), t))
    assert(TxTable.create(docs(1L -> "from-src", 2L -> "ins"), src))
    spark.sql(
      s"""MERGE INTO tx.`$t` t USING (SELECT * FROM tx.`$src`) s
         |ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(contents(t) == Map(1L -> "from-src", 2L -> "ins"))
  }

  test("alias-qualified DML resolves: DELETE/UPDATE with a table " +
      "alias strip the qualifier before run-time resolution") {
    val t = freshDir()
    assert(TxTable.create(
      docs(1L -> "t1", 2L -> "t2", 3L -> "t3"), t))
    spark.sql(s"DELETE FROM tx.`$t` t WHERE t.doc_id = 3")
    assert(contents(t).keySet == Set(1L, 2L))
    spark.sql(
      s"UPDATE tx.`$t` t SET text = concat(t.text, '!') " +
        "WHERE t.doc_id = 1")
    assert(contents(t) == Map(1L -> "t1!", 2L -> "t2"))
  }

  test("INSERT BY NAME rejects source columns the table lacks " +
      "instead of silently dropping them") {
    val t = freshDir()
    assert(TxTable.create(docs(1L -> "t1"), t))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO tx.`$t` BY NAME " +
        "SELECT 9L AS doc_id, 'x' AS text, 42 AS stray")
    }
    assert(e.getMessage.contains("stray"),
      s"expected the stray column named in: ${e.getMessage}")
    assert(contents(t).keySet == Set(1L), "nothing may land")
  }

  test("CREATE TABLE tx.`p` (cols) births an empty table " +
      "metadata-only; IF NOT EXISTS no-ops; REPLACE TABLE refuses " +
      "clearly") {
    val t = freshDir() + "/fresh"
    val v = spark.sql(
      s"CREATE TABLE tx.`$t` (doc_id BIGINT, text STRING)")
      .head.getLong(0)
    assert(v == 1L)
    assert(spark.sql(s"SELECT * FROM tx.`$t`").columns.toSeq ==
      Seq("doc_id", "text"))
    assert(spark.sql(s"SELECT * FROM tx.`$t`").count() == 0)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE tx.`$t` (doc_id BIGINT, text STRING)")
    }
    assert(spark.sql(s"CREATE TABLE IF NOT EXISTS tx.`$t` " +
      "(doc_id BIGINT, text STRING)").head.getLong(0) == 1L)
    spark.sql(s"INSERT INTO tx.`$t` SELECT 5L, 'hello'")
    assert(contents(t) == Map(5L -> "hello"))
    val r = intercept[Exception] {
      spark.sql(s"REPLACE TABLE tx.`$t` AS SELECT 1L AS doc_id, " +
        "'x' AS text")
    }
    assert(r.getMessage.toLowerCase.contains("replace table"),
      s"expected a clear REPLACE refusal, got: ${r.getMessage}")
  }

  test("ALTER TABLE ADD COLUMNS / ALTER COLUMN TYPE evolve the " +
      "schema metadata-only through SQL; non-widening refused") {
    val t = freshDir()
    assert(TxTable.create(Seq((1L, 7)).toDF("doc_id", "n")
      .select(col("doc_id"), col("n").cast("int")), t))
    val v = spark.sql(
      s"ALTER TABLE tx.`$t` ADD COLUMNS (lang STRING, score DOUBLE)")
      .head.getLong(0)
    assert(v == 2L)
    val v2 = spark.sql(s"ALTER TABLE tx.`$t` ALTER COLUMN n TYPE BIGINT")
      .head.getLong(0)
    assert(v2 == 3L)
    val row = spark.sql(s"SELECT doc_id, n, lang FROM tx.`$t`").head
    assert(row.getLong(1) == 7L && row.isNullAt(2),
      "old files read widened n and NULL lang")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE tx.`$t` ALTER COLUMN n TYPE INT")
    }
    // old history replays with its own schema
    assert(spark.sql(s"SELECT * FROM tx.`$t` VERSION AS OF 1")
      .schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("OPTIMIZE compacts through SQL: plain re-bins, ZORDER BY one " +
      "column range-clusters (per-file stats turn selective), two " +
      "columns lay out the Z-curve") {
    val t = freshDir()
    assert(TxTable.create((0L until 64L).map(i => (i, i / 8L))
      .toDF("doc_id", "grp"), t))
    TxTable.append((64L until 128L).map(i => (i, i / 8L))
      .toDF("doc_id", "grp"), t)
    val before = TxTable.read(spark, t).as[(Long, Long)].collect().toSet
    val v = spark.sql(s"OPTIMIZE tx.`$t`").head.getLong(0)
    assert(v == 3L)
    assert(TxTable.read(spark, t).as[(Long, Long)].collect().toSet ==
      before, "compaction is content-neutral")
    val v2 = spark.sql(s"OPTIMIZE tx.`$t` ZORDER BY (doc_id)")
      .head.getLong(0)
    assert(v2 == 4L)
    // range-clustered: each file owns a doc_id slice, so per-file
    // bounds are disjoint and a key-range read prunes files
    val s = TxTable.snapshot(t).get
    val ranges = s.files.flatMap(f => s.numRange("doc_id", f))
    assert(ranges.size == s.files.size)
    assert(ranges.sortBy(_._1).sliding(2).forall {
      case Seq((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, s"clustered files must own disjoint slices: $ranges")
    val v3 = spark.sql(s"OPTIMIZE tx.`$t` ZORDER BY (doc_id, grp)")
      .head.getLong(0)
    assert(v3 == 5L)
    assert(TxTable.read(spark, t).as[(Long, Long)].collect().toSet ==
      before)
    // both columns carry per-file stats under the Z layout
    val s2 = TxTable.snapshot(t).get
    assert(s2.files.forall(f => s2.numRange("grp", f).isDefined))
    intercept[Exception] {
      spark.sql(s"OPTIMIZE tx.`$t` ZORDER BY (a, b, c)")
    }
    // refusals fire BEFORE any data write: unknown column, and the
    // 2-D interleave on a non-integral column
    val vHead = TxTable.latestVersion(t).get
    val e1 = intercept[Exception] {
      spark.sql(s"OPTIMIZE tx.`$t` ZORDER BY (nope)")
    }
    assert(e1.getMessage.contains("nope"))
    val t2 = freshDir()
    assert(TxTable.create(docs(1L -> "a"), t2))
    val e2 = intercept[Exception] {
      spark.sql(s"OPTIMIZE tx.`$t2` ZORDER BY (doc_id, text)")
    }
    assert(e2.getMessage.contains("text"))
    assert(TxTable.latestVersion(t).contains(vHead) &&
      TxTable.latestVersion(t2).contains(1L),
      "refused OPTIMIZE must commit nothing")
  }

  test("CREATE TABLE tx with a column DEFAULT is refused (the " +
      "manifest schema cannot carry it)") {
    val t = freshDir() + "/dflt"
    intercept[Exception] {
      spark.sql(s"CREATE TABLE tx.`$t` " +
        "(doc_id BIGINT, lang STRING DEFAULT 'en')")
    }
    assert(TxTable.latestVersion(t).isEmpty)
  }

  test("CREATE INDEX / REFRESH INDEX drive a maintained index " +
      "entirely from SQL, share the Scala API's exactly-once " +
      "ledger, infer the fold from the index schema, and refuse " +
      "clearly") {
    import graft.operators.{Bm25, IncrementalIndex}
    val (c, i) = (freshDir(), freshDir())
    assert(TxTable.create(docs(1L -> "a b", 2L -> "b c"), c))
    // birth: v1; IF NOT EXISTS no-ops; plain re-create refuses
    assert(spark.sql(s"CREATE INDEX tx.`$i` ON tx.`$c` USING BM25")
      .head.getLong(0) == 1L)
    assert(spark.sql(
      s"CREATE INDEX IF NOT EXISTS tx.`$i` ON tx.`$c` USING BM25")
      .head.getLong(0) == 1L)
    intercept[Exception] {
      spark.sql(s"CREATE INDEX tx.`$i` ON tx.`$c` USING BM25")
    }
    def rebuilt() = Bm25.postings(
      TxTable.read(spark, c).select("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect().toSet
    def maintained() = TxTable.read(spark, i)
      .select("doc_id", "term", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().toSet
    // first refresh folds the create; the index equals a rebuild
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
      .head.getLong(1) == 1L)
    assert(maintained() == rebuilt())
    // churn (append + delete): refresh folds exactly the unapplied
    // tail, then a re-refresh folds nothing
    TxTable.append(docs(3L -> "c d"), c)            // v2
    TxTable.delete(spark, c, col("doc_id") === 1L)  // v3
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
      .head.getLong(1) == 2L)
    assert(maintained() == rebuilt())
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
      .head.getLong(1) == 0L)
    // SHARED ledger: a Scala-API apply makes the SQL refresh no-op
    TxTable.append(docs(4L -> "d e"), c)            // v4
    IncrementalIndex.applyBm25(spark, c, i, 4L)
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
      .head.getLong(1) == 0L)
    assert(maintained() == rebuilt())
    // TO VERSION pins the fold mid-history
    TxTable.append(docs(5L -> "e f"), c)            // v5
    TxTable.append(docs(6L -> "f g"), c)            // v6
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c` TO VERSION 5")
      .head.getLong(1) == 1L)
    assert(!maintained().exists(_._1 == 6L))
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
      .head.getLong(1) == 1L)
    assert(maintained() == rebuilt())
    // fold INFERRED from the index's own schema: a MinHash index
    // refreshes with no USING clause
    val m = freshDir()
    spark.sql(s"CREATE INDEX tx.`$m` ON tx.`$c` USING MINHASH")
    spark.sql(s"REFRESH INDEX tx.`$m` ON tx.`$c`")
    assert(TxTable.read(spark, m)
      .select("doc_id", "band_idx", "band_hash")
      .as[(Long, Int, Long)].collect().toSet ==
      IncrementalIndex.minhashBandRows(
        TxTable.read(spark, c).select("doc_id", "text"))
        .select("doc_id", "band_idx", "band_hash")
        .as[(Long, Int, Long)].collect().toSet,
      "SQL-refreshed MinHash index must equal the batch fold")
    // refusals, each with the table state unharmed
    intercept[Exception] { // unknown method
      spark.sql(s"CREATE INDEX tx.`${freshDir()}` ON tx.`$c` " +
        "USING BTREE")
    }
    intercept[Exception] { // IVF needs its pinned quantizer table
      spark.sql(s"CREATE INDEX tx.`${freshDir()}` ON tx.`$c` USING IVF")
    }
    intercept[Exception] { // PQ needs CODEBOOKS too
      spark.sql(s"CREATE INDEX tx.`${freshDir()}` ON tx.`$c` " +
        s"USING PQ CENTROIDS tx.`${freshDir()}`")
    }
    intercept[Exception] { // refreshing a non-index table
      spark.sql(s"REFRESH INDEX tx.`$c` ON tx.`$c`")
    }
    intercept[Exception] { // beyond the corpus head
      spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c` TO VERSION 99")
    }
    intercept[Exception] { // malformed but claimed: no ON clause
      spark.sql(s"CREATE INDEX tx.`$i` USING BM25")
    }
    assert(maintained() == rebuilt(),
      "refused statements must not perturb the index")
  }

  test("REFRESH INDEX ... NETTED absorbs the whole unapplied range " +
      "as ONE index commit, reports the source versions folded, " +
      "composes with TO VERSION, and hands back to per-version " +
      "refresh cleanly") {
    import graft.operators.Bm25
    val (c, i) = (freshDir(), freshDir())
    assert(TxTable.create(docs(1L -> "a b", 2L -> "b c"), c))
    spark.sql(s"CREATE INDEX tx.`$i` ON tx.`$c` USING BM25")
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
      .head.getLong(1) == 1L)                          // folds v1
    def rebuiltNow() = Bm25.postings(
      TxTable.read(spark, c).select("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect().toSet
    def maintained() = TxTable.read(spark, i)
      .select("doc_id", "term", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().toSet
    // a retraction-shaped backlog: append, update, delete
    TxTable.append(docs(3L -> "c d"), c)               // v2
    TxTable.merge(spark, c, docs(2L -> "b c UP"))      // v3
    assert(TxTable.delete(spark, c, col("doc_id") === 1L) == 4L)
    val idxV = TxTable.latestVersion(i).get
    val r = spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c` NETTED").head
    assert(r.getLong(1) == 3L,
      "NETTED must report the 3 source versions absorbed")
    assert(TxTable.latestVersion(i).contains(idxV + 1L),
      "the whole backlog must land as ONE index commit")
    assert(maintained() == rebuiltNow())
    // nothing left: a re-NETTED refresh folds zero
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c` NETTED")
      .head.getLong(1) == 0L)
    // TO VERSION pins the netted catch-up mid-history; plain
    // per-version refresh continues on top of the netted jump
    TxTable.append(docs(5L -> "e f"), c)               // v5
    TxTable.append(docs(6L -> "f g"), c)               // v6
    assert(spark.sql(
      s"REFRESH INDEX tx.`$i` ON tx.`$c` TO VERSION 5 NETTED")
      .head.getLong(1) == 1L)
    assert(!maintained().exists(_._1 == 6L))
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
      .head.getLong(1) == 1L)
    assert(maintained() == rebuiltNow())
    // a netted refresh pinned BELOW the ledger's high-water is an
    // idempotent nothing (the per-version empty-chunk behavior),
    // not an argument error
    assert(spark.sql(
      s"REFRESH INDEX tx.`$i` ON tx.`$c` TO VERSION 2 NETTED")
      .head.getLong(1) == 0L)
    assert(maintained() == rebuiltNow())
  }

  test("SHOW/DESCRIBE/DROP INDEX + START/STOP MAINTAIN: discovery, " +
      "lag arithmetic, live-maintainer refusals, and clean " +
      "retirement — the whole operational lifecycle from SQL") {
    import graft.streaming.StreamingIndexMaintain
    val (c, i) = (freshDir(), freshDir())
    assert(TxTable.create(docs(1L -> "a b", 2L -> "b c"), c))
    spark.sql(s"CREATE INDEX tx.`$i` ON tx.`$c` USING BM25")
    // discovery: the index appears with its method and ledger appId,
    // lag = 1 (created, nothing folded yet against the v1 corpus)
    val shown = spark.sql(s"SHOW INDEXES ON tx.`$c`").collect()
    assert(shown.length == 1)
    assert(shown.head.getString(1) == "BM25")
    assert(shown.head.getString(2) == "graft_bm25_index")
    assert(shown.head.getLong(5) == 1L, "unfolded create must lag 1")
    spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
    assert(spark.sql(s"DESCRIBE INDEX tx.`$i`").head().getLong(5) == 0L,
      "refreshed index must lag 0")
    // a corpus with no registered indexes yields zero rows
    val bare = freshDir()
    assert(TxTable.create(docs(9L -> "z"), bare))
    assert(spark.sql(s"SHOW INDEXES ON tx.`$bare`").count() == 0L)
    // DESCRIBE of a Scala-born (unregistered) index refuses clearly
    val scalaBorn = freshDir()
    graft.operators.IncrementalIndex.initBm25(spark, scalaBorn)
    val e1 = intercept[Exception] {
      spark.sql(s"DESCRIBE INDEX tx.`$scalaBorn`").collect()
    }
    assert(e1.getMessage.contains("_meta"))
    // DROP refusals: missing without IF EXISTS; 0 under IF EXISTS
    intercept[Exception] {
      spark.sql(s"DROP INDEX tx.`${freshDir()}`").collect()
    }
    assert(spark.sql(s"DROP INDEX IF EXISTS tx.`${freshDir()}`")
      .head().getLong(0) == 0L)
    // live maintainer: START through SQL, second START refuses,
    // DROP refuses while live, STOP is counted and idempotent,
    // then DROP succeeds and unregisters
    val ckpt = freshDir()
    assert(spark.sql(s"START MAINTAIN INDEX tx.`$i` ON tx.`$c` " +
      s"CHECKPOINT '$ckpt'").head().getString(0) == "graft_bm25_index")
    val q = StreamingIndexMaintain.liveMaintainers(i)
    assert(q.map(_._1) == Seq("graft_bm25_index"))
    intercept[Exception] {
      spark.sql(s"START MAINTAIN INDEX tx.`$i` ON tx.`$c` " +
        s"CHECKPOINT '${freshDir()}'").collect()
    }
    val e2 = intercept[Exception] {
      spark.sql(s"DROP INDEX tx.`$i`").collect()
    }
    assert(e2.getMessage.contains("STOP MAINTAIN"))
    // the maintainer actually maintains: the commit it tails folds
    TxTable.append(docs(3L -> "c d"), c)
    q.head._2.processAllAvailable()
    assert(spark.sql(s"DESCRIBE INDEX tx.`$i`").head().getLong(5) == 0L,
      "live maintainer must fold the appended commit to lag 0")
    assert(spark.sql(s"STOP MAINTAIN INDEX tx.`$i`")
      .head().getLong(0) == 1L)
    assert(spark.sql(s"STOP MAINTAIN INDEX tx.`$i`")
      .head().getLong(0) == 0L, "stop is idempotent")
    assert(spark.sql(s"DROP INDEX tx.`$i`").head().getLong(0) == 1L)
    assert(!Files.exists(Paths.get(i)), "drop must delete the tree")
    assert(spark.sql(s"SHOW INDEXES ON tx.`$c`").count() == 0L,
      "drop must unregister from the corpus registry")
    // START MAINTAIN on a missing index refuses with the runbook
    val e3 = intercept[Exception] {
      spark.sql(s"START MAINTAIN INDEX tx.`${freshDir()}` " +
        s"ON tx.`$c` CHECKPOINT '${freshDir()}'").collect()
    }
    assert(e3.getMessage.contains("CREATE INDEX first"))
  }

  test("REFRESH INDEX catch-up spans a schema-evolution commit: the " +
      "chunked feed unions evolving schemas instead of throwing") {
    import graft.operators.Bm25
    val (c, i) = (freshDir(), freshDir())
    assert(TxTable.create(docs(1L -> "a b", 2L -> "b c"), c))     // v1
    TxTable.append(docs(3L -> "c d"), c)                          // v2
    // v3 widens the corpus schema; v4 appends under the NEW schema —
    // a catch-up range [1..4] now unions feeds of different widths
    spark.sql(s"ALTER TABLE tx.`$c` ADD COLUMNS (lang STRING)")   // v3
    spark.sql(s"INSERT INTO tx.`$c` BY NAME " +
      "SELECT 4 AS doc_id, 'd e' AS text, 'en' AS lang")          // v4
    spark.sql(s"CREATE INDEX tx.`$i` ON tx.`$c` USING BM25")
    assert(spark.sql(s"REFRESH INDEX tx.`$i` ON tx.`$c`")
      .head.getLong(1) == 4L,
      "all four versions fold through one catch-up")
    assert(TxTable.read(spark, i)
      .select("doc_id", "term", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().toSet ==
      Bm25.postings(TxTable.read(spark, c).select("doc_id", "text"))
        .as[(Long, String, Long, Long)].collect().toSet,
      "the evolved-range catch-up must equal the rebuild")
    // NETTED across the same evolved range: changes() reads every
    // file at the TO schema (pre-evolution rows null-fill), so the
    // one-commit catch-up crosses the ALTER just as the chunked
    // per-version path does
    val n = freshDir()
    spark.sql(s"CREATE INDEX tx.`$n` ON tx.`$c` USING BM25")
    assert(spark.sql(s"REFRESH INDEX tx.`$n` ON tx.`$c` NETTED")
      .head.getLong(1) == 4L)
    assert(TxTable.read(spark, n)
      .select("doc_id", "term", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().toSet ==
      TxTable.read(spark, i)
        .select("doc_id", "term", "tf", "dl")
        .as[(Long, String, Long, Long)].collect().toSet,
      "the netted evolved-range catch-up must equal the chunked one")
  }
}
