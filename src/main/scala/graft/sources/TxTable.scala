package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Snapshot-isolated transactional table on parquet — the commit-log
  * storage layer under the corpus refresh. The reference keeps its
  * table state in a single-writer SQLite log
  * (kinesis-to-humio.py:48-68); this is the same idea generalized to
  * the shape a 100 TB corpus team needs the first time two refresh
  * jobs race: a VERSIONED MANIFEST log with atomic swap, optimistic
  * concurrency, time travel, and compaction (the Delta/Iceberg
  * architecture, reduced to its load-bearing core).
  *
  * Layout under the table root:
  * {{{
  *   _txlog/v00000001.json     one immutable manifest per version:
  *   _txlog/v00000002.json     {version, op, schema DDL, data files}
  *   data/<uuid>/part-*.parquet  immutable data files
  * }}}
  *
  * == Atomicity & isolation ==
  * A manifest is written to a temp file and published with
  * `Files.createLink` — hard-link creation is ATOMIC and FAILS if
  * the target exists, so exactly one writer wins each version slot
  * (compare-and-swap on the version number) and a reader can never
  * observe a half-written manifest. Readers resolve the newest
  * manifest once and read ONLY the files it lists: concurrent
  * commits are invisible until their manifest lands (snapshot
  * isolation), and any version's manifest replays forever (time
  * travel — manifests and data files are immutable).
  *
  * Losers REBASE: an append re-targets the new head (append sets
  * commute, data files are reused verbatim); a merge re-RUNS against
  * the new snapshot (copy-on-write — its stale files become orphan
  * garbage for [[vacuum]]); compaction simply aborts (pure
  * maintenance — never worth contending with real writers).
  *
  * == Crash safety ==
  * Data files land BEFORE the manifest that references them. A
  * writer that dies mid-job leaves orphan files no manifest points
  * to — readers never see them, and [[vacuum]] deletes them. There
  * is no partial-commit state to repair.
  *
  * == Scale mapping ==
  * Manifests are O(files) metadata, never data-sized; the data path
  * is ordinary distributed parquet IO. Data files are written
  * REPARTITIONED BY HASH OF THE MERGE KEY into `buckets` tasks
  * (each commit's files align with the [[graft.sinks
  * .CuratedCorpusSink]] bucket layout), so a downstream merge/join
  * on the key starts from key-clustered files. On an object store
  * the `createLink` CAS maps to a conditional PUT (S3
  * If-None-Match) or a commit-coordinator row — same protocol, same
  * manifest format.
  */
object TxTable {

  /** One resolved table version: the manifest's file list, absolute
    * paths. `files` empty means an empty (but existing) table. */
  case class Snapshot(version: Long, op: String, schemaDdl: String,
                      files: Seq[String])

  /** Thrown when `retries` successive CAS attempts all lose — the
    * caller is contending with a pathological writer storm and must
    * decide itself whether to keep trying. */
  final class CommitContentionException(msg: String)
      extends RuntimeException(msg)

  private def logDir(table: String): Path = Paths.get(table, "_txlog")

  /** Directory listing as a materialized Seq, with the underlying
    * stream CLOSED — `Files.list`/`walk` hold an open fd until
    * closed, and a long-lived library JVM must not leak one per
    * metadata operation. */
  private def listed(p: Path): Seq[Path] = {
    val st = Files.list(p)
    try st.iterator().asScala.toSeq finally st.close()
  }

  private def walked(p: Path): Seq[Path] = {
    val st = Files.walk(p)
    try st.iterator().asScala.toSeq finally st.close()
  }

  private def manifestPath(table: String, v: Long): Path =
    logDir(table).resolve(f"v$v%08d.json")

  /** Newest committed version, if the table exists. */
  def latestVersion(table: String): Option[Long] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) None
    else {
      val vs = listed(dir)
        .map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d{8}\\.json") =>
          s.substring(1, 9).toLong }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  // Manifest JSON is written and parsed by this object only; data
  // file paths are generated (uuid + parquet part names) and the
  // schema is Spark DDL — neither contains characters needing JSON
  // escaping beyond the quote check enforced at write time. `txn`
  // is the streaming exactly-once record: (appId, batchId) of the
  // committing writer (the Delta txn-action pattern) — a replayed
  // micro-batch finds its batchId already committed and no-ops.
  private def renderManifest(v: Long, op: String, schemaDdl: String,
                             files: Seq[String],
                             txn: Option[(String, Long)] = None): String = {
    require(!(schemaDdl + files.mkString + txn.map(_._1).getOrElse(""))
      .contains('"'),
      "manifest fields must not contain raw quotes")
    val fs = files.sorted.map(f => s""""$f"""").mkString("[", ",", "]")
    val tx = txn.map { case (app, b) =>
      s""","txn":{"app":"$app","batch":$b}""" }.getOrElse("")
    s"""{"version":$v,"op":"$op","schema":"$schemaDdl","files":$fs$tx}"""
  }

  private val fileRe = """"([^"]+)"""".r

  /** The snapshot at `version` (default: newest). None if the table
    * (or that version) does not exist. */
  def snapshot(table: String, version: Option[Long] = None)
      : Option[Snapshot] =
    version.orElse(latestVersion(table)).flatMap { v =>
      val p = manifestPath(table, v)
      if (!Files.exists(p)) None
      else {
        val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        val op = """"op":"([^"]*)"""".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
        val ddl = """"schema":"([^"]*)"""".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
        // scan ONLY inside the files array — fields after its closing
        // bracket (the txn record) must not parse as file paths
        val files = txt.indexOf(""""files":[""") match {
          case -1 => Seq.empty[String]
          case i =>
            val close = txt.indexOf(']', i)
            fileRe.findAllMatchIn(txt.substring(i + 9, close))
              .map(_.group(1)).toSeq
        }
        Some(Snapshot(v, op, ddl, files.map(f =>
          Paths.get(table).resolve(f).toString)))
      }
    }

  /** Read a snapshot as a DataFrame — `version = None` reads the
    * newest; a pinned version is time travel. The schema always
    * comes from the manifest, so an empty snapshot still reads with
    * the table's schema. */
  def read(spark: SparkSession, table: String,
           version: Option[Long] = None): DataFrame = {
    val s = snapshot(table, version).getOrElse(
      throw new IllegalArgumentException(
        s"no such table/version: $table @ $version"))
    val schema = StructType.fromDDL(s.schemaDdl)
    if (s.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(s.files: _*)
  }

  /** Atomic CAS publish of version `v`: true iff this writer won the
    * slot. */
  private def publish(table: String, v: Long, op: String,
                      schemaDdl: String, files: Seq[String],
                      txn: Option[(String, Long)] = None): Boolean = {
    Files.createDirectories(logDir(table))
    val tmp = logDir(table).resolve(
      s"tmp-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp,
      renderManifest(v, op, schemaDdl, files, txn)
        .getBytes(StandardCharsets.UTF_8))
    try { Files.createLink(manifestPath(table, v), tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  /** Highest batch id `appId` has ever committed to `table`, scanning
    * the manifest log (O(versions) metadata reads — manifests are
    * tiny; a production variant carries the per-app high-water mark
    * forward in each manifest). */
  def lastCommittedBatch(table: String, appId: String): Option[Long] = {
    val re = (""""txn":\{"app":"""" + java.util.regex.Pattern.quote(appId) +
      """","batch":(\d+)\}""").r
    val vs = (1L to latestVersion(table).getOrElse(0L)).flatMap { v =>
      val p = manifestPath(table, v)
      if (!Files.exists(p)) None
      else re.findFirstMatchIn(
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
        .map(_.group(1).toLong)
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** EXACTLY-ONCE streaming append: commit `df` as (`appId`,
    * `batchId`) unless that batch (or a later one) is already in the
    * log — the replay a restarted Structured Streaming query issues
    * for its last in-flight micro-batch finds the txn recorded and
    * NO-OPS instead of duplicating rows (the S13 idempotence
    * contract, upgraded from partition-overwrite to a transactional
    * commit). Concurrent writers with OTHER appIds interleave safely
    * via the normal append rebase. Returns the committed (or
    * already-present) version. */
  def appendOnce(df: DataFrame, table: String, appId: String,
                 batchId: Long, bucketKey: String = "doc_id",
                 buckets: Int = 4, retries: Int = 20): Long = {
    if (lastCommittedBatch(table, appId).exists(_ >= batchId))
      return latestVersion(table).getOrElse(0L)
    val files = writeData(df, table, bucketKey, buckets)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"appendOnce to missing table $table"))
      // re-check inside the loop: a CAS loss may mean OUR batch
      // landed from a racing attempt of the same restarted query
      if (lastCommittedBatch(table, appId).exists(_ >= batchId))
        return head.version
      val headRel = head.files.map(f =>
        Paths.get(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "append", head.schemaDdl,
          headRel ++ files, Some((appId, batchId))))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"appendOnce lost $retries CAS rounds on $table")
  }

  /** Write `df`'s rows as immutable data files under `data/<uuid>/`,
    * repartitioned by hash of `bucketKey` into `buckets` tasks (the
    * bucketed-sink alignment), and return their table-relative
    * paths. No manifest is touched — the files are invisible until a
    * commit references them. */
  private def writeData(df: DataFrame, table: String, bucketKey: String,
                        buckets: Int): Seq[String] = {
    val sub = s"data/${java.util.UUID.randomUUID().toString}"
    val dir = Paths.get(table).resolve(sub)
    df.repartition(buckets, col(bucketKey))
      .write.parquet(dir.toString)
    listed(dir)
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$sub/$n")
  }

  /** Create the table at version 1 with `df`'s rows. Exactly one of
    * several racing creators wins; the rest get false (their data
    * files become vacuum-able orphans). */
  def create(df: DataFrame, table: String, bucketKey: String = "doc_id",
             buckets: Int = 4): Boolean = {
    val files = writeData(df, table, bucketKey, buckets)
    publish(table, 1L, "create", df.schema.toDDL, files)
  }

  /** Append `df`'s rows. Appends COMMUTE, so a CAS loss just
    * re-targets the new head with the same data files. Returns the
    * committed version. */
  def append(df: DataFrame, table: String, bucketKey: String = "doc_id",
             buckets: Int = 4, retries: Int = 20): Long = {
    val files = writeData(df, table, bucketKey, buckets)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(s"append to missing table $table"))
      val rel = files // already table-relative
      val headRel = head.files.map(f =>
        Paths.get(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "append", head.schemaDdl,
          headRel ++ rel))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"append lost $retries CAS rounds on $table")
  }

  /** Append with SCHEMA EVOLUTION: columns of `df` not in the table
    * schema WIDEN it (appended in `df`'s order); columns both sides
    * share must keep their exact type (no silent coercion — a type
    * change is a rewrite, not an append). Old data files simply lack
    * the new columns and read as NULL under the widened manifest
    * schema (parquet schema reconciliation) — no data rewrite,
    * O(files) metadata cost like every commit here. Time travel
    * stays SCHEMA-PINNED: a pre-evolution version replays with its
    * own manifest's schema, the new columns absent — readers of
    * history never see columns that did not exist yet. Returns the
    * committed version. */
  def appendEvolve(df: DataFrame, table: String,
                   bucketKey: String = "doc_id", buckets: Int = 4,
                   retries: Int = 20): Long = {
    val files = writeData(df, table, bucketKey, buckets)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"appendEvolve to missing table $table"))
      val headSchema = StructType.fromDDL(head.schemaDdl)
      for (f <- df.schema.fields if headSchema.fieldNames.contains(f.name))
        require(headSchema(f.name).dataType == f.dataType,
          s"appendEvolve cannot change ${f.name}: " +
            s"${headSchema(f.name).dataType} -> ${f.dataType}")
      val widened = StructType(headSchema.fields ++
        df.schema.fields.filterNot(f =>
          headSchema.fieldNames.contains(f.name)))
      val headRel = head.files.map(f =>
        Paths.get(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "append_evolve",
          widened.toDDL, headRel ++ files))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"appendEvolve lost $retries CAS rounds on $table")
  }

  /** MERGE (upsert) `updates` into the table on `key`: matching rows
    * are replaced, new keys inserted — the q_corpus_upsert semantics
    * as a COPY-ON-WRITE transaction. A CAS loss re-RUNS the merge
    * against the new snapshot (merge does not commute with other
    * writes), abandoning the stale files to [[vacuum]]. Returns the
    * committed version.
    *
    * Scale: one co-partitioned full-outer join per attempt; both
    * sides arrive key-bucketed (this table's own layout), so on a
    * cluster with bucket-aware scans the merge exchange is free. */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
            key: String = "doc_id", buckets: Int = 4,
            retries: Int = 20): Long = {
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(s"merge into missing table $table"))
      val current = read(spark, table, Some(head.version))
      val others = current.columns.filterNot(_ == key)
      val merged = current.as("c")
        .join(updates.as("u"), Seq(key), "full_outer")
        .select(col(key) +: others.map(c =>
          coalesce(col(s"u.$c"), col(s"c.$c")).as(c)): _*)
      val files = writeData(merged, table, key, buckets)
      if (publish(table, head.version + 1, "merge", head.schemaDdl, files))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"merge lost $retries CAS rounds on $table")
  }

  /** Rewrite the current snapshot's files into `buckets` files with
    * identical logical content (small-file compaction). Pure
    * maintenance: on a CAS loss — including planning against a
    * stale pinned snapshot `at` — it ABORTS (returns None) rather
    * than contend with real writers; rerun it in the next quiet
    * window. */
  def compact(spark: SparkSession, table: String,
              bucketKey: String = "doc_id", buckets: Int = 4,
              at: Option[Snapshot] = None): Option[Long] = {
    val head = at.orElse(snapshot(table)).getOrElse(
      throw new IllegalArgumentException(s"compact of missing table $table"))
    val files = writeData(read(spark, table, Some(head.version)),
      table, bucketKey, buckets)
    if (publish(table, head.version + 1, "compact", head.schemaDdl, files))
      Some(head.version + 1)
    else None
  }

  /** Row-level CHANGE FEED between two committed versions — the CDC
    * surface an incremental downstream consumer reads instead of
    * rescanning the table (the public change-data-feed idea, derived
    * here purely from the immutable manifests: no change journal, no
    * tombstones, nothing extra written at commit time).
    *
    * The FILE-set diff bounds the work: only files touched between
    * the versions are read. Inside the touched files a multiset ROW
    * diff (EXCEPT ALL both ways) strips copy-on-write rewrite noise
    * down to net changes:
    * {{{
    *   insert = rows(files(to) ∖ files(from))  ∖∖  rows(files(from) ∖ files(to))
    *   delete = the reverse
    * }}}
    * so an append's feed is exactly the appended rows, a MERGE's feed
    * is delete(old)+insert(new) per updated key plus plain inserts —
    * the upsert shape a downstream MERGE applies verbatim — and a
    * pure compaction cancels to an EMPTY feed (identical content,
    * different files). Versions need not be adjacent: (v1, v4) yields
    * the NET change of the whole range (intermediate rewrites cancel
    * the same way), so a consumer that fell behind catches up in one
    * read whose cost is the net file churn, not the commits missed.
    *
    * Output: the table schema plus a `_change` column
    * ("insert" | "delete").
    *
    * Scale: the general path is ONE hash shuffle of the touched-file
    * rows (a signed-count aggregation computing both EXCEPT ALL
    * directions in a single pass — not two separate excepts, which
    * would shuffle the churn twice) — a day's feed costs the day's
    * churn, never the table. The append-only case (the dominant
    * ingest shape, detected as "no files removed") short-circuits to
    * a plain scan of the new files: NO shuffle, NO aggregation. */
  def changes(spark: SparkSession, table: String,
              fromVersion: Long, toVersion: Long): DataFrame = {
    require(0L <= fromVersion && fromVersion <= toVersion,
      s"changes requires 0 <= fromVersion <= toVersion " +
        s"($fromVersion, $toVersion)")
    def snap(v: Long) = snapshot(table, Some(v)).getOrElse(
      throw new IllegalArgumentException(s"no such version: $table @ $v"))
    val to = snap(toVersion)
    // version 0 = the empty table, so the CREATE commit's feed is
    // pure inserts — lets a consumer tail a table from birth
    val from =
      if (fromVersion == 0L) Snapshot(0L, "empty", to.schemaDdl, Nil)
      else snap(fromVersion)
    val schema = StructType.fromDDL(to.schemaDdl)
    def readFiles(fs: Seq[String]): DataFrame =
      if (fs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(fs: _*)
    val fromSet = from.files.toSet
    val toSet = to.files.toSet
    val addedFiles = to.files.filterNot(fromSet)
    val removedFiles = from.files.filterNot(toSet)
    val fields = schema.fieldNames.toSeq
    val reserved = Seq("_change", "_sign", "_n", "_dup").filter(
      fields.contains)
    require(reserved.isEmpty,
      s"table columns collide with change-feed internals: $reserved")
    if (removedFiles.isEmpty)
      // append-only fast path (also covers the v -> v identity):
      // every added row IS an insert — plain scan, no shuffle
      readFiles(addedFiles).withColumn("_change", lit("insert"))
    else if (addedFiles.isEmpty)
      // pure retention shrink: every removed row is a delete
      readFiles(removedFiles).withColumn("_change", lit("delete"))
    else {
      // copy-on-write rewrite: net multiset count per distinct row
      // (+1 per added copy, -1 per removed copy) in ONE aggregation;
      // positive nets emit that many inserts, negative that many
      // deletes — bit-identical to the EXCEPT ALL pair, half the
      // shuffles. Zero nets (carried rows) vanish here, which is
      // the whole point: rewrite noise never leaves the aggregate.
      readFiles(addedFiles).withColumn("_sign", lit(1L))
        .unionByName(readFiles(removedFiles).withColumn("_sign", lit(-1L)))
        .groupBy(fields.map(col): _*)
        .agg(sum(col("_sign")).as("_n"))
        .filter(col("_n") =!= 0L)
        .select(fields.map(col) :+
          when(col("_n") > 0, "insert").otherwise("delete").as("_change") :+
          explode(expr("sequence(1, cast(abs(_n) AS int))")).as("_dup"): _*)
        .drop("_dup")
    }
  }

  /** Delete orphan data files referenced by NO manifest (crashed or
    * CAS-losing writers). Time travel keeps every COMMITTED file
    * alive — only never-committed garbage goes. */
  def vacuum(table: String): Int = {
    val dataDir = Paths.get(table).resolve("data")
    if (!Files.isDirectory(dataDir)) return 0
    val live: Set[String] = (1L to latestVersion(table).getOrElse(0L))
      .flatMap(v => snapshot(table, Some(v)).toSeq.flatMap(_.files))
      .map(Paths.get(_).toAbsolutePath.toString).toSet
    var removed = 0
    walked(dataDir).reverse.foreach { p =>
      if (Files.isRegularFile(p) &&
          !live.contains(p.toAbsolutePath.toString)) {
        Files.delete(p); removed += 1
      } else if (Files.isDirectory(p) && listed(p).isEmpty) {
        Files.delete(p)
      }
    }
    removed
  }
}
