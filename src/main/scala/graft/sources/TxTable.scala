package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, DecimalType,
  DoubleType, FloatType, IntegerType, LongType, StructField,
  StructType, TimestampType}

/** Snapshot-isolated transactional table on parquet — the commit-log
  * storage layer under the corpus refresh. The reference keeps its
  * table state in a single-writer SQLite log
  * (kinesis-to-humio.py:48-68); this is the same idea generalized to
  * the shape a 100 TB corpus team needs the first time two refresh
  * jobs race: a VERSIONED MANIFEST log with atomic swap, optimistic
  * concurrency, time travel, row-level delete, retention, and
  * compaction (the Delta/Iceberg architecture, reduced to its
  * load-bearing core).
  *
  * Layout under the table root:
  * {{{
  *   _txlog/v00000001.json     one immutable manifest per version:
  *   _txlog/v00000002.json     {version, op, schema DDL, data files,
  *   _txlog/_head                per-app txn high-water map}
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
  * isolation), and any retained version's manifest replays forever
  * (time travel — manifests and data files are immutable).
  *
  * Losers REBASE: an append re-targets the new head (append sets
  * commute, data files are reused verbatim); a merge or delete
  * re-RUNS against the new snapshot (copy-on-write — stale files
  * become orphan garbage for [[vacuum]]); compaction simply aborts
  * (pure maintenance — never worth contending with real writers).
  *
  * == Crash safety ==
  * Data files land BEFORE the manifest that references them. A
  * writer that dies mid-job leaves orphan files no manifest points
  * to — readers never see them, and [[vacuum]] deletes them. There
  * is no partial-commit state to repair. As a belt-and-suspenders
  * against a mis-configured vacuum racing an in-flight writer,
  * [[publish]] re-verifies every referenced data file exists
  * immediately before the CAS and fails LOUDLY instead of
  * committing a manifest that points at missing files.
  *
  * == Head resolution ==
  * `_txlog/_head` is a monotone HINT (best-effort atomic replace
  * after each successful publish): readers jump to the hinted
  * version and probe forward until the first missing manifest —
  * O(1 + publish lag) instead of listing the whole log, which at
  * one commit per streaming micro-batch (S24) grows without bound.
  * The hint is never trusted blindly: a missing or stale hint falls
  * back to a full listing, so resolution is ALWAYS equivalent to
  * the listing (proven by TxTableSpec).
  *
  * == Exactly-once txn records ==
  * Every manifest carries the full per-app `{appId -> highest
  * batchId}` map, folded forward commit over commit, so
  * [[lastCommittedBatch]] reads ONLY the head manifest (O(1), not
  * O(versions) — a long-lived streaming sink would otherwise pay
  * O(V²) metadata reads over its lifetime). CONTRACT: an appId must
  * commit nondecreasing batch ids (Structured Streaming guarantees
  * this for its micro-batch ids); a batchId at or below the
  * high-water mark is treated as a REPLAY and no-ops — out-of-order
  * ids from a non-streaming caller would be silently dropped, which
  * is why the contract is stated here and asserted in scaladoc
  * rather than loosened to exact membership (which would require
  * unbounded per-batch state).
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

  /** One resolved table version: the manifest's file list (absolute
    * paths; empty means an empty but existing table) plus the
    * carried-forward per-app txn high-water map, the commit wall
    * time (`tsMillis`, 0 for pre-upgrade manifests — used only by
    * [[versionAsOf]], never by content gates), and per-file
    * per-file column statistics. `stats` holds integral `[min, max]`
    * keyed by (column, absolute file path); `strStats` the string
    * `[min, max]` the same way; `rowCounts` per-file row counts
    * (absent for pre-upgrade files). Column "" is the LEGACY
    * wildcard: pre-multi-column manifests recorded stats under the
    * bare file path (implicitly the write's bucket key) — readers
    * fall back to it via [[Snapshot.numRange]]. Files without stats
    * are simply absent — readers must treat absence as "cannot
    * prune". `hasTxnsMap` records whether the manifest carried the
    * POST-UPGRADE full `"txns":{...}` map (true) or only a legacy
    * single-commit record / nothing (false) — the bit
    * [[carriedTxns]] and [[lastCommittedBatch]] key their upgrade
    * handling on. */
  case class Snapshot(version: Long, op: String, schemaDdl: String,
                      files: Seq[String],
                      txns: Map[String, Long] = Map.empty,
                      tsMillis: Long = 0L,
                      stats: Map[(String, String), (Long, Long)] =
                        Map.empty,
                      hasTxnsMap: Boolean = false,
                      strStats: Map[(String, String), (String, String)] =
                        Map.empty,
                      rowCounts: Map[String, Long] = Map.empty) {
    /** Integral `[min,max]` of `c` in `absFile`, falling back to the
      * legacy wildcard-column entry. */
    def numRange(c: String, absFile: String): Option[(Long, Long)] =
      stats.get((c, absFile)).orElse(stats.get(("", absFile)))
    /** String `[min,max]` of `c` in `absFile`. */
    def strRange(c: String, absFile: String): Option[(String, String)] =
      strStats.get((c, absFile))
    /** Exact row count of the snapshot, when EVERY file carries one
      * (post-upgrade commits always record counts; a None means some
      * file predates them and the caller must count the data). O(1)
      * metadata — what a consumer sizes capacity-bound state (e.g.
      * the S26 Bloom prescreen) from without scanning the table. */
    def totalRows: Option[Long] =
      if (files.forall(rowCounts.contains))
        Some(files.map(rowCounts).sum)
      else None
  }

  /** Per-file statistics of one commit's files, keyed by (column,
    * TABLE-RELATIVE path) — the write-side twin of the [[Snapshot]]
    * maps (which re-key to absolute paths for readers). */
  case class FileStats(
      num: Map[(String, String), (Long, Long)] = Map.empty,
      str: Map[(String, String), (String, String)] = Map.empty,
      rows: Map[String, Long] = Map.empty) {
    def ++(o: FileStats): FileStats =
      FileStats(num ++ o.num, str ++ o.str, rows ++ o.rows)
  }

  /** Thrown when `retries` successive CAS attempts all lose — the
    * caller is contending with a pathological writer storm and must
    * decide itself whether to keep trying. */
  final class CommitContentionException(msg: String)
      extends RuntimeException(msg)

  /** Counts from a retention [[vacuum]] run. */
  case class VacuumStats(expiredManifests: Int, removedDataFiles: Int)

  /** The table root, normalized to an ABSOLUTE path once — every
    * relativize/containment comparison below runs against this, so a
    * caller-supplied RELATIVE table path (a perfectly reasonable way
    * to address a local working table) cannot trip
    * `Path.relativize`'s absolute-vs-relative IllegalArgumentException
    * in the stats pass or delete's touched-file matching. */
  private def root(table: String): Path =
    Paths.get(table).toAbsolutePath.normalize()

  private def logDir(table: String): Path = root(table).resolve("_txlog")

  private def headHintPath(table: String): Path =
    logDir(table).resolve("_head")

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

  // v00000001.json .. with 8+ digits: the %08d format grows past 8
  // digits at version 10^8 instead of wrapping, and this pattern
  // keeps accepting it — no silent format cliff where new commits
  // become invisible to readers.
  private val manifestNameRe = """v(\d{8,})\.json""".r

  private def listedVersions(table: String): Seq[Long] =
    listed(logDir(table)).map(_.getFileName.toString).collect {
      case manifestNameRe(d) => d.toLong
    }

  /** Newest committed version, if the table exists. O(1 + publish
    * lag) via the `_head` hint when present; a full `_txlog` listing
    * otherwise (and whenever the hint is stale past a vacuumed
    * manifest) — both resolutions are equivalent by construction
    * because the hint is only ever written AFTER its manifest. */
  def latestVersion(table: String): Option[Long] = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return None
    val hinted: Option[Long] = {
      val hp = headHintPath(table)
      if (!Files.exists(hp)) None
      else scala.util.Try(new String(Files.readAllBytes(hp),
        StandardCharsets.UTF_8).trim.toLong).toOption
        .filter(v => v >= 1L && Files.exists(manifestPath(table, v)))
    }
    hinted match {
      case Some(h) =>
        // probe forward: the hint is monotone but may lag the last
        // few publishes (best-effort update, racing writers)
        var v = h
        while (Files.exists(manifestPath(table, v + 1))) v += 1
        Some(v)
      case None =>
        val vs = listedVersions(table)
        if (vs.isEmpty) None else Some(vs.max)
    }
  }

  // Manifest JSON is written and parsed by this object only; data
  // file paths are generated (uuid + parquet part names) and the
  // schema is Spark DDL — neither contains characters needing JSON
  // escaping beyond the quote check enforced at write time. `txns`
  // is the streaming exactly-once record: the full per-app
  // high-water batch map, carried forward in EVERY manifest so the
  // head alone answers [[lastCommittedBatch]].
  // field ORDER is load-bearing for the regex parser: the files
  // array must close before any other '['-bearing field (stats /
  // sstats values), and txns/stats/sstats/nrows each end at the
  // first '}' after their opener (their entries hold no nested
  // braces). Stat keys are "col|relfile" — the legacy wildcard
  // column renders as the bare file path (round-tripping pre-upgrade
  // entries unchanged).
  private def statKey(k: (String, String)): String =
    if (k._1.isEmpty) k._2 else s"${k._1}|${k._2}"

  private def renderManifest(v: Long, op: String, schemaDdl: String,
                             files: Seq[String],
                             txns: Map[String, Long],
                             tsMillis: Long,
                             stats: FileStats): String = {
    require(!(schemaDdl + files.mkString + txns.keys.mkString +
        stats.num.keys.map(statKey).mkString +
        stats.str.keys.map(statKey).mkString +
        stats.str.values.map(p => p._1 + p._2).mkString +
        stats.rows.keys.mkString).contains('"'),
      "manifest fields must not contain raw quotes")
    val fs = files.sorted.map(f => s""""$f"""").mkString("[", ",", "]")
    val tx =
      if (txns.isEmpty) ""
      else txns.toSeq.sortBy(_._1)
        .map { case (app, b) => s""""$app":$b""" }
        .mkString(""","txns":{""", ",", "}")
    val st =
      if (stats.num.isEmpty) ""
      else stats.num.toSeq.sortBy(p => statKey(p._1))
        .map { case (k, (lo, hi)) => s""""${statKey(k)}":[$lo,$hi]""" }
        .mkString(""","stats":{""", ",", "}")
    val ss =
      if (stats.str.isEmpty) ""
      else stats.str.toSeq.sortBy(p => statKey(p._1))
        .map { case (k, (lo, hi)) =>
          s""""${statKey(k)}":["$lo","$hi"]""" }
        .mkString(""","sstats":{""", ",", "}")
    val nr =
      if (stats.rows.isEmpty) ""
      else stats.rows.toSeq.sortBy(_._1)
        .map { case (f, n) => s""""$f":$n""" }
        .mkString(""","nrows":{""", ",", "}")
    s"""{"version":$v,"op":"$op","schema":"$schemaDdl",""" +
      s""""files":$fs$tx,"ts":$tsMillis$st$ss$nr}"""
  }

  private val fileRe = """"([^"]+)"""".r
  private val txnsEntryRe = """"([^"]+)":(\d+)""".r
  private val statsEntryRe = """"([^"]+)":\[(-?\d+),(-?\d+)\]""".r
  private val strStatsEntryRe = """"([^"]+)":\["([^"]*)","([^"]*)"\]""".r

  // "col|relfile" -> (col, relfile); a bare path (no '|') is a legacy
  // wildcard-column entry — see Snapshot scaladoc
  private def splitStatKey(k: String): (String, String) =
    k.indexOf('|') match {
      case -1 => ("", k)
      case i => (k.substring(0, i), k.substring(i + 1))
    }
  // pre-round-11 manifests carried a single {"app":...,"batch":...}
  // record per commit; parse it too so existing tables keep their
  // exactly-once guarantee across the format upgrade
  private val legacyTxnRe =
    """"txn":\{"app":"([^"]+)","batch":(\d+)\}""".r

  /** The snapshot at `version` (default: newest). None if the table
    * (or that version) does not exist — a RETENTION-EXPIRED version
    * reads as absent, so a pinned reader of expired history fails
    * cleanly instead of resolving a half-vacuumed file set. */
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
        // bracket (the txns map) must not parse as file paths
        val files = txt.indexOf(""""files":[""") match {
          case -1 => Seq.empty[String]
          case i =>
            val close = txt.indexOf(']', i)
            fileRe.findAllMatchIn(txt.substring(i + 9, close))
              .map(_.group(1)).toSeq
        }
        val hasMap = txt.contains(""""txns":{""")
        val txns: Map[String, Long] = txt.indexOf(""""txns":{""") match {
          case -1 =>
            legacyTxnRe.findFirstMatchIn(txt)
              .map(m => Map(m.group(1) -> m.group(2).toLong))
              .getOrElse(Map.empty)
          case i =>
            val close = txt.indexOf('}', i)
            txnsEntryRe.findAllMatchIn(txt.substring(i + 8, close))
              .map(m => m.group(1) -> m.group(2).toLong).toMap
        }
        val ts = """"ts":(\d+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toLong).getOrElse(0L)
        def mapBody(field: String): Option[String] =
          txt.indexOf(s""""$field":{""") match {
            case -1 => None
            case i =>
              val open = i + field.length + 4
              Some(txt.substring(open, txt.indexOf('}', open)))
          }
        def absKey(k: String): (String, String) = {
          val (c, f) = splitStatKey(k)
          (c, root(table).resolve(f).toString)
        }
        val stats: Map[(String, String), (Long, Long)] =
          mapBody("stats").map(b => statsEntryRe.findAllMatchIn(b)
            .map(m => absKey(m.group(1)) ->
              (m.group(2).toLong, m.group(3).toLong)).toMap)
            .getOrElse(Map.empty)
        val strStats: Map[(String, String), (String, String)] =
          mapBody("sstats").map(b => strStatsEntryRe.findAllMatchIn(b)
            .map(m => absKey(m.group(1)) -> (m.group(2), m.group(3)))
            .toMap).getOrElse(Map.empty)
        val rowCounts: Map[String, Long] =
          mapBody("nrows").map(b => txnsEntryRe.findAllMatchIn(b)
            .map(m => root(table).resolve(m.group(1)).toString ->
              m.group(2).toLong).toMap).getOrElse(Map.empty)
        Some(Snapshot(v, op, ddl, files.map(f =>
          root(table).resolve(f).toString), txns, ts, stats, hasMap,
          strStats, rowCounts))
      }
    }

  /** Read a snapshot as a DataFrame — `version = None` reads the
    * newest; a pinned version is time travel. The schema always
    * comes from the manifest, so an empty snapshot still reads with
    * the table's schema — and after a type-widening
    * [[appendEvolve]], pre-widening files read UP to the manifest
    * type through parquet's widening reconciliation (int32 under a
    * bigint schema, float under double — native in the Spark 4
    * readers, both vectorized and row paths). */
  def read(spark: SparkSession, table: String,
           version: Option[Long] = None): DataFrame = {
    val s = snapshot(table, version).getOrElse(
      throw new IllegalArgumentException(
        s"no such table/version (missing or retention-expired): " +
          s"$table @ $version"))
    val schema = StructType.fromDDL(s.schemaDdl)
    if (s.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(s.files: _*)
  }

  /** The active commit-protocol primitives ([[TxCommitStore]] — the
    * object-store seam). Module-level and swappable so the stress
    * suite can drive the SAME protocol through a fault-injecting
    * store; production code never touches it. */
  @volatile private[sources] var commitStore: TxCommitStore =
    LocalFsCommitStore

  /** Run `f` with `store` as the commit-protocol implementation —
    * the test hook the fault-injection suite uses. Restores the
    * previous store afterwards. NOT for concurrent use with writers
    * on OTHER stores (module-level swap). */
  private[sources] def withCommitStore[T](store: TxCommitStore)(f: => T)
      : T = {
    val prev = commitStore
    commitStore = store
    try f finally commitStore = prev
  }

  /** Atomic CAS publish of version `v`: true iff this writer won the
    * slot — [[TxCommitStore.putIfAbsent]] on the manifest path (the
    * ONLY atomicity-bearing write in the protocol, with the `_head`
    * hint's best-effort replace). Before the CAS, every referenced
    * data file's existence is re-verified so a writer whose files
    * were wrongly vacuumed while it sat in the retry loop fails
    * loudly instead of committing a permanently unreadable snapshot.
    * On a win, the `_head` hint is refreshed best-effort (losers and
    * laggards are harmless — readers probe forward and never trust a
    * stale hint). */
  private def publish(table: String, v: Long, op: String,
                      schemaDdl: String, files: Seq[String],
                      txns: Map[String, Long],
                      stats: FileStats = FileStats())
      : Boolean = {
    val missing = files.filterNot(f =>
      Files.exists(root(table).resolve(f)))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"refusing to commit $table v$v: ${missing.size} referenced " +
          s"data files are missing (vacuumed under an in-flight " +
          s"writer? first: ${missing.head}) — run vacuum with a " +
          "grace window longer than the slowest writer's commit")
    Files.createDirectories(logDir(table))
    val won = commitStore.putIfAbsent(manifestPath(table, v),
      renderManifest(v, op, schemaDdl, files, txns,
        System.currentTimeMillis(), stats)
        .getBytes(StandardCharsets.UTF_8))
    if (won) {
      // best-effort monotone hint: a concurrent slower writer may
      // re-publish a smaller v afterwards; readers probe forward so
      // a regressed hint only costs extra probes, never correctness
      try commitStore.replace(headHintPath(table),
        v.toString.getBytes(StandardCharsets.UTF_8))
      catch { case _: java.io.IOException => () }
    }
    won
  }

  /** The COMPLETE per-app txn high-water map as of `head` — the map
    * every commit must carry forward. INVARIANT: any manifest bearing
    * a `"txns":{...}` map holds the complete retained history at its
    * commit time, because every publisher here carries THIS map
    * forward. The first commit onto a PRE-UPGRADE head (no map — only
    * per-commit legacy `"txn":{...}` records, and plain appends with
    * nothing at all) therefore seeds by folding ALL retained
    * manifests' records, max per app — a one-time O(versions) scan
    * that re-establishes the O(1) head read for everything after.
    * Seeding from `head.txns` alone would DROP legacy records below
    * a record-less head and break exactly-once across the upgrade
    * (a replayed legacy batch would commit twice). */
  private def carriedTxns(table: String, head: Snapshot)
      : Map[String, Long] = {
    if (head.hasTxnsMap) return head.txns
    var acc = Map.empty[String, Long]
    var v = head.version
    while (v >= 1L) {
      snapshot(table, Some(v)) match {
        case None => return acc // older history retention-expired
        case Some(s) =>
          s.txns.foreach { case (app, b) =>
            if (acc.getOrElse(app, Long.MinValue) < b) acc += app -> b
          }
          // a map-bearing manifest is complete by the invariant —
          // records below it are already folded into it
          if (s.hasTxnsMap) return acc
      }
      v -= 1L
    }
    acc
  }

  /** Highest batch id `appId` has ever committed to `table`. O(1):
    * the head manifest carries the full per-app high-water map
    * (complete by the [[carriedTxns]] invariant — the first
    * post-upgrade commit seeds it from the whole retained legacy
    * history, so stopping at a map-bearing manifest never hides a
    * legacy record below it). For tables whose head predates the
    * carried map, falls back to a newest-first scan over the legacy
    * records down to the retention horizon. */
  def lastCommittedBatch(table: String, appId: String): Option[Long] = {
    snapshot(table).flatMap(h => carriedTxns(table, h).get(appId))
  }

  /** A snapshot's stats re-keyed to table-relative paths (the form
    * manifests store), restricted to `keep` when given — the
    * carry-forward step every commit that retains head files runs. */
  private def relStats(table: String, s: Snapshot,
                       keep: Option[Set[String]] = None): FileStats = {
    def rel(abs: String): String =
      root(table).relativize(Paths.get(abs)).toString
    val kept: String => Boolean =
      keep.map(k => (f: String) => k(f)).getOrElse(_ => true)
    FileStats(
      s.stats.map { case ((c, f), mm) => (c, rel(f)) -> mm }
        .filter { case ((_, f), _) => kept(f) },
      s.strStats.map { case ((c, f), mm) => (c, rel(f)) -> mm }
        .filter { case ((_, f), _) => kept(f) },
      s.rowCounts.map { case (f, n) => rel(f) -> n }
        .filter { case (f, _) => kept(f) })
  }

  /** EXACTLY-ONCE streaming append: commit `df` as (`appId`,
    * `batchId`) unless that batch (or a later one) is already in the
    * log — the replay a restarted Structured Streaming query issues
    * for its last in-flight micro-batch finds the txn recorded and
    * NO-OPS instead of duplicating rows (the S13 idempotence
    * contract, upgraded from partition-overwrite to a transactional
    * commit). Concurrent writers with OTHER appIds interleave safely
    * via the normal append rebase. Returns the committed (or
    * already-present) version.
    *
    * CONTRACT: each appId must commit NONDECREASING batch ids —
    * exactly what Structured Streaming's micro-batch ids guarantee.
    * The replay check is a high-water comparison (the Delta
    * txn-action semantics): a batchId at or below the recorded
    * high-water is treated as an already-committed replay and
    * no-ops. A caller that genuinely commits out of order would have
    * its low batch dropped as a "replay" — do not use this entry
    * point outside a monotone-batch protocol. */
  def appendOnce(df: DataFrame, table: String, appId: String,
                 batchId: Long, bucketKey: String = "doc_id",
                 buckets: Int = 4, retries: Int = 20): Long = {
    if (lastCommittedBatch(table, appId).exists(_ >= batchId))
      return latestVersion(table).getOrElse(0L)
    val (files, newStats) = writeData(df, table, bucketKey, buckets)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"appendOnce to missing table $table"))
      // re-check against the head we are about to rebase onto: a CAS
      // loss may mean OUR batch landed from a racing attempt of the
      // same restarted query (O(1) — the head carries the txn map;
      // carriedTxns also seeds the first commit onto a pre-upgrade
      // head from the full retained legacy history)
      val carried = carriedTxns(table, head)
      if (carried.get(appId).exists(_ >= batchId))
        return head.version
      val headRel = head.files.map(f =>
        root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "append", head.schemaDdl,
          headRel ++ files, carried + (appId -> batchId),
          relStats(table, head) ++ newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"appendOnce lost $retries CAS rounds on $table")
  }

  /** `key` as the Long its manifest stats are recorded in: integral
    * columns cast (the int/long-width-agnostic delete discipline);
    * DATE as epoch DAYS (parquet's int32 physical — exactly what
    * [[footerStats]]' Number fold yields); TIMESTAMP as epoch MICROS
    * (int64 physical — [[writeData]] pins TIMESTAMP_MICROS so the
    * footer carries stats; INT96 carries none). Comparing these
    * longs against `numRange` bounds is therefore exact.
    * DECIMAL(p ≤ 18, s) as the UNSCALED long (value·10^s) — parquet
    * writes such decimals as int32/int64 physical whose footer stats
    * ARE the unscaled values, so the comparison is again exact. The
    * multiplier uses the TABLE's scale `s`, so a keys frame whose
    * own decimal scale differs still yields table-scale unscaled
    * longs (any key equal to a stored value is exactly representable
    * at table scale, so its bound is exact; a non-representable key
    * truncates toward zero, which only leaves bounds covering every
    * representable key — pruning stays conservative). */
  private def statLong(key: Column, t: DataType): Column = t match {
    case DateType => unix_date(key).cast("long")
    case TimestampType => unix_micros(key)
    case d: DecimalType =>
      // 10^s as an exact scale-0 decimal literal: (p,s)·(s+1,0) →
      // precision ≤ 18+19+1 = 38, no precision-loss rounding
      (key * lit(new java.math.BigDecimal(
        java.math.BigInteger.TEN.pow(d.scale)))).cast("long")
    case _ => key.cast("long")
  }

  /** Stats-eligible "numeric" types: recorded as Long `[min,max]`
    * per file. Date/Timestamp ride the same path via their physical
    * int32/int64 encodings (see [[statLong]]) — the single most
    * common clustering key in log pipelines is event time, and it
    * must prune. DECIMAL up to precision 18 rides it as the unscaled
    * long (int32/int64 physical — the money columns of any
    * TPC-H-shaped or financial corpus); precision > 18 is
    * FIXED_LEN_BYTE_ARRAY physical and stays conservatively
    * unstated. */
  private def statsAsLong(t: DataType): Boolean = t match {
    case IntegerType | LongType | DateType | TimestampType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  /** True iff a string STAT BOUND is safe to embed in a manifest:
    * short (bounds are metadata, not payload) and free of the
    * characters the quote-free JSON renderer refuses. An unsafe
    * bound just drops its entry — readers treat absence as "cannot
    * prune", so correctness never depends on a stat existing. */
  private def safeStrBound(v: String): Boolean =
    v != null && v.length <= 64 &&
      !v.exists(c => c == '"' || c == '\\' || c == '|' || c < ' ')

  /** Write `df`'s rows as immutable data files under `data/<uuid>/`
    * and return their table-relative paths plus per-file statistics:
    * row counts (always), and `[min,max]` of every `statsCols`
    * column that is integral, DATE, or TIMESTAMP (long bounds — epoch
    * days/micros, see [[statLong]]) or string (truncation-free
    * bounds, skipped when unsafe to embed — see [[safeStrBound]]) —
    * the stats that enable MANIFEST-LEVEL file skipping in
    * [[readKeyRange]]/[[readKeyRangeString]]. Layout:
    * hash-repartitioned by the bucket key (the bucketed-sink
    * alignment); RANGE-CLUSTERED + sorted on the key when
    * `rangeCluster`; or range-clustered + sorted on an arbitrary
    * `clusterBy` expression (the Z-ORDER layout path — cluster on
    * the interleaved key, collect stats on the source columns) —
    * the layouts that make stats selective (a hash bucket spans the
    * whole key range; a cluster owns a slice). Statistics come
    * STRAIGHT FROM THE PARQUET FOOTERS the write just produced (the
    * Iceberg/Delta write-time stats pattern): min/max/row-count per
    * file folded over the footer's row-group column chunks — NO
    * second Spark job re-reading the data. At one commit per
    * streaming micro-batch the per-commit job floor is what bounds
    * sink latency; footers are O(files) driver-side metadata reads
    * of files the page cache is still hot on. No manifest is
    * touched — the files are invisible until a commit references
    * them. */
  /** Pin `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS`
    * around a TxTable data-file write and restore the caller's value
    * after. Spark's default is INT96 — a deprecated non-standard
    * physical type whose parquet footers carry NO statistics, which
    * would silently disable manifest pruning on every
    * timestamp-keyed corpus. Micros-int64 is the standard lakehouse
    * encoding (Delta/Iceberg write the same). Depth-counted so
    * concurrent TxTable writers on one session never restore the
    * conf out from under each other's in-flight write. */
  private val microsState = // per session: (depth, saved previous)
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      (Int, String)]
  private def withMicrosTimestamps[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.parquet.outputTimestampType"
    microsState.synchronized {
      val (depth, prev) = microsState.getOrDefault(spark,
        (0, null: String))
      if (depth == 0) {
        microsState.put(spark, (1, spark.conf.get(key)))
        spark.conf.set(key, "TIMESTAMP_MICROS")
      } else microsState.put(spark, (depth + 1, prev))
    }
    try f
    finally microsState.synchronized {
      val (depth, prev) = microsState.get(spark)
      if (depth == 1) {
        microsState.remove(spark)
        spark.conf.set(key, prev)
      } else microsState.put(spark, (depth - 1, prev))
    }
  }

  private def writeData(df: DataFrame, table: String, bucketKey: String,
                        buckets: Int, rangeCluster: Boolean = false,
                        statsCols: Seq[String] = Nil,
                        clusterBy: Option[Column] = None)
      : (Seq[String], FileStats) = {
    val sub = s"data/${java.util.UUID.randomUUID().toString}"
    val dir = root(table).resolve(sub)
    val shaped = clusterBy match {
      case Some(k) =>
        df.repartitionByRange(buckets, k).sortWithinPartitions(k)
      case None if rangeCluster =>
        df.repartitionByRange(buckets, col(bucketKey))
          .sortWithinPartitions(col(bucketKey))
      case None => df.repartition(buckets, col(bucketKey))
    }
    withMicrosTimestamps(df.sparkSession) {
      shaped.write.parquet(dir.toString)
    }
    val files = listed(dir)
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$sub/$n")
    if (files.isEmpty) return (files, FileStats())
    def typeOf(c: String): Option[DataType] =
      df.schema.fields.find(_.name == c).map(_.dataType)
    val numCols = (bucketKey +: statsCols).distinct.filter(c =>
      typeOf(c).exists(statsAsLong))
    val strCols = (bucketKey +: statsCols).distinct.filter(c =>
      typeOf(c).contains(org.apache.spark.sql.types.StringType))
    val conf = df.sparkSession.sessionState.newHadoopConf()
    var num = Map.empty[(String, String), (Long, Long)]
    var str = Map.empty[(String, String), (String, String)]
    var rows = Map.empty[String, Long]
    val nonEmpty = Seq.newBuilder[String]
    files.foreach { rel =>
      val (n, mins, maxs) = footerStats(
        conf, root(table).resolve(rel), numCols.toSet, strCols.toSet)
      // ZERO-ROW part files never enter the manifest (Spark writes
      // one for an empty frame to carry schema; manifests carry the
      // schema themselves): a no-op commit stays metadata-only and
      // the stray file is an ordinary vacuum-able orphan
      if (n > 0L) {
        nonEmpty += rel
        rows += rel -> n
        numCols.foreach { c =>
          (mins.get(c), maxs.get(c)) match {
            case (Some(lo: Long), Some(hi: Long)) =>
              num += (c, rel) -> (lo, hi)
            case _ => ()
          }
        }
        strCols.foreach { c =>
          (mins.get(c), maxs.get(c)) match {
            case (Some(lo: String), Some(hi: String))
                if safeStrBound(lo) && safeStrBound(hi) =>
              str += (c, rel) -> (lo, hi)
            case _ => ()
          }
        }
      }
    }
    (nonEmpty.result(), FileStats(num, str, rows))
  }

  /** Row count and per-column [min, max] of one just-written parquet
    * file, folded from its footer's row-group column-chunk
    * statistics. Integral columns yield Long bounds (int32 widened),
    * string columns UTF-8 String bounds — parquet's unsigned
    * byte-wise binary ordering for UTF8 matches Spark's UTF8String
    * comparison, so footer bounds equal what a `min(col)/max(col)`
    * aggregation would compute. A chunk without usable statistics
    * (dropped oversized bounds, all-null, legacy writer) drops the
    * whole column's entry — readers treat absence as "cannot prune",
    * so correctness never depends on a stat existing. */
  /** a <= b in UNSIGNED UTF-8 BYTE order — the ordering parquet's
    * UTF8 binary stats and Spark's UTF8String comparisons both use
    * (Scala's String <= is UTF-16 code-unit order, which disagrees
    * beyond the BMP). */
  private def utf8Lte(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes(StandardCharsets.UTF_8),
      b.getBytes(StandardCharsets.UTF_8))
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length <= y.length
  }

  private def footerStats(conf: org.apache.hadoop.conf.Configuration,
                          file: Path, numCols: Set[String],
                          strCols: Set[String])
      : (Long, Map[String, Any], Map[String, Any]) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      var mins = Map.empty[String, Any]
      var maxs = Map.empty[String, Any]
      var dead = Set.empty[String] // a statless chunk poisons the col
      for (b <- blocks; cc <- b.getColumns.asScala) {
        val path = cc.getPath.toDotString
        if ((numCols(path) || strCols(path)) && !dead(path)) {
          val st = cc.getStatistics
          if (st == null || st.isEmpty || !st.hasNonNullValue) {
            // all-null chunks carry no bounds but don't invalidate
            // bounds from sibling chunks; anything else unusable does
            if (st == null || !(st.isNumNullsSet && st.getNumNulls == b.getRowCount)) {
              dead += path; mins -= path; maxs -= path
            }
          } else (st.genericGetMin, st.genericGetMax) match {
            case (lo: java.lang.Number, hi: java.lang.Number)
                if numCols(path) =>
              val (l, h) = (lo.longValue(), hi.longValue())
              mins += path -> mins.get(path).map(m =>
                math.min(m.asInstanceOf[Long], l): Any).getOrElse(l)
              maxs += path -> maxs.get(path).map(m =>
                math.max(m.asInstanceOf[Long], h): Any).getOrElse(h)
            case (lo: org.apache.parquet.io.api.Binary,
                  hi: org.apache.parquet.io.api.Binary) if strCols(path) =>
              val (l, h) = (lo.toStringUsingUTF8, hi.toStringUsingUTF8)
              mins += path -> mins.get(path).map(m =>
                (if (utf8Lte(m.asInstanceOf[String], l)) m else l): Any)
                .getOrElse(l)
              maxs += path -> maxs.get(path).map(m =>
                (if (utf8Lte(h, m.asInstanceOf[String])) m else h): Any)
                .getOrElse(h)
            case _ => dead += path; mins -= path; maxs -= path
          }
        }
      }
      (rowCount, mins, maxs)
    } finally reader.close()
  }

  /** Create the table at version 1 with `df`'s rows. Exactly one of
    * several racing creators wins; the rest get false (their data
    * files become vacuum-able orphans). A SPURIOUS CAS false (the
    * store's retryable-5xx surface: nothing landed at the slot — see
    * [[TxCommitStore.putIfAbsent]]) is retried here, bounded, so
    * callers only ever see false when a competitor genuinely won. */
  def create(df: DataFrame, table: String, bucketKey: String = "doc_id",
             buckets: Int = 4, retries: Int = 20): Boolean = {
    val (files, newStats) = writeData(df, table, bucketKey, buckets)
    publishV1Retrying(table, df.schema.toDDL, files, newStats, retries)
  }

  /** Create an EMPTY table at version 1 with `schemaDdl`'s schema —
    * a pure metadata publish (no write job, no data files): the
    * zero-cost form of `create(emptyFrame, ...)` an index
    * initializer uses. Same CAS contract as [[create]], including
    * the bounded retry on spurious (nothing-landed) CAS failures. */
  def createEmpty(table: String, schemaDdl: String,
                  retries: Int = 20): Boolean =
    publishV1Retrying(table, schemaDdl, Nil, FileStats(), retries)

  /** Publish the version-1 manifest, absorbing SPURIOUS CAS
    * failures: `putIfAbsent` may return false on a retryable store
    * error with nothing landed (the contract's safe-false case), and
    * unlike `append` — which rebases onto the new head — a creator
    * has no new head to rebase onto, so it must retry the SAME slot
    * while the slot is demonstrably still empty. False only when a
    * competing creator's manifest actually exists. */
  private def publishV1Retrying(table: String, schemaDdl: String,
                                files: Seq[String], stats: FileStats,
                                retries: Int): Boolean = {
    var attempt = 0
    while (attempt < retries) {
      if (publish(table, 1L, "create", schemaDdl, files, Map.empty,
          stats))
        return true
      if (Files.exists(manifestPath(table, 1L))) return false // lost
      attempt += 1
    }
    throw new CommitContentionException(
      s"create exhausted $retries attempts on $table with the v1 " +
        "slot still empty (persistent spurious CAS failures)")
  }

  /** Append `df`'s rows. Appends COMMUTE, so a CAS loss just
    * re-targets the new head with the same data files. Returns the
    * committed version. */
  def append(df: DataFrame, table: String, bucketKey: String = "doc_id",
             buckets: Int = 4, retries: Int = 20): Long = {
    val (files, newStats) = writeData(df, table, bucketKey, buckets)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(s"append to missing table $table"))
      val headRel = head.files.map(f =>
        root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "append", head.schemaDdl,
          headRel ++ files, carriedTxns(table, head), relStats(table, head) ++ newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"append lost $retries CAS rounds on $table")
  }

  /** True iff parquet reads `from`-typed files UP to `to` natively —
    * the SAFE widenings (no precision or range loss, supported by
    * the Spark 4 vectorized and row readers alike). */
  private def widens(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }

  /** Append with SCHEMA EVOLUTION: columns of `df` not in the table
    * schema WIDEN it (appended in `df`'s order), and shared columns
    * may SAFELY WIDEN their type — int→long, float→double — with the
    * manifest schema taking the wider type and files on EITHER side
    * of the widening reading up through parquet's native type
    * promotion (no data rewrite, O(files) metadata cost like every
    * commit here). Any other type change — narrowing, string↔number,
    * nested edits — is refused: that is a rewrite, not an append.
    * Old data files simply lack brand-new columns and read as NULL
    * under the widened manifest schema. Time travel stays
    * SCHEMA-PINNED: a pre-evolution version replays with its own
    * manifest's schema — readers of history never see columns (or
    * widths) that did not exist yet. Returns the committed
    * version. */
  def appendEvolve(df: DataFrame, table: String,
                   bucketKey: String = "doc_id", buckets: Int = 4,
                   retries: Int = 20): Long = {
    val (files, newStats) = writeData(df, table, bucketKey, buckets)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"appendEvolve to missing table $table"))
      val headSchema = StructType.fromDDL(head.schemaDdl)
      val resolved = headSchema.fields.map { hf =>
        df.schema.fields.find(_.name == hf.name) match {
          case None => hf
          case Some(nf) if nf.dataType == hf.dataType => hf
          case Some(nf) if widens(hf.dataType, nf.dataType) =>
            StructField(hf.name, nf.dataType, hf.nullable || nf.nullable)
          case Some(nf) if widens(nf.dataType, hf.dataType) => hf
          case Some(nf) =>
            throw new IllegalArgumentException(
              s"appendEvolve cannot change ${hf.name}: " +
                s"${hf.dataType} -> ${nf.dataType} is not a safe " +
                "widening (int->long, float->double)")
        }
      }
      val widened = StructType(resolved ++
        df.schema.fields.filterNot(f =>
          headSchema.fieldNames.contains(f.name)))
      val headRel = head.files.map(f =>
        root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "append_evolve",
          widened.toDDL, headRel ++ files, carriedTxns(table, head),
          relStats(table, head) ++ newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"appendEvolve lost $retries CAS rounds on $table")
  }

  /** METADATA-ONLY schema evolution — the ALTER TABLE verb: append
    * `addCols` to the schema and/or SAFELY WIDEN existing columns'
    * types (int→long, float→double — parquet's native read-up
    * promotions, the [[appendEvolve]] contract without the append):
    * publishes a new manifest with the widened schema and the HEAD'S
    * OWN files — no data is read or written, O(manifest) cost, the
    * lakehouse ALTER discipline (existing files read new columns as
    * NULL and narrower numerics up through parquet type promotion).
    * Time travel stays schema-pinned: pre-evolution versions replay
    * with their own schema. Refuses duplicate adds, unknown or
    * non-widening alters. Returns the committed version. */
  def evolveSchema(table: String, addCols: Seq[StructField],
                   widenCols: Seq[(String, DataType)] = Nil,
                   retries: Int = 20): Long = {
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"evolveSchema on missing table $table"))
      val headSchema = StructType.fromDDL(head.schemaDdl)
      addCols.foreach(f => require(
        !headSchema.fieldNames.contains(f.name),
        s"ADD COLUMN ${f.name}: column already exists"))
      // addCols must also be distinct among THEMSELVES (case-
      // insensitively, matching Spark's default resolver) — a
      // duplicate pair would publish a manifest whose schema no
      // future read can resolve
      val dupAdds = addCols.groupBy(_.name.toLowerCase)
        .collect { case (n, fs) if fs.size > 1 => n }
      require(dupAdds.isEmpty,
        s"ADD COLUMNS: duplicate column name(s) ${dupAdds.mkString(", ")}")
      val widenMap = widenCols.toMap
      (widenMap.keySet -- headSchema.fieldNames.toSet).foreach(c =>
        throw new IllegalArgumentException(
          s"ALTER COLUMN $c: no such column"))
      val widened = StructType(headSchema.fields.map { hf =>
        widenMap.get(hf.name) match {
          case None => hf
          case Some(t) if t == hf.dataType => hf
          case Some(t) if widens(hf.dataType, t) =>
            StructField(hf.name, t, hf.nullable)
          case Some(t) => throw new IllegalArgumentException(
            s"ALTER COLUMN ${hf.name}: ${hf.dataType} -> $t is not a " +
              "safe widening (int->long, float->double)")
        }
      } ++ addCols)
      val headRel = head.files.map(f =>
        root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "evolve", widened.toDDL,
          headRel, carriedTxns(table, head), relStats(table, head)))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"evolveSchema lost $retries CAS rounds on $table")
  }

  /** MERGE (upsert) `updates` into the table on `key`: a matching
    * key's row is REPLACED BY THE WHOLE UPDATE ROW (a NULL in an
    * update column nulls the field out — match-marker semantics, not
    * per-column coalesce, which could never clear a value), new keys
    * are inserted — the q_corpus_upsert semantics as a COPY-ON-WRITE
    * transaction. `updates` must carry exactly the table's columns
    * and at most one row per key (duplicate keys would fan out
    * through the join; they are REJECTED up front rather than
    * resolved arbitrarily). A CAS loss re-RUNS the merge against the
    * new snapshot (merge does not commute with other writes),
    * abandoning the stale files to [[vacuum]]. Returns the committed
    * version.
    *
    * Scale: one co-partitioned full-outer join per attempt; both
    * sides arrive key-bucketed (this table's own layout), so on a
    * cluster with bucket-aware scans the merge exchange is free. The
    * duplicate-key precheck is a key-only aggregation of `updates`
    * (the small side), paid once across all attempts. */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
            key: String = "doc_id", buckets: Int = 4,
            retries: Int = 20): Long = {
    require(!updates.columns.contains("_graft_matched"),
      "updates must not carry the reserved column _graft_matched")
    val dup = updates.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1L).limit(1).collect()
    require(dup.isEmpty,
      s"merge updates carry duplicate key ${dup.headOption.map(_.get(0))}" +
        s" — one row per $key required")
    val marked = updates.withColumn("_graft_matched", lit(true))
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(s"merge into missing table $table"))
      val current = read(spark, table, Some(head.version))
      val others = current.columns.filterNot(_ == key)
      val merged = current.as("c")
        .join(marked.as("u"), Seq(key), "full_outer")
        .select(col(key) +: others.map(c =>
          when(col("_graft_matched").isNotNull, col(s"u.$c"))
            .otherwise(col(s"c.$c")).as(c)): _*)
      val (files, newStats) = writeData(merged, table, key, buckets)
      if (publish(table, head.version + 1, "merge", head.schemaDdl,
          files, carriedTxns(table, head), newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"merge lost $retries CAS rounds on $table")
  }

  /** Row-level DELETE WHERE `pred` — the takedown/compliance verb: a
    * copy-on-write rewrite of ONLY the files that contain matching
    * rows, committed as one version. Standard SQL DELETE semantics:
    * rows where `pred` is TRUE go; FALSE and NULL stay.
    *
    * File pruning is computed, not guessed: one scan WITH the
    * predicate pushed down collects the distinct matching file paths
    * (O(files) driver state — the same bound as the manifest
    * itself); untouched files carry over to the new manifest
    * verbatim, so a delete that hits 3 files out of 30 000 rewrites
    * 3. Deletes surface in [[changes]] as NET DELETE rows (the
    * carried rows of rewritten files cancel in the signed multiset
    * diff) and compose across versions like every other commit; a
    * delete matching NOTHING commits no version at all and returns
    * the current head. A CAS loss re-RUNS against the new snapshot
    * (delete does not commute with writes that may add matching
    * rows). Returns the committed (or unchanged) version. */
  def delete(spark: SparkSession, table: String, pred: Column,
             bucketKey: String = "doc_id", buckets: Int = 4,
             retries: Int = 20): Long = {
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"delete from missing table $table"))
      if (head.files.isEmpty) return head.version
      val schema = StructType.fromDDL(head.schemaDdl)
      // phase 1: which files hold matching rows? predicate pushed to
      // the scan; result bounded by the file count
      val touchedUris = spark.read.schema(schema)
        .parquet(head.files: _*)
        .filter(coalesce(pred, lit(false)))
        .select(input_file_name().as("_f")).distinct()
        .collect().map(r => new java.net.URI(r.getString(0)).getPath)
        .toSet
      val touched = head.files.filter(f =>
        touchedUris.contains(Paths.get(f).toAbsolutePath.toString))
      if (touched.isEmpty) return head.version
      // phase 2: rewrite ONLY the touched files without the matches
      val kept = spark.read.schema(schema).parquet(touched: _*)
        .filter(!coalesce(pred, lit(false)))
      val (newFiles, newStats) = writeData(kept, table, bucketKey, buckets)
      val untouchedRel = head.files.filterNot(touched.contains)
        .map(f => root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "delete", head.schemaDdl,
          untouchedRel ++ newFiles, carriedTxns(table, head),
          relStats(table, head, Some(untouchedRel.toSet)) ++ newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"delete lost $retries CAS rounds on $table")
  }

  /** Row-level UPDATE — standard SQL semantics: rows where `pred`
    * is TRUE get each `set` column replaced by its expression
    * (evaluated against the OLD row, cast to the column's declared
    * type); FALSE and NULL rows pass through untouched. A
    * copy-on-write rewrite of ONLY the files containing matching
    * rows, like [[delete]]: phase 1 collects touched files with the
    * predicate pushed to the scan (O(files) driver state), phase 2
    * rewrites them with a per-column `when(pred, value)` projection,
    * untouched files carry over verbatim. Updates surface in
    * [[changes]] as delete(old row)+insert(new row) per touched row
    * (carried rows cancel in the signed diff). A no-match update
    * commits nothing. Returns the committed (or unchanged) version.
    * Set columns must exist; assignments cannot target the table's
    * bucket key's type-unsafely (values are cast, a failing cast
    * surfaces as the scan error it is). */
  def update(spark: SparkSession, table: String, pred: Column,
             set: Seq[(String, Column)], bucketKey: String = "doc_id",
             buckets: Int = 4, retries: Int = 20): Long = {
    require(set.nonEmpty, "update requires at least one SET column")
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"update of missing table $table"))
      if (head.files.isEmpty) return head.version
      val schema = StructType.fromDDL(head.schemaDdl)
      val setMap = set.toMap
      val unknown = setMap.keySet -- schema.fieldNames.toSet
      require(unknown.isEmpty, s"update SET of unknown columns: $unknown")
      val touchedUris = spark.read.schema(schema)
        .parquet(head.files: _*)
        .filter(coalesce(pred, lit(false)))
        .select(input_file_name().as("_f")).distinct()
        .collect().map(r => new java.net.URI(r.getString(0)).getPath)
        .toSet
      val touched = head.files.filter(f =>
        touchedUris.contains(Paths.get(f).toAbsolutePath.toString))
      if (touched.isEmpty) return head.version
      val rewritten = spark.read.schema(schema).parquet(touched: _*)
        .select(schema.fields.map { fld =>
          setMap.get(fld.name) match {
            case Some(v) =>
              when(coalesce(pred, lit(false)), v.cast(fld.dataType))
                .otherwise(col(fld.name)).as(fld.name)
            case None => col(fld.name)
          }
        }.toSeq: _*)
      val (newFiles, newStats) =
        writeData(rewritten, table, bucketKey, buckets)
      val untouchedRel = head.files.filterNot(touched.contains)
        .map(f => root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "update", head.schemaDdl,
          untouchedRel ++ newFiles, carriedTxns(table, head),
          relStats(table, head, Some(untouchedRel.toSet)) ++ newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"update lost $retries CAS rounds on $table")
  }

  /** OVERWRITE the table's content with `df`'s rows in one commit
    * (the INSERT OVERWRITE verb): the new manifest references ONLY
    * the new files — previous content expires into history (still
    * time-travelable until vacuumed), the schema stays the table's
    * (df must carry exactly its columns). The change feed across an
    * overwrite nets old∖new deletes + new∖old inserts like any
    * copy-on-write commit. Returns the committed version. */
  def overwrite(df: DataFrame, table: String,
                bucketKey: String = "doc_id", buckets: Int = 4,
                retries: Int = 20): Long = {
    val head0 = snapshot(table).getOrElse(
      throw new IllegalArgumentException(
        s"overwrite of missing table $table"))
    val expect = StructType.fromDDL(head0.schemaDdl).fieldNames.toSet
    require(df.columns.toSet == expect,
      s"overwrite columns ${df.columns.toSet} != table columns $expect")
    val (files, newStats) = writeData(
      df.select(StructType.fromDDL(head0.schemaDdl).fieldNames
        .map(col).toSeq: _*), table, bucketKey, buckets)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"overwrite of missing table $table"))
      // a concurrent schema evolution between attempts would publish
      // a manifest whose schema the already-written files cannot
      // honor — fail loudly rather than commit silently-NULL columns
      if (head.schemaDdl != head0.schemaDdl)
        throw new IllegalStateException(
          s"table schema evolved under overwrite of $table — rerun " +
            "against the new schema")
      if (publish(table, head.version + 1, "overwrite", head.schemaDdl,
          files, carriedTxns(table, head), newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"overwrite lost $retries CAS rounds on $table")
  }

  /** Row-level DELETE of every row whose `key` appears in `keys` —
    * the KEY-FRAME form of [[delete]] an incremental consumer issues
    * when the keys to retract arrive as a DataFrame (a change feed's
    * deleted ids, a takedown list). Semantics: rows whose `key`
    * equals any non-NULL key in `keys` go; NULL keys match nothing
    * (SQL join semantics). Returns the committed (or unchanged)
    * version.
    *
    * Scale: `keys` is churn-sized, never table-sized — it is
    * NULL-dropped and BROADCAST (duplicates are harmless on the
    * build side of a semi/anti join, so no dedup shuffle is paid);
    * phase 1 finds touched files with a
    * semi-join under the scan (O(files) driver state, same bound as
    * the manifest), phase 2 rewrites only those files with an
    * anti-join. Nothing key-list-sized ever reaches the driver —
    * the [[delete]] predicate form would need an `isin` literal
    * list, which does. */
  def deleteKeys(spark: SparkSession, table: String, keys: DataFrame,
                 key: String = "doc_id", bucketKey: String = "doc_id",
                 buckets: Int = 4, retries: Int = 20): Long = {
    val keyFrame = keys.select(col(key)).na.drop()
    // bounds for the manifest-stats prune, paid ONCE across attempts.
    // Unlike replaceKeysOnce (whose prune arms only above 16 files),
    // deleteKeys ALWAYS arms: the takedown verb's empty-frame
    // short-circuit rides the bounds row, and this keeps the prune
    // comparator discipline (UTF-8 string order, unscaled-long
    // widening) executable on bucket-count-sized spec tables.
    // Widening/typing follows the TABLE's key type (statLong's
    // decimal contract: the table scale picks the unscaled-long
    // multiplier, whatever the caller frame's own scale), captured
    // once — a key-column TYPE change mid-retry is outside the
    // supported evolution set (int→long widening lands in the same
    // long domain).
    lazy val numBounds = {
      val t = snapshot(table)
        .map(h => StructType.fromDDL(h.schemaDdl))
        .flatMap(_.fields.find(_.name == key).map(_.dataType))
        .getOrElse(keyFrame.schema.fields.head.dataType)
      keyFrame.agg(min(statLong(col(key), t)),
        max(statLong(col(key), t))).head()
    }
    lazy val strBounds = keyFrame.agg(min(col(key)), max(col(key))).head()
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"deleteKeys from missing table $table"))
      if (head.files.isEmpty) return head.version
      val schema = StructType.fromDDL(head.schemaDdl)
      // manifest-level candidate pruning: files whose per-file
      // [min,max] stat on `key` cannot intersect the key frame's
      // bounds never reach the phase-1 scan (selective after a
      // clustered compaction; a hash-bucketed file spans the range
      // and prunes nothing). One tiny bounds aggregate on the
      // churn-sized key frame buys it; an empty frame short-circuits
      // the whole delete here.
      val keyType = schema.fields.find(_.name == key).map(_.dataType)
      val candidates: Seq[String] = keyType match {
        case Some(t) if statsAsLong(t) =>
          if (numBounds.isNullAt(0)) Nil
          else head.files.filter(f => head.numRange(key, f) match {
            case Some((lo, hi)) =>
              hi >= numBounds.getLong(0) && lo <= numBounds.getLong(1)
            case None => true
          })
        case Some(org.apache.spark.sql.types.StringType) =>
          if (strBounds.isNullAt(0)) Nil
          else head.files.filter(f => head.strRange(key, f) match {
            // bounds come from UTF-8-ordered sources (parquet footer
            // UTF8 stats; Spark min/max aggregates), so compare in
            // UTF-8 byte order — Scala String >= is UTF-16 order and
            // disagrees beyond the BMP (would wrongly prune files
            // whose stats span supplementary-plane keys)
            case Some((lo, hi)) =>
              utf8Lte(strBounds.getString(0), hi) &&
                utf8Lte(lo, strBounds.getString(1))
            case None => true
          })
        case _ => head.files
      }
      if (candidates.isEmpty) return head.version
      // input_file_name is projected BELOW the join — over the scan
      // it names, where it is unambiguous (over the join it would be
      // a multi-source error)
      val touchedUris = spark.read.schema(schema).parquet(candidates: _*)
        .select(col(key), input_file_name().as("_f"))
        .join(broadcast(keyFrame), Seq(key), "left_semi")
        .select("_f").distinct()
        .collect().map(r => new java.net.URI(r.getString(0)).getPath)
        .toSet
      val touched = candidates.filter(f =>
        touchedUris.contains(Paths.get(f).toAbsolutePath.toString))
      if (touched.isEmpty) return head.version
      val kept = spark.read.schema(schema).parquet(touched: _*)
        .join(broadcast(keyFrame), Seq(key), "left_anti")
        .select(schema.fieldNames.map(col).toSeq: _*)
      val (newFiles, newStats) = writeData(kept, table, bucketKey, buckets)
      val untouchedRel = head.files.filterNot(touched.contains)
        .map(f => root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "delete", head.schemaDdl,
          untouchedRel ++ newFiles, carriedTxns(table, head),
          relStats(table, head, Some(untouchedRel.toSet)) ++ newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"deleteKeys lost $retries CAS rounds on $table")
  }

  /** EXACTLY-ONCE single-commit RETRACT + APPEND — the atomic fold an
    * incremental index maintainer applies per source version: delete
    * every row whose `key` appears in `keys` AND append `newRows`, as
    * ONE manifest under the (`appId`, `batchId`) txn record. Readers
    * (head or time travel) can never observe the torn middle state a
    * separate delete-then-append pair exposes (touched docs' rows
    * absent entirely); a crash replays the WHOLE fold or none of it,
    * and the ledger guard no-ops the replay once the single commit
    * has landed. Semantics = [[deleteKeys]] ∘ [[appendOnce]] fused:
    * `keys` NULL-dropped and broadcast (duplicates are harmless on
    * the build side of a semi/anti join, so no dedup shuffle is
    * paid), touched files found
    * with the manifest-stats prune + pushed semi-join, kept rows and
    * `newRows` written together in one churn-sized write. A batchId
    * at or below the app's high-water no-ops (the nondecreasing-
    * batch contract of [[appendOnce]]). Always commits a version —
    * even a content-empty fold (no touches, no inserts) lands a
    * metadata-only manifest so the txn high-water advances and the
    * index keeps one version per source version. Returns the index
    * version after the fold.
    *
    * `keys` is consumed up to three times (bounds, touched-file
    * semi-join, rewrite anti-join): pass an already-materialized
    * frame (a localCheckpointed change feed — what
    * [[graft.operators.IncrementalIndex.applyMany]] provides) when
    * its lineage is expensive to recompute. */
  def replaceKeysOnce(spark: SparkSession, table: String, keys: DataFrame,
                      newRows: DataFrame, appId: String, batchId: Long,
                      key: String = "doc_id", bucketKey: String = "doc_id",
                      buckets: Int = 4, retries: Int = 20): Long = {
    if (lastCommittedBatch(table, appId).exists(_ >= batchId))
      return latestVersion(table).getOrElse(0L)
    val keyFrame = keys.select(col(key)).na.drop()
    // bounds for the manifest-stats prune, paid ONCE across attempts
    // — and ONLY when the head has enough files for manifest pruning
    // to beat the job it costs (at 100 TB / 100k files the prune is
    // the whole point; on a bucket-count-sized table every file is a
    // candidate anyway and the bounds job is pure overhead). Numeric
    // keys as widened longs in the TABLE key type's domain
    // (deleteKeys' cast discipline — the keys frame's own int/long
    // width or decimal scale must not matter), string keys as-is.
    lazy val numBounds = {
      val t = snapshot(table)
        .map(h => StructType.fromDDL(h.schemaDdl))
        .flatMap(_.fields.find(_.name == key).map(_.dataType))
        .getOrElse(keyFrame.schema.fields.head.dataType)
      keyFrame.agg(min(statLong(col(key), t)),
        max(statLong(col(key), t))).head()
    }
    lazy val strBounds = keyFrame.agg(min(col(key)), max(col(key))).head()
    val pruneWorthwhile = snapshot(table).exists(_.files.size > 16)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"replaceKeysOnce on missing table $table"))
      val carried = carriedTxns(table, head)
      if (carried.get(appId).exists(_ >= batchId)) return head.version
      val schema = StructType.fromDDL(head.schemaDdl)
      val keyType = schema.fields.find(_.name == key).map(_.dataType)
      // manifest-stats candidate prune, as in deleteKeys
      val candidates: Seq[String] = keyType match {
        case _ if !pruneWorthwhile => head.files
        case Some(t) if statsAsLong(t) =>
          if (numBounds.isNullAt(0)) Nil
          else head.files.filter(f => head.numRange(key, f) match {
            case Some((mn, mx)) =>
              mx >= numBounds.getLong(0) && mn <= numBounds.getLong(1)
            case None => true
          })
        case Some(org.apache.spark.sql.types.StringType) =>
          if (strBounds.isNullAt(0)) Nil
          else head.files.filter(f => head.strRange(key, f) match {
            // UTF-8 byte order, matching the bounds' own ordering
            // (see deleteKeys) — String >= would mis-prune non-BMP
            case Some((mn, mx)) =>
              utf8Lte(strBounds.getString(0), mx) &&
                utf8Lte(mn, strBounds.getString(1))
            case None => true
          })
        case _ => head.files
      }
      val touched: Seq[String] =
        if (candidates.isEmpty) Nil
        else {
          val uris = spark.read.schema(schema).parquet(candidates: _*)
            .select(col(key), input_file_name().as("_f"))
            .join(broadcast(keyFrame), Seq(key), "left_semi")
            .select("_f").distinct()
            .collect().map(r => new java.net.URI(r.getString(0)).getPath)
            .toSet
          candidates.filter(f =>
            uris.contains(Paths.get(f).toAbsolutePath.toString))
        }
      val kept =
        if (touched.isEmpty) None
        else Some(spark.read.schema(schema).parquet(touched: _*)
          .join(broadcast(keyFrame), Seq(key), "left_anti")
          .select(schema.fieldNames.map(col).toSeq: _*))
      val toWrite = kept match {
        case Some(k) => k.unionByName(
          newRows.select(schema.fieldNames.map(col).toSeq: _*))
        case None => newRows.select(schema.fieldNames.map(col).toSeq: _*)
      }
      val (newFiles, newStats) = writeData(toWrite, table, bucketKey, buckets)
      val untouchedRel = head.files.filterNot(touched.contains)
        .map(f => root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "replace", head.schemaDdl,
          untouchedRel ++ newFiles, carried + (appId -> batchId),
          relStats(table, head, Some(untouchedRel.toSet)) ++ newStats))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"replaceKeysOnce lost $retries CAS rounds on $table")
  }

  /** Rewrite the current snapshot's files into `buckets` files with
    * identical logical content (small-file compaction). Pure
    * maintenance: on a CAS loss — including planning against a
    * stale pinned snapshot `at` — it ABORTS (returns None) rather
    * than contend with real writers; rerun it in the next quiet
    * window.
    *
    * `rangeCluster = true` is CLUSTERED compaction: files come out
    * RANGE-partitioned and sorted on `bucketKey` instead of
    * hash-bucketed, so each file owns a key slice and the manifest's
    * per-file `[min,max]` stats turn selective — [[readKeyRange]]
    * then skips whole files at the MANIFEST level (a hash bucket
    * spans the full range; stats on it prune nothing). Same
    * content-neutrality contract either way.
    *
    * `clusterBy` generalizes the clustered layout to an ARBITRARY
    * sort expression — pass a [[graft.functions.ZOrder]] interleave
    * of two columns and name them in `statsCols`, and each file owns
    * a Z-curve slice whose per-COLUMN `[min,max]` manifest stats
    * stay tight on BOTH dimensions (the OPTIMIZE ZORDER layout): a
    * 2-D range read via [[readKeyRanges]] then prunes at the
    * manifest on both predicates. `statsCols` adds per-file stats
    * for extra columns (integral or string) on any layout. */
  def compact(spark: SparkSession, table: String,
              bucketKey: String = "doc_id", buckets: Int = 4,
              at: Option[Snapshot] = None,
              rangeCluster: Boolean = false,
              clusterBy: Option[Column] = None,
              statsCols: Seq[String] = Nil): Option[Long] = {
    val head = at.orElse(snapshot(table)).getOrElse(
      throw new IllegalArgumentException(s"compact of missing table $table"))
    val (files, newStats) = writeData(read(spark, table, Some(head.version)),
      table, bucketKey, buckets, rangeCluster, statsCols, clusterBy)
    if (publish(table, head.version + 1, "compact", head.schemaDdl,
        files, carriedTxns(table, head), newStats))
      Some(head.version + 1)
    else None
  }

  /** RESTORE the table to the content of `toVersion` — the undo verb
    * (a bad delete, a botched merge): publishes a NEW head whose file
    * list, schema and stats are `toVersion`'s, REUSING its immutable
    * data files verbatim (no data is written — O(manifest) cost).
    * History is preserved, not rewritten: the bad commits stay
    * replayable between `toVersion` and the restore, the restore is
    * itself one more commit, and [[changes]] across it nets to
    * exactly the rows the bad commits touched (an undone delete's
    * feed is pure re-inserts). Txn state does NOT roll back — the
    * head's per-app high-water map carries forward, so streaming
    * exactly-once survives a restore. `toVersion` must still be
    * retained (an expired version fails cleanly). A CAS loss re-runs
    * against the new head (restore does not commute with concurrent
    * writes — last restore wins, like any transaction). Returns the
    * committed version. */
  def restore(spark: SparkSession, table: String, toVersion: Long,
              retries: Int = 20): Long = {
    val target = snapshot(table, Some(toVersion)).getOrElse(
      throw new IllegalArgumentException(
        s"restore target missing or retention-expired: " +
          s"$table @ $toVersion"))
    val targetRel = target.files.map(f =>
      root(table).relativize(Paths.get(f)).toString)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"restore of missing table $table"))
      if (publish(table, head.version + 1, "restore", target.schemaDdl,
          targetRel, carriedTxns(table, head),
          relStats(table, target)))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"restore lost $retries CAS rounds on $table")
  }

  /** Newest version committed at or before `tsMillis` wall time —
    * timestamp time travel ("the table as of last midnight"). Commit
    * times are the writers' clocks (monotone only as far as the
    * fleet's clocks are — the usual lakehouse caveat; version pins
    * are the precise form). Scans retained manifests newest-first
    * and returns the first old-enough one; pre-upgrade manifests
    * (no ts field) count as time 0. None if every retained version
    * is newer. */
  def versionAsOf(table: String, tsMillis: Long): Option[Long] = {
    var v = latestVersion(table).getOrElse(return None)
    while (v >= 1L) {
      snapshot(table, Some(v)) match {
        case None => return None // older history retention-expired
        case Some(s) if s.tsMillis <= tsMillis => return Some(v)
        case _ => v -= 1L
      }
    }
    None
  }

  /** Read rows with `bucketKey` in `[lo, hi]`, skipping every data
    * file whose manifest `[min,max]` stats prove it disjoint from
    * the range — MANIFEST-LEVEL file pruning: at 100 TB / 100k files
    * this is the difference between opening 100k parquet footers and
    * reading one manifest (row-group stats only help AFTER a file is
    * opened). Selectivity needs a range-clustered layout
    * ([[compact]] with `rangeCluster = true`); on hash-bucketed
    * files every file spans the whole range and nothing prunes —
    * same answer, no skipping. Files WITHOUT stats (non-integral
    * keys, pre-stats manifests) are conservatively read. Always
    * equivalent to `read(...).filter(key between lo hi)`. */
  def readKeyRange(spark: SparkSession, table: String, bucketKey: String,
                   lo: Long, hi: Long,
                   version: Option[Long] = None): DataFrame =
    readKeyRanges(spark, table, Map(bucketKey -> (lo, hi)), version)

  /** Multi-column form of [[readKeyRange]]: rows satisfying EVERY
    * `col BETWEEN lo AND hi` in `ranges` (numeric/date/timestamp/
    * decimal bounds as their stat longs — see [[statLong]]) AND
    * every `col BETWEEN lo AND hi` in `strRanges` (string bounds,
    * compared in UTF-8 byte order like [[readKeyRangeString]]),
    * skipping each file any ONE column's manifest `[min,max]` proves
    * disjoint (per-file pruning predicates AND together, so pruning
    * power compounds across dimensions — selective on a Z-ordered
    * layout, where every file is tight on every clustered column;
    * see [[compact]]'s `clusterBy`; a (string id, time) Z-order is
    * the common corpus layout, and both dims must prune). Files
    * without stats on a column are conservatively kept. Always
    * equivalent to `read(...).filter(all ranges)`. */
  def readKeyRanges(spark: SparkSession, table: String,
                    ranges: Map[String, (Long, Long)],
                    version: Option[Long] = None,
                    strRanges: Map[String, (String, String)] =
                      Map.empty): DataFrame = {
    val s = snapshot(table, version).getOrElse(
      throw new IllegalArgumentException(
        s"no such table/version (missing or retention-expired): " +
          s"$table @ $version"))
    val schema = StructType.fromDDL(s.schemaDdl)
    val kept = s.files.filter(f => ranges.forall { case (c, (lo, hi)) =>
      s.numRange(c, f) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    } && strRanges.forall { case (c, (lo, hi)) =>
      s.strRange(c, f) match {
        // UTF-8 byte order — footer UTF8 stats and Spark UTF8String
        // comparisons agree there; UTF-16 String <= does not (BMP)
        case Some((mn, mx)) => utf8Lte(lo, mx) && utf8Lte(mn, hi)
        case None => true
      }
    })
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(kept: _*)
    val numFiltered = ranges.foldLeft(base) { case (df, (c, (lo, hi))) =>
      // residual filter in the column's OWN type: date/timestamp
      // ranges arrive as their stat longs (epoch days / micros —
      // see statLong), and Spark has no date/timestamp↔numeric
      // implicit comparison
      val (l, h) = schema.fields.find(_.name == c).map(_.dataType) match {
        case Some(DateType) =>
          (date_from_unix_date(lit(lo.toInt)),
            date_from_unix_date(lit(hi.toInt)))
        case Some(TimestampType) =>
          (timestamp_micros(lit(lo)), timestamp_micros(lit(hi)))
        case Some(d: DecimalType) =>
          // decimal ranges arrive as UNSCALED longs at the column's
          // scale (see statLong); rebuild the exact decimal bound —
          // BigDecimal(unscaled, s) is lo·10^-s with no rounding
          (lit(new java.math.BigDecimal(
            java.math.BigInteger.valueOf(lo), d.scale)),
            lit(new java.math.BigDecimal(
              java.math.BigInteger.valueOf(hi), d.scale)))
        case _ => (lit(lo), lit(hi))
      }
      df.filter(col(c).between(l, h))
    }
    strRanges.foldLeft(numFiltered) { case (df, (c, (lo, hi))) =>
      df.filter(col(c).between(lit(lo), lit(hi)))
    }
  }

  /** [[readKeyRange]] for a STRING key (doc ids are strings in most
    * real corpora): rows with `key` in `[lo, hi]` lexicographically,
    * skipping every file whose manifest string `[min,max]` proves it
    * disjoint. Selectivity needs a range-clustered layout on the key
    * (the stats exist on any layout — string bounds are recorded at
    * write time like integral ones, minus the rare unsafe-to-embed
    * bound, which conservatively reads). Always equivalent to
    * `read(...).filter(key between lo hi)`. The single-string form
    * of [[readKeyRanges]] — one prune path, one set of ordering
    * rules (UTF-8 byte order: the stats are UTF-8-ordered parquet
    * UTF8 binary bounds and the residual filter compares in Spark's
    * UTF8String order — UTF-16 String >= would silently drop
    * in-range files when bounds cross the BMP boundary). */
  def readKeyRangeString(spark: SparkSession, table: String, key: String,
                         lo: String, hi: String,
                         version: Option[Long] = None): DataFrame =
    readKeyRanges(spark, table, Map.empty, version,
      strRanges = Map(key -> (lo, hi)))

  /** True iff the (fromVersion → toVersion) transition REMOVED no
    * data files — pure metadata (two manifest reads): the feed over
    * such a transition is guaranteed pure inserts (the
    * [[changes]] append-only fast path), so an incremental consumer
    * can skip its retract phase without scanning anything. Version 0
    * is the empty table (a CREATE transition is append-only). */
  def appendOnlyTransition(table: String, fromVersion: Long,
                           toVersion: Long): Boolean = {
    if (fromVersion == 0L) return true
    val from = snapshot(table, Some(fromVersion)).getOrElse(
      throw new IllegalArgumentException(
        s"no such version: $table @ $fromVersion"))
    val to = snapshot(table, Some(toVersion)).getOrElse(
      throw new IllegalArgumentException(
        s"no such version: $table @ $toVersion"))
    val toSet = to.files.toSet
    from.files.forall(toSet)
  }

  /** EXACTLY-ONCE metadata-only commit: record (`appId`, `batchId`)
    * in the txn high-water map WITHOUT touching content — the verb
    * an incremental consumer uses to mark a NO-OP source transition
    * (a compaction's net-zero feed) as applied, keeping one index
    * version per source version at zero Spark jobs. Same
    * nondecreasing-batch contract as [[appendOnce]]. Returns the
    * committed (or already-present) version. */
  def recordBatchOnce(table: String, appId: String, batchId: Long,
                      retries: Int = 20): Long = {
    if (lastCommittedBatch(table, appId).exists(_ >= batchId))
      return latestVersion(table).getOrElse(0L)
    var attempt = 0
    while (attempt < retries) {
      val head = snapshot(table).getOrElse(
        throw new IllegalArgumentException(
          s"recordBatchOnce on missing table $table"))
      val carried = carriedTxns(table, head)
      if (carried.get(appId).exists(_ >= batchId)) return head.version
      val headRel = head.files.map(f =>
        root(table).relativize(Paths.get(f)).toString)
      if (publish(table, head.version + 1, "record", head.schemaDdl,
          headRel, carried + (appId -> batchId), relStats(table, head)))
        return head.version + 1
      attempt += 1
    }
    throw new CommitContentionException(
      s"recordBatchOnce lost $retries CAS rounds on $table")
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
    * is delete(old)+insert(new) per updated key plus plain inserts,
    * a row-level DELETE's feed is exactly the net deleted rows (the
    * rewritten files' kept rows cancel) — the upsert shape a
    * downstream MERGE applies verbatim — and a pure compaction
    * cancels to an EMPTY feed (identical content, different files).
    * Versions need not be adjacent: (v1, v4) yields the NET change
    * of the whole range (intermediate rewrites cancel the same way),
    * so a consumer that fell behind catches up in one read whose
    * cost is the net file churn, not the commits missed.
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

  /** Orphan-only vacuum (back-compat form): deletes data files
    * referenced by NO manifest, keeps every committed version.
    * Equivalent to `vacuumRetain(table, Int.MaxValue, 0L)` — see
    * there for the safety contract. Returns removed file count. */
  def vacuum(table: String): Int =
    vacuumRetain(table, Int.MaxValue, 0L).removedDataFiles

  /** RETENTION-BOUNDED vacuum: keep the newest `keepVersions`
    * committed versions replayable, EXPIRE older manifests, and
    * delete every data file that (a) is referenced by no retained
    * manifest and (b) is older than `graceMs` — which covers both
    * never-committed orphans (crashed or CAS-losing writers) and
    * files whose every referencing version just expired.
    *
    * SAFETY CONTRACT:
    *   - A reader pinned to a RETAINED version is unaffected —
    *     retained manifests and all files they reference survive.
    *   - A reader pinned to an EXPIRED version fails CLEANLY at
    *     [[read]]/[[snapshot]] resolution ("missing or
    *     retention-expired") — it can never resolve a manifest whose
    *     files are gone, because the manifest goes first and the
    *     resolution path starts from the manifest.
    *   - `graceMs` is the in-flight-writer guard (the Delta VACUUM
    *     retention pattern): a writer lands data files BEFORE its
    *     manifest and may sit in the CAS retry loop, so files
    *     younger than the grace window are NEVER deleted even when
    *     unreferenced. Run with graceMs comfortably above the
    *     slowest writer's land-to-commit latency (minutes);
    *     `graceMs = 0` is only safe with NO in-flight writers (the
    *     quiet-window maintenance assumption). [[publish]]
    *     additionally re-verifies file existence pre-CAS, turning a
    *     mis-sized grace window into a loud commit failure instead
    *     of a silently unreadable snapshot.
    *   - Retention must exceed every consumer's lag: an incremental
    *     [[changes]] reader needs its `fromVersion` still retained,
    *     and [[lastCommittedBatch]]'s fallback scan for PRE-UPGRADE
    *     manifests stops at the retention horizon (post-upgrade
    *     heads carry the txn map, so streaming exactly-once is
    *     retention-independent).
    *
    * At one commit per streaming micro-batch (S24) this is what
    * keeps `_txlog/` and dead copy-on-write files bounded on disk:
    * O(keepVersions) manifests + the files they reference. */
  def vacuumRetain(table: String, keepVersions: Int,
                   graceMs: Long): VacuumStats = {
    require(keepVersions >= 1, "must retain at least the head version")
    val latest = latestVersion(table).getOrElse(return VacuumStats(0, 0))
    val keepFrom = math.max(1L, latest - keepVersions.toLong + 1L)
    // expire manifests below the horizon (oldest first, so a crash
    // mid-vacuum leaves a contiguous retained suffix)
    var expired = 0
    listedVersions(table).filter(_ < keepFrom).sorted.foreach { v =>
      if (Files.deleteIfExists(manifestPath(table, v))) expired += 1
    }
    val dataDir = root(table).resolve("data")
    if (!Files.isDirectory(dataDir)) return VacuumStats(expired, 0)
    val live: Set[String] = (keepFrom to latest)
      .flatMap(v => snapshot(table, Some(v)).toSeq.flatMap(_.files))
      .map(Paths.get(_).toAbsolutePath.toString).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var removed = 0
    walked(dataDir).reverse.foreach { p =>
      // <= not <: with graceMs = 0 (the quiet-window form) a dead
      // file whose mtime falls in the very millisecond of the vacuum
      // — or in the same COARSER fs-timestamp tick — must still reap,
      // or the reap count turns nondeterministic on fast hardware
      if (Files.isRegularFile(p) &&
          !live.contains(p.toAbsolutePath.toString) &&
          Files.getLastModifiedTime(p).toMillis <= cutoff) {
        Files.delete(p); removed += 1
      } else if (Files.isDirectory(p) && p != dataDir && listed(p).isEmpty) {
        Files.delete(p)
      }
    }
    VacuumStats(expired, removed)
  }
}
