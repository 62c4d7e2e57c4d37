package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The transactional commit log under fire: CAS atomicity (two
  * writers, one winner per version slot), rebase semantics (no lost
  * rows under concurrent appends; no lost update under concurrent
  * merges), snapshot isolation + time travel, crash-orphan
  * invisibility, content-neutral compaction, and vacuum safety. */
class TxTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), "txspec_")
      .toString

  private def docs(ids: Long*) =
    ids.map(i => (i, s"t$i")).toDF("doc_id", "text")

  test("create is exclusive; append rebases and loses no rows under " +
      "concurrent writers") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t))
    assert(!TxTable.create(docs(9L), t), "second create must lose the CAS")

    // two threads append disjoint batches concurrently; both must
    // land (rebase), versions must be a linear 1..3 chain
    val batches = Seq(Seq(10L, 11L), Seq(20L, 21L))
    val threads = batches.map { b =>
      new Thread(() => { TxTable.append(docs(b: _*), t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(TxTable.latestVersion(t).contains(3L))
    val ids = TxTable.read(spark, t).select("doc_id")
      .as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 10L, 11L, 20L, 21L),
      s"rows lost or duplicated under concurrent appends: ${ids.toSeq}")
  }

  test("merge updates matching keys, inserts new ones, and rebases " +
      "instead of losing a concurrent writer's rows") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L, 3L), t))
    // concurrent: one merge (update 1, insert 7) races one append (5)
    val m = new Thread(() => {
      TxTable.merge(spark, t,
        Seq((1L, "t1-upd"), (7L, "t7")).toDF("doc_id", "text")); ()
    })
    val a = new Thread(() => { TxTable.append(docs(5L), t); () })
    m.start(); a.start(); m.join(); a.join()
    val rows = TxTable.read(spark, t)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "t1-upd", 2L -> "t2", 3L -> "t3",
      5L -> "t5", 7L -> "t7"),
      s"merge/append interleave lost rows: $rows")
    assert(TxTable.latestVersion(t).contains(3L))
  }

  test("snapshot isolation and time travel: every committed version " +
      "replays exactly; uncommitted files are invisible") {
    val t = freshDir()
    assert(TxTable.create(docs(1L), t))
    TxTable.append(docs(2L), t)
    TxTable.merge(spark, t, Seq((1L, "t1-v3")).toDF("doc_id", "text"))
    // a "crashed" writer: data files written, no manifest committed
    docs(99L).write.parquet(
      Paths.get(t).resolve("data/crashed-writer").toString)
    def idsAt(v: Long) = TxTable.read(spark, t, Some(v))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(idsAt(1L) == Seq(1L))
    assert(idsAt(2L) == Seq(1L, 2L))
    assert(idsAt(3L) == Seq(1L, 2L))
    assert(TxTable.read(spark, t, Some(3L)).filter($"doc_id" === 1L)
      .select("text").as[String].head() == "t1-v3")
    // latest == v3; the crashed writer's 99 appears nowhere
    assert(TxTable.read(spark, t).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // vacuum removes ONLY the orphans; all committed versions survive
    assert(TxTable.vacuum(t) > 0, "orphan files must be collected")
    assert(idsAt(1L) == Seq(1L) && idsAt(2L) == Seq(1L, 2L) &&
      idsAt(3L) == Seq(1L, 2L),
      "vacuum must never touch committed history")
    assert(TxTable.vacuum(t) == 0, "second vacuum finds nothing")
  }

  test("compaction is content-neutral, shrinks the file count, and " +
      "aborts rather than contend") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t, buckets = 4))
    (0 until 3).foreach(i => TxTable.append(docs(10L + i), t, buckets = 4))
    val before = TxTable.snapshot(t).get
    val rowsBefore = TxTable.read(spark, t)
      .select("doc_id", "text").as[(Long, String)].collect().sorted
    assert(TxTable.compact(spark, t, buckets = 1)
      .contains(before.version + 1))
    val after = TxTable.snapshot(t).get
    assert(after.files.size < before.files.size,
      s"compaction must shrink files: ${before.files.size} -> ${after.files.size}")
    val rowsAfter = TxTable.read(spark, t)
      .select("doc_id", "text").as[(Long, String)].collect().sorted
    assert(rowsBefore.sameElements(rowsAfter), "compaction changed content")
    // contention: a compaction planned against a pinned snapshot
    // that a real writer has since superseded must abort, not retry
    val head = TxTable.snapshot(t).get
    TxTable.append(docs(30L), t)
    assert(TxTable.compact(spark, t, at = Some(head)).isEmpty,
      "compaction must abort when it loses the CAS")
    // and the winner's row is intact
    assert(TxTable.read(spark, t).filter($"doc_id" === 30L).count() == 1)
  }

  test("change feed: appends are exact and shuffle-free, merges net " +
      "to delete+insert, compaction cancels, ranges compose") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t))                  // v1
    TxTable.append(docs(3L), t)                              // v2
    TxTable.merge(spark, t,                                  // v3
      Seq((1L, "t1-new"), (5L, "t5")).toDF("doc_id", "text"))
    assert(TxTable.compact(spark, t, buckets = 1).contains(4L)) // v4

    def feed(f: Long, v: Long): Set[(Long, String, String)] =
      TxTable.changes(spark, t, f, v)
        .select("doc_id", "text", "_change")
        .as[(Long, String, String)].collect().toSet

    // append: exactly the appended rows, and the FAST PATH — the
    // optimized plan must contain no aggregation at all (no shuffle
    // for the dominant append-only shape: a plain scan)
    assert(feed(1L, 2L) == Set((3L, "t3", "insert")))
    val appendPlan = TxTable.changes(spark, t, 1L, 2L)
      .queryExecution.optimizedPlan.toString
    assert(!appendPlan.contains("Except") &&
      !appendPlan.contains("Aggregate"),
      s"append-only feed must skip the row diff:\n$appendPlan")
    // general path: ONE aggregation computes both diff directions —
    // never two excepts (each would shuffle the churn separately)
    val mergePlan = TxTable.changes(spark, t, 2L, 3L)
      .queryExecution.optimizedPlan.toString
    assert(!mergePlan.contains("Except") &&
      mergePlan.split("Aggregate").length - 1 <= 2, // partial+final
      s"merge feed must diff with one signed aggregation:\n$mergePlan")

    // merge: rewrite noise cancels — only the updated key's old/new
    // pair and the plain insert survive the multiset diff
    assert(feed(2L, 3L) == Set(
      (1L, "t1", "delete"), (1L, "t1-new", "insert"), (5L, "t5", "insert")))

    // compaction: identical content, different files -> EMPTY feed
    assert(TxTable.changes(spark, t, 3L, 4L).isEmpty,
      "compaction must emit zero changes")

    // range composability: 1→4 nets out intermediate rewrites
    assert(feed(1L, 4L) == Set(
      (1L, "t1", "delete"), (1L, "t1-new", "insert"),
      (3L, "t3", "insert"), (5L, "t5", "insert")))

    // identity: v→v is empty
    assert(TxTable.changes(spark, t, 2L, 2L).isEmpty)
  }

  test("schema evolution: new columns widen, old files read NULL, " +
      "history stays schema-pinned, type changes are refused") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t))              // v1: 2 cols
    TxTable.appendEvolve(Seq((3L, "t3", "web"))
      .toDF("doc_id", "text", "source"), t)              // v2: +source
    // head: widened schema; pre-evolution rows read source as NULL
    val head = TxTable.read(spark, t).orderBy("doc_id")
      .select("doc_id", "source").as[(Long, Option[String])]
      .collect().toSeq
    assert(head == Seq((1L, None), (2L, None), (3L, Some("web"))))
    // time travel is schema-pinned: v1 has no source column at all
    assert(!TxTable.read(spark, t, Some(1L)).columns.contains("source"))
    // the feed across the evolution is the appended rows (fast path)
    assert(TxTable.changes(spark, t, 1L, 2L)
      .select("doc_id", "_change").as[(Long, String)].collect().toSeq ==
      Seq((3L, "insert")))
    // merge keeps working on the widened schema (old rows' source
    // stays NULL through the copy-on-write rewrite)
    TxTable.merge(spark, t, Seq((1L, "t1-new", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source"), key = "doc_id")
    val merged = TxTable.read(spark, t).orderBy("doc_id")
      .select("doc_id", "text", "source")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(merged == Seq((1L, "t1-new", None), (2L, "t2", None),
      (3L, "t3", Some("web"))))
    // a type change is a rewrite, not an append — refuse it
    intercept[IllegalArgumentException] {
      TxTable.appendEvolve(Seq((9L, 42))
        .toDF("doc_id", "text"), t)
    }
  }

  test("delete removes matching rows copy-on-write, prunes to touched " +
      "files, feeds net deletes, and composes with compaction") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t, buckets = 1))        // v1
    TxTable.append(docs(3L, 4L), t, buckets = 1)                // v2
    TxTable.append(docs(5L, 6L), t, buckets = 1)                // v3
    val before = TxTable.snapshot(t).get
    assert(before.files.size == 3)
    // delete hits only v2's file (ids 3,4) -> exactly one file
    // rewritten, the other two carried over VERBATIM
    val v4 = TxTable.delete(spark, t, $"doc_id" === 3L)
    assert(v4 == 4L)
    val after = TxTable.snapshot(t).get
    assert(before.files.toSet.intersect(after.files.toSet).size == 2,
      s"untouched files must carry over: ${before.files} -> ${after.files}")
    assert(TxTable.read(spark, t).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L, 6L))
    // time travel: pre-delete versions still hold the row
    assert(TxTable.read(spark, t, Some(3L)).filter($"doc_id" === 3L)
      .count() == 1)
    // the change feed is the NET delete — the rewritten file's kept
    // row (4) cancels
    assert(TxTable.changes(spark, t, 3L, 4L)
      .select("doc_id", "_change").as[(Long, String)].collect().toSeq ==
      Seq((3L, "delete")))
    // SQL NULL semantics: pred NULL keeps the row
    TxTable.appendEvolve(Seq((7L, "t7", "web"), (8L, "t8", null))
      .toDF("doc_id", "text", "source"), t)                     // v5
    TxTable.delete(spark, t, $"source" === "web")               // v6
    assert(TxTable.read(spark, t).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L, 6L, 8L),
      "rows where the delete predicate is NULL must stay")
    // delete matching nothing commits NO version
    assert(TxTable.delete(spark, t, $"doc_id" === 999L) == 6L)
    assert(TxTable.latestVersion(t).contains(6L))
    // delete ∘ compact: content survives, feed of the compaction is
    // empty, and the composed range nets out the insert-then-delete
    // of row 7 entirely — only the surviving insert remains
    assert(TxTable.compact(spark, t, buckets = 1).contains(7L))
    assert(TxTable.changes(spark, t, 6L, 7L).isEmpty)
    assert(TxTable.changes(spark, t, 4L, 7L)
      .select("doc_id", "_change").as[(Long, String)]
      .collect().toSet == Set((8L, "insert")))
  }

  test("retention vacuum keeps retained versions replayable, fails " +
      "expired reads cleanly, and honors the grace window") {
    val t = freshDir()
    assert(TxTable.create(docs(1L), t, buckets = 1))            // v1
    TxTable.append(docs(2L), t, buckets = 1)                    // v2
    TxTable.merge(spark, t, Seq((1L, "t1-new")).toDF("doc_id", "text"),
      buckets = 1)                                              // v3 (CoW)
    TxTable.append(docs(4L), t, buckets = 1)                    // v4
    // grace window: nothing is young enough to delete, manifests
    // still expire (metadata, not in-flight state)
    val guarded = TxTable.vacuumRetain(t, keepVersions = 2,
      graceMs = 3600000L)
    assert(guarded.expiredManifests == 2 && guarded.removedDataFiles == 0,
      s"grace window must protect young files: $guarded")
    // expired version reads fail cleanly
    intercept[IllegalArgumentException] { TxTable.read(spark, t, Some(1L)) }
    intercept[IllegalArgumentException] { TxTable.read(spark, t, Some(2L)) }
    // retained versions are untouched
    assert(TxTable.read(spark, t, Some(3L)).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    assert(TxTable.read(spark, t, Some(4L)).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 4L))
    // with the grace window elapsed (0ms), dead pre-merge files go
    val reaped = TxTable.vacuumRetain(t, keepVersions = 2, graceMs = 0L)
    assert(reaped.expiredManifests == 0 && reaped.removedDataFiles > 0,
      s"dead expired files must be reaped: $reaped")
    assert(TxTable.read(spark, t, Some(3L)).count() == 2 &&
      TxTable.read(spark, t, Some(4L)).count() == 3,
      "retained reads must survive the data reap")
    assert(TxTable.vacuumRetain(t, 2, 0L) == TxTable.VacuumStats(0, 0),
      "vacuum is idempotent")
    // head resolution after manifest expiry still works both ways
    assert(TxTable.latestVersion(t).contains(4L))
    Files.deleteIfExists(Paths.get(t, "_txlog", "_head"))
    assert(TxTable.latestVersion(t).contains(4L),
      "listing fallback must agree after retention expiry")
  }

  test("head hint resolution is equivalent to listing: stale, missing, " +
      "and corrupt hints all resolve the same head") {
    val t = freshDir()
    assert(TxTable.create(docs(1L), t, buckets = 1))
    (0 until 4).foreach(i => TxTable.append(docs(10L + i), t, buckets = 1))
    assert(TxTable.latestVersion(t).contains(5L))
    val hint = Paths.get(t, "_txlog", "_head")
    // stale hint (lags several publishes): probe-forward recovers
    Files.write(hint, "2".getBytes)
    assert(TxTable.latestVersion(t).contains(5L))
    // corrupt hint: listing fallback
    Files.write(hint, "not-a-number".getBytes)
    assert(TxTable.latestVersion(t).contains(5L))
    // missing hint: listing fallback
    Files.deleteIfExists(hint)
    assert(TxTable.latestVersion(t).contains(5L))
    // and a normal commit restores the O(1) hint
    TxTable.append(docs(99L), t, buckets = 1)
    assert(new String(Files.readAllBytes(hint)).trim == "6")
  }

  test("merge replaces the whole matched row (NULLs clear fields) and " +
      "rejects duplicate update keys") {
    val t = freshDir()
    assert(TxTable.create(
      Seq((1L, "t1", "web"), (2L, "t2", "pdf"))
        .toDF("doc_id", "text", "source"), t, buckets = 1))
    // the update row carries NULL source: match-marker semantics
    // must null the field out, not keep 'web' via coalesce
    TxTable.merge(spark, t,
      Seq((1L, "t1-upd", null.asInstanceOf[String]))
        .toDF("doc_id", "text", "source"), buckets = 1)
    val rows = TxTable.read(spark, t).orderBy("doc_id")
      .select("doc_id", "text", "source")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(rows == Seq((1L, "t1-upd", None), (2L, "t2", Some("pdf"))),
      s"merge must replace the whole matched row: $rows")
    // duplicate keys in updates are rejected, not fanned out
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, t,
        Seq((2L, "a", "x"), (2L, "b", "y"))
          .toDF("doc_id", "text", "source"), buckets = 1)
    }
  }

  test("type widening: int->long and float->double evolve in place; " +
      "narrowing and incompatible changes are refused") {
    val t = freshDir()
    import org.apache.spark.sql.types._
    assert(TxTable.create(
      Seq((1, 1.5f, "a"), (2, 2.5f, "b")).toDF("k", "score", "text"),
      t, bucketKey = "k", buckets = 1))
    // widen: new rows carry long k + double score
    TxTable.appendEvolve(
      Seq((3000000000L, 3.25, "c")).toDF("k", "score", "text"),
      t, bucketKey = "k", buckets = 1)
    val head = TxTable.read(spark, t)
    assert(head.schema("k").dataType == LongType &&
      head.schema("score").dataType == DoubleType,
      s"manifest must take the wider types: ${head.schema}")
    // old int/float files read UP under the widened schema
    assert(head.orderBy("k").select("k", "score").as[(Long, Double)]
      .collect().toSeq == Seq((1L, 1.5), (2L, 2.5), (3000000000L, 3.25)))
    // time travel stays width-pinned: v1 replays int/float
    val v1 = TxTable.read(spark, t, Some(1L))
    assert(v1.schema("k").dataType == IntegerType &&
      v1.schema("score").dataType == FloatType)
    // appending the NARROW type after widening is fine (reads up)
    TxTable.appendEvolve(Seq((4, 4.5f, "d")).toDF("k", "score", "text"),
      t, bucketKey = "k", buckets = 1)
    assert(TxTable.read(spark, t).schema("k").dataType == LongType)
    assert(TxTable.read(spark, t).filter($"k" === 4).count() == 1)
    // refusals: long->int narrowing, string->int incompatible
    intercept[IllegalArgumentException] {
      TxTable.appendEvolve(Seq((5, 5.5, 42)).toDF("k", "score", "text"),
        t, bucketKey = "k", buckets = 1)
    }
  }

  test("restore rolls content back without data IO, feeds net " +
      "re-inserts, preserves history and txn state, refuses expired " +
      "targets") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L, 3L), t, buckets = 1))   // v1
    TxTable.appendOnce(docs(4L), t, appId = "app", batchId = 7L,
      buckets = 1)                                             // v2
    TxTable.delete(spark, t, $"doc_id" isin (2L, 4L))          // v3
    assert(TxTable.read(spark, t).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    val v2files = TxTable.snapshot(t, Some(2L)).get.files.toSet
    assert(TxTable.restore(spark, t, 2L) == 4L)                // v4
    // content = v2, files REUSED verbatim (no data written)
    assert(TxTable.read(spark, t).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(TxTable.snapshot(t).get.files.toSet == v2files,
      "restore must reuse the target's immutable files")
    // the undo's feed: exactly the deleted rows come back
    assert(TxTable.changes(spark, t, 3L, 4L)
      .select("doc_id", "_change").as[(Long, String)].collect().toSet ==
      Set((2L, "insert"), (4L, "insert")))
    // history preserved: the bad delete still replays
    assert(TxTable.read(spark, t, Some(3L)).count() == 2)
    // txn state carries FORWARD through the restore (exactly-once
    // must not roll back with the data)
    assert(TxTable.lastCommittedBatch(t, "app").contains(7L))
    // restoring to an expired version fails cleanly
    TxTable.vacuumRetain(t, keepVersions = 2, graceMs = 0L)
    intercept[IllegalArgumentException] { TxTable.restore(spark, t, 1L) }
  }

  test("versionAsOf resolves commit wall time; clustered compaction " +
      "makes manifest stats selective and readKeyRange skips files") {
    val t = freshDir()
    assert(TxTable.create(
      (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text"),
      t, buckets = 4))
    Thread.sleep(15)
    TxTable.append(docs(100L), t, buckets = 1)
    Thread.sleep(15)
    TxTable.append(docs(101L), t, buckets = 1)
    // timestamp time travel: each commit's own ts resolves to it
    // (commits are >15ms apart, so ties cannot mask the order)
    (1L to 3L).foreach { v =>
      val ts = TxTable.snapshot(t, Some(v)).get.tsMillis
      assert(ts > 0L, "manifests must carry commit time")
      assert(TxTable.versionAsOf(t, ts).contains(v),
        s"versionAsOf(ts of v$v) must be v$v")
    }
    assert(TxTable.versionAsOf(t,
      TxTable.snapshot(t, Some(1L)).get.tsMillis - 1L).isEmpty,
      "a time before the first commit resolves to nothing")
    // hash-bucketed layout: stats exist but each file spans ~the
    // whole range — nothing prunes, content still exact
    def kept(lo: Long, hi: Long) = {
      val s = TxTable.snapshot(t).get
      s.files.count(f => s.numRange("doc_id", f) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      })
    }
    assert(TxTable.readKeyRange(spark, t, "doc_id", 5L, 20L)
      .select("doc_id").as[Long].collect().sorted.toSeq ==
      (5L to 20L).toSeq)
    // clustered compaction: files become key slices; a narrow range
    // now PRUNES whole files at the manifest level
    assert(TxTable.compact(spark, t, buckets = 4, rangeCluster = true)
      .contains(4L))
    val total = TxTable.snapshot(t).get.files.size
    assert(kept(5L, 20L) < total,
      s"range-clustered stats must prune files: ${kept(5L, 20L)}/$total")
    assert(TxTable.readKeyRange(spark, t, "doc_id", 5L, 20L)
      .select("doc_id").as[Long].collect().sorted.toSeq ==
      (5L to 20L).toSeq,
      "pruned read must equal the filtered read")
    assert(TxTable.readKeyRange(spark, t, "doc_id", 5000L, 6000L)
      .isEmpty, "fully disjoint range reads empty")
    // a STRING-keyed table records STRING [min,max] stats; a numeric
    // readKeyRange on an unstat'd column stays correct (no-prune)
    val ts2 = freshDir()
    assert(TxTable.create(
      Seq(("a", 1L), ("b", 2L)).toDF("id", "v"), ts2,
      bucketKey = "id", buckets = 1))
    val snap2 = TxTable.snapshot(ts2).get
    assert(snap2.stats.isEmpty, "no integral stats for a string key")
    assert(snap2.files.forall(f => snap2.strRange("id", f).nonEmpty),
      "string bucket key must record string stats")
    assert(TxTable.readKeyRange(spark, ts2, "v", 2L, 9L)
      .select("v").as[Long].collect().toSeq == Seq(2L))
  }

  test("string-keyed range-clustered layout prunes files at the " +
      "manifest; pruned reads stay content-exact; row counts are " +
      "carried exactly") {
    val t = freshDir()
    val rows = (0 until 100).map(i => (f"doc_$i%03d", i.toLong))
      .toDF("id", "v")
    assert(TxTable.create(rows, t, bucketKey = "id", buckets = 4))
    assert(TxTable.compact(spark, t, bucketKey = "id", buckets = 4,
      rangeCluster = true).contains(2L))
    val s = TxTable.snapshot(t).get
    val keptN = s.files.count(f => s.strRange("id", f) match {
      case Some((mn, mx)) => mx >= "doc_010" && mn <= "doc_025"
      case None => true
    })
    assert(keptN < s.files.size,
      s"string-clustered stats must prune: $keptN/${s.files.size}")
    assert(TxTable.readKeyRangeString(spark, t, "id",
      "doc_010", "doc_025").select("id").as[String].collect()
      .sorted.toSeq == (10 to 25).map(i => f"doc_$i%03d"),
      "pruned string read must equal the filtered read")
    assert(TxTable.readKeyRangeString(spark, t, "id", "zzz", "zzzz")
      .isEmpty, "fully disjoint string range reads empty")
    // exact O(1) row counts at every version (create and compact)
    assert(TxTable.snapshot(t, Some(1L)).get.totalRows.contains(100L))
    assert(s.totalRows.contains(100L))
  }

  test("Z-order clustered compaction makes 2-D manifest stats " +
      "selective on BOTH columns; readKeyRanges prunes and stays " +
      "content-exact") {
    import graft.functions.ZOrder
    val t = freshDir()
    // a 32x32 grid: points (x, y); either single-column sort would
    // leave the OTHER column spanning its whole range in every file
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y =>
      (x.toLong * 32 + y, x.toLong, y.toLong))).toDF("id", "x", "y")
    assert(TxTable.create(grid, t, bucketKey = "id", buckets = 4))
    assert(TxTable.compact(spark, t, bucketKey = "id", buckets = 16,
      clusterBy = Some(ZOrder.z16(col("x"), col("y"))),
      statsCols = Seq("x", "y")).contains(2L))
    val s = TxTable.snapshot(t).get
    def keptFiles(xr: (Long, Long), yr: (Long, Long)) =
      s.files.count(f =>
        Seq(("x", xr), ("y", yr)).forall { case (c, (lo, hi)) =>
          s.numRange(c, f) match {
            case Some((mn, mx)) => mx >= lo && mn <= hi
            case None => true
          }
        })
    // a quadrant query must prune most z-clustered files
    val kept = keptFiles((0L, 7L), (0L, 7L))
    assert(kept < s.files.size / 2,
      s"z-layout must prune a quadrant query: $kept/${s.files.size}")
    val got = TxTable.readKeyRanges(spark, t,
      Map("x" -> (0L, 7L), "y" -> (0L, 7L)))
      .select("id").as[Long].collect().sorted.toSeq
    val want = (0 until 8).flatMap(x => (0 until 8).map(y =>
      x.toLong * 32 + y)).sorted
    assert(got == want, "2-D pruned read must equal the filtered read")
    assert(TxTable.readKeyRanges(spark, t,
      Map("x" -> (500L, 600L), "y" -> (0L, 31L))).isEmpty)
  }

  test("decimal-keyed manifest stats prune as unscaled longs — " +
      "negative values order correctly, a stat-less legacy layout " +
      "reads conservatively, and pruned reads stay content-exact") {
    val t = freshDir()
    // prices -5.00 .. 4.90 step 0.10: DECIMAL(10,2), negatives
    // included — unscaled cents -500 .. 490
    val rows = (-50 to 49).map(i =>
      (i.toLong, new java.math.BigDecimal(
        java.math.BigInteger.valueOf(i * 10L), 2)))
      .toDF("id", "price")
      .select(col("id"), col("price").cast("decimal(10,2)"))
    assert(TxTable.create(rows, t, bucketKey = "id", buckets = 2))
    assert(TxTable.compact(spark, t, bucketKey = "id", buckets = 8,
      clusterBy = Some(col("price")), statsCols = Seq("price"))
      .contains(2L))
    val s = TxTable.snapshot(t).get
    assert(s.files.forall(f => s.numRange("price", f).nonEmpty),
      "decimal stats column must record unscaled-long bounds")
    // negative ordering: the file holding -5.00 must carry a bound
    // BELOW -400 (UNSIGNED footer folding would order -500 above 490)
    assert(s.files.exists(f =>
      s.numRange("price", f).exists(_._1 <= -490L)),
      s"negative unscaled bounds must survive: " +
        s"${s.files.flatMap(f => s.numRange("price", f))}")
    // skip arithmetic on a negative sub-range: -1.25 .. -0.35
    val kept = s.files.count(f => s.numRange("price", f) match {
      case Some((mn, mx)) => mx >= -125L && mn <= -35L
      case None => true
    })
    assert(kept < s.files.size,
      s"price-clustered stats must prune: $kept/${s.files.size}")
    assert(TxTable.readKeyRanges(spark, t,
      Map("price" -> (-125L, -35L)))
      .select("id").as[Long].collect().sorted.toSeq ==
      (-12L to -4L).toSeq,
      "pruned decimal read must equal the filtered read")
    assert(TxTable.readKeyRanges(spark, t,
      Map("price" -> (100000L, 200000L))).isEmpty,
      "fully disjoint decimal range reads empty")
    // stat-less legacy layout: a table whose manifests never
    // recorded price bounds (not the bucket key, not in statsCols)
    // keeps every file conservatively and the read stays exact
    val legacy = freshDir()
    assert(TxTable.create(rows, legacy, bucketKey = "id", buckets = 2))
    val ls = TxTable.snapshot(legacy).get
    assert(ls.files.forall(f => ls.numRange("price", f).isEmpty),
      "fixture must present a stat-less price column")
    assert(TxTable.readKeyRanges(spark, legacy,
      Map("price" -> (-125L, -35L)))
      .select("id").as[Long].collect().sorted.toSeq ==
      (-12L to -4L).toSeq,
      "stat-less layout must read conservatively, not wrongly prune")
  }

  test("mixed-type readKeyRanges compounds string and time pruning: " +
      "a file pruned by either dim alone skips, surviving both dims " +
      "keeps, and pruned reads stay content-exact") {
    import graft.functions.ZOrder
    val t = freshDir()
    // ids s000..s255 × scattered day index (i*97 % 256): a genuine
    // 2-D (string id, time) space, timestamps at day granularity
    val rows = (0 until 256).map { i =>
      val day = (i * 97) % 256
      (f"s$i%03d", java.time.Instant.ofEpochSecond(
        (18262L + day) * 86400L), i.toLong)
    }.toDF("id", "ts", "n")
    assert(TxTable.create(rows, t, bucketKey = "id", buckets = 2))
    assert(TxTable.compact(spark, t, bucketKey = "id", buckets = 16,
      clusterBy = Some(ZOrder.z16(expr("CAST(substring(id, 2) AS LONG)"),
        (col("n") * 97) % 256)),
      statsCols = Seq("id", "ts")).contains(2L))
    val s = TxTable.snapshot(t).get
    assert(s.files.forall(f => s.strRange("id", f).nonEmpty &&
      s.numRange("ts", f).nonEmpty),
      "both dims must carry per-file bounds")
    def keptFiles(idLo: String, idHi: String, tsLo: Long, tsHi: Long) =
      s.files.filter { f =>
        val strOk = s.strRange("id", f) match {
          case Some((mn, mx)) => idLo <= mx && mn <= idHi
          case None => true
        }
        val numOk = s.numRange("ts", f) match {
          case Some((mn, mx)) => mx >= tsLo && mn <= tsHi
          case None => true
        }
        strOk && numOk
      }
    val fullTs = (18262L * 86400000000L, (18262L + 256L) * 86400000000L)
    val midTs = ((18262L + 64L) * 86400000000L,
      (18262L + 127L) * 86400000000L)
    val strOnly = keptFiles("s032", "s095", fullTs._1, fullTs._2)
    val tsOnly = keptFiles("s000", "s999", midTs._1, midTs._2)
    val both = keptFiles("s032", "s095", midTs._1, midTs._2)
    assert(strOnly.size < s.files.size,
      s"string dim alone must prune: ${strOnly.size}/${s.files.size}")
    assert(tsOnly.size < s.files.size,
      s"time dim alone must prune: ${tsOnly.size}/${s.files.size}")
    // compounding: the 2-D slice keeps no more than either dim alone,
    // and strictly fewer than at least one of them on this layout
    assert(both.size <= math.min(strOnly.size, tsOnly.size))
    assert(both.size < math.max(strOnly.size, tsOnly.size),
      s"compound pruning must cut beyond a single dim: " +
        s"${both.size} vs ${strOnly.size}/${tsOnly.size}")
    // a file pruned by the string dim is skipped even though its
    // time bounds overlap, and vice versa — and the read stays exact
    val got = TxTable.readKeyRanges(spark, t,
      Map("ts" -> midTs), strRanges = Map("id" -> ("s032", "s095")))
      .select("n").as[Long].collect().sorted.toSeq
    val want = (32L to 95L).filter(i =>
      (i * 97) % 256 >= 64L && (i * 97) % 256 <= 127L).sorted
    assert(got == want,
      "mixed pruned read must equal the filtered read")
    assert(TxTable.readKeyRanges(spark, t, Map("ts" -> midTs),
      strRanges = Map("id" -> ("zzz", "zzzz"))).isEmpty,
      "disjoint string dim empties the read regardless of time")
    assert(TxTable.readKeyRanges(spark, t,
      Map("ts" -> (4000000000000000L, 4100000000000000L)),
      strRanges = Map("id" -> ("s000", "s999"))).isEmpty,
      "disjoint time dim empties the read regardless of strings")
  }

  test("publish verifies referenced files exist: a vacuumed-under-writer " +
      "commit fails loudly instead of landing unreadable") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t, buckets = 1))
    // simulate a mis-configured vacuum racing the writer: a committed
    // file vanishes; the next append carries it forward and must
    // refuse to commit a manifest pointing at a missing file
    val victim = Paths.get(TxTable.snapshot(t).get.files.head)
    Files.delete(victim)
    intercept[IllegalStateException] {
      TxTable.append(docs(3L), t, buckets = 1)
    }
  }

  test("exactly-once survives the txn-format upgrade: legacy records " +
      "below a record-less head seed the first new-format commit") {
    val t = freshDir()
    assert(TxTable.create(docs(1L), t, buckets = 1))              // v1
    TxTable.appendOnce(docs(2L), t, appId = "A", batchId = 5L,
      buckets = 1)                                                // v2
    TxTable.append(docs(3L), t, buckets = 1)                      // v3
    // DOWNGRADE the log in place to the pre-upgrade format: v2 gets
    // the legacy single-commit record, v3 (a plain append) carries
    // nothing — the exact shape a table last written by the old code
    // presents (legacy appendOnce at v2, legacy append at v3)
    def rewrite(v: Long, f: String => String): Unit = {
      val p = Paths.get(t, "_txlog", f"v$v%08d.json")
      val txt = new String(Files.readAllBytes(p), "UTF-8")
      Files.write(p, f(txt).getBytes("UTF-8"))
    }
    rewrite(2L, _.replace(""","txns":{"A":5}""",
      ""","txn":{"app":"A","batch":5}"""))
    rewrite(3L, _.replace(""","txns":{"A":5}""", ""))
    assert(!TxTable.snapshot(t).get.hasTxnsMap,
      "fixture must present a record-less legacy head")
    assert(TxTable.lastCommittedBatch(t, "A").contains(5L),
      "legacy records below a record-less head must stay visible")
    // first POST-UPGRADE commit by a DIFFERENT app: its carried map
    // must seed from the retained legacy history, not head.txns
    TxTable.appendOnce(docs(4L), t, appId = "B", batchId = 1L,
      buckets = 1)                                                // v4
    assert(TxTable.snapshot(t).get.txns ==
      Map("A" -> 5L, "B" -> 1L),
      "upgrade commit must fold legacy records into the carried map")
    // the replay that used to duplicate: A's batch 5 must NO-OP
    val v = TxTable.appendOnce(docs(99L), t, appId = "A", batchId = 5L,
      buckets = 1)
    assert(v == 4L, "replayed legacy batch must no-op, not commit")
    assert(TxTable.read(spark, t).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "replay across the format upgrade duplicated rows")
  }

  test("a RELATIVE table root works end to end (create, stats pass, " +
      "appendOnce, delete)") {
    val rel = s"target/txrel_${java.util.UUID.randomUUID()}"
    try {
      assert(TxTable.create(docs(1L, 2L, 3L), rel, buckets = 1))
      TxTable.appendOnce(docs(4L), rel, appId = "app", batchId = 0L,
        buckets = 1)
      assert(TxTable.snapshot(rel).get.stats.nonEmpty,
        "stats pass must survive a relative root")
      TxTable.delete(spark, rel, $"doc_id" === 2L, buckets = 1)
      assert(TxTable.read(spark, rel).select("doc_id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 3L, 4L))
      assert(TxTable.lastCommittedBatch(rel, "app").contains(0L))
    } finally {
      val d = Paths.get(rel).toAbsolutePath
      if (Files.exists(d))
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
    }
  }

  test("deleteKeys removes exactly the keyed rows; NULL and absent " +
      "keys match nothing; empty/no-match frames hold the head") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L, 3L, 4L, 5L), t))
    // duplicates in the key frame collapse; NULL keys match nothing
    val keys = Seq(Some(2L), Some(2L), None, Some(4L), Some(99L))
      .toDF("doc_id")
    assert(TxTable.deleteKeys(spark, t, keys) == 2L)
    assert(TxTable.read(spark, t).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 5L))
    // no-match and empty frames commit nothing
    assert(TxTable.deleteKeys(spark, t, Seq(77L).toDF("doc_id")) == 2L)
    assert(TxTable.deleteKeys(spark, t,
      Seq.empty[Long].toDF("doc_id")) == 2L)
    assert(TxTable.latestVersion(t).contains(2L))
  }

  test("deleteKeys prunes untouched files at the manifest level on " +
      "a clustered layout and carries them over verbatim") {
    val t = freshDir()
    assert(TxTable.create(
      (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text"),
      t, buckets = 4))
    assert(TxTable.compact(spark, t, buckets = 4, rangeCluster = true)
      .contains(2L))
    val before = TxTable.snapshot(t).get.files.toSet
    // keys confined to one key slice: only that file may be rewritten
    assert(TxTable.deleteKeys(spark, t,
      Seq(10L, 11L, 12L).toDF("doc_id")) == 3L)
    val after = TxTable.snapshot(t).get.files.toSet
    val carried = before.intersect(after)
    assert(carried.size == before.size - 1,
      s"exactly one clustered file must be rewritten: " +
        s"${before.size} -> carried ${carried.size}")
    assert(TxTable.read(spark, t).count() == 97L)
    assert(TxTable.read(spark, t)
      .filter(col("doc_id").between(10L, 12L)).isEmpty)
    // string-keyed pruning path: bounds compare lexicographically
    val t2 = freshDir()
    assert(TxTable.create(
      (0 until 40).map(i => (f"k$i%02d", i)).toDF("id", "v"), t2,
      bucketKey = "id", buckets = 2))
    assert(TxTable.compact(spark, t2, bucketKey = "id", buckets = 2,
      rangeCluster = true).contains(2L))
    val b2 = TxTable.snapshot(t2).get.files.toSet
    assert(TxTable.deleteKeys(spark, t2, Seq("k01").toDF("id"),
      key = "id", bucketKey = "id") == 3L)
    val a2 = TxTable.snapshot(t2).get.files.toSet
    assert(b2.intersect(a2).size == b2.size - 1,
      "string-stat pruning must spare the disjoint clustered file")
    assert(TxTable.read(spark, t2).count() == 39L)
  }

  test("update rewrites only the files containing matches and " +
      "surfaces as delete+insert in the change feed") {
    val t = freshDir()
    assert(TxTable.create(
      (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text"),
      t, buckets = 4))
    assert(TxTable.compact(spark, t, buckets = 4, rangeCluster = true)
      .contains(2L))
    val before = TxTable.snapshot(t).get.files.toSet
    assert(TxTable.update(spark, t,
      col("doc_id").between(10L, 12L),
      Seq("text" -> concat(col("text"), lit("-u")))) == 3L)
    val after = TxTable.snapshot(t).get.files.toSet
    assert(before.intersect(after).size == before.size - 1,
      "exactly one clustered file holds ids 10..12")
    val updated = TxTable.read(spark, t)
      .filter(col("doc_id").between(10L, 12L))
      .select("text").as[String].collect().sorted.toSeq
    assert(updated == Seq("t10-u", "t11-u", "t12-u"))
    assert(TxTable.read(spark, t).count() == 100L)
    val feed = TxTable.changes(spark, t, 2L, 3L)
      .groupBy("_change").count().as[(String, Long)].collect().toMap
    assert(feed == Map("delete" -> 3L, "insert" -> 3L),
      s"update feed must net to per-row replace: $feed")
  }

  test("empty table states read back with the schema intact") {
    val t = freshDir()
    assert(TxTable.create(docs().toDF("doc_id", "text")
      .filter(lit(false)), t))
    val df = TxTable.read(spark, t)
    assert(df.columns.toSeq == Seq("doc_id", "text"))
    assert(df.count() == 0)
    TxTable.append(docs(4L), t)
    assert(TxTable.read(spark, t).count() == 1)
  }

  test("manifest stats come from the parquet footers and equal a " +
      "recomputed per-file min/max/rowcount aggregation") {
    val t = freshDir()
    assert(TxTable.create(Seq((5L, "bb", 7), (1L, "aa", 9),
      (12L, "cc", 3), (8L, "zz", 1)).toDF("doc_id", "text", "n"), t))
    val s = TxTable.snapshot(t).get
    assert(s.files.nonEmpty)
    assert(s.totalRows.contains(4L))
    for (f <- s.files) {
      val df = spark.read.parquet(f)
      val n = df.count()
      assert(s.rowCounts(f) == n, s"row count mismatch for $f")
      if (n > 0L) {
        val r = df.agg(min(col("doc_id")).cast("long"),
          max(col("doc_id")).cast("long")).head()
        assert(s.numRange("doc_id", f).contains(
          (r.getLong(0), r.getLong(1))),
          s"doc_id bounds mismatch for $f: ${s.numRange("doc_id", f)}")
      } else assert(s.numRange("doc_id", f).isEmpty)
    }
  }

  test("createEmpty publishes a zero-file v1 whose schema reads back " +
      "and accepts appends") {
    val t = freshDir()
    assert(TxTable.createEmpty(t, "doc_id BIGINT,text STRING"))
    assert(!TxTable.createEmpty(t, "doc_id BIGINT,text STRING"),
      "second create must lose the CAS")
    val df = TxTable.read(spark, t)
    assert(df.columns.toSeq == Seq("doc_id", "text") && df.count() == 0)
    assert(TxTable.snapshot(t).get.totalRows.contains(0L))
    TxTable.append(docs(1L, 2L), t)
    assert(TxTable.read(spark, t).count() == 2)
  }

  test("replaceKeysOnce retracts and appends as ONE version, carries " +
      "untouched files, and no-ops on batch replay") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L, 3L, 4L), t))
    val v1Files = TxTable.snapshot(t).get.files.toSet
    val v = TxTable.replaceKeysOnce(spark, t,
      Seq(2L, 3L).toDF("doc_id"),
      Seq((2L, "two'"), (9L, "nine")).toDF("doc_id", "text"),
      appId = "app", batchId = 1L)
    assert(v == 2L, "retract+append must land as exactly one version")
    assert(TxTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "t1"), (4L, "t4"), (2L, "two'"), (9L, "nine")))
    // exactly-once: same batch replays to a no-op at the same head
    val v2 = TxTable.replaceKeysOnce(spark, t,
      Seq(2L, 3L).toDF("doc_id"),
      Seq((2L, "two'"), (9L, "nine")).toDF("doc_id", "text"),
      appId = "app", batchId = 1L)
    assert(v2 == 2L && TxTable.latestVersion(t).contains(2L))
    assert(TxTable.lastCommittedBatch(t, "app").contains(1L))
    // files whose keys were untouched carry over verbatim
    val v2Files = TxTable.snapshot(t).get.files.toSet
    assert(v2Files.intersect(v1Files).nonEmpty,
      "untouched bucket files must carry over, not rewrite")
  }

  test("replaceKeysOnce with an empty key frame and empty rows is a " +
      "metadata-only txn commit; recordBatchOnce ditto") {
    val t = freshDir()
    assert(TxTable.create(docs(1L), t))
    val before = TxTable.snapshot(t).get.files.toSet
    val v = TxTable.replaceKeysOnce(spark, t,
      spark.emptyDataset[Long].toDF("doc_id"),
      docs(), appId = "a", batchId = 5L)
    assert(v == 2L)
    val s2 = TxTable.snapshot(t).get
    assert(s2.files.toSet == before, "no content change expected")
    assert(TxTable.lastCommittedBatch(t, "a").contains(5L))
    val v3 = TxTable.recordBatchOnce(t, "a", 7L)
    assert(v3 == 3L)
    assert(TxTable.snapshot(t).get.files.toSet == before)
    assert(TxTable.lastCommittedBatch(t, "a").contains(7L))
    assert(TxTable.recordBatchOnce(t, "a", 7L) == 3L, "replay no-ops")
    assert(TxTable.read(spark, t).count() == 1)
  }

  test("appendOnlyTransition is true for create/append, false for " +
      "copy-on-write commits") {
    val t = freshDir()
    assert(TxTable.create(docs(1L, 2L), t))          // v1
    TxTable.append(docs(3L), t)                      // v2
    TxTable.merge(spark, t, docs(1L))                // v3 (rewrite)
    assert(TxTable.delete(spark, t, col("doc_id") === 2L) == 4L)
    assert(TxTable.compact(spark, t).contains(5L))
    assert(TxTable.appendOnlyTransition(t, 0L, 1L))
    assert(TxTable.appendOnlyTransition(t, 1L, 2L))
    assert(!TxTable.appendOnlyTransition(t, 2L, 3L))
    assert(!TxTable.appendOnlyTransition(t, 3L, 4L))
    assert(!TxTable.appendOnlyTransition(t, 4L, 5L))
    assert(TxTable.appendOnlyTransition(t, 0L, 2L),
      "composed create+append range is still append-only")
  }

  test("evolveSchema adds NULL-reading columns and widens types " +
      "metadata-only; refuses narrowing; time travel stays pinned") {
    import org.apache.spark.sql.types._
    val t = freshDir()
    assert(TxTable.create(Seq((1L, 7), (2L, 9)).toDF("doc_id", "n")
      .select(col("doc_id"), col("n").cast("int")), t))
    val filesBefore = TxTable.snapshot(t).get.files.toSet
    val v = TxTable.evolveSchema(t,
      addCols = Seq(StructField("lang", StringType)),
      widenCols = Seq(("n", LongType)))
    assert(v == 2L)
    assert(TxTable.snapshot(t).get.files.toSet == filesBefore,
      "schema evolution must not rewrite data")
    val evolved = TxTable.read(spark, t)
    assert(evolved.schema("n").dataType == LongType)
    assert(evolved.select("doc_id", "n", "lang")
      .as[(Long, Long, Option[String])].collect().toSet ==
      Set((1L, 7L, None), (2L, 9L, None)),
      "old int32 files must read up to long; new column reads NULL")
    // pre-evolution version replays with ITS schema
    assert(TxTable.read(spark, t, Some(1L)).schema("n")
      .dataType == IntegerType)
    intercept[IllegalArgumentException] {
      TxTable.evolveSchema(t, Nil, Seq(("n", IntegerType)))
    }
    intercept[IllegalArgumentException] {
      TxTable.evolveSchema(t, Seq(StructField("n", LongType)), Nil)
    }
    // appends under the widened schema land, totalRows stays exact
    TxTable.append(Seq((3L, 100L, "en")).toDF("doc_id", "n", "lang"), t)
    assert(TxTable.read(spark, t).count() == 3)
  }

  test("evolveSchema refuses addCols that duplicate EACH OTHER " +
      "(case-insensitively) — a duplicate pair would publish an " +
      "unresolvable schema") {
    import org.apache.spark.sql.types._
    val t = freshDir()
    assert(TxTable.create(docs(1L), t))
    intercept[IllegalArgumentException] {
      TxTable.evolveSchema(t, Seq(StructField("x", IntegerType),
        StructField("x", StringType)))
    }
    intercept[IllegalArgumentException] {
      TxTable.evolveSchema(t, Seq(StructField("x", IntegerType),
        StructField("X", LongType)))
    }
    // the refusal must not have published anything
    assert(TxTable.latestVersion(t).contains(1L))
  }

  test("DATE/TIMESTAMP keys record long manifest stats (epoch days " +
      "/ micros; TIMESTAMP_MICROS pinned over Spark's statless INT96 " +
      "default), prune files, stay content-exact, and stat-less " +
      "legacy layouts read conservatively") {
    import java.time.LocalDate
    val t = freshDir()
    val day0 = 18262L // 2020-01-01
    val rows = (0 until 200).map { i =>
      val d = day0 + i % 100
      (i.toLong, java.sql.Date.valueOf(LocalDate.ofEpochDay(d)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          d * 86400L + (i % 24) * 3600L)))
    }.toDF("doc_id", "dt", "ts")
    assert(TxTable.create(rows, t, bucketKey = "doc_id", buckets = 2))
    // v1: dt/ts were never statsCols — no stats, and the range read
    // must stay correct via conservative keep-everything
    val s1 = TxTable.snapshot(t).get
    assert(s1.files.forall(f => s1.numRange("dt", f).isEmpty),
      "v1 must be the stat-less legacy shape for this test")
    val expected10to20 = (0 until 200)
      .filter(i => (10 to 20).contains(i % 100)).map(_.toLong).sorted
    assert(TxTable.readKeyRange(spark, t, "dt", day0 + 10, day0 + 20)
      .select("doc_id").as[Long].collect().sorted.toSeq == expected10to20,
      "stat-less reads must be conservative, not wrong")

    // v2: date-range-clustered with timestamp stats
    assert(TxTable.compact(spark, t, bucketKey = "dt", buckets = 8,
      rangeCluster = true, statsCols = Seq("ts")).contains(2L))
    val s2 = TxTable.snapshot(t).get
    assert(s2.files.forall(f => s2.numRange("dt", f).nonEmpty &&
      s2.numRange("ts", f).nonEmpty),
      "date AND timestamp footer stats must land (INT96 carries none)")
    def kept(c: String, lo: Long, hi: Long) =
      s2.files.count(f => s2.numRange(c, f) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      })
    assert(kept("dt", day0 + 10, day0 + 20) < s2.files.size,
      "date stats on the clustered layout must skip files")
    assert(kept("ts", (day0 + 10) * 86400000000L,
      (day0 + 20) * 86400000000L) < s2.files.size,
      "timestamp stats must skip files too (ts rides the dt order)")
    assert(TxTable.readKeyRange(spark, t, "dt", day0 + 10, day0 + 20)
      .select("doc_id").as[Long].collect().sorted.toSeq == expected10to20,
      "pruned date read must equal the stat-less read")
    // sub-day micros bound: day10 from 05:00 through day20 00:00
    val tsLo = (day0 + 10) * 86400000000L + 5L * 3600000000L
    val tsHi = (day0 + 20) * 86400000000L
    val expTs = (0 until 200).filter { i =>
      val us = (day0 + i % 100) * 86400000000L +
        (i % 24) * 3600000000L
      us >= tsLo && us <= tsHi
    }.map(_.toLong).sorted
    assert(TxTable.readKeyRange(spark, t, "ts", tsLo, tsHi)
      .select("doc_id").as[Long].collect().sorted.toSeq == expTs,
      "micros-precision timestamp slice must be exact")
    // a DATE key frame drives deleteKeys through the same stat-long
    // prune: exactly the day-0 rows go
    TxTable.deleteKeys(spark, t,
      Seq(java.sql.Date.valueOf(LocalDate.ofEpochDay(day0)))
        .toDF("dt"), key = "dt", bucketKey = "doc_id")
    assert(TxTable.read(spark, t).select("doc_id").as[Long]
      .collect().sorted.toSeq ==
      (0 until 200).filter(_ % 100 != 0).map(_.toLong).sorted,
      "date-keyed delete must remove exactly the keyed day")
  }

  test("supplementary-plane string keys: manifest pruning compares " +
      "in UTF-8 byte order, so astral-key files are neither " +
      "mis-pruned on read nor skipped by deletes") {
    // U+10400 (𐐀) encodes ABOVE U+E000 in UTF-8 (F0… > EE…) but its
    // UTF-16 surrogate pair (D801 DC00) sorts BELOW U+E000 — the two
    // orders disagree exactly on this pair. Footer stats and Spark
    // min/max aggregates are both UTF-8-ordered, so a UTF-16 String
    // compare at the prune sites would silently skip these files.
    // (replaceKeysOnce shares deleteKeys' comparator; its prune only
    // arms above 16 files, so deleteKeys is the executable pin.)
    val astral = "𐐀" // U+10400 DESERET CAPITAL LONG I
    val bmpHigh = ""      // BMP private-use, above surrogates

    // readKeyRangeString: file bounds [a, 𐐀]; the range [U+E000, 𐐀]
    // contains the astral row under Spark's UTF8String order — a
    // UTF-16 prune sees max D801… < lo E000 and drops the file
    val t1 = freshDir()
    assert(TxTable.create(Seq(("a", 1L), (astral, 2L)).toDF("id", "v"),
      t1, bucketKey = "id", buckets = 1))
    val s1 = TxTable.snapshot(t1).get
    assert(s1.files.forall(f => s1.strRange("id", f).nonEmpty),
      "fixture must carry string stats or the prune path is untested")
    assert(TxTable.readKeyRangeString(spark, t1, "id", bmpHigh, astral)
      .select("v").as[Long].collect().toSeq == Seq(2L),
      "in-range astral-key row dropped by manifest pruning")

    // deleteKeys: the delete frame's UTF-8 min is U+E000; the file
    // holding 𐐀 has UTF-16 max BELOW that and would be wrongly
    // pruned — the takedown must still take effect
    val t2 = freshDir()
    assert(TxTable.create(
      Seq((astral, "x"), ("a", "y")).toDF("doc_id", "text"), t2,
      bucketKey = "doc_id", buckets = 1))
    TxTable.deleteKeys(spark, t2,
      Seq(bmpHigh, astral).toDF("doc_id"))
    assert(TxTable.read(spark, t2).select("doc_id").as[String]
      .collect().toSeq == Seq("a"),
      "astral-key delete skipped its file (UTF-16-ordered prune)")
  }
}
