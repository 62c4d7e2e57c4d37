package graft.sources

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded multi-writer CONTENTION stress for the CAS commit
  * protocol — the invariants someone mapping `createLink` publishes
  * to object-store conditional PUTs must be able to rely on:
  * four concurrent appenders, a key-frame deleter, and a compactor
  * race ~100 commits; afterwards the version history must be a
  * gapless linear chain, no appended row may be lost or duplicated,
  * every committed delete must have landed exactly, manifest row
  * counts must stay exact at every sampled version, and change feeds
  * over random version ranges must replay the content diff exactly
  * (the EXCEPT-ALL-both-ways oracle, in-engine).
  *
  * The SAME invariants run twice: once on the local-FS
  * [[TxCommitStore]] and once through a FAULT-INJECTING store
  * (seeded latency jitter inside the CAS window, ~15% spurious
  * retryable CAS losses — the 5xx-shaped failure an object store
  * surfaces, ~50% dropped `_head` hint updates — the stale-hint
  * case readers must survive), pinning the protocol an object-store
  * port must honor, not just the happy path. */
class TxTableStressSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), "txstress_")
      .toString

  private def rows(ids: Seq[Long]) =
    ids.map(i => (i, s"t$i")).toDF("doc_id", "text")

  /** Wraps a store with seeded faults that a correct caller must
    * absorb: latency inside the CAS window (widens race windows),
    * spurious CAS losses WITHOUT a landed object (the retryable-5xx
    * contract of [[TxCommitStore.putIfAbsent]] — the caller rebases
    * and retries the slot), and dropped head-hint replaces (readers
    * fall back to the listing / forward probe). */
  private final class FaultInjectingStore(inner: TxCommitStore,
                                          seed: Long)
      extends TxCommitStore {
    private val rnd = new java.util.Random(seed)
    private def roll(pct: Int): Boolean =
      rnd.synchronized(rnd.nextInt(100) < pct)
    private def jitter(): Unit = {
      val ms = rnd.synchronized(rnd.nextInt(4))
      if (ms > 0) Thread.sleep(ms.toLong)
    }
    override def putIfAbsent(path: java.nio.file.Path,
                             bytes: Array[Byte]): Boolean = {
      jitter()
      if (roll(15)) return false // retryable loss, nothing landed
      val won = inner.putIfAbsent(path, bytes)
      jitter()
      won
    }
    override def replace(path: java.nio.file.Path,
                         bytes: Array[Byte]): Unit =
      if (!roll(50)) inner.replace(path, bytes) // else: hint goes stale
  }

  /** Models the one failure an S3/GCS port must resolve ITSELF: a
    * conditional PUT whose RESPONSE is lost after the object may
    * have landed. Per the [[TxCommitStore.putIfAbsent]] contract the
    * implementation reads the slot back and compares a writer-unique
    * token — here the manifest bytes themselves (data-file UUIDs and
    * txn records make them writer-unique) — and only then answers.
    * Returning a raw false for a landed put would make a guard-less
    * [[TxTable.append]] re-commit its rows under the next slot (a
    * duplicate); this store pins that the documented resolution
    * closes that hole under real contention. */
  private final class AmbiguousStore(inner: TxCommitStore, seed: Long)
      extends TxCommitStore {
    val ambiguities = new java.util.concurrent.atomic.AtomicLong
    val landedAmbiguities = new java.util.concurrent.atomic.AtomicLong
    private val rnd = new java.util.Random(seed)
    private def roll(pct: Int): Boolean =
      rnd.synchronized(rnd.nextInt(100) < pct)
    override def putIfAbsent(path: java.nio.file.Path,
                             bytes: Array[Byte]): Boolean = {
      val won = inner.putIfAbsent(path, bytes)
      if (roll(25)) {
        // response lost — `won` is unknowable to a real port. The
        // slot is immutable once created, so one read-back decides
        // ownership for good.
        ambiguities.incrementAndGet()
        if (won) landedAmbiguities.incrementAndGet()
        val landed =
          try Files.readAllBytes(path)
          catch { case _: java.io.IOException => null }
        return landed != null && java.util.Arrays.equals(landed, bytes)
      }
      won
    }
    override def replace(path: java.nio.file.Path,
                         bytes: Array[Byte]): Unit =
      inner.replace(path, bytes)
  }

  test("~100 racing commits (4 appenders + deleter + compactor): " +
      "linear history, no lost rows, exact feeds and row counts") {
    stressRun(20260816L)
  }

  test("the same invariants hold when the CAS response itself is " +
      "LOST after the object landed (the ambiguous conditional PUT " +
      "an object-store port must resolve by read-back)") {
    val store = new AmbiguousStore(
      new FaultInjectingStore(LocalFsCommitStore, 777L), 20280816L)
    TxTable.withCommitStore(store) { stressRun(20280816L) }
    assert(store.ambiguities.get() > 0,
      "the injector never fired — the test pinned nothing")
    assert(store.landedAmbiguities.get() > 0,
      "no landed-but-response-lost case occurred — raise the rate " +
        "or commit count so the dangerous path is actually exercised")
  }

  test("the same invariants hold through a fault-injecting commit " +
      "store: latency in the CAS window, spurious retryable losses, " +
      "stale head hints") {
    TxTable.withCommitStore(
      new FaultInjectingStore(LocalFsCommitStore, 4242L)) {
      stressRun(20270816L)
    }
  }

  test("the S3-SEMANTICS reference store passes the full matrix: " +
      "conditional-PUT CAS decisions (no rename/link in the " +
      "protocol) under latency, spurious losses, stale hints, AND " +
      "lost-response ambiguity resolved by read-back") {
    val s3 = new ObjectStoreCommitStore
    // clean-fault pass: the conditional-PUT decision alone carries
    // the protocol through the full racing-writers matrix
    TxTable.withCommitStore(new FaultInjectingStore(s3, 1313L)) {
      stressRun(20290816L)
    }
    // ambiguous pass: the port's one hard failure mode — a landed
    // conditional PUT whose response is lost — resolved by reading
    // the slot back, over the same store
    val amb = new AmbiguousStore(
      new FaultInjectingStore(new ObjectStoreCommitStore, 99L),
      20300816L)
    TxTable.withCommitStore(amb) { stressRun(20300816L) }
    assert(amb.ambiguities.get() > 0,
      "the injector never fired — the test pinned nothing")
    assert(amb.landedAmbiguities.get() > 0,
      "no landed-but-response-lost case occurred — raise the rate " +
        "or commit count so the dangerous path is actually exercised")
  }

  private def stressRun(seed: Long): Unit = {
    val t = freshDir()
    // victims are fully present BEFORE the race, so every delete
    // commit removes exactly its range (no append/delete ambiguity).
    // create absorbs spurious (injected) retryable CAS losses
    // INTERNALLY — false only ever means a competitor's v1 landed
    val victims = (0L until 100L)
    assert(TxTable.create(rows(victims), t))
    assert(TxTable.latestVersion(t).contains(1L))

    val errors = new ConcurrentLinkedQueue[Throwable]()
    val appendsPerWriter = 20
    val writers = 4
    // appender w commits ids (w+1)*10000+k — disjoint from the
    // victim space, so deletes and appends never race for one id
    val appenders = (0 until writers).map { w =>
      new Thread(() => {
        val rnd = new Random(seed + w)
        try {
          for (b <- 0 until appendsPerWriter) {
            TxTable.append(
              rows(Seq((w + 1) * 10000L + 2 * b,
                (w + 1) * 10000L + 2 * b + 1)),
              t, retries = 200)
            if (rnd.nextInt(3) == 0) Thread.sleep(rnd.nextInt(8).toLong)
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    // deleter removes 10 disjoint victim ranges of 10 ids each
    val deleter = new Thread(() => {
      val rnd = new Random(seed - 1)
      try {
        for (r <- 0 until 10) {
          val ids = (r * 10L until r * 10L + 10L)
          TxTable.deleteKeys(spark, t, ids.toDF("doc_id"),
            retries = 200)
          Thread.sleep(rnd.nextInt(15).toLong)
        }
      } catch { case e: Throwable => errors.add(e) }
    })
    // compactor: best-effort maintenance, aborts on contention
    @volatile var compactions = 0
    val compactor = new Thread(() => {
      val rnd = new Random(seed + 99)
      try {
        for (_ <- 0 until 6) {
          if (TxTable.compact(spark, t).nonEmpty) compactions += 1
          Thread.sleep(rnd.nextInt(40).toLong)
        }
      } catch { case e: Throwable => errors.add(e) }
    })

    val all = appenders :+ deleter :+ compactor
    all.foreach(_.start()); all.foreach(_.join())
    assert(errors.isEmpty,
      s"writer threads failed: ${errors.toArray.mkString("; ")}")

    // 1) gapless linear version chain, every version replayable
    val head = TxTable.latestVersion(t).get
    val expectedCommits = 1 + writers * appendsPerWriter + 10 +
      compactions
    assert(head == expectedCommits,
      s"version chain must be exactly one slot per committed write: " +
        s"head=$head expected=$expectedCommits")
    for (v <- 1L to head)
      assert(TxTable.snapshot(t, Some(v)).nonEmpty,
        s"gap in the version chain at v$v")

    // 2) no lost / duplicated rows: victims minus deleted + appends
    val appended = for (w <- 0 until writers;
                        k <- 0 until appendsPerWriter * 2)
      yield (w + 1) * 10000L + k
    // the deleter removed ALL 100 victims (10 ranges x 10 ids)
    val expected = appended.toSet
    val got = TxTable.read(spark, t).select("doc_id").as[Long]
      .collect().toSeq
    assert(got.size == got.distinct.size,
      "a CAS rebase duplicated rows")
    assert(got.toSet == expected,
      s"lost/phantom rows: missing=${expected -- got.toSet} " +
        s"phantom=${got.toSet -- expected}")

    // 3) manifest row counts exact at sampled versions
    val rnd = new Random(seed)
    val sampleVs = (Seq(1L, head) ++
      Seq.fill(6)(1L + rnd.nextInt(head.toInt).toLong)).distinct
    for (v <- sampleVs) {
      val s = TxTable.snapshot(t, Some(v)).get
      val n = TxTable.read(spark, t, Some(v)).count()
      assert(s.totalRows.contains(n),
        s"manifest row count at v$v: ${s.totalRows} != $n")
    }

    // 4) change feeds replay the content diff exactly over random
    // ranges (inserts = read(b) \\ read(a), deletes = the reverse)
    val pairs = Seq.fill(5) {
      val a = rnd.nextInt(head.toInt).toLong      // 0..head-1
      val b = a + 1 + rnd.nextInt((head - a).toInt)
      (a, b)
    }.distinct
    for ((a, b) <- pairs) {
      def content(v: Long) =
        if (v == 0L) rows(Nil) else TxTable.read(spark, t, Some(v))
      val feed = TxTable.changes(spark, t, a, b)
      val ins = feed.filter(col("_change") === "insert")
        .select("doc_id", "text")
      val del = feed.filter(col("_change") === "delete")
        .select("doc_id", "text")
      val expIns = content(b).exceptAll(content(a))
      val expDel = content(a).exceptAll(content(b))
      assert(ins.exceptAll(expIns).isEmpty &&
        expIns.exceptAll(ins).isEmpty,
        s"feed($a,$b) inserts diverge from the content diff")
      assert(del.exceptAll(expDel).isEmpty &&
        expDel.exceptAll(del).isEmpty,
        s"feed($a,$b) deletes diverge from the content diff")
    }
  }
}
