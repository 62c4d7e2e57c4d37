package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** THE COMMIT-PROTOCOL SEAM of [[TxTable]]: the two storage
  * primitives the whole transaction layer rests on, isolated so an
  * object-store port swaps ONE small implementation instead of
  * touching the protocol. Everything else TxTable does against
  * storage is plain immutable reads/writes (data files land before
  * any manifest references them; readers resolve manifests first) —
  * only these two operations carry atomicity requirements.
  *
  * Mapping to real stores:
  *  - `putIfAbsent` ↔ S3 conditional PUT (`If-None-Match: *`), GCS
  *    `ifGenerationMatch=0`, Azure `If-None-Match: *`, or a
  *    commit-coordinator row insert (the DynamoDB LogStore shape).
  *  - `replace` ↔ a plain last-writer-wins PUT (the `_head` hint is
  *    best-effort and monotone-probed by readers, so lost or
  *    reordered replaces cost extra probes, never correctness).
  *
  * CONTRACT for `putIfAbsent`: returns true iff THIS call created
  * the object; false iff the path already exists (a competing writer
  * won the slot). An implementation over a store with AMBIGUOUS
  * failures (a conditional PUT whose response is lost) must resolve
  * the ambiguity internally before returning — e.g. read the object
  * back and compare a writer-unique token (TxTable manifests embed
  * writer-unique data-file UUIDs, so byte comparison decides
  * ownership). Returning false for a put that actually landed would
  * make a guard-less writer (plain [[TxTable.append]]) re-commit its
  * rows under the next slot — a duplicate. A spurious false WITHOUT
  * a landed object is safe (the caller rebases and retries the same
  * slot) and is exactly how a retryable 5xx should surface.
  */
trait TxCommitStore {
  /** Atomic create-if-absent: true iff this call created `path` with
    * `bytes`. Must never leave a partially-written object visible at
    * `path`. */
  def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean

  /** Atomic full replace of `path` with `bytes` (create if absent).
    * Last writer wins; readers must never observe a torn value. */
  def replace(path: Path, bytes: Array[Byte]): Unit
}

/** S3-SEMANTICS REFERENCE IMPLEMENTATION: the commit protocol as an
  * object-store port runs it — the CAS decision is a CONDITIONAL PUT
  * (`If-None-Match: *`) against the store's own object namespace,
  * the head hint a plain overwrite PUT, and NO filesystem rename or
  * hard link enters the protocol anywhere (S3 has neither; the
  * LocalFs twin's `createLink`-as-CAS is exactly the primitive a
  * port loses). The service's internal serialization of conditional
  * PUTs is modeled by the atomic map insert — that is the store's
  * own atomicity, as in real S3, not a filesystem trick. Committed
  * objects are MATERIALIZED to the local path namespace afterwards
  * purely so [[TxTable]]'s read path (GETs in a real port) can
  * observe them; a reader probing the slot between the CAS decision
  * and the materialization simply misses it and re-probes — the
  * protocol already tolerates that (hint staleness / listing lag),
  * and the stress matrix runs this store under fault injection to
  * prove it. List-after-write is strongly consistent here, matching
  * S3's (post-2020) strong read-after-write — no stale-listing
  * shortcut is taken or needed: readers resolve manifests by direct
  * slot probes, never by trusting a listing to be complete.
  *
  * Scope: one store instance = one bucket. Deletions (vacuum,
  * retention) go through the filesystem directly — a vacuumed slot
  * stays occupied in the map, which is safe because version slots
  * are monotone and never reused. */
final class ObjectStoreCommitStore extends TxCommitStore {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private def key(path: Path): String =
    path.toAbsolutePath.normalize.toString

  // GET-visibility plumbing of the harness, not part of the CAS:
  // the decision was already made by the conditional PUT above it
  private def materialize(path: Path, bytes: Array[Byte]): Unit = {
    val tmp = path.getParent.resolve(
      s"tmp-obj-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean = {
    val won = objects.putIfAbsent(key(path), bytes) == null
    if (won) materialize(path, bytes)
    won
  }

  override def replace(path: Path, bytes: Array[Byte]): Unit = {
    objects.put(key(path), bytes)
    materialize(path, bytes)
  }
}

/** Local-filesystem implementation — the exact protocol TxTable
  * shipped with: write a temp file in the target's directory, then
  * `Files.createLink` (hard-link creation is atomic and fails if the
  * target exists — POSIX's create-if-absent) for the CAS, and
  * `ATOMIC_MOVE` + `REPLACE_EXISTING` for the hint. */
object LocalFsCommitStore extends TxCommitStore {
  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean = {
    val tmp = path.getParent.resolve(
      s"tmp-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, bytes)
    try { Files.createLink(path, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  override def replace(path: Path, bytes: Array[Byte]): Unit = {
    val tmp = path.getParent.resolve(
      s"tmp-head-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
