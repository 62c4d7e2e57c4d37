package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Standing audit of every per-key state fold in the engine
  * (`collect_list` and friends): each site holds a key's whole group
  * in one task, which is fine exactly when the group is bounded — by
  * config, by a fixed dimension, or by a documented fits-one-task
  * precondition (the sessionizer contract). This spec makes that
  * class ENUMERABLE: every file that materializes per-key state is
  * listed below with its boundedness argument, and the listed file
  * must carry the argument in its own (scala)doc. Adding a new
  * `collect_list` anywhere — or stripping the documentation from an
  * existing one — fails the audit until the site is justified here
  * AND in the source.
  */
class BoundedStateAuditSpec extends AnyFunSuite {

  private val srcRoot = Paths.get("src/main/scala")

  /** file (relative to src/main/scala) -> (expected occurrences of
    * "collect_list", boundedness argument, a phrase the file's own
    * docs must contain so the justification lives with the code). */
  private val allowed: Map[String, (Int, String, String)] = Map(
    "graft/queries/AnalyticsQueries.scala" -> ((1,
      "q_events_ema: per-user event history; recursive EMA is " +
        "inherently sequential per key — fits-one-task stated in doc, " +
        "scale path is the streaming stateful op",
      "must fit a task")),
    "graft/queries/EventQueries.scala" -> ((1,
      "q_events_pattern: per-user event-type string for regex " +
        "matching — the sessionizer fits-one-task contract",
      "fits-one-task")),
    "graft/queries/PipelineQueries.scala" -> ((1,
      "firehose batch assembly: one row per (block, batch) bounded " +
        "by the decoder's batch-size contract",
      "collect_list is safe here")),
    "graft/queries/CompositeQueries.scala" -> ((1,
      "nation-name list per group: fixed 25-row dimension",
      "collect_list order is partition-dependent")),
    "graft/operators/PrefixSum.scala" -> ((1,
      "per-partition counts frame: #partitions rows, cluster config",
      "partition")),
    "graft/operators/AnnSearch.scala" -> ((2,
      "centroid/codebook assembly: d values per cell, config-bounded",
      "collecting only")),
    "graft/operators/ApproxDedup.scala" -> ((1,
      "per-fingerprint member list: O(group size) vs the O(group^2) " +
        "pair explosion it replaces; groups doc'd in scaladoc",
      "O(group size) memory")),
    "graft/operators/TriangleCount.scala" -> ((1,
      "adjacency arrays after degree orientation: out-degree " +
        "bounded by O(sqrt(edges))",
      "degree")),
    "graft/operators/KMeans.scala" -> ((1,
      "k centroids collapsed to one broadcast row: k is config",
      "collect_list is partition-dependent")),
    "graft/operators/LineDedup.scala" -> ((1,
      "document reassembly after line-level dedup: one document's " +
        "segments per key — the chunker/sessionizer fits-one-task " +
        "contract, stated in scaladoc",
      "fits-one-task")))

  /** Same discipline for BATCH group folds (`mapGroups` /
    * `flatMapGroups` — a whole group's rows in one task; the
    * `...WithState` streaming variants hold bounded state by design
    * and are excluded by the regex). */
  private val allowedGroupFolds: Map[String, (Int, String, String)] = Map(
    "graft/operators/SequencePacking.scala" -> ((1,
      "packBinsFfd: per-shard FFD scan over (id, tokens) pairs — " +
        "16 bytes/doc, the fits-one-task shard contract stated in " +
        "scaladoc; shards are the parallel unit",
      "fits-one-task")),
    "graft/streaming/StatefulSessionizer.scala" -> ((1,
      "sessionsBatch parity adapter: one user's events per task — " +
        "the sessionizer fits-one-task contract; the unbounded-key " +
        "scale path is the streaming state machine (one open session " +
        "of state)",
      "fits-one-task")))

  private def scalaFiles(p: Path): Seq[Path] =
    Files.walk(p).iterator.asScala
      .filter(f => f.toString.endsWith(".scala")).toSeq

  test("every collect_list site is enumerated with a boundedness " +
      "argument, and the argument lives in the file's own docs") {
    val found = scalaFiles(srcRoot).flatMap { f =>
      val text = Files.readString(f)
      val n = "collect_list\\(".r.findAllIn(text).length
      if (n == 0) None
      else Some(srcRoot.relativize(f).toString.replace('\\', '/') ->
        (n, text))
    }.toMap

    val unlisted = found.keySet -- allowed.keySet
    assert(unlisted.isEmpty,
      s"NEW per-key state fold(s) in ${unlisted.mkString(", ")} — " +
        "document the fits-one-task/bounded-group precondition in " +
        "the file and add a justified entry to BoundedStateAuditSpec")

    val gone = allowed.keySet -- found.keySet
    assert(gone.isEmpty,
      s"allow-list rot: ${gone.mkString(", ")} no longer contains " +
        "collect_list — remove the entries so the list stays exact")

    for ((file, (nExpected, why, marker)) <- allowed) {
      val (nActual, text) = found(file)
      assert(nActual == nExpected,
        s"$file: expected $nExpected collect_list occurrence(s) " +
          s"(justified as: $why), found $nActual — re-justify the " +
          "new/removed site here")
      assert(text.contains(marker),
        s"$file: the documented precondition phrase '$marker' is " +
          "gone — the boundedness argument must live in the source, " +
          "not only in this spec")
    }
  }

  test("every batch mapGroups/flatMapGroups fold is enumerated with " +
      "a boundedness argument that lives in the file's own docs") {
    val foldRe = """\.(?:flatMapGroups|mapGroups)\s*[({\[]""".r
    val found = scalaFiles(srcRoot).flatMap { f =>
      val text = Files.readString(f)
      val n = foldRe.findAllIn(text).length
      if (n == 0) None
      else Some(srcRoot.relativize(f).toString.replace('\\', '/') ->
        (n, text))
    }.toMap

    val unlisted = found.keySet -- allowedGroupFolds.keySet
    assert(unlisted.isEmpty,
      s"NEW whole-group fold(s) in ${unlisted.mkString(", ")} — " +
        "document the fits-one-task/bounded-group precondition in " +
        "the file and add a justified entry to BoundedStateAuditSpec")

    val gone = allowedGroupFolds.keySet -- found.keySet
    assert(gone.isEmpty,
      s"allow-list rot: ${gone.mkString(", ")} no longer folds " +
        "groups — remove the entries so the list stays exact")

    for ((file, (nExpected, why, marker)) <- allowedGroupFolds) {
      val (nActual, text) = found(file)
      assert(nActual == nExpected,
        s"$file: expected $nExpected group-fold site(s) " +
          s"(justified as: $why), found $nActual")
      assert(text.contains(marker),
        s"$file: the documented precondition phrase '$marker' is gone")
    }
  }
}
