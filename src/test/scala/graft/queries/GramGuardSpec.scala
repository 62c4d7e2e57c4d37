package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The gram kernel's two raggedness defenses (ADVICE r6):
  * within-partition ragged rows fail in the task, and partitions
  * that are internally consistent at DIFFERENT dims — invisible to
  * the per-row check — fail in the global marker guard instead of
  * silently mixing triangle indices. Also pins that the guard branch
  * reuses the main branch's exchange, so the N·d²/2 kernel still
  * runs exactly once.
  */
class GramGuardSpec extends SparkSpec {
  import spark.implicits._

  private def emb(dim: Int, ids: Range) =
    ids.map(i => (i.toLong, Array.fill(dim)(0.5f)))
      .toDF("vec_id", "embedding")

  test("internally-consistent partitions at different dims fail loudly") {
    // union of two single-dim frames keeps their partitions separate,
    // so every partition passes the per-row require — only the
    // cross-partition marker guard can catch this
    val ragged = emb(4, 0 until 8).repartition(2)
      .unionByName(emb(6, 8 until 16).repartition(2))
    val e = intercept[Exception] {
      SimilarityQueries.gramE12Of(ragged).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m =>
      m != null && m.contains("mixed embedding dims")),
      s"expected the marker-guard error, got: $e")
  }

  test("consistent dims pass and yield the exact triangle") {
    val out = SimilarityQueries.gramE12Of(emb(3, 0 until 5).repartition(3))
      .orderBy("i", "j").collect()
    // 5 vectors of 0.5f: quantE6(0.5) = 500000; each cell = 5 * 25e10
    assert(out.length == 6) // d(d+1)/2 = 6 upper-triangle cells
    assert(out.forall(_.getLong(2) == 5L * 500000L * 500000L))
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)))
  }

  test("the kernel runs once: both branches read the checkpoint barrier") {
    // Without the localCheckpoint barrier Catalyst pushes the guard's
    // i = -1 filter beneath the groupBy and re-executes the N·d²/2
    // kernel for a handful of marker rows (observed: only the cheap
    // repartition exchange got reused). The barrier pins the shape:
    // the result plan reads the materialized d²-row RDD and contains
    // no MapPartitions kernel at all.
    val df = SimilarityQueries.gramE12Of(emb(4, 0 until 8).repartition(2))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("MapPartitions"),
      s"result plan must read the checkpoint, not re-run the kernel:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("LogicalRDD") ||
      p.contains("Scan"), s"expected a checkpoint scan in:\n$p")
  }

  test("empty corpus yields the empty frame, not a guard error") {
    val empty = emb(4, 0 until 0)
    assert(SimilarityQueries.gramE12Of(empty).collect().isEmpty)
  }
}
