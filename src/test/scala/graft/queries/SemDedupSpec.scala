package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.VectorFns
import graft.operators.AnnSearch
import org.apache.spark.sql.functions._

/** q_dedup_semantic (SemDeDup) invariants beyond the oracle hash:
  * representatives are component minima, members co-habit quantizer
  * cells with their representative's component chain, the pair space
  * never crosses cells, and the physical plan is the cell equi-join
  * (no nested-loop pair scan — the whole point vs the bounded
  * q_dedup_embed_* exact tiers).
  */
class SemDedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("representative is the component minimum; keep flags exact") {
    val rows = SparkEntry.queries("q_dedup_semantic")(spark, dir).collect()
    assert(rows.nonEmpty, "fixture must produce at least one dup cluster")
    val byRep = rows.groupBy(_.getLong(1))
    for ((rep, members) <- byRep) {
      val ids = members.map(_.getLong(0))
      assert(ids.min == rep, s"rep $rep is not the min of ${ids.toSeq}")
      assert(ids.distinct.length == ids.length)
      for (m <- members) {
        assert(m.getBoolean(2) == (m.getLong(0) == rep))
        assert(m.getLong(3) == members.length,
          s"cluster_size ${m.getLong(3)} != ${members.length}")
      }
      assert(members.length > 1, "singletons must not be emitted")
    }
  }

  test("every duplicate pair chain stays within quantizer cells") {
    // members of one component need not ALL share a cell, but each
    // edge is intra-cell; verify the weaker per-component invariant
    // that every member shares its cell with at least one other
    // member (its edge partner) — for component size 2 that means the
    // same cell.
    val e = Tables.embeddings(spark, dir)
    val cents = AnnSearch.trainQuantizer(e, nCentroids = 8, kmeansIters = 1)
    val cell = AnnSearch.assignCells(e, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("q_dedup_semantic")(spark, dir).collect()
    for ((_, members) <- rows.groupBy(_.getLong(1))) {
      val cells = members.map(r => cell(r.getLong(0)))
      val counts = cells.groupBy(identity).view.mapValues(_.size)
      assert(counts.values.forall(_ >= 2) || members.length == 1,
        s"a member has no intra-cell partner: cells=${cells.toSeq}")
    }
  }

  test("plan: pair space is a cell equi-join, not a loop join") {
    val f = SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!f.contains("BroadcastNestedLoopJoin") &&
      !f.contains("CartesianProduct"),
      "SemDeDup must never form an unbucketed pair scan")
  }
}
