package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_pack_batches: length-grouped batching invariants — batch sizes,
  * exact padding arithmetic, and the padding win of sorted over
  * arrival-order assignment (chunking the length-sorted order
  * minimizes the sum of per-chunk maxima for the same chunk sizes).
  */
class PackBatchesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("padding arithmetic exact; sorted batching never pads more " +
      "in total than arrival order") {
    val rows = SparkEntry.queries("q_pack_batches")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 16, "batch size in 1..16")
      assert(r.getLong(4) >= 0 && r.getLong(6) >= 0, "padding non-negative")
    }
    val byLang = rows.groupBy(_.getString(0))
    for ((lang, rs) <- byLang) {
      val (ps, pa) = (rs.map(_.getLong(4)).sum, rs.map(_.getLong(6)).sum)
      assert(ps <= pa,
        s"$lang: sorted padding $ps exceeds arrival padding $pa")
    }
  }
}
