package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the shared RRF core: the Column form (batch plans) and the
  * scalar form (streaming folds) are bit-equal over the ENTIRE input
  * domain a bounded fusion can produce — every rank pair to depth
  * 1000 plus the one-sided absent cases. This is what licenses the
  * "no forked arithmetic" claim for q_retrieval_fusion vs S23. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("Column and scalar kernels agree bit-for-bit over the full " +
      "bounded-rank domain (both-present, and each side absent)") {
    val depth = 1000
    val pairs =
      (for (b <- 1 to depth; c <- Seq(Some(b), Some(depth + 1 - b), None))
        yield (Some(b): Option[Int], c)) ++
        (1 to depth).map(c => (None: Option[Int], Some(c)))
    val df = pairs.toDF("rb", "rc")
      .withColumn("col_rrf", Rrf.scoreCol(col("rb"), col("rc")))
    val rows = df.collect()
    assert(rows.length == pairs.size)
    rows.foreach { r =>
      val rb = if (r.isNullAt(0)) None else Some(r.getInt(0))
      val rc = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val scalar = Rrf.score(rb, rc)
      val viaCol = r.getDouble(2)
      assert(java.lang.Double.doubleToLongBits(scalar) ==
        java.lang.Double.doubleToLongBits(viaCol),
        s"fork at ($rb, $rc): scalar=$scalar column=$viaCol")
    }
  }
}
