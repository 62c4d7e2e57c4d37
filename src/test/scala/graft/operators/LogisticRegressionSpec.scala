package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ground-truth spec for the fixed-point logistic trainer: an
  * independent serial BigInt replay of the exact same arithmetic
  * (hard sigmoid, truncate-toward-zero division) run against the
  * distributed operator on randomized weighted cells — the BpeSpec
  * discipline. Any divergence in clamp, rounding, or fold order
  * shows up as an exact integer mismatch.
  */
class LogisticRegressionSpec extends SparkSpec {
  import spark.implicits._

  private val S = LogisticRegression.S

  /** Serial replay over (x1, x2, y, w) cells. */
  private def serialFit(cells: Seq[(Long, Long, Long, Long)],
      lrDiv: Long, iterations: Int): (Long, Long, Long, Long, Long, Long, Long) = {
    def tdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b) // BigInt / truncates for >=0
    def sig(z: BigInt): BigInt =
      (z + 4 * S).max(BigInt(0)).min(BigInt(8) * S) / 8 match {
        case p => p.min(BigInt(S))
      }
    var (w0, w1, w2) = (BigInt(0), BigInt(0), BigInt(0))
    val n = cells.map(_._4).sum
    for (_ <- 1 to iterations) {
      var (g0, g1, g2) = (BigInt(0), BigInt(0), BigInt(0))
      cells.foreach { case (x1, x2, y, w) =>
        val e = sig(w0 + w1 * x1 + w2 * x2) - BigInt(y) * S
        g0 += BigInt(w) * e; g1 += BigInt(w) * e * x1
        g2 += BigInt(w) * e * x2
      }
      val d = BigInt(n) * lrDiv
      w0 -= tdiv(g0, d); w1 -= tdiv(g1, d); w2 -= tdiv(g2, d)
    }
    var (nPos, nPredPos, nCorrect) = (0L, 0L, 0L)
    cells.foreach { case (x1, x2, y, w) =>
      val pred = if (sig(w0 + w1 * x1 + w2 * x2) >= S / 2) 1L else 0L
      nPos += w * y; nPredPos += w * pred
      if (pred == y) nCorrect += w
    }
    (w0.toLong, w1.toLong, w2.toLong, n, nPos, nPredPos, nCorrect)
  }

  private def runBoth(cells: Seq[(Long, Long, Long, Long)],
      lrDiv: Long, iters: Int): Unit = {
    val df = cells.toDF("x1", "x2", "y", "w")
    val got = LogisticRegression.fit(df, lrDiv, iters).collect()(0)
    val want = serialFit(cells, lrDiv, iters)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5), got.getLong(6)) == want,
      s"distributed != serial replay: got $got want $want")
  }

  test("matches the serial fixed-point replay on random weighted cells") {
    val rnd = new scala.util.Random(42)
    val cells = (1 to 80).map { _ =>
      val x1 = rnd.nextInt(12).toLong
      val x2 = rnd.nextInt(12).toLong
      // label correlated with x1 so gradients move in both signs
      val y = if (x1 + rnd.nextInt(8) > 8) 1L else 0L
      (x1, x2, y, (rnd.nextInt(50) + 1).toLong)
    }.distinct
    runBoth(cells, lrDiv = 16L, iters = 3)
  }

  test("all-negative labels: predicts negative, counts stay exact") {
    val cells = Seq((1L, 2L, 0L, 10L), (3L, 1L, 0L, 5L), (0L, 0L, 0L, 2L))
    runBoth(cells, lrDiv = 8L, iters = 2)
    val out = LogisticRegression.fit(
      cells.toDF("x1", "x2", "y", "w"), 8L, 2).collect()(0)
    assert(out.getLong(4) == 0L, "n_pos must be 0")
    assert(out.getLong(6) == out.getLong(3) - out.getLong(5),
      "correct = all docs minus predicted-positive when labels are 0")
  }

  test("extreme magnitudes: huge weights/features stay exact " +
    "(decimal sums, no long overflow)") {
    // w up to 1e9 docs per cell and x up to 1e4: per-cell gradient
    // terms reach ~1e9·1e6·1e4 = 1e19 > Long.MaxValue — exactly the
    // regime the DECIMAL(38,0) sums exist for. The serial BigInt
    // replay is the overflow-free reference.
    val cells = Seq(
      (10000L, 0L, 1L, 1000000000L),
      (0L, 10000L, 0L, 999999999L),
      (9999L, 9999L, 1L, 123456789L),
      (1L, 1L, 0L, 1L))
    runBoth(cells, lrDiv = 16L, iters = 2)
  }

  test("single gradient step from zero weights is the analytic value") {
    // z = 0 → p = S/2 exactly; e = S/2 - y·S. One cell, w = 1:
    // g0 = e, update = -tdiv(e, lrDiv). For y = 1: e = -S/2,
    // w0 = S/(2·lrDiv).
    val cells = Seq((0L, 0L, 1L, 1L))
    val out = LogisticRegression.fit(
      cells.toDF("x1", "x2", "y", "w"), lrDiv = 4L, iterations = 1)
      .collect()(0)
    assert(out.getLong(0) == S / 8,
      s"w0 must be S/(2·4) = ${S / 8}, got ${out.getLong(0)}")
    assert(out.getLong(1) == 0L && out.getLong(2) == 0L)
  }
}
