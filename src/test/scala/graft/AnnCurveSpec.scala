package graft

import graft.operators.AnnSearch
import org.apache.spark.sql.functions._

/** Pins the ANN operating curve's defining properties on the driver
  * fixture, so a kernel regression that bends the committed
  * ANN_CURVE.md artifact fails the build:
  *   - recall@5 is NON-DECREASING in nProbe for the IVF and IVF-PQ
  *     paths (probing more cells can only add candidates);
  *   - at nProbe = nCells the IVF path is EXACT (recall 1.0): the
  *     candidate set is the whole corpus;
  *   - PQ recall is non-decreasing in the re-rank budget. */
class AnnCurveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val nCells = 8

  test("recall is monotone in nProbe; full probe is exact for IVF; " +
      "PQ recall is monotone in rerank") {
    val e = Tables.embeddings(spark, dir)
    val brute = AnnSearch.bruteTopK(e, k = 5, maxId = 200)
      .localCheckpoint(true)
    val probes = Seq(1, 2, 4, 8)
    val ivf = probes.map(p => AnnCurve.recallOf(brute,
      AnnSearch.ivfTopK(e, k = 5, maxId = 200, nCentroids = nCells,
        nProbe = p, kmeansIters = 0)))
    assert(ivf.zip(ivf.tail).forall { case (a, b) => a <= b },
      s"IVF recall not monotone in nProbe: $ivf")
    assert(ivf.last == 1.0,
      s"IVF at nProbe=nCells must be exact, got ${ivf.last}")
    val ivfpq = probes.map(p => AnnCurve.recallOf(brute,
      AnnSearch.ivfPqTopK(e, k = 5, maxId = 200, nCentroids = nCells,
        nProbe = p)))
    assert(ivfpq.zip(ivfpq.tail).forall { case (a, b) => a <= b },
      s"IVF-PQ recall not monotone in nProbe: $ivfpq")
    val reranks = Seq(5, 15, 45)
    val pq = reranks.map(r => AnnCurve.recallOf(brute,
      AnnSearch.pqTopK(e, k = 5, maxId = 200, rerank = r)))
    assert(pq.zip(pq.tail).forall { case (a, b) => a <= b },
      s"PQ recall not monotone in rerank: $pq")
  }
}
