package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last ~2000 chars of the bench run's
  * output and parses the JSON line out of that window (round 3's
  * full-registry line overflowed it → `parsed: null`, a lost perf
  * round). These tests pin the emitted line's worst-case size with a
  * hard margin for the trailing sbt "[success] Total time..." chatter
  * that shares the window.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val worstCase =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9999.999)

  test("headline JSON line fits the 2000-char capture window with margin") {
    val line = Bench.jsonLine(worstCase, "/root/testdata/sf0.1", 9999.999)
    assert(line.length <= 1600,
      s"bench line ${line.length} chars — would risk scrolling out of the driver's 2000-char tail")
  }

  test("build_sec is reported as its own field and added to value") {
    val line = Bench.jsonLine(Seq("q_a" -> 2.0, "q_b" -> 3.0), "sf", 1.5)
    assert(line.contains(""""build_sec":1.500"""), line)
    assert(line.contains(""""value":6.500"""), line)
    val full = Bench.fullJson(Seq("q_a" -> 2.0), "sf", buildSec = 0.25)
    assert(full.contains(""""build_sec":0.250""") &&
      full.contains(""""value":2.250"""), full)
  }

  test("every headline key exists in the registry") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline keys not in registry: $missing")
  }

  test("failure sentinel stays integral -1") {
    assert(Bench.fmt(-1.0) == "-1")
    assert(Bench.fmt(1.23456) == "1.235")
  }

  test("full JSON covers the whole registry") {
    val full = Bench.fullJson(worstCase, "/root/testdata/sf0.1")
    for (k <- SparkEntry.queries.keys)
      assert(full.contains(s""""$k":"""), s"missing $k in full JSON")
  }
}
