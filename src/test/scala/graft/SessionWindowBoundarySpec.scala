package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Pins Spark's `session_window` gap semantics at the EXACT boundary,
  * so the q_events_session_window oracle (WindowQueries: new session
  * iff gap > 30 min) can never silently diverge: Spark MERGES an
  * event arriving exactly `gap` after the previous one — the merge
  * condition is `gap <= duration`, inclusive — and splits one
  * microsecond later. The driver fixture happens to contain no exact
  * 30-minute µs gaps; this spec covers the boundary the fixture
  * doesn't.
  */
class SessionWindowBoundarySpec extends SparkSpec {
  import spark.implicits._

  private def sessions(gapMicros: Long): Array[(Timestamp, Timestamp, Long)] = {
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    val df = Seq(base, base + gapMicros).toDF("us")
      .select(lit(1L).as("u"), timestamp_micros(col("us")).as("ts"))
    df.groupBy(col("u"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start"), col("session_window.end"),
        col("n"))
      .orderBy("start")
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
  }

  private val thirtyMinUs = 30L * 60 * 1000000

  test("an exact 30-minute gap MERGES (matches the oracle's gap > " +
      "30min new-session rule)") {
    val s = sessions(thirtyMinUs)
    assert(s.length == 1, s"expected one merged session, got ${s.toSeq}")
    assert(s.head._3 == 2)
    // end = last event + gap
    assert(s.head._2.getTime - s.head._1.getTime == 2 * 30 * 60 * 1000)
  }

  test("one microsecond past the gap SPLITS") {
    val s = sessions(thirtyMinUs + 1)
    assert(s.length == 2, s"expected two sessions, got ${s.toSeq}")
    assert(s.forall(_._3 == 1))
  }

  test("one microsecond under the gap merges") {
    val s = sessions(thirtyMinUs - 1)
    assert(s.length == 1)
  }
}
