package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("segments: non-overlapping width-token runs, trailing " +
      "remainder kept, original order indexed") {
    val segs = LineDedup.segments(
      docs((1L, "a b c d e f g")), width = 3).collect()
      .map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(segs.toSeq == Seq((0, "a b c"), (1, "d e f"), (2, "g")))
  }

  test("a segment recurring across >= minDf docs is dropped from " +
      "EVERY doc; unique segments survive; docs reassemble in order") {
    // "x y z" appears in docs 1, 2, 3 (df=3); every other segment
    // is unique (df=1)
    val d = docs(
      (1L, "x y z a a a"),
      (2L, "b b b x y z"),
      (3L, "x y z c c c"),
      (4L, "d d d e e e"))
    val out = LineDedup.cleanProfile(d, width = 3, minDf = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(4)))
    // each doc: 2 segments; docs 1-3 drop the shared one (3 tokens,
    // 5 chars remain), doc 4 keeps both (11 chars)
    assert(out.toSeq == Seq(
      (1L, 2, 1, 5), (2L, 2, 1, 5), (3L, 2, 1, 5), (4L, 2, 0, 11)))
  }

  test("clean_hash is the md5 of the reassembled kept text, " +
      "order-preserving") {
    val d = docs((1L, "x y z a a a"), (2L, "x y z b b b"))
    val out = LineDedup.cleanProfile(d, width = 3, minDf = 2)
      .orderBy("doc_id").collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getString(3) == md5hex("a a a"))
    assert(out(1).getString(3) == md5hex("b b b"))
  }

  test("a doc whose every segment is boilerplate still appears, " +
      "empty (the lost-doc regression)") {
    val d = docs((1L, "x y z"), (2L, "x y z"), (3L, "u v w"))
    val out = LineDedup.cleanProfile(d, width = 3, minDf = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getInt(2) == 1 && out(0).getInt(4) == 0,
      "fully-boilerplate doc: all dropped, zero-length clean text")
    assert(out(2).getInt(2) == 0 && out(2).getInt(4) == 5)
  }

  test("frequency is DOCUMENT frequency: in-doc repetition does not " +
      "trigger the drop") {
    val d = docs((1L, "x y z x y z"), (2L, "a b c d e f"))
    val out = LineDedup.cleanProfile(d, width = 3, minDf = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getInt(2) == 0,
      "df of 'x y z' is 1 (one doc) — both copies survive")
  }

  test("the frequent-set side of the flag join is broadcast (the " +
      "corpus is never shuffled by segment key)") {
    val d = docs((1L, "x y z a a a"), (2L, "x y z b b b"))
    val plan = LineDedup.cleanProfile(d, width = 3, minDf = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast flag join, got:\n$plan")
  }
}
