package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("PiiScrub redacts all three classes and is idempotent") {
    val df = Seq(
      "mail a.b+c@ex-ample.co.uk now",
      "call +44-123-4567 or visit 192.168.0.1",
      "clean text, no pii",
      "edge: x@y.io at 1.2.3.4 phone +1-555-0000").toDF("t")
    val once = df.select(PiiScrub.scrub(col("t")).as("t"))
    val out = once.as[String].collect()
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "call <PHONE> or visit <IP>")
    assert(out(2) == "clean text, no pii")
    assert(out(3) == "edge: <EMAIL> at <IP> phone <PHONE>")
    val twice = once.select(PiiScrub.scrub(col("t")).as("t")).as[String].collect()
    assert(twice.sameElements(out), "scrub must be idempotent")
    val counts = df.agg(
      sum(PiiScrub.countEmails(col("t"))),
      sum(PiiScrub.countPhones(col("t"))),
      sum(PiiScrub.countIps(col("t")))).first()
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) == ((2L, 2L, 2L)))
  }

  test("Contamination.overlap counts distinct shared grams and bench docs") {
    // train 1 shares "a b c" (and "b c d") with bench 10 and 11;
    // train 2 shares nothing.
    val train = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    val bench = Seq((10L, "a b c d"), (11L, "q a b c")).toDF("doc_id", "text")
    val out = Contamination.overlap(train, bench, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // train 1 grams: {a b c, b c d}; bench grams: 10 → {a b c, b c d},
    // 11 → {q a b, a b c}. Shared = both grams, hitting both docs.
    assert(out.toSeq == Seq((1L, 2L, 2L)))
  }

  test("boilerplate grams use document frequency, not term frequency") {
    val docs = Seq(
      (1L, "the end the end"),   // "the end" twice in one doc → df 1
      (2L, "the end is near"),
      (3L, "no match here")).toDF("doc_id", "text")
    val out = CorpusStats.boilerplateGrams(docs, n = 2, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("the end", 2L)))
  }

  test("sampleByRates keeps a deterministic per-group subset") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val rates = Seq(("en", 100), ("es", 0), ("de", 50), ("fr", 50),
      ("zh", 50)).toDF("lang", "rate")
    val kept = Sampling.sampleByRates(docs, "doc_id", "lang", rates)
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == totals("en"), "rate 100 keeps everything")
    assert(!byLang.contains("es"), "rate 0 keeps nothing")
    for (l <- Seq("de", "fr", "zh"))
      assert(byLang(l) > 0 && byLang(l) < totals(l), s"$l partially kept")
    // Determinism under relayout.
    val again = Sampling.sampleByRates(docs.repartition(11), "doc_id",
        "lang", rates).select("doc_id").as[Long].collect().sorted
    val first = kept.select("doc_id").as[Long].collect().sorted
    assert(again.sameElements(first))
  }

  test("overlapBloom is result-identical to overlap") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    val train = docs.filter(col("doc_id") < 450)
    val bench = docs.filter(col("doc_id") >= 450)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = rows(Contamination.overlap(train, bench, n = 5))
    assert(exact.nonEmpty, "fixture must actually contain overlap")
    // Equal at the default fpp AND at an absurdly lossy one — the
    // exact-confirm join must kill every extra Bloom candidate.
    assert(rows(Contamination.overlapBloom(train, bench, n = 5)) == exact)
    assert(rows(Contamination.overlapBloom(train, bench, n = 5,
      fpp = 0.5)) == exact)
  }
}
