package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the dominant stopword profile") {
    val rows = Seq(
      (1L, "the cat sat on the mat and it is happy that you came to see it"),
      (2L, "el perro corre en la calle y el gato duerme en una casa"),
      (3L, "der hund und die katze sind nicht mit dem ball zufrieden ich glaube"),
      (4L, "le chat et les oiseaux sont dans le jardin avec des fleurs"),
      (5L, "zzz qqq xxx www")).toDF("doc_id", "text")
    val got = rows.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr",
      5L -> "und"))
  }

  test("token counts: whitespace vs BPE-ish segmentation") {
    val df = Seq((1L, "hello world42 again!")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.wsTokenCount($"text"),
      TextAnalysis.bpeTokenCount($"text")).head()
    assert(r.getInt(0) == 3)
    // hello | world | 42 | again | !
    assert(r.getInt(1) == 5)
  }

  test("fingerprints: whitespace-insensitive doc hash, chunk overlap detection") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha  beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "totally different words here having nothing shared with others at all"))
      .toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextAnalysis.docFingerprint($"text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L), "whitespace-normalized hash must agree")
    assert(fp(1L) != fp(3L))
    // docs sharing an 8-token chunk share a chunk fingerprint
    val chunks = df.select($"doc_id",
      TextAnalysis.chunkFingerprints($"text", 8).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(chunks(1L).intersect(chunks(3L)).isEmpty)
  }

  test("analyze runs over the driver documents table") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.analyze(docs)
    assert(out.count() == 500)
    assert(out.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0)
  }
}
