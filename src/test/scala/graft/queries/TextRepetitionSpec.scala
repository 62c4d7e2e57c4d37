package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Planted-repetition fixture for q_text_repetition, pinning the
  * Gopher-style signal definitions independent of the driver data:
  * dup3_frac = 1 - distinct/total trigram occurrences, top2_frac =
  * most-frequent-bigram occurrences / total bigram occurrences.
  */
class TextRepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("planted docs yield exact repetition fractions") {
    val dir = Files.createTempDirectory("graft_rep").toFile.getAbsolutePath
    Seq(
      // "a b a b a b": bigrams [ab,ba,ab,ba,ab] -> top 'a b' 3/5;
      // trigrams [aba,bab,aba,bab] -> distinct 2/4 -> dup3 0.5
      (1L, "en", "a b a b a b"),
      // all-distinct words: no repeated grams
      (2L, "en", "one two three four five"),
      // too short for trigrams: dup3 must be 0, not null/NaN
      (3L, "en", "x y"))
      .toDF("doc_id", "lang", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("q_text_repetition")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out(1L) == ((5, 4, 0.5, 0.6)))
    assert(out(2L) == ((4, 3, 0.0, 0.25)))
    assert(out(3L) == ((1, 0, 0.0, 1.0)))
  }
}
