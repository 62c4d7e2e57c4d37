package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent reference encoder: applies merges strictly in
    * training-rank order, each everywhere in the word. Equivalent to
    * the engine's lowest-rank-first loop by BPE's construction
    * property (a rank-r merge only creates pairs learned after round
    * r), but implemented differently — a real cross-check, not a
    * copy. */
  private def refEncode(text: String,
                        merges: Seq[(String, String)]): Seq[String] =
    Bpe.preTokens(text).flatMap { w =>
      var syms = w.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      syms
    }

  test("training is deterministic and learns the classic merges") {
    val corpus = Seq("low low low low low lower lower",
      "newest newest newest newest newest newest widest widest widest")
    val m1 = Bpe.train(corpus, 10)
    val m2 = Bpe.train(corpus, 10)
    assert(m1 == m2)
    assert(m1.length == 10)
    // 'lo' appears 7 times (low x5 + lower x2); 'es' 9 times
    // (newest x6 + widest x3); 'ne' 6, 'wi' 3, 'we' ... the top
    // merge must be the most frequent pair: (e,s) with count 9.
    assert(m1.head == ("e", "s"), s"first merge was ${m1.head}")
    // and the learned vocabulary eventually rebuilds whole words
    val rk = Bpe.ranks(Bpe.train(corpus, 50))
    assert(Bpe.encode("newest", rk) == Seq("newest"))
    assert(Bpe.encode("low", rk) == Seq("low"))
  }

  test("encoding merges lowest rank first and tiles the pre-tokens") {
    val rk = Bpe.ranks(Seq(("a", "b"), ("ab", "c"), ("x", "a")))
    // 'xabc': (a,b) has rank 0 < (x,a) rank 2 -> ab, then (ab,c)
    assert(Bpe.encodeWord("xabc", rk) == Vector("x", "abc"))
    val text = "The widest tests, 42 low-cost!"
    val tokens = Bpe.encode(text, rk)
    assert(tokens.mkString == Bpe.preTokens(text).mkString,
      "BPE tokens must tile the pre-token stream")
  }

  test("distributed counts equal the independent reference encoder " +
      "on the documents corpus") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val merges = Bpe.trainOnSample(docs, "doc_id", "text",
      sampleN = 200, nMerges = 200)
    val sparkCounts = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val golden = docs.orderBy("doc_id").limit(50).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    golden.foreach { case (id, text) =>
      val ref = refEncode(text, merges).length
      assert(sparkCounts(id) == ref,
        s"doc $id: spark=${sparkCounts(id)} ref=$ref")
    }
  }

  test("distributed trainer is bit-equal to the serial reference " +
      "trainer on the same corpus") {
    import spark.implicits._
    // the serial trainer is the independent ground truth: same
    // algorithm, entirely driver-side, no Spark in the loop
    val docs = Tables.documents(spark, dir).select("text")
    val texts = docs.as[String].collect().toSeq
    val serial = Bpe.train(texts, 40)
    val distributed = Bpe.trainDistributed(docs, "text", 40)
    assert(distributed == serial,
      s"first divergence at rank ${
        distributed.zip(serial).indexWhere { case (a, b) => a != b }}")
  }

  test("distributed trainer matches the serial reference on seeded " +
      "random corpora (adversarial ties included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    // small alphabets force heavy count TIES, stressing the
    // (-count, a, b) tie-break path on both sides
    for (trial <- 1 to 3) {
      val alpha = "abcd!?7 ".take(4 + trial)
      val corpus = Seq.fill(60)(
        Seq.fill(1 + rnd.nextInt(8))(alpha(rnd.nextInt(alpha.length)))
          .mkString)
      val serial = Bpe.train(corpus, 25)
      val dist = Bpe.trainDistributed(
        corpus.toDF("text"), "text", 25)
      assert(dist == serial, s"trial $trial diverged: $dist vs $serial")
    }
  }

  test("distributed trainer exhausts gracefully when the corpus runs " +
      "out of repeating pairs") {
    import spark.implicits._
    val tiny = Seq("ab", "cd").toDF("text")
    val merges = Bpe.trainDistributed(tiny, "text", 50)
    // 2 single-use pairs exist; after merging both, nothing remains
    assert(merges == Bpe.train(Seq("ab", "cd"), 50))
    assert(merges.length <= 2)
  }

  test("sequential-by-rank apply is equivalent to the lowest-rank-" +
    "first encoder on every corpus word (the BpeOracle premise)") {
    // A merge of rank r creates a token no merge of rank < r can
    // reference, so applying merges in rank order — one left-to-right
    // pass each — must reach encodeWord's fixpoint. This is the
    // structural fact that lets the DuckDB oracle unroll the encode
    // as per-ROUND rewrites; prove it on the real corpus at sf0.01.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    val merges = Bpe.trainOnSample(docs, "doc_id", "text",
      sampleN = 200, nMerges = 120)
    val rk = Bpe.ranks(merges)
    val words = docs.collect().flatMap(r => Bpe.preTokens(r.getString(1)))
      .distinct.sorted
    assert(words.nonEmpty)
    words.foreach { w =>
      var syms: Vector[String] = w.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += syms(j) + syms(j + 1); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      assert(syms == Bpe.encodeWord(w, rk),
        s"word '$w': sequential $syms != encoder ${Bpe.encodeWord(w, rk)}")
    }
  }

  test("real-BPE counts refine the heuristic within sane bounds") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val merges = Bpe.trainOnSample(docs, "doc_id", "text",
      sampleN = 200, nMerges = 200)
    val joined = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .join(docs.select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("pre_tokens"),
        length(col("text")).as("chars")), "doc_id")
      .collect()
    joined.foreach { r =>
      val (bpe, pre, chars) =
        (r.getInt(1), r.getInt(2), r.getInt(3))
      // sub-word count is bounded below by the pre-token count and
      // above by the character count
      assert(bpe >= pre && bpe <= chars,
        s"doc ${r.getLong(0)}: bpe=$bpe pre=$pre chars=$chars")
    }
  }
}
