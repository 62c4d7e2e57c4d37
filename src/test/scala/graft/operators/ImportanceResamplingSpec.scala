package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class ImportanceResamplingSpec extends SparkSpec {
  import spark.implicits._
  private val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
  private val B = 1024

  /** The engine's exact rounding: BigDecimal HALF_UP on the raw
    * double, the semantics of Spark's `round` (and of DuckDB's
    * half-away-from-zero ROUND on the same IEEE value). */
  private def microNats(x: Double): Long =
    BigDecimal(x * 1e6)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  private def bucketStream(rows: Array[(Long, String)]): Array[(Long, Long)] =
    rows.flatMap { case (id, t) =>
      // split(col, " ") in Spark keeps trailing empties → limit -1
      t.split(" ", -1).map { w =>
        (id, graft.functions.Md5Long.compute(
          UTF8String.fromString(w), 8) % B)
      }
    }

  test("dsirScores matches an independent brute-force log-likelihood " +
      "ratio computation (JVM md5 + Math.log twin)") {
    val target = docs.filter($"source" === "src0")
      .select("doc_id", "text")
    val pool = docs.filter($"source" =!= "src0")
      .select("doc_id", "text")
    val got = ImportanceResampling
      .dsirScores(target, pool, "doc_id", "text", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    val tArr = bucketStream(target.collect()
      .map(r => (r.getLong(0), r.getString(1))))
    val rArr = bucketStream(pool.collect()
      .map(r => (r.getLong(0), r.getString(1))))
    val ct = tArr.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cr = rArr.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val (nt, nr) = (tArr.length.toLong, rArr.length.toLong)
    def lr(b: Long): Long = microNats(math.log(
      ((ct.getOrElse(b, 0L) + 1).toDouble * (nr + B).toDouble) /
        ((cr(b) + 1).toDouble * (nt + B).toDouble)))
    val expect = rArr.groupBy(_._1).map { case (id, toks) =>
      val perBkt = toks.groupBy(_._2).view.mapValues(_.length.toLong)
      (id, toks.length.toLong,
        perBkt.map { case (b, c) => c * lr(b) }.sum)
    }.toSet
    assert(got == expect)
    assert(got.size == pool.count())
  }

  test("dsirTopK is deterministic under physical layout and ranks " +
      "target-like text above target-free text") {
    val target = docs.filter($"source" === "src0")
      .select("doc_id", "text")
    val pool = docs.filter($"source" =!= "src0")
      .select("doc_id", "text")
    val a = ImportanceResampling
      .dsirTopK(target, pool, "doc_id", "text", k = 100, B)
      .select("doc_id").as[Long].collect().toSeq
    val b = ImportanceResampling
      .dsirTopK(target.repartition(7), pool.repartition(13),
        "doc_id", "text", k = 100, B)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b)

    // semantic check on a constructed corpus: a pool doc made of
    // target vocabulary must outscore one of target-absent tokens
    val t2 = Seq((1L, "wiki wiki facts facts"),
      (2L, "wiki facts wiki facts")).toDF("doc_id", "text")
    val p2 = Seq((10L, "wiki facts wiki"),
      (11L, "spam zzz qqq")).toDF("doc_id", "text")
    val s2 = ImportanceResampling
      .dsirScores(t2, p2, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s2(10L) > s2(11L))
  }

  test("dsirResample: the Gumbel keys match the JVM twin, the draw " +
      "is deterministic, and it diverges from pure top-k (diversity)") {
    val target = docs.filter($"source" === "src0")
      .select("doc_id", "text")
    val pool = docs.filter($"source" =!= "src0")
      .select("doc_id", "text")
    val got = ImportanceResampling
      .dsirResample(target, pool, "doc_id", "text", k = 100, B)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // brute-force Gumbel from the same md5 bits
    got.foreach { case (id, score, gumbel, key) =>
      val u = (graft.functions.Md5Long.compute(
        UTF8String.fromString(id.toString), 8).toDouble + 1.0) /
        4294967297.0
      assert(gumbel == microNats(-math.log(-math.log(u))), s"doc $id")
      assert(key == score + gumbel, s"doc $id")
    }
    // deterministic under layout
    val again = ImportanceResampling
      .dsirResample(target.repartition(7), pool.repartition(13),
        "doc_id", "text", k = 100, B)
      .collect().map(_.getLong(0)).toSeq
    assert(again == got.map(_._1).toSeq)
    // the perturbed draw must differ from argmax selection
    val argmax = ImportanceResampling
      .dsirTopK(target, pool, "doc_id", "text", k = 100, B)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet != argmax,
      "Gumbel resample should not equal pure top-k on this corpus")
  }

  test("property: random corpora, vocabularies and bucket counts all " +
      "match the brute-force twin (incl. forced bucket collisions " +
      "and tokens absent from the target)") {
    // Seeded-random trials (the frequencySplitJoin discipline).
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 4) {
      // small bucket domains force collisions; tiny vocab forces
      // shared + disjoint token sets across target/pool
      val buckets = Seq(8, 32, 256, 1024)(trial - 1)
      val vocab = (1 to (3 + rnd.nextInt(25)))
        .map(i => s"w${i}_$trial")
      def doc(id: Long) = (id, (0 to rnd.nextInt(30))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val target = (1L to (1L + rnd.nextInt(6))).map(doc).toDF(
        "doc_id", "text")
      val pool = (100L to (100L + 1 + rnd.nextInt(40))).map(doc).toDF(
        "doc_id", "text")
      val got = ImportanceResampling
        .dsirScores(target, pool, "doc_id", "text", buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val tArr = target.collect().map(r => (r.getLong(0), r.getString(1)))
      val rArr = pool.collect().map(r => (r.getLong(0), r.getString(1)))
      def bkts(rows: Array[(Long, String)]) = rows.flatMap {
        case (id, t) => t.split(" ", -1).map(w => (id,
          graft.functions.Md5Long.compute(
            UTF8String.fromString(w), 8) % buckets))
      }
      val (tB, rB) = (bkts(tArr), bkts(rArr))
      val ct = tB.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val cr = rB.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (nt, nr) = (tB.length.toLong, rB.length.toLong)
      def lr(b: Long): Long = microNats(math.log(
        ((ct.getOrElse(b, 0L) + 1).toDouble * (nr + buckets).toDouble) /
          ((cr(b) + 1).toDouble * (nt + buckets).toDouble)))
      val expect = rB.groupBy(_._1).map { case (id, toks) =>
        (id, toks.length.toLong,
          toks.groupBy(_._2).map { case (b, c) =>
            c.length.toLong * lr(b) }.sum)
      }.toSet
      assert(got == expect, s"trial=$trial buckets=$buckets")
    }
  }
}
