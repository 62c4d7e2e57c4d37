package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Ground-truth verification of the approximate dedup family on a
  * corpus with planted near-duplicates. */
class ApproxDedupSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 0/1 near-identical, 2 = partial overlap of 0,
  // 3/4 unrelated, 5 = exact copy of 3
  private val docs: Seq[(Long, String)] = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (2L, "the quick brown fox sat still under an old oak tree all day long"),
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "unrelated words forming another tiny document with no overlap at all"),
    (5L, "completely different content about spark query engines and shuffles"))

  private def df: DataFrame = docs.toDF("doc_id", "text")

  /** Scala-side exact Jaccard of word n-gram shingle sets. */
  private def trueJaccard(a: String, b: String, n: Int): Double = {
    def sh(s: String) =
      s.split(" ").sliding(n).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  test("ngramJaccardPairs matches Scala-computed Jaccard exactly") {
    val got = ApproxDedup.ngramJaccardPairs(df, n = 2, maxId = 10,
      threshold = 1e-9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for {
      (i, ta) <- docs; (j, tb) <- docs if i < j
    } {
      val expected = trueJaccard(ta, tb, 2)
      if (expected > 0.0) {
        assert(math.abs(got((i, j)) - expected) < 1e-6,
          s"pair ($i,$j): got ${got.get((i, j))}, expected $expected")
      } else assert(!got.contains((i, j)))
    }
  }

  test("minhashPairs finds planted near-dups and skips unrelated docs") {
    val pairs = ApproxDedup.minhashPairs(df, n = 2, k = 32, bands = 8,
      threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "near-identical pair must surface")
    assert(pairs.contains((3L, 5L)), "exact copy must surface")
    assert(!pairs.contains((3L, 4L)), "unrelated docs must not pair")
    // verification stage guarantees no false positives below threshold
    val all = ApproxDedup.minhashPairs(df, n = 2, k = 32, bands = 8,
      threshold = 0.3).collect()
    all.foreach { r =>
      val t = trueJaccard(docs(r.getLong(0).toInt)._2,
        docs(r.getLong(1).toInt)._2, 2)
      assert(math.abs(r.getDouble(2) - t) < 1e-6)
      assert(t >= 0.3)
    }
  }

  test("incrementalMinhash screens the batch against the corpus only") {
    // batch = {0, 5-copy, clean}; corpus = {1, 2, 3, 4}. Expected
    // hits: 0↔1 (near-identical) and 100↔3 (exact copy). Crucially
    // NO corpus-internal pair (3↔5-style) may appear, and the clean
    // doc must not match anything.
    val batch = Seq(
      (0L, docs(0)._2), (100L, docs(3)._2),
      (101L, "fresh clean text with zero corpus overlap whatsoever here"))
      .toDF("doc_id", "text")
    val corpus = docs.slice(1, 5).toDF("doc_id", "text")
    val out = ApproxDedup.incrementalMinhash(batch, corpus,
        n = 3, k = 32, bands = 8, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSet == Set((0L, 1L), (100L, 3L)))
    val j01 = out.find(t => t._1 == 0L).get._3
    assert(math.abs(j01 - trueJaccard(docs(0)._2, docs(1)._2, 3)) < 1e-6)
    assert(out.find(t => t._1 == 100L).get._3 == 1.0)
  }

  test("simhash: identical docs get identical fingerprints, near-dups stay close") {
    val fps = ApproxDedup.simhashOf(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(3L) == fps(5L), "exact copies must collide")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(0L), fps(1L)) < hamming(fps(0L), fps(4L)),
      "near-dup pair must be closer than unrelated pair")
  }

  test("simhashPairs surfaces exact copies at hamming 0") {
    val pairs = ApproxDedup.simhashPairs(df, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 3L && p._2 == 5L && p._3 == 0))
  }

  test("minhashGroups matches minhashPairs on distinct contents and " +
      "carries duplicate counts") {
    val base = ApproxDedup.minhashPairs(df, n = 2, k = 32, bands = 8,
      threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 5 duplicates doc 3's content: the (3,5) pair collapses into
    // group counts; all other pairs survive with their representatives
    val got = ApproxDedup.minhashGroups(df, n = 2, k = 32, bands = 8,
      threshold = 0.3).collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))).toMap
    assert(!got.contains((3L, 5L)))
    assert(base.filterNot(_ == ((3L, 5L))).forall(got.contains),
      "distinct-content pairs must survive the collapse")
    // 10x duplication: same group pairs, counts scaled by 10
    import org.apache.spark.sql.functions.{col, lit}
    val dup = (0 until 10).map(i =>
      df.withColumn("doc_id", col("doc_id") + lit(i * 100L)))
      .reduce(_ union _)
    val dupGot = ApproxDedup.minhashGroups(dup, n = 2, k = 32, bands = 8,
      threshold = 0.3).collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))).toMap
    assert(dupGot.keySet == got.keySet)
    // counts are EXACTLY 10x the originals, on both sides of the pair
    for ((k, (na, nb)) <- dupGot) {
      val (oa, ob) = got(k)
      assert(na == oa * 10 && nb == ob * 10,
        s"pair $k counts ($na,$nb) != 10x ($oa,$ob)")
    }
  }

  test("simhashGroups collapses exact dups and pairs distinct " +
      "fingerprints like simhashPairs") {
    val groups = ApproxDedup.simhashGroups(df, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("rep_a"), r.getAs[Long]("rep_b"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    // exact copies 3/5 share a fingerprint → ONE group (n=2), so they
    // never appear as a cross-group pair
    assert(!groups.exists(g => g._1 == 3L && g._2 == 5L))
    // every cross-group pair maps to a simhashPairs doc pair between
    // the two groups' members
    val docPairs = ApproxDedup.simhashPairs(df, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fps = ApproxDedup.simhashOf(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = fps.groupBy(_._2).map { case (fp, m) =>
      fps(m.keys.min) -> m.keys.toSet }
    for ((ra, rb, _, _) <- groups) {
      val cross = for (a <- members(fps(ra)); b <- members(fps(rb)))
        yield if (a < b) (a, b) else (b, a)
      assert(cross.exists(docPairs.contains),
        s"group pair ($ra,$rb) has no doc-pair counterpart")
    }
    // a 10x-duplicated corpus yields the SAME group-pair rows (modulo
    // counts) — the property that bounds the blowup
    import org.apache.spark.sql.functions.{col, concat, lit}
    val dup = (0 until 10).map(i =>
      df.withColumn("doc_id", col("doc_id") + lit(i * 100L)))
      .reduce(_ union _)
    val origByPair = groups.map(g => (g._1, g._2) -> ((g._3, g._4))).toMap
    val dupGroups = ApproxDedup.simhashGroups(dup, maxHamming = 3)
      .collect()
      .map(r => (r.getAs[Long]("rep_a"), r.getAs[Long]("rep_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))).toMap
    assert(dupGroups.keySet == origByPair.keySet)
    // counts are EXACTLY 10x, on BOTH sides
    for ((k, (na, nb)) <- dupGroups) {
      val (oa, ob) = origByPair(k)
      assert(na == oa * 10 && nb == ob * 10,
        s"pair $k counts ($na,$nb) != 10x ($oa,$ob)")
    }
  }

  test("eager minhash paths release the shingle caches " +
      "(long-lived-session lifecycle)") {
    def liveCached(): Int = spark.sparkContext.getPersistentRDDs.size
    // Same rows either way.
    val lazyRows = ApproxDedup.minhashPairs(df, n = 2, k = 32, bands = 8,
      threshold = 0.3).collect().toSet
    spark.sharedState.cacheManager.clearCache()
    val before = liveCached()
    val eagerDf = ApproxDedup.minhashPairs(df, n = 2, k = 32, bands = 8,
      threshold = 0.3, eager = true)
    assert(eagerDf.collect().toSet == lazyRows)
    // The big shingled-corpus cache is gone; at most the (small)
    // localCheckpointed RESULT remains, and it is ContextCleaner-
    // collected once the frame is unreferenced.
    assert(liveCached() - before <= 1,
      s"shingle cache leaked: ${spark.sparkContext.getPersistentRDDs}")
    // incremental + groups variants: same discipline (groups caches
    // reps AND shingles — both must be released).
    val beforeInc = liveCached()
    ApproxDedup.incrementalMinhash(df, df, n = 2, k = 32, bands = 8,
      threshold = 0.3, eager = true).collect()
    assert(liveCached() - beforeInc <= 1)
    val beforeGrp = liveCached()
    ApproxDedup.minhashGroups(df, n = 2, k = 32, bands = 8,
      threshold = 0.3, eager = true).collect()
    assert(liveCached() - beforeGrp <= 2)
  }
}
