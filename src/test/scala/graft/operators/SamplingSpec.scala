package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._
  private val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")

  test("hash split is deterministic and partition-layout independent") {
    val a = Sampling.split(docs, "doc_id")
      .select("doc_id", "split").collect().map(r => (r.getLong(0),
        r.getString(1))).toMap
    val b = Sampling.split(docs.repartition(13), "doc_id")
      .select("doc_id", "split").collect().map(r => (r.getLong(0),
        r.getString(1))).toMap
    assert(a == b)
  }

  test("hash split is disjoint, complete, and near the target fractions") {
    val n = docs.count().toDouble
    val counts = Sampling.split(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n.toLong)
    // 500 docs: binomial noise on 90/5/5 is a few points
    assert(counts("train") / n > 0.8 && counts("train") / n < 0.97,
      s"train fraction ${counts("train") / n}")
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) ==
      n.toLong - counts("train"))
  }

  test("adding rows never reassigns existing ones") {
    val half = docs.filter(col("doc_id") % 2 === 0)
    val fromHalf = Sampling.split(half, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val fromAll = Sampling.split(docs, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(fromHalf.forall { case (id, s) => fromAll(id) == s })
  }

  test("stratified every-kth keeps exact ceil(n/k) per stratum") {
    val k = 5
    val perStratum = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratifiedEveryKth(docs, "lang", "doc_id", k)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- perStratum)
      assert(sampled(lang) == (n + k - 1) / k, s"stratum $lang")
  }

  test("weightedTopK matches a brute-force Efraimidis–Spirakis draw") {
    val picked = Sampling.weightedTopK(
        docs.select("doc_id", "n_chars"),
        col("doc_id"), col("n_chars").cast("double"), k = 50)
      .select("doc_id").as[Long].collect()
    // Brute force on the driver from the same md5 uniforms.
    val all = docs.select(col("doc_id"),
        Sampling.md5Uniform(col("doc_id")).as("u"),
        col("n_chars").cast("double").as("w"))
      .collect().map(r => (r.getLong(0),
        math.pow(r.getDouble(1), 1.0 / r.getDouble(2))))
    val expect = all.sortBy { case (id, key) => (-key, id) }
      .take(50).map(_._1)
    assert(picked.toSeq == expect.toSeq)
    // Layout independence.
    val again = Sampling.weightedTopK(
        docs.repartition(13).select("doc_id", "n_chars"),
        col("doc_id"), col("n_chars").cast("double"), k = 50)
      .select("doc_id").as[Long].collect()
    assert(again.sameElements(picked))
  }

  test("weightedTopK selection tracks weights") {
    // Two weight classes, 10:1 — the heavy class should dominate a
    // 100-of-1000 draw (binomial mean ~91 of 100 picks heavy).
    val rows = spark.range(1000)
      .select(col("id"), when(col("id") < 500, 100.0).otherwise(10.0)
        .as("w"))
    val heavy = Sampling.weightedTopK(rows, col("id"), col("w"), k = 100)
      .filter(col("w") === 100.0).count()
    assert(heavy > 70, s"heavy-class picks: $heavy of 100")
  }

  test("token-budget admission meets each budget minimally and " +
    "layout-independently") {
    val perDoc = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("toks"))
    val budgets = perDoc.groupBy("lang")
      .agg(expr("sum(toks) div 3").as("token_budget"))
    val budgetOf = budgets.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val admitted = Sampling.admitByTokenBudget(
      perDoc, "doc_id", Seq("lang"), col("toks"), budgets)
    val byLang = admitted.groupBy("lang")
      .agg(sum("n_tokens").as("got"), max("cum_tokens").as("maxcum"),
        max(col("cum_tokens") - col("n_tokens")).as("maxbefore"),
        min(col("cum_tokens") - col("n_tokens")).as("minbefore"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    for ((lang, got, maxcum, maxbefore, minbefore) <- byLang) {
      val b = budgetOf(lang)
      // budget met (the first crossing row is admitted)...
      assert(got >= b, s"$lang: admitted $got < budget $b")
      // ...and the admitted set is the exact md5-order prefix:
      // contiguous cumulative sums, every row starting strictly
      // under budget (so dropping any admitted row undershoots)
      assert(maxcum == got, s"$lang: admitted rows not a prefix")
      assert(maxbefore < b, s"$lang: row admitted at/after budget")
      assert(minbefore == 0L, s"$lang first row not admitted")
    }
    // deterministic under a different physical layout
    val again = Sampling.admitByTokenBudget(
        perDoc.repartition(13), "doc_id", Seq("lang"), col("toks"),
        budgets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == admitted.select("doc_id").collect()
      .map(_.getLong(0)).toSet)
  }

  test("reservoirPerGroup matches the brute-force bottom-k draw per " +
      "group, is layout-independent, and nests (pos<=j is the " +
      "same draw at smaller k)") {
    val k = 5
    val got = Sampling.reservoirPerGroup(docs, "doc_id", "lang", k)
      .select("lang", "doc_id", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // brute force: per group, the k smallest md5 keys (ties by id)
    val all = docs.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = all.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.map { case (_, id) =>
        (graft.functions.Md5Long.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(
            id.toString), 8), id)
      }.sorted.take(k).zipWithIndex
        .map { case ((_, id), i) => (lang, id, i + 1) }
    }.toSet
    assert(got.toSet == expect)
    // sizes: exactly min(k, |group|) per group
    val sizes = got.groupBy(_._1).view.mapValues(_.length).toMap
    val groupN = all.groupBy(_._1).view.mapValues(_.length).toMap
    groupN.foreach { case (g, n) =>
      assert(sizes(g) == math.min(k, n), s"group $g") }
    // layout independence
    val again = Sampling.reservoirPerGroup(
        docs.repartition(13), "doc_id", "lang", k)
      .select("lang", "doc_id", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(again.toSet == got.toSet)
    // nesting: the k=2 draw is exactly the pos<=2 slice of the k=5 one
    val k2 = Sampling.reservoirPerGroup(docs, "doc_id", "lang", 2)
      .select("lang", "doc_id", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(k2.toSet == got.filter(_._3 <= 2).toSet)
  }

  test("reservoirPerGroup property: random group shapes and k all " +
      "match the brute-force bottom-k (incl. k > group size, " +
      "singleton groups, one giant group)") {
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 4) {
      val nGroups = Seq(1, 3, 10, 40)(trial - 1)
      val k = 1 + rnd.nextInt(7)
      val rows = (1L to (20L + rnd.nextInt(400))).map { id =>
        (id, s"g${1 + rnd.nextInt(nGroups)}")
      }
      val df = rows.toDF("id", "grp")
      val got = Sampling.reservoirPerGroup(df, "id", "grp", k)
        .select("grp", "id", "pos")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      val expect = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
        rs.map { case (id, _) =>
          (graft.functions.Md5Long.compute(
            org.apache.spark.unsafe.types.UTF8String.fromString(
              id.toString), 8), id)
        }.sorted.take(k).zipWithIndex
          .map { case ((_, id), i) => (g, id, i + 1) }
      }.toSet
      assert(got == expect, s"trial=$trial k=$k groups=$nGroups")
    }
  }
}
