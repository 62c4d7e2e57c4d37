package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Ground-truth pins for [[PortableSketch]] — including the
  * domain-wide portability proof of the one floating-point branch.
  */
class PortableSketchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private val M = PortableSketch.M

  /** The linear-counting branch `round(m·ln(m/V))` is the only place
    * a transcendental enters the hash-gated result. Its input domain
    * is FINITE (V ∈ [1, m−1]), so portability is provable by sweep:
    * at every V, the value m·ln(m/V) must sit far enough from a .5
    * rounding boundary that a multi-ulp libm discrepancy between the
    * JVM and any other engine cannot flip the rounded BIGINT.
    * (Measured against DuckDB 1.0: 302/4095 inputs differ bitwise
    * between StrictMath.log and DuckDB ln; 0/4095 differ rounded;
    * min boundary distance 1.07e-4 ≫ the ~1e-12 ulp scale here.) */
  test("linear-counting round is stable across ±8 ulps at EVERY " +
    "possible register-vacancy count") {
    var minMargin = 1.0
    (1 until M).foreach { v =>
      val x = StrictMath.log(M.toDouble / v) * M
      val margin = math.abs(x - math.floor(x) - 0.5)
      minMargin = math.min(minMargin, margin)
      var (up, dn) = (x, x)
      (1 to 8).foreach { _ =>
        up = Math.nextUp(up); dn = Math.nextDown(dn)
      }
      assert(math.round(up) == math.round(x) &&
        math.round(dn) == math.round(x),
        s"V=$v: round($x) flips within 8 ulps")
    }
    assert(minMargin > 1e-5, s"boundary margin $minMargin too tight")
  }

  test("register frame is partition-layout independent") {
    val li = Tables.lineitem(spark, dir)
    def regs(df: org.apache.spark.sql.DataFrame) =
      PortableSketch.hllRegisters(df, col("l_orderkey"),
        Seq("l_returnflag"))
        .orderBy("l_returnflag", "reg")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .toSeq
    assert(regs(li) == regs(li.repartition(17)))
  }

  test("union of daily registers equals the direct month registers " +
    "(register-wise max is associative)") {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      date_trunc("day", timestamp_micros(expr("ts div 1000")))
        .as("day"))
    val daily = PortableSketch.hllRegisters(ev, col("user_id"),
      Seq("day"))
    val viaUnion = PortableSketch.hllUnion(daily,
      Seq(date_trunc("month", col("day")) -> "month"))
      .orderBy("month", "reg")
      .collect().map(r => (r.get(0), r.getInt(1), r.getInt(2))).toSeq
    val direct = PortableSketch.hllRegisters(
      ev.select(col("user_id"),
        date_trunc("month", col("day")).as("month")),
      col("user_id"), Seq("month"))
      .orderBy("month", "reg")
      .collect().map(r => (r.get(0), r.getInt(1), r.getInt(2))).toSeq
    assert(viaUnion == direct)
  }

  test("portable HLL tracks exact cardinality across a range of " +
    "scales (both estimator branches)") {
    import spark.implicits._
    // n = 100 exercises linear counting; n = 50000 the raw branch
    for (n <- Seq(100, 2000, 50000)) {
      val df = spark.range(n).toDF("k")
      val est = PortableSketch.hllEstimate(
        PortableSketch.hllRegisters(
          df.withColumn("g", lit("x")), col("k"), Seq("g")),
        Seq("g")).head().getAs[Long]("est")
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.05, s"n=$n est=$est err=$err")
    }
  }

  test("KMV sample: mergeable — bottom-K of a union equals bottom-K " +
    "of concatenated per-shard bottom-Ks") {
    import spark.implicits._
    val mk = (lo: Int, hi: Int) => (lo until hi)
      .map(i => ("g", s"row$i", i.toDouble)).toDF("g", "rk", "v")
    val a = mk(0, 3000)
    val b = mk(3000, 7000)
    val direct = PortableSketch.kmvSample(
      a.unionByName(b), Seq("g"), col("rk"), col("v"))
    // merge = bottom-K of the shard samples' union, selected by the
    // SAME (h, v) order the samples carry (no re-hashing)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("h", "v")
    val viaShards = PortableSketch.kmvSample(a, Seq("g"), col("rk"), col("v"))
      .unionByName(PortableSketch.kmvSample(b, Seq("g"), col("rk"), col("v")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= PortableSketch.K).drop("rn")
    assert(direct.exceptAll(viaShards).isEmpty &&
      viaShards.exceptAll(direct).isEmpty,
      "min-wise stability must make the shard-merged sample " +
        "identical to the direct sample")
  }

  test("kmvMerge of fine-group samples equals the direct coarse " +
    "sample (the q_sketch_quantile_merge identity)") {
    import org.apache.spark.sql.functions.concat_ws
    val keyed = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        concat_ws(":", col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long")).as("rk"),
        col("l_extendedprice").as("v"))
    val direct = PortableSketch.kmvSample(keyed,
      Seq("l_returnflag"), col("rk"), col("v"))
    val merged = PortableSketch.kmvMerge(
      PortableSketch.kmvSample(keyed,
        Seq("l_returnflag", "l_linestatus"), col("rk"), col("v")),
      Seq("l_returnflag"))
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty,
      "rollup of fine samples must equal the direct coarse sample")
  }

  test("KMV quantiles: rank error bounded on a known distribution") {
    import spark.implicits._
    // v = i over 0..49999: true quantile q is 50000·q; with K = 256
    // the sample-quantile rank error is ~1/√K — assert a loose 3σ
    // bound (±0.12 of rank at n = 50000)
    val n = 50000
    val df = (0 until n).map(i => ("g", s"r$i", i.toDouble))
      .toDF("g", "rk", "v")
    val est = PortableSketch.kmvQuantiles(
      PortableSketch.kmvSample(df, Seq("g"), col("rk"), col("v")),
      Seq("g"), Seq("p50" -> 0.5, "p90" -> 0.9))
      .head()
    val (p50, p90) = (est.getAs[Double]("p50"), est.getAs[Double]("p90"))
    assert(math.abs(p50 / n - 0.5) < 0.12, s"p50=$p50")
    assert(math.abs(p90 / n - 0.9) < 0.12, s"p90=$p90")
    assert(est.getAs[Long]("n_sample") == PortableSketch.K)
  }

  test("KMV set-similarity: estimates track exact Jaccard/union/" +
    "intersection within the k=256 error bound; exact under k") {
    import spark.implicits._
    // two overlapping id sets with known exact overlap:
    // A = [0, 4000), B = [2000, 7000) → J = 2000/7000 ≈ 0.2857
    val a = spark.range(0, 4000).toDF("id")
    val b = spark.range(2000, 7000).toDF("id")
    val r = PortableSketch.kmvSetSimilarity(a, b, "id").head()
    val (j, u, i) = (r.getAs[Double]("jaccard_est"),
      r.getAs[Double]("union_est"), r.getAs[Double]("inter_est"))
    val (exJ, exU, exI) = (2000.0 / 7000, 7000.0, 2000.0)
    // minwise-sample std ≈ sqrt(J(1-J)/k) ≈ 0.028; 4σ margin
    assert(math.abs(j - exJ) < 0.12, s"jaccard_est=$j")
    // kth-minimum estimator relative std ≈ 1/sqrt(k) ≈ 6%; 4σ
    assert(math.abs(u - exU) / exU < 0.25, s"union_est=$u")
    assert(math.abs(i - exI) / exI < 0.35, s"inter_est=$i")
    // run-to-run determinism (md5 hashing, no RNG)
    assert(PortableSketch.kmvSetSimilarity(a, b, "id").head() == r)
    // unions smaller than k are counted EXACTLY
    val small = PortableSketch
      .kmvSetSimilarity(spark.range(0, 60).toDF("id"),
        spark.range(30, 100).toDF("id"), "id").head()
    assert(small.getAs[Int]("k_used") == 100)
    assert(small.getAs[Double]("union_est") == 100.0)
    assert(small.getAs[Int]("matches") == 30)
    assert(small.getAs[Double]("jaccard_est") == 0.3)
  }

  test("portable CMS cells: estimate via min-over-rows is " +
    "deterministic and bounded") {
    val li = Tables.lineitem(spark, dir)
    val cells = PortableSketch.cmsCells(li, col("l_orderkey"))
    // total cell mass = D * rows (each row lands in exactly one
    // bucket per hash row)
    val mass = cells.agg(sum("cnt")).head().getLong(0)
    assert(mass == PortableSketch.D * li.count())
    assert(cells.count() <= PortableSketch.D.toLong * PortableSketch.W)
  }
}
