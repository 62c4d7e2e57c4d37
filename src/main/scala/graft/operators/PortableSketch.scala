package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-replayable sketches: a portable HyperLogLog, a
  * portable count-min sketch, and a portable bottom-K (KMV) quantile
  * sample, whose every step is reproducible,
  * bit-for-bit, by any engine with `md5` and IEEE doubles — the same
  * portability contract the simhash/minhash family established
  * (md5-derived keys: Spark `conv(substring(md5(x),1,15),16,10)` ≡
  * DuckDB `('0x'||substring(md5(x),1,15))::BIGINT`).
  *
  * Why alongside Spark's native sketches (`approx_count_distinct`,
  * `count_min_sketch`, `hll_sketch_agg` — all demonstrated in
  * AggSketchSpec): native sketch BYTES are engine-private, so a
  * lineage pipeline can't audit a Spark-built sketch from another
  * system. These sketches make the register/counter table itself the
  * interchange format — tiny (m rows per group / d·w cells), exactly
  * mergeable (register-wise MAX / cell-wise SUM, both map-side
  * combining aggregates), and auditable anywhere.
  *
  * Determinism proof obligations, discharged once for the whole input
  * domain rather than per-dataset:
  *  - register index / rank: pure integer ops on md5 bits — portable
  *    by construction;
  *  - harmonic sum: Σ 2^(49−rank) as BIGINT (rank ≤ 49 ⇒ terms are
  *    exact integers; ≤ m·2^48 < 2^61 ⇒ no overflow) — order
  *    independent, portable;
  *  - raw estimate: ONE double division of identical operands — IEEE
  *    round-to-nearest on both engines, bit-identical;
  *  - linear counting `round(m·ln(m/V))`: V ranges over [1, m−1], a
  *    FINITE domain; a JVM sweep (PortableSketchSpec) shows the
  *    closest any `m·ln(m/V)` comes to a .5 rounding boundary is
  *    1.07e-4 (m = 4096), so the ≤1-ulp spread between libm
  *    implementations (measured: 302/4095 inputs differ bitwise
  *    between StrictMath.log and DuckDB 1.0 ln; 0/4095 differ after
  *    rounding) can never flip the rounded BIGINT.
  *
  * Reference behaviors covered: the reference ships no sketches (its
  * 296-line pipeline is exact counts only) — this is part of the
  * 100 TB extension surface, where exact `COUNT(DISTINCT)` shuffles
  * every distinct value but a register table shuffles ≤ m rows per
  * group.
  */
object PortableSketch {

  /** Register-count exponent: m = 2^P registers per group. */
  val P = 12
  val M: Int = 1 << P // 4096
  /** Standard HLL bias constant α_m·m² for m = 4096, times the 2^49
    * harmonic-sum scale — inlined as ONE double literal into both
    * engines' SQL (Double.toString round-trips to identical bits in
    * both parsers). */
  private val AlphaM2Scaled: Double =
    0.7213 / (1 + 1.079 / M) * M.toDouble * M.toDouble * math.pow(2, 49)
  /** Scaled contribution of an EMPTY register: 2^0 · 2^49. */
  private val EmptyTerm: Long = 1L << 49

  /** First 60 md5 bits of the key's UTF-8 string form as a
    * non-negative LONG — the repo's standard portable hash
    * (codegen'd [[graft.functions.Md5Long]]; same value as the
    * interpreted `conv(substring(md5(x), 1, 15), 16, 10)` chain the
    * oracles replay, ~4x cheaper per row). */
  def h60(key: Column): Column =
    graft.functions.HashExpressions.md5Long(key.cast("string"), 15)

  /** HLL rank (leading-zero count + 1) of the 48-bit value `w`, as a
    * branch ladder usable VERBATIM in both Spark and DuckDB SQL —
    * pure integer comparisons, zero float risk. w = 0 ⇒ rank 49. */
  def rankSql(w: String): String =
    "CASE " +
      (1 to 48).map(r => s"WHEN $w >= ${1L << (48 - r)} THEN $r")
        .mkString(" ") + " ELSE 49 END"

  /** Per-(group, register) max-rank frame — THE sketch, as data. One
    * map-side-combining aggregation; ≤ m rows per group regardless of
    * input size. Columns: groupCols..., reg INT, r INT. */
  def hllRegisters(df: DataFrame, key: Column,
                   groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ h60(key).as("__h"): _*)
      .select(g :+ (col("__h") % M).cast("int").as("reg") :+
        expr(rankSql(s"(__h div $M)")).cast("int").as("r"): _*)
      .groupBy(groupCols.head, groupCols.tail :+ "reg": _*)
      .agg(max(col("r")).as("r"))
  }

  /** Merge register frames by register-wise MAX (HLL union — the
    * property that makes daily sketch tables roll up to any range
    * without rescanning facts) onto new group columns. `regroup`
    * maps old group columns to the union grain (e.g. day → month). */
  def hllUnion(registers: DataFrame, regroup: Seq[(Column, String)])
  : DataFrame = {
    val keys = regroup.map { case (c, n) => c.as(n) } :+ col("reg")
    registers.groupBy(keys: _*).agg(max(col("r")).as("r"))
  }

  /** Cardinality estimate per group from a register frame: classic
    * HLL with the linear-counting small-range branch, every operand
    * integer until one shared double division / one ln on a finite
    * proven-portable domain (see class doc). Emits `est` BIGINT. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String])
  : DataFrame =
    registers
      .groupBy(groupCols.head, groupCols.tail: _*)
      .agg(count(lit(1)).as("present"),
        sum(expr("cast(pow(2, 49 - r) as bigint)")).as("s_present"))
      .select(groupCols.map(col) :+
        expr(estSql("present", "s_present")).as("est"): _*)

  /** The estimate expression over (present-register count, scaled
    * harmonic partial sum) — identical text runs on both engines;
    * DuckDB's oracle builds the same columns and applies this. */
  def estSql(present: String, sPresent: String): String = {
    val lit = java.lang.Double.toString(AlphaM2Scaled)
    s"""CAST(CASE
       |  WHEN CAST($lit AS DOUBLE) /
       |       CAST($sPresent + ($M - $present) * $EmptyTerm AS DOUBLE)
       |       <= ${2.5 * M} AND $present < $M
       |  THEN round($M.0 * ln($M.0 / ($M - $present)))
       |  ELSE round(CAST($lit AS DOUBLE) /
       |       CAST($sPresent + ($M - $present) * $EmptyTerm AS DOUBLE))
       |END AS BIGINT)""".stripMargin.replaceAll("\\s+", " ").trim
  }

  /** DuckDB-side register CTE body for `key` (a SQL expression of the
    * source row) grouped by `groupSql` — mirrors [[hllRegisters]]. */
  def duckRegistersSql(keyExpr: String, groupSql: Seq[String],
                       from: String): String = {
    val g = groupSql.mkString(", ")
    s"""SELECT $g, h % $M AS reg,
       |  MAX(${rankSql(s"(h // $M)")}) AS r
       |FROM (SELECT $g,
       |        ('0x' || substring(md5($keyExpr), 1, 15))::BIGINT AS h
       |      FROM $from)
       |GROUP BY $g, h % $M""".stripMargin
  }

  /** DuckDB-side estimate selection over a register CTE. */
  def duckEstimateSql(groupSql: Seq[String], registersCte: String)
  : String = {
    val g = groupSql.mkString(", ")
    s"""SELECT $g, ${estSql("present", "s_present")} AS est
       |FROM (SELECT $g, COUNT(*) AS present,
       |        SUM(CAST(power(2, 49 - r) AS BIGINT)) AS s_present
       |      FROM $registersCte GROUP BY $g)""".stripMargin
  }

  // ---------------------------------------------------------------
  // Portable count-min sketch
  // ---------------------------------------------------------------

  /** CMS depth (independent hash rows) and width (buckets per row):
    * eps = e/W ≈ 0.13%, failure prob ≈ e^-D ≈ 1.8%. */
  val D = 4
  val W = 2048

  /** The CMS as data: (j, bucket, cnt) cells, ≤ D·W rows total. The
    * explode-then-count shape map-side combines to ≤ D·W cells per
    * partition, so the shuffle is sketch-sized, not data-sized — the
    * merge property that makes CMS usable over a 100 TB stream,
    * materialized as an auditable table instead of opaque bytes. */
  def cmsCells(df: DataFrame, key: Column): DataFrame =
    // explode-then-hash, all fused into one codegen stage with the
    // partial aggregation — an A/B against hashing into a D-int
    // array + posexplode showed no win (slower on average, within
    // host variance; see SCALING.md): nothing here is shuffled
    // pre-aggregation, so a narrower explode buys nothing while the
    // per-row array allocation adds work
    df.select(key.cast("string").as("__k"))
      .select(explode(expr(s"sequence(0, ${D - 1})")).as("j"), col("__k"))
      .select(col("j"),
        (h60(concat(col("j").cast("string"), lit(":"), col("__k"))) % W)
          .cast("int").as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))

  /** KMV sample size: quantile rank error is O(1/√K) w.h.p. (~6%
    * at K = 256) — the sketch-size/accuracy dial. */
  val K = 256

  /** Mergeable bottom-K (KMV) uniform row sample per group — the
    * quantile member of the portable sketch family (HLL: distinct
    * counts; CMS: point frequencies; KMV: the value DISTRIBUTION).
    * The sample is the K rows with the smallest portable-md5 row
    * hashes, totally ordered by (h, v): a uniform sample because md5
    * is uniform, MERGEABLE because bottom-K of a union is bottom-K
    * of the concatenated bottom-Ks (min-wise stability — the
    * PortableSketchSpec proof), and portable because any engine
    * reproduces the same hashes and the same (h, v) order (duplicate
    * (h, v) rows are interchangeable, so rank ties cannot change the
    * selected multiset).
    *
    * Scale: the rank-≤K filter compiles to WindowGroupLimit, which
    * prunes to K rows per group WITHIN each input partition before
    * the shuffle — the shuffle carries ≤ K·partitions rows per
    * group, never the data. That is the distributed bottom-K
    * aggregation shape; no global sort, no driver collect. */
  def kmvSample(df: DataFrame, groups: Seq[String], rowKey: Column,
                value: Column, k: Int = K): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groups.map(col): _*)
      .orderBy(col("h"), col("v"))
    df.select(groups.map(col) ++
        Seq(h60(rowKey).as("h"), value.as("v")): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Merge [[kmvSample]] frames to coarser groups WITHOUT
    * re-hashing: bottom-K of the union by the SAME (h, v) order the
    * samples carry. Min-wise stability makes the result identical
    * to sampling the union of the original rows directly
    * (PortableSketchSpec), which is the incremental-maintenance
    * story: per-shard/per-day samples roll up to any coarser
    * grouping without rescanning facts — the KMV analogue of the
    * daily-HLL register union. Input is already ≤ K rows per fine
    * group, so this costs |fine groups|·K rows total. */
  def kmvMerge(samples: DataFrame, groups: Seq[String],
               k: Int = K): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groups.map(col): _*)
      .orderBy(col("h"), col("v"))
    samples.select((groups.map(col) :+ col("h") :+ col("v")): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Per-group quantile estimates from a [[kmvSample]] frame: the
    * sample element at 1-based rank floor(q·(n−1)) + 1 in (v, h)
    * order — the deterministic lower-interpolation selection both
    * engines compute identically (q·(n−1) is the same IEEE double
    * everywhere, n ≤ K). Output: groups, n_sample, one column per
    * requested (name, q). */
  def kmvQuantiles(sample: DataFrame, groups: Seq[String],
                   qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(groups.map(col): _*)
      .orderBy(col("v"), col("h"))
    val part = Window.partitionBy(groups.map(col): _*)
    val ranked = sample
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("__n", count(lit(1)).over(part))
    ranked.groupBy(groups.map(col): _*)
      .agg(max(col("__n")).as("n_sample"),
        qs.map { case (name, q) =>
          max(when(col("__rn") ===
            floor(lit(q) * (col("__n") - 1)).cast("long") + 1,
            col("v"))).as(name)
        }: _*)
  }

  /** Point-frequency estimates for `probes` (a one-column frame of
    * keys): est(k) = min over rows j of cell(j, h_j(k)), absent cells
    * counting 0. The cell table broadcasts (≤ D·W rows). */
  def cmsEstimate(cells: DataFrame, probes: DataFrame,
                  keyCol: String): DataFrame =
    probes
      .select(col(keyCol), explode(expr(s"sequence(0, ${D - 1})")).as("j"))
      .select(col(keyCol), col("j"),
        (h60(concat(col("j").cast("string"), lit(":"),
          col(keyCol).cast("string"))) % W).cast("int").as("bucket"))
      .join(broadcast(cells), Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  /** KMV set-similarity sketch — the set-operations member of the
    * portable family (HLL counts, CMS frequencies, KMV quantiles,
    * and now KMV resemblance): Jaccard, union-cardinality and
    * intersection-cardinality estimates for two key sets from ONE
    * bottom-k pass (Beyer et al., SIGMOD'07 / Broder's minwise
    * resemblance). U = the k smallest portable-md5 hashes of
    * A ∪ B is a uniform size-k sample of the union (min-wise), so
    * J ≈ |U ∩ A ∩ B| / |U|; |A ∪ B| ≈ (k−1)·2⁶⁰ / (h_k + 1)
    * (the classic kth-minimum estimator — exact count when the
    * union has fewer than k keys); |A ∩ B| ≈ J · |A ∪ B|.
    *
    * Scale shape: each side reduces to its distinct hashed keys
    * (map-side partial distinct), the bottom-k is
    * TakeOrderedAndProject (per-partition heap + k-row driver
    * merge), and the membership probes are broadcast semi-join
    * lookups of a k-row frame — nothing wider than k rows past the
    * distincts at any input size.
    *
    * Deterministic end to end (md5 hashes, integer h_k, one fixed
    * double-op chain), so the DuckDB oracle replays estimates
    * bit-for-bit; the error-bound spec pins |Ĵ − J| on the fixture.
    */
  def kmvSetSimilarity(a: DataFrame, b: DataFrame, key: String,
                       k: Int = K): DataFrame = {
    val ha = a.select(h60(col(key)).as("h"))
    val hb = b.select(h60(col(key)).as("h"))
    kmvSetSimilarityOn(ha, hb, k).localCheckpoint(true)
  }

  /** [[kmvSetSimilarity]]'s estimator over already-hashed (possibly
    * duplicate-carrying) key frames, one `h` column each.
    *
    * Shuffle economy (the 10×-scaling shape): each side pays ONE
    * map-combined dedup shuffle for its own bottom-k — and past
    * that, only k-row frames ever move. The union's bottom-k is
    * computed from the two k-row side samples (bottom-k of a union
    * = bottom-k of the sides' bottom-k's — the samples cover it by
    * construction), NOT by re-shuffling both full distinct sets a
    * second time; membership probes stream each RAW side once,
    * map-only, against the broadcast k-row sample, with the
    * survivors deduplicated inside the aggregate (≤ k distinct
    * values — the partial aggregate carries at most k rows per
    * partition into a trailing k-sized shuffle). */
  private def kmvSetSimilarityOn(ha: DataFrame, hb: DataFrame,
                                 k: Int): DataFrame = {
    // per-side bottom-k distinct: HashAggregate dedup (map-side
    // combine) then TakeOrdered — k rows per side leave the side
    def bottomK(s: DataFrame): DataFrame =
      s.distinct().orderBy("h").limit(k)
    // k smallest distinct of A∪B from the 2k side samples; three
    // consumers read it (uAgg + two broadcast probes) — checkpoint
    // the k rows once
    val u = bottomK(ha).union(bottomK(hb)).distinct()
      .orderBy("h").limit(k).localCheckpoint(true)
    // u∩A (≤ k rows after the in-aggregate dedup), then |u∩A∩B|
    val inA = ha.join(broadcast(u), Seq("h"), "left_semi")
      .select("h").distinct()
    val uAgg = u.agg(count(lit(1)).cast("int").as("k_used"),
      max(col("h")).as("h_k"))
    val mAgg = hb.join(broadcast(inA), Seq("h"), "left_semi")
      .agg(countDistinct(col("h")).cast("int").as("matches"))
    // single-row × single-row: the allow-listed broadcast-scalar cross
    uAgg.crossJoin(mAgg)
      // every output below is an IEEE chain over exact-int inputs
      // (int→double is a single correctly-rounded step on both
      // engines, and 255·2⁶⁰ folds exactly), so the values are
      // bit-identical UNROUNDED — while a final round(·, k) on the
      // matches/k_used int ratio is a half-grid boundary hazard
      // (SURVEY 7.4 rule 10)
      .select(col("k_used"), col("matches"), col("h_k"),
        (col("matches").cast("double") /
          col("k_used").cast("double")).as("jaccard_est"),
        // exact when the union fits in k; kth-minimum estimator
        // otherwise — ((k−1)·2⁶⁰)/(h_k+1), written as ONE
        // left-to-right chain so DuckDB folds identically
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
            (col("h_k").cast("double") + lit(1.0)))
          .as("union_est"))
      .withColumn("inter_est",
        col("matches").cast("double") /
          col("k_used").cast("double") * col("union_est"))
  }
}
