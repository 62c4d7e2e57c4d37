package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate nearest-neighbor search over embedding columns.
  *
  * Baseline: brute-force cosine top-k (exact — also the per-bucket
  * kernel). Scale path: random-hyperplane LSH — L independent tables
  * of `bitsPerTable` signed projections each; vectors sharing a
  * bucket in ANY table become candidates, candidates are ranked
  * exactly. Bucketing is a per-row projection; the only shuffle is
  * the bucket equi-join on (table, bucket) — at 100 TB that is the
  * difference between O(N²) pairs and O(N × L) bucket rows.
  *
  * Hyperplanes are derived from a seeded integer mix (splitmix64
  * constants), so plans are deterministic across runs and executors —
  * no RNG, no broadcast of random state needed.
  */
object AnnSearch {
  /** Deterministic pseudo-random unit-free hyperplane component in
    * [-1, 1): splitmix64 finalizer over (table, bit, dim) index. */
  private def mix(z0: Long): Double = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  def planes(tables: Int, bitsPerTable: Int, dim: Int): Seq[Seq[Seq[Float]]] =
    (0 until tables).map(t => (0 until bitsPerTable).map(b =>
      (0 until dim).map(d =>
        mix(t.toLong * 1000003 + b * 1009 + d).toFloat).toSeq).toSeq)

  /** Bucket id of `vec` in one LSH table: the sign bits of its
    * projections onto the table's hyperplanes (float literals so the
    * native float dot kernel applies). */
  def bucketId(vec: Column, tablePlanes: Seq[Seq[Float]]): Column =
    tablePlanes.zipWithIndex.map { case (p, j) =>
      when(VectorFns.dot(vec, typedLit(p)) > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** (vec_id, table_idx, bucket) — one row per vector per table. */
  def bucketed(embeddings: DataFrame, tables: Int = 4,
               bitsPerTable: Int = 4, dim: Int = 64): DataFrame = {
    val ps = planes(tables, bitsPerTable, dim)
    val bucketsArr = array(ps.map(tp => bucketId(col("embedding"), tp)): _*)
    embeddings.select(col("vec_id"), col("embedding"),
      posexplode(bucketsArr).as(Seq("table_idx", "bucket")))
  }

  /** Exact brute-force cosine top-k among vectors with id < maxId —
    * the recall baseline. `candidateFilter` restricts the CANDIDATE
    * side only (the filtered-ANN ground truth: top-k qualifying
    * neighbors for every query). */
  def bruteTopK(embeddings: DataFrame, k: Int = 5,
                maxId: Long = 200,
                candidateFilter: Column = lit(true)): DataFrame = {
    val e = embeddings.filter(col("vec_id") < maxId)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("va"))
    val b = e.filter(candidateFilter)
      .select(col("vec_id").as("b_id"), col("embedding").as("vb"))
    val w = Window.partitionBy("a_id")
      .orderBy(col("cos_sim").desc, col("b_id").asc)
    a.join(b, col("a_id") =!= col("b_id"))
      .withColumn("cos_sim",
        round(VectorFns.cosine(col("va"), col("vb")), 6))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select("a_id", "b_id", "cos_sim", "rk")
  }

  /** Per-vector array of struct(sim, cell) against a broadcast
    * centroid list — the shared assignment kernel of the IVF path
    * (argmax = `array_max`: highest sim, ties to the higher cell). */
  private[graft] def cellSimsFor(centroids: Array[(Int, Seq[Float])])(
      vec: Column): Column = array(centroids.map {
    case (cid, cvec) =>
      struct(VectorFns.cosine(vec, typedLit(cvec)).as("sim"),
        lit(cid).as("cell"))
  }: _*)

  /** Train the coarse quantizer once: deterministic lowest-id seed
    * (renumbered 0..n−1 by rank, so id gaps and non-zero-based
    * corpora seed fine), optionally Lloyd-refined. The index-build
    * half of the IVF path, shared by [[ivfTopK]] and the streaming
    * enrichment ([[graft.streaming.StreamingAnnEnrich]]). */
  def trainQuantizer(e: DataFrame, nCentroids: Int = 8,
                     kmeansIters: Int = 0): Array[(Int, Seq[Float])] = {
    val seed: Array[(Int, Seq[Float])] = e
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id").asc).limit(nCentroids)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }
    refineCentroids(e, seed, kmeansIters)
  }

  /** Cell-assigned corpus (vec_id, embedding, cell): argmax cosine
    * against the broadcast centroids — a per-row projection. */
  def assignCells(e: DataFrame,
                  centroids: Array[(Int, Seq[Float])]): DataFrame =
    e.withColumn("cell",
      array_max(cellSimsFor(centroids)(col("embedding"))).getField("cell"))

  /** Query probe frame: one row per (query, probed cell) — the
    * top-`nProbe` cells by centroid similarity (ties to the higher
    * cell, like the assignment argmax). */
  def probeCells(e: DataFrame, centroids: Array[(Int, Seq[Float])],
                 nProbe: Int): DataFrame =
    e.withColumn("probe_cells",
      slice(reverse(array_sort(cellSimsFor(centroids)(col("embedding")))),
        1, nProbe))
      .select(col("vec_id").as("a_id"), col("embedding").as("va"),
        explode(col("probe_cells").getField("cell")).as("cell"))

  /** Lloyd refinement of an IVF coarse quantizer, as DataFrame ops:
    * each iteration assigns every vector to its argmax-cosine cell
    * (per-row projection against the broadcast centroids) and
    * recomputes each cell's centroid as the position-wise mean —
    * one `posexplode` + `groupBy(cell, pos)` pass over the corpus,
    * collecting only `nCentroids` rows back per iteration. Cells
    * that attract no vectors keep their previous centroid.
    *
    * DETERMINISM (the [[KMeans]] integer-arithmetic discipline,
    * applied to float embeddings): a naive `avg(v)` is a double fold
    * in shuffle order — not replayable. Instead every component is
    * quantized to exact micro-units (`round(v·1e6)` as LONG — one
    * correctly-rounded double product per value), summed in exact
    * integer arithmetic (order-independent), and the mean is two
    * sequential IEEE divisions (`sum/n/1e6`) cast to float — every
    * step exactly rounded, so any engine reproduces the centroid
    * bit-for-bit and the q_ann_ivf DuckDB oracle can replay the
    * unrolled iterations. Exactness bound: per-cell Σ|round(v·1e6)|
    * must stay below 2⁵³ (cell size × max|v| < 9e9 — documented
    * precondition; micro-quantization loses < 1e-6 per component,
    * noise for a quantizer whose job is cell assignment).
    *
    * At 100 TB each iteration is one shuffle of (cell, pos, micro)
    * triples with map-side partial aggregation — the standard
    * distributed-k-means shape; nothing corpus-sized ever reaches
    * the driver.
    */
  def refineCentroids(e: DataFrame, init: Array[(Int, Seq[Float])],
                      iters: Int): Array[(Int, Seq[Float])] = {
    var cents = init
    for (_ <- 0 until iters) {
      val assigned = e.withColumn("cell",
        array_max(cellSimsFor(cents)(col("embedding"))).getField("cell"))
      val next = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(sum(round(col("v").cast("double") * lit(1e6), 0)
            .cast("long")).as("sm"),
          count(lit(1)).as("n"))
        .select(col("cell"), col("pos"),
          (col("sm").cast("double") / col("n") / lit(1e6)).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cell"),
          transform(col("pm"), x => x.getField("m").cast("float"))
            .as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1))
        .toMap
      cents = cents.map { case (cid, old) => (cid, next.getOrElse(cid, old)) }
    }
    cents
  }

  /** IVF-style approximate top-k: a coarse quantizer of `nCentroids`
    * centroid vectors — seeded with the `nCentroids` lowest-id
    * vectors (deterministic), optionally refined with `kmeansIters`
    * Lloyd iterations ([[refineCentroids]]) — every vector assigned
    * to its nearest centroid, queries probing their `nProbe` nearest
    * cells. The per-cell search is the exact brute kernel.
    *
    * Scale shape: assignment is a per-row projection against a
    * broadcast centroid table (driver collects only `nCentroids`
    * rows); the candidate join is an equi-join on cell id — the
    * standard IVF trade of recall for a 1/nCells candidate fraction.
    */
  /** `candidateFilter`: FILTERED ANN — the production RAG/tenant
    * shape "top-k among vectors satisfying a metadata predicate".
    * The quantizer trains on the FULL slice (index build is
    * filter-agnostic, like any shared IVF index), queries probe as
    * usual, but only qualifying vectors enter the candidate join —
    * a pre-filter, so the per-cell search ranks qualifying vectors
    * only and always returns up to k of THEM (post-filtering an
    * unfiltered top-k would return fewer). The predicate lands in
    * the candidate-side scan (Catalyst pushes it below the
    * assignment projection), so non-qualifying rows never reach the
    * shuffle — at a 1% selectivity that is a 100× candidate-volume
    * cut, the whole point of filtered ANN at scale. */
  /** `index`: pass pre-trained coarse centroids (same train params)
    * to skip quantizer training — the shared-index path (see
    * [[IvfPqIndex]]); None trains inline. */
  def ivfTopK(embeddings: DataFrame, k: Int = 5, maxId: Long = 200,
              nCentroids: Int = 8, nProbe: Int = 2,
              kmeansIters: Int = 0,
              candidateFilter: Column = lit(true),
              index: Option[Array[(Int, Seq[Float])]] = None)
      : DataFrame = {
    val e = embeddings.filter(col("vec_id") < maxId)
    val centroids = index.getOrElse(
      trainQuantizer(e, nCentroids, kmeansIters))
    // assignment: argmax similarity over the broadcast centroid
    // array; only qualifying vectors become candidates (pre-filter)
    ivfTopKFrom(assignCells(e.filter(candidateFilter), centroids),
      e, centroids, k, nProbe)
  }

  /** The probe/score/top-k core of [[ivfTopK]] over an ALREADY
    * cell-assigned candidate frame (vec_id, embedding, cell) — the
    * entry point a MAINTAINED assignment index feeds
    * ([[IncrementalIndex.searchIvf]]) instead of re-assigning the
    * corpus per session. `queries` is (vec_id, embedding). */
  private[graft] def ivfTopKFrom(assigned: DataFrame,
                                 queries: DataFrame,
                                 centroids: Array[(Int, Seq[Float])],
                                 k: Int, nProbe: Int): DataFrame = {
    // probes: top-nProbe cells per query vector
    val probed = probeCells(queries, centroids, nProbe)
    val w = Window.partitionBy("a_id")
      .orderBy(col("cos_sim").desc, col("b_id").asc)
    // No distinct needed: each candidate is assigned exactly one cell
    // and probe cells per query are distinct, so (a_id, b_id) pairs
    // are already unique — a distinct here would shuffle rows carrying
    // both embedding arrays for nothing.
    probed
      .join(assigned.select(col("vec_id").as("b_id"),
        col("embedding").as("vb"), col("cell")), Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .drop("cell")
      .withColumn("cos_sim",
        round(VectorFns.cosine(col("va"), col("vb")), 6))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select("a_id", "b_id", "cos_sim", "rk")
      .orderBy("a_id", "rk")
  }

  /** EXACT cosine top-k through the IVF cell partition — the
    * sublinear-shaped replacement for a brute query×corpus scan that
    * still returns BIT-IDENTICAL results to the exact scan (so
    * hash-gated consumers like the retrieval fusion/nDCG keys keep
    * their DuckDB oracles unchanged).
    *
    * Exactness argument (triangle inequality on UNIT vectors): for a
    * corpus vector x in cell c, cos(q,x) = q̂·x̂ = q̂·ĉ + q̂·(x̂−ĉ)
    * ≤ cos(q,c) + ‖x̂−ĉ‖, and ‖x̂−ĉ‖² = 2 − 2·cos(x,c) (both unit),
    * so every cell carries a radius r_c = max over members of
    * √(2 − 2·cos(x,c)) and the bound is pure cosines — no unit
    * vectors ever materialize. Phase 1 probes the `nProbe` nearest
    * cells per query and takes the candidate kth-best score τ_q
    * (lower-bounds the true kth best, since more candidates only
    * raise it). Phase 2 keeps every cell with cos(q,c) + r_c ≥ τ_q −
    * margin (margin 2e-6 absorbs the 6-decimal output rounding plus
    * fp slop; conservative margins only ADD candidates): any doc in
    * the true top-k scores ≥ τ_q, so its cell passes — the final
    * ranking over phase-2 candidates equals the full scan's exactly.
    *
    * Scale shape: both phases are cell EQUI-joins of a broadcast
    * probe frame against the cell-partitioned corpus — never a
    * nested-loop query×corpus cross. On clustered real-world
    * embeddings r_c ≪ √2 and phase 2 touches a small cell fraction
    * (the IVF speedup, with a proof instead of a recall gamble); on
    * adversarially uniform vectors the bound degrades to probing
    * every cell — same results, linear work, still the scale-ready
    * join shape. The spec verifies equality against the brute scan.
    *
    * Candidates include the query vector itself (dense retrieval
    * convention: rank 1 is the query document, which downstream
    * graded-relevance consumers rely on).
    */
  def exactCosineTopK(embeddings: DataFrame, queryPred: Column,
                      k: Int, nCells: Int = 16, nProbe: Int = 4,
                      kmeansIters: Int = 1,
                      index: Option[Array[(Int, Seq[Float])]] = None,
                      cacheKey: Option[String] = None): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val cents = index.getOrElse(memoCents(e, nCells, kmeansIters, cacheKey))
    val assigned = assignedWithRadius(e, cents, cacheKey)
    // cell radii: nCells rows to the driver (bounded by contract,
    // like every quantizer collect here) off the SHARED assigned
    // frame — with a cacheKey the corpus is scanned/assigned ONCE
    // for both the radii pass and the candidate frame
    val radii: Map[Int, Double] = assigned
      .groupBy("cell").agg(max(col("r_own")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val corpus = assigned
      .select(col("vec_id").as("doc_id"), col("embedding").as("cv"),
        VectorFns.norm2(col("embedding")).as("cn"), col("cell"))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        VectorFns.norm2(col("embedding")).as("qn"))
    val exactCos = round(VectorFns.cosineWithNorms(
      col("qv"), col("cv"), col("qn"), col("cn")), 6).as("cos_sim")
    val wq = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("doc_id").asc)
    // Phase 1: nProbe nearest cells per query -> candidate kth best
    val probed = q.withColumn("probe_cells",
        slice(reverse(array_sort(cellSimsFor(cents)(col("qv")))), 1, nProbe))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(col("probe_cells").getField("cell")).as("cell"))
    val tau = probed.join(corpus, Seq("cell"))
      .select(col("query_id"), col("doc_id"), exactCos)
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= k)
      .groupBy("query_id")
      .agg(min("cos_sim").as("kth"), count(lit(1)).as("cnt"))
      // fewer than k phase-1 candidates -> no usable cutoff: tau sinks
      // below any cosine so every cell qualifies (still exact)
      .select(col("query_id"),
        when(col("cnt") < k, lit(-2.0))
          .otherwise(col("kth") - lit(2e-6)).as("tau"))
    // Phase 2: every cell whose bound clears tau, as a per-query
    // array filter over the broadcast (centroid, radius) literals —
    // then the same cell equi-join and the exact ranking
    val bounds = array(cents.sortBy(_._1).map { case (cid, cvec) =>
      struct((VectorFns.cosine(col("qv"), typedLit(cvec)) +
        lit(radii.getOrElse(cid, 0.0))).as("bound"), lit(cid).as("cell"))
    }: _*)
    q.join(broadcast(tau), Seq("query_id"))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(filter(bounds, s => s.getField("bound") >= col("tau"))
          .getField("cell")).as("cell"))
      .join(corpus, Seq("cell"))
      .select(col("query_id"), col("doc_id"), exactCos)
      .withColumn("rk", row_number().over(wq).cast("int"))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "cos_sim")
  }

  /** [[exactCosineTopK]] under the bounded-baseline contract's
    * SELF-EXCLUSION (the [[bruteTopK]] output shape): every vector
    * queries the corpus, its own row is dropped, ranks re-assigned
    * among the rest. Exact by composition: the kernel runs at k+1
    * and the top-k non-self rows are always a subset of the overall
    * top-(k+1). Output (a_id, b_id, cos_sim, rk) — bit-identical to
    * the brute self-join it replaces, no nested loop. */
  def exactCosineTopKNonSelf(embeddings: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 1,
      index: Option[Array[(Int, Seq[Float])]] = None,
      cacheKey: Option[String] = None): DataFrame = {
    val w = Window.partitionBy("a_id")
      .orderBy(col("cos_sim").desc, col("b_id").asc)
    exactCosineTopK(embeddings, lit(true), k + 1, nCells, nProbe,
        kmeansIters, index, cacheKey)
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id").as("a_id"), col("doc_id").as("b_id"),
        col("cos_sim"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
  }

  /** The shared cell-assignment frame (vec_id, embedding, cell,
    * r_own) behind the exact cell-bounded kernels — r_own is the
    * row's chord distance to its own centroid, √(2 − 2·cos(x,c)),
    * whose per-cell max is the cell radius. With a `cacheKey` the
    * frame is memoized through [[DerivedCache]] (eager local
    * checkpoint), so the radii/stats pass and the candidate frame
    * scan the corpus ONCE between them — the shared-index
    * discipline; without one, callers pay an extra assignment pass
    * (fine for one-shot use). */
  /** Train-or-recall the coarse quantizer for the exact cell-bounded
    * kernels. With a `cacheKey` the trained centroid ARRAY memoizes
    * through [[DerivedCache.memoValue]] under the SAME key family as
    * the cached assignment frame — so a later call probes with
    * provably the very centroids the memoized assignment (and its
    * radii) was built from. Retraining per call would make the
    * triangle-inequality bound's exactness hinge on distributed
    * float aggregation being bit-reproducible across runs (it is not
    * guaranteed to be): a 1-ulp centroid drift between the cached
    * assignment and a fresh probe could silently drop a true
    * neighbor. Without a key, one-shot callers train inline as
    * before (one call site, one training — nothing to drift
    * against). */
  private def memoCents(e: DataFrame, nCells: Int, kmeansIters: Int,
      cacheKey: Option[String]): Array[(Int, Seq[Float])] =
    cacheKey match {
      case Some(k) =>
        DerivedCache.memoValue(e.sparkSession,
          s"$k:cents:$nCells:$kmeansIters")(
          trainQuantizer(e, nCells, kmeansIters))
      case None => trainQuantizer(e, nCells, kmeansIters)
    }

  private def assignedWithRadius(e: DataFrame,
      cents: Array[(Int, Seq[Float])],
      cacheKey: Option[String]): DataFrame = {
    def build = {
      val best = array_max(cellSimsFor(cents)(col("embedding")))
      e.withColumn("cell", best.getField("cell"))
        .withColumn("r_own", sqrt(greatest(lit(0.0),
          lit(2.0) - lit(2.0) * best.getField("sim"))))
    }
    cacheKey match {
      case Some(k) =>
        DerivedCache.memo(e.sparkSession, s"$k:assigned")(build)
      case None => build
    }
  }

  /** EXACT cosine THRESHOLD pairs (a_id < b_id, cos ≥ tau) through
    * the cell partition — the scale-shaped replacement for the brute
    * all-pairs theta join, BIT-IDENTICAL to it by the same triangle
    * inequality as [[exactCosineTopK]]: for x in cell a and y in
    * cell b, chord(x,y) ≥ chord(c_a,c_b) − r_a − r_b, and cos(x,y) ≥
    * tau ⟺ chord(x,y) ≤ √(2−2·tau), so only cell pairs with
    * chord(c_a,c_b) ≤ √(2−2·tau) + r_a + r_b can hold a qualifying
    * pair — every other cell pair is provably empty and never
    * joined. The candidate join is two EQUI-joins through a
    * broadcast ≤ nCells² qualifying-cell-pair frame (never a
    * nested-loop row cross); margins only ADD candidates (the 2e-6
    * absorbs the 6-decimal output rounding of the ≥ tau filter, the
    * 1e-6 chord slack absorbs driver-side fp), so exactness is
    * one-sided and the final rounded-cosine filter decides.
    *
    * Scale shape: on clustered real-world embeddings at production
    * thresholds (0.9+) most cell pairs are pruned and candidates ≈
    * within-cell pairs (the SemDeDup geometry, with a proof instead
    * of a recall gamble); on adversarially uniform vectors at loose
    * thresholds the bound degrades to all cell pairs — same results,
    * linear-in-pairs work, still the bucketed join shape that
    * salts/partitions instead of crossing rows. */
  def exactCosineThresholdPairs(embeddings: DataFrame, tau: Double,
      nCells: Int = 16, kmeansIters: Int = 1,
      index: Option[Array[(Int, Seq[Float])]] = None,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = embeddings.sparkSession
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val cents = index.getOrElse(memoCents(e, nCells, kmeansIters, cacheKey))
    val assigned = assignedWithRadius(e, cents, cacheKey)
    val radii: Map[Int, Double] = assigned
      .groupBy("cell").agg(max(col("r_own")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // driver-side qualifying cell pairs (≤ nCells² — quantizer-sized
    // metadata, like the centroid array itself); both directions so
    // the a_id < b_id winner can sit in either cell
    def chord(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val c = if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      math.sqrt(math.max(0.0, 2.0 - 2.0 * c))
    }
    val chordMax = math.sqrt(math.max(0.0, 2.0 - 2.0 * (tau - 2e-6)))
    val qualifying = for {
      (ca, va) <- cents.toSeq
      (cb, vb) <- cents.toSeq
      if chord(va, vb) <= chordMax + radii.getOrElse(ca, 0.0) +
        radii.getOrElse(cb, 0.0) + 1e-6
    } yield (ca, cb)
    import spark.implicits._
    val cellPairs = qualifying.toDF("cell_a", "cell_b")
    val a = assigned.select(col("cell").as("cell_a"),
      col("vec_id").as("a_id"), col("embedding").as("va"),
      VectorFns.norm2(col("embedding")).as("na"))
    val b = assigned.select(col("cell").as("cell_b"),
      col("vec_id").as("b_id"), col("embedding").as("vb"),
      VectorFns.norm2(col("embedding")).as("nb"))
    a.join(broadcast(cellPairs), Seq("cell_a"))
      .join(b, Seq("cell_b"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim",
        round(VectorFns.cosineWithNorms(col("va"), col("vb"),
          col("na"), col("nb")), 6))
      .filter(col("cos_sim") >= tau)
      .select("a_id", "b_id", "cos_sim")
  }

  /** Per-subspace L2 assignment: argmin ‖v − c‖² = argmax
    * (2·v·c − ‖c‖²) — ‖v‖² is constant per row; ‖c‖² is a
    * driver-side constant per code. Ties go to the higher code id
    * (array_max on (score, code) structs), deterministically. */
  private def pqAssign(subvec: Column, cents: Array[Seq[Float]]): Column =
    array_max(array(cents.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x.toDouble * x).sum
      struct((lit(2.0) * VectorFns.dot(subvec, typedLit(c)) - lit(c2))
        .as("score"), lit(i).as("code"))
    }: _*)).getField("code")

  /** Product-quantization codebooks: the embedding splits into `m`
    * subspaces of `dim/m` dims; each subspace gets its own `k`-code
    * codebook — seeded with the k lowest-id subvectors, refined with
    * `iters` L2-Lloyd iterations. ALL subspaces train together: the
    * corpus explodes once to (vec, subspace, subvector) rows, each
    * iteration is ONE assignment + position-wise-mean pass over that
    * frame (two Spark jobs per iteration total, not two per
    * subspace — the per-job overhead of m separate trainings
    * dominated the first cut). Only m·k·(dim/m) floats reach the
    * driver per iteration. */
  def pqTrain(e: DataFrame, m: Int = 8, k: Int = 16, dim: Int = 64,
              iters: Int = 2): Array[Array[Seq[Float]]] = {
    // Codes are stored as SIGNED bytes downstream (ivfPqTopK packs
    // them via cast("byte")): a code in 128..255 would wrap negative
    // and element_at(codebook, code+1) would then silently index from
    // the END of the codebook, corrupting every ADC score. Fail the
    // build instead of corrupting scores; widen the stored code type
    // before ever raising this bound.
    require(k <= 128,
      s"codesPerSub=$k exceeds the signed-byte code range (max 128)")
    val sub = dim / m
    val subvecs = array((0 until m).map(s =>
      slice(col("embedding"), s * sub + 1, sub)): _*)
    val sv = e.select(col("vec_id"),
      posexplode(subvecs).as(Seq("s", "sv")))
    // one collect seeds every subspace: the subvectors of the k
    // lowest ids ACTUALLY PRESENT (broadcast TakeOrdered semi-join —
    // id gaps or non-zero-based corpora seed fine), code c taking
    // the rank-c id's subvector
    val seedIds = e.select(col("vec_id"))
      .orderBy(col("vec_id").asc).limit(k)
    val seedRows = sv.join(broadcast(seedIds), "vec_id")
      .select("vec_id", "s", "sv").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    val rankedIds = seedRows.keys.map(_._1).toArray.distinct.sorted
    require(rankedIds.nonEmpty, "pqTrain: empty corpus")
    var books: Array[Array[Seq[Float]]] = Array.tabulate(m, k)(
      (s, c) => seedRows((rankedIds(c % rankedIds.length), s)))
    for (_ <- 0 until iters) {
      // per-subspace argmin ‖v − c‖² chosen through one 3-d literal:
      // score(s, c) = 2·sv·cb[s][c] − ‖cb[s][c]‖²
      val cb = typedLit(books.map(_.toSeq).toSeq)
      val c2 = typedLit(books.map(_.map(_.map(x =>
        x.toDouble * x).sum).toSeq).toSeq)
      val cell = array_max(array((0 until k).map { c =>
        struct((lit(2.0) * VectorFns.dot(col("sv"),
          element_at(element_at(cb, col("s") + 1), c + 1)) -
          element_at(element_at(c2, col("s") + 1), c + 1)).as("score"),
          lit(c).as("code"))
      }: _*)).getField("code")
      val next = sv
        .withColumn("cell", cell)
        .select(col("s"), col("cell"),
          posexplode(col("sv")).as(Seq("pos", "v")))
        // micro-quantized integer means — the refineCentroids
        // determinism discipline, so the q_ann_pq oracle can replay
        // both training iterations bit-for-bit
        .groupBy("s", "cell", "pos")
        .agg(sum(round(col("v").cast("double") * lit(1e6), 0)
            .cast("long")).as("sm"),
          count(lit(1)).as("n"))
        .select(col("s"), col("cell"), col("pos"),
          (col("sm").cast("double") / col("n") / lit(1e6)).as("m"))
        .groupBy("s", "cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("s"), col("cell"),
          transform(col("pm"), x => x.getField("m").cast("float"))
            .as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2))
        .toMap
      books = Array.tabulate(m, k)((s, c) =>
        next.getOrElse((s, c), books(s)(c)))
    }
    books
  }

  /** PQ-ADC approximate top-k: every corpus vector compresses to `m`
    * small codes (m·log₂k bits — 4 bytes here vs 256 for the raw
    * floats); a query scores a candidate by summing its subspace
    * dot products against the candidate's CODEBOOK ENTRIES
    * (asymmetric distance computation), then the top `rerank`
    * approximate candidates re-rank by exact cosine.
    *
    * Scale shape: encoding is a per-row projection against broadcast
    * codebooks; the ADC scan reads only (b_id, codes) — the 64×
    * compression is what lets a 100 TB corpus's index fit hot
    * storage; the only shuffle is the per-query top-k. Exact re-rank
    * touches `rerank` full vectors per query, not the corpus.
    */
  def pqTopK(embeddings: DataFrame, k: Int = 5, maxId: Long = 200,
             m: Int = 8, codesPerSub: Int = 16, dim: Int = 64,
             iters: Int = 2, rerank: Int = 15): DataFrame = {
    val sub = dim / m
    val e = embeddings.filter(col("vec_id") < maxId)
    val books = pqTrain(e, m, codesPerSub, dim, iters)
    val cb = typedLit(books.map(_.toSeq).toSeq)
    // corpus side of the ADC scan: 4-byte codes ONLY — the raw
    // vectors are fetched later, for re-rank candidates alone
    val codes = e.select(col("vec_id").as("b_id"),
      array((0 until m).map(s =>
        pqAssign(slice(col("embedding"), s * sub + 1, sub), books(s))): _*)
        .as("codes"))
    val vecs = e.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
    val queries = e.select(col("vec_id").as("a_id"),
      col("embedding").as("va"))
    // ADC score: Σ_s dot(query subvector, codebook[s][code_b[s]])
    val adc = (0 until m).map(s =>
      VectorFns.dot(slice(col("va"), s * sub + 1, sub),
        element_at(element_at(cb, s + 1),
          col("codes").getItem(s) + 1))).reduce(_ + _)
    val wApprox = Window.partitionBy("a_id")
      .orderBy(col("approx").desc, col("b_id").asc)
    val wExact = Window.partitionBy("a_id")
      .orderBy(col("cos_sim").desc, col("b_id").asc)
    queries
      .join(codes, col("a_id") =!= col("b_id"))
      .withColumn("approx", adc)
      .withColumn("ark", row_number().over(wApprox))
      .filter(col("ark") <= rerank)
      .join(vecs, Seq("b_id"))
      .withColumn("cos_sim",
        round(VectorFns.cosine(col("va"), col("vb")), 6))
      .withColumn("rk", row_number().over(wExact).cast("int"))
      .filter(col("rk") <= k)
      .select("a_id", "b_id", "cos_sim", "rk")
      .orderBy("a_id", "rk")
  }

  /** Composed IVF-PQ approximate top-k (the Jégou et al. IVFADC
    * shape — the production 100 TB index): a Lloyd-refined coarse
    * quantizer buckets the corpus into cells, each vector's RESIDUAL
    * (v − centroid[cell]) is product-quantized into `m` codes by ONE
    * shared residual codebook, and a query ADC-scans only its
    * `nProbe` probed cells — where [[pqTopK]] ADC-scans the whole
    * code table, here the scan is cell-local, the IVF candidate cut
    * and the 64× PQ compression composing multiplicatively. The ADC
    * top-`rerank` candidates re-rank by exact cosine.
    *
    * ADC under the dot-product metric needs no query residual:
    * dot(q, c + dequant(codes)) = dot(q, c) + Σ_s dot(q_s, cb[s][code_s])
    * — evaluated as that exact LEFT-ASSOCIATIVE chain (centroid term
    * first) so the DuckDB oracle replays it term for term.
    *
    * Determinism: the coarse quantizer is the lowest-id seed +
    * micro-quantized-integer Lloyd ([[refineCentroids]]); residuals
    * are float(double(v[i]) − double(c[i])) — one exactly-rounded op,
    * engine-independent; PQ training on the residual frame reuses
    * [[pqTrain]]'s integer-mean discipline. The whole pipeline
    * hash-gates against an unrolled-CTE DuckDB replay.
    *
    * Scale shape: everything driver-side is codebook-sized
    * (nCentroids + m·k subvectors); the corpus-side frames carry
    * (id, cell, 4-byte codes) — the index that fits hot storage at
    * 100 TB; the only wide-row stage is the `rerank`-bounded exact
    * re-rank join.
    */
  /** Trained IVFADC index artifacts — coarse centroids + the shared
    * residual codebooks. Codebook-sized (nCentroids + m·k
    * subvectors), so an index trains ONCE per corpus and serves
    * every query shape (plain, filtered, streaming) — exactly how a
    * production 100 TB index is operated; share via
    * [[DerivedCache.memoValue]]. */
  case class IvfPqIndex(centroids: Array[(Int, Seq[Float])],
                        books: Array[Array[Seq[Float]]])

  /** The residual frame r = v − centroid[cell] over the slice:
    * r[i] = float(double(v[i]) − double(c[i])) — exact double
    * subtraction of two floats, then one rounding, so DuckDB replays
    * as CAST(v[i] − c[i] AS FLOAT). */
  private def residualFrame(e: DataFrame,
      centroids: Array[(Int, Seq[Float])]): DataFrame = {
    // cell-indexed centroid literal (cells are 0-based contiguous by
    // trainQuantizer's renumbering)
    val centLit = typedLit(centroids.sortBy(_._1).map(_._2).toSeq)
    assignCells(e, centroids).withColumn("residual",
      zip_with(col("embedding"), element_at(centLit, col("cell") + 1),
        (x, y) => (x.cast("double") - y.cast("double")).cast("float")))
  }

  /** Train the composed index: Lloyd coarse quantizer + ONE shared
    * residual codebook (classic IVFADC) via [[pqTrain]]'s
    * deterministic pipeline. */
  def ivfPqTrain(embeddings: DataFrame, maxId: Long = 200,
                 nCentroids: Int = 8, kmeansIters: Int = 2,
                 m: Int = 16, codesPerSub: Int = 16,
                 dim: Int = 64, pqIters: Int = 2,
                 coarse: Option[Array[(Int, Seq[Float])]] = None)
      : IvfPqIndex = {
    val e = embeddings.filter(col("vec_id") < maxId)
    val centroids = coarse.getOrElse(
      trainQuantizer(e, nCentroids, kmeansIters))
    val books = pqTrain(
      residualFrame(e, centroids)
        .select(col("vec_id"), col("residual").as("embedding")),
      m, codesPerSub, dim, pqIters)
    IvfPqIndex(centroids, books)
  }

  /** `candidateFilter`: the filtered-ANN contract composed onto the
    * compressed index — the full production RAG/tenant shape. Both
    * quantizers train on the WHOLE slice (one shared index serves
    * every predicate); the filter restricts the CODE TABLE side of
    * the cell join, so the ADC ranks qualifying candidates only and
    * every query gets up to k qualifying neighbors.
    *
    * `index`: pass a pre-trained [[IvfPqIndex]] (same train params)
    * to skip training — the shared-index path every production
    * deployment uses; None trains inline. */
  def ivfPqTopK(embeddings: DataFrame, k: Int = 5, maxId: Long = 200,
                nCentroids: Int = 8, nProbe: Int = 2,
                kmeansIters: Int = 2, m: Int = 16, codesPerSub: Int = 16,
                dim: Int = 64, pqIters: Int = 2,
                rerank: Int = 45,
                candidateFilter: Column = lit(true),
                index: Option[IvfPqIndex] = None): DataFrame = {
    val e = embeddings.filter(col("vec_id") < maxId)
    val idx = index.getOrElse(ivfPqTrain(embeddings, maxId, nCentroids,
      kmeansIters, m, codesPerSub, dim, pqIters))
    // corpus index rows: (b_id, cell, codes) — encoded inline (the
    // session-build path); a MAINTAINED code table feeds
    // ivfPqTopKFrom directly instead
    val codes = residualFrame(e, idx.centroids).filter(candidateFilter)
      .select(col("vec_id").as("b_id"), col("cell"),
        pqCodes(idx.books, m, dim)(col("residual")).as("codes"))
    ivfPqTopKFrom(codes, e, e, idx, k, nProbe, rerank, m, dim)
  }

  /** The m SIGNED-BYTE PQ codes of a residual vector — ONE BYTE per
    * code (codesPerSub <= 128, enforced in pqTrain: the byte is
    * SIGNED, so 128..255 would wrap negative and mis-index the
    * codebook; m bytes per vector is the production packed-code
    * layout, 32x narrower than the raw floats). */
  private[graft] def pqCodes(books: Array[Array[Seq[Float]]], m: Int,
                             dim: Int)(residual: Column): Column = {
    val sub = dim / m
    array((0 until m).map(s =>
      pqAssign(slice(residual, s * sub + 1, sub), books(s))
        .cast("byte")): _*)
  }

  /** (vec_id, cell, codes) IVFADC index rows for an embedding frame
    * against a PINNED index — the per-row encode a maintained code
    * table folds per corpus commit ([[graft.operators
    * .IncrementalIndex]]): coarse-assign, residual, m byte codes.
    * Decomposable by construction (each output row is a function of
    * one input row and the broadcast index artifacts). */
  def encodeIvfPq(e: DataFrame, idx: IvfPqIndex, m: Int = 16,
                  dim: Int = 64): DataFrame =
    residualFrame(e, idx.centroids)
      .select(col("vec_id"), col("cell"),
        pqCodes(idx.books, m, dim)(col("residual")).as("codes"))

  /** The probe/ADC/re-rank core of [[ivfPqTopK]] over an ALREADY
    * ENCODED code frame (b_id, cell, codes) — the entry point a
    * maintained code table serves
    * ([[graft.operators.IncrementalIndex.searchIvfPq]]): the session
    * pays NO corpus re-encode, only the cell-local ADC scan over the
    * standing (id, cell, m-byte-codes) rows. `queries` is (vec_id,
    * embedding); `vecs` supplies the full vectors for the
    * `rerank`-bounded exact re-rank join. */
  private[graft] def ivfPqTopKFrom(codes: DataFrame, queries: DataFrame,
                                   vecs: DataFrame, idx: IvfPqIndex,
                                   k: Int, nProbe: Int, rerank: Int,
                                   m: Int = 16, dim: Int = 64)
      : DataFrame = {
    val sub = dim / m
    val centLit = typedLit(idx.centroids.sortBy(_._1).map(_._2).toSeq)
    val codesIn = codes.select(col("b_id"), col("cell"), col("codes"))
    val vb = vecs.select(col("vec_id").as("b_id"),
      col("embedding").as("vb"))
    // query probes: top-nProbe cells (reuses the IVF probe kernel)
    val probed = probeCells(queries, idx.centroids, nProbe)
    val cb = typedLit(idx.books.map(_.toSeq).toSeq)
    // approx = dot(q, centroid[cell]) + Σ_s dot(q_s, cb[s][codes[s]]),
    // left-associative from the centroid term
    val adc = (0 until m).foldLeft(
      VectorFns.dot(col("va"), element_at(centLit, col("cell") + 1))) {
      (acc, s) => acc + VectorFns.dot(slice(col("va"), s * sub + 1, sub),
        element_at(element_at(cb, s + 1), col("codes").getItem(s) + 1))
    }
    val wApprox = Window.partitionBy("a_id")
      .orderBy(col("approx").desc, col("b_id").asc)
    val wExact = Window.partitionBy("a_id")
      .orderBy(col("cos_sim").desc, col("b_id").asc)
    // cell-local ADC: the candidate join is the IVF equi-join on cell
    // id — a candidate is scored only when it lives in a probed cell
    probed
      .join(codesIn, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("approx", adc)
      .withColumn("ark", row_number().over(wApprox))
      .filter(col("ark") <= rerank)
      .join(vb, Seq("b_id"))
      .withColumn("cos_sim",
        round(VectorFns.cosine(col("va"), col("vb")), 6))
      .withColumn("rk", row_number().over(wExact).cast("int"))
      .filter(col("rk") <= k)
      .select("a_id", "b_id", "cos_sim", "rk")
      .orderBy("a_id", "rk")
  }

  /** LSH-bucketed approximate top-k: candidates = pairs co-bucketed
    * in any table, ranked exactly within each query's candidate set.
    */
  def lshTopK(embeddings: DataFrame, k: Int = 5, maxId: Long = 200,
              tables: Int = 4, bitsPerTable: Int = 4,
              dim: Int = 64): DataFrame = {
    val e = embeddings.filter(col("vec_id") < maxId)
    val bk = bucketed(e, tables, bitsPerTable, dim)
    val cand = bk.alias("a")
      .join(bk.alias("b"),
        col("a.table_idx") === col("b.table_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("a.embedding").as("va"),
        col("b.vec_id").as("b_id"), col("b.embedding").as("vb"))
      .distinct()
    val w = Window.partitionBy("a_id")
      .orderBy(col("cos_sim").desc, col("b_id").asc)
    cand
      .withColumn("cos_sim",
        round(VectorFns.cosine(col("va"), col("vb")), 6))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select("a_id", "b_id", "cos_sim", "rk")
      .orderBy("a_id", "rk")
  }
}
