package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sparse + hybrid text retrieval — the query→corpus search shapes a
  * training-data pipeline runs for decontamination lookups, RAG
  * grounding, and eval-set leakage audits. The reference
  * (`kinesis-to-humio.py`) has no retrieval surface; this pack is
  * part of the LLM-pipeline brief, composing the engine's existing
  * token statistics ([[AnalyticsQueries]] tf/df discipline) and
  * embedding kernels ([[VectorFns]]).
  *
  * Operators:
  *   - `q_retrieval_bm25` — Okapi BM25 (k1=1.2, b=0.75) top-10 docs
  *     per query over an inverted-index-shaped postings frame.
  *   - `q_retrieval_fusion` — reciprocal-rank fusion (RRF, k=60) of
  *     the BM25 ranking with an embedding-cosine ranking: the hybrid
  *     sparse⊕dense retrieval standard.
  *
  * == Determinism (SURVEY §7.4) ==
  * BM25 is the registry's first *transcendental* scoring function
  * under the hash gate. `ln` is a libm call, NOT an IEEE-exact op:
  * glibc (DuckDB) and HotSpot (`Math.log`) disagree by 1 ulp on
  * ~4·10⁻⁴ of inputs (measured on 2·10⁵ idf-shaped ratios this
  * round). The mitigation is EARLY QUANTIZATION: idf is rounded to 6
  * decimals the moment it is computed — `idf6 = round(ln(1 +
  * (N−df+0.5)/(df+0.5)), 6)` — so a 1-ulp ln disagreement only
  * surfaces if the true value lies within 1 ulp of a 5·10⁻⁷ rounding
  * boundary (p ≈ 1e-10 per distinct df; the vocabulary has 31). Every
  * arithmetic step after the quantization is a correctly-rounded IEEE
  * double op replayed with identical operand order by the oracle, and
  * the per-(query,doc) sum over matched terms is made order-free by
  * casting each term contribution to DECIMAL(18,6) before SUM (the
  * q_agg_hash discipline). RRF needs none of this: 1/(60+rank) on
  * integer ranks is exactly rounded, and a two-term IEEE add is
  * commutative.
  *
  * == Scale shape ==
  * Queries ≪ corpus is the contract (|Q| = 20 here): the query-term
  * frame and the vocabulary-sized idf frame BROADCAST onto the
  * postings frame, so the only shuffle is the per-(query,doc) partial
  * aggregate — map-side combine shrinks it below |Q|·|matched docs|
  * rows before exchange. Nothing corpus-sized ever shuffles on a raw
  * token key (the hotkey-join gate shape); for web-scale query sets
  * the same plan flips to [[graft.operators.ScaleJoins
  * .frequencySplitJoin]] on term, exactly as q_text_keywords does.
  * The dense side of the fusion is [[graft.operators.AnnSearch
  * .exactCosineTopK]] — the IVF cell EQUI-join with a triangle-
  * inequality bound that makes its top-k provably equal to the
  * exact scan (sublinear on clustered corpora, linear-at-worst on
  * uniform ones, never a nested-loop cross). The brute scan remains
  * as the spec-side verifier (RetrievalQueriesSpec).
  */
object RetrievalQueries {
  private val nQueries = 20 // query set = doc_id < 20, by contract
  private val fusionDepth = 50 // per-ranker rank cutoff feeding RRF
  private val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)

  /** BM25-scored (query_id, doc_id, score) via the shared
    * [[graft.operators.Bm25]] core (one expression tree with the S21
    * streaming twin). Query terms are the DISTINCT terms of the
    * query documents (standard short-query BM25: query-side tf
    * ignored); both the query-term frame and the vocab-sized idf
    * broadcast — never a token-keyed shuffle.
    *
    * Memoized ([[graft.operators.DerivedCache]]): three registry
    * keys consume the identical scored frame (bm25 top-k, RRF
    * fusion, nDCG), so the index build + scoring join runs once per
    * (session, dataset) — the clusterPairs/ivfPqIndex discipline.
    * The checkpointed frame is query-bounded (nQueries × matching
    * docs), not corpus²-sized. */
  private def bm25Scored(s: SparkSession, d: String): DataFrame =
    graft.operators.DerivedCache.memo(
      s, s"bm25_scored:q=$nQueries:$d") {
      val idx = graft.operators.Bm25.buildIndex(
        Tables.documents(s, d).select("doc_id", "text"))
      val qterms = idx.postings.filter(col("doc_id") < nQueries)
        .select(col("doc_id").as("query_id"), col("term"))
      graft.operators.Bm25.score(qterms, idx)
    }

  /** Cosine-scored (query_id, doc_id, cos_sim), top-[[fusionDepth]]
    * per query — the DEFAULT dense side is now the sublinear path:
    * [[graft.operators.AnnSearch.exactCosineTopK]], the IVF cell
    * EQUI-join with a triangle-inequality cell bound that guarantees
    * results bit-identical to the exact query×corpus scan (its
    * scaladoc has the proof; RetrievalQueriesSpec verifies equality
    * against the brute scan and pins the build plan to the cell
    * join — no nested loop). The oracle replays the plain exact
    * scan, which is the same ranking by the guarantee. vec_id aligns
    * with doc_id by fixture construction (FIXTURES.md). Memoized
    * like [[bm25Scored]]: the fusion and nDCG keys consume the
    * identical frame. Depth [[fusionDepth]] covers every consumer
    * (fusion cuts at 50, nDCG relevance at 10) — ranks within the
    * frame equal global ranks for rk ≤ 50. */
  private def cosineScored(s: SparkSession, d: String): DataFrame =
    graft.operators.DerivedCache.memo(
      s, s"cosine_scored:q=$nQueries:k=$fusionDepth:$d") {
      graft.operators.AnnSearch.exactCosineTopK(
        Tables.embeddings(s, d), col("vec_id") < nQueries,
        k = fusionDepth, cacheKey = Some(s"cosine_scored:$d"))
    }

  private def rankOver(part: String, score: Column, id: Column): Column =
    row_number().over(
      Window.partitionBy(part).orderBy(score.desc, id.asc)).cast("int")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retrieval_bm25" -> ((s, d) => {
      bm25Scored(s, d)
        .withColumn("rk", rankOver("query_id", col("score"), col("doc_id")))
        .filter(col("rk") <= 10)
        .select("query_id", "doc_id", "score", "rk")
        .orderBy("query_id", "rk")
    }),

    // Retrieval-quality evaluation: nDCG@10 of the BM25 ranking,
    // with the dense cosine top-10 as graded relevance (rel =
    // 11 − cosine_rank) — the eval-harness member of the retrieval
    // family, as q_ann_recall is for ANN. Determinism: the rank
    // discount 1/log2(i+1) is quantized to the 1e-6 grid exactly
    // like idf6 (10 distinct inputs), each DCG term is re-rounded to
    // the grid and decimal-summed, and the final nDCG is one IEEE
    // division of two grid-exact doubles.
    "q_retrieval_ndcg" -> ((s, d) => {
      val disc6 = round(lit(1.0) / log2(col("rk") + lit(1.0)), 6)
      val rb = bm25Scored(s, d)
        .withColumn("rk", rankOver("query_id", col("score"), col("doc_id")))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("doc_id"), disc6.as("disc"))
      val rel = cosineScored(s, d)
        .withColumn("rk", rankOver("query_id", col("cos_sim"), col("doc_id")))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("doc_id"),
          (lit(11) - col("rk")).cast("long").as("rel"),
          disc6.as("ideal_disc"))
      val dcg = rb.join(rel.select("query_id", "doc_id", "rel"),
          Seq("query_id", "doc_id"), "left")
        .select(col("query_id"),
          round(coalesce(col("rel"), lit(0L)).cast("double") * col("disc"), 6)
            .cast(dec6).as("t"))
        .groupBy("query_id").agg(sum("t").cast("double").as("dcg"))
      // ideal DCG: the relevance grades replayed in their own
      // (ideal) order — the cosine ranking itself, by construction
      val idcg = rel
        .select(col("query_id"),
          round(col("rel").cast("double") * col("ideal_disc"), 6)
            .cast(dec6).as("t"))
        .groupBy("query_id").agg(sum("t").cast("double").as("idcg"))
      dcg.join(idcg, "query_id")
        .select(col("query_id"), col("dcg"), col("idcg"),
          (col("dcg") / col("idcg")).as("ndcg"))
        .orderBy("query_id")
    }),

    "q_retrieval_fusion" -> ((s, d) => {
      val rb = bm25Scored(s, d)
        .withColumn("rb", rankOver("query_id", col("score"), col("doc_id")))
        .filter(col("rb") <= fusionDepth)
        .select("query_id", "doc_id", "rb")
      val rc = cosineScored(s, d)
        .withColumn("rc", rankOver("query_id", col("cos_sim"), col("doc_id")))
        .filter(col("rc") <= fusionDepth)
        .select("query_id", "doc_id", "rc")
      // RRF via the SHARED scoring core (graft.operators.Rrf — one
      // formula for this key and the S23 streaming twin): 1/(60+rank)
      // on exact int ranks, absent ranker contributes 0 — exact-int
      // add + one correctly-rounded division per term, then a single
      // two-term IEEE add, bit-deterministic with no rounding needed.
      val fused = rb.join(rc, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          graft.operators.Rrf.scoreCol(col("rb"), col("rc")))
      fused
        .withColumn("rk", rankOver("query_id", col("rrf"), col("doc_id")))
        .filter(col("rk") <= 10)
        .select("query_id", "doc_id", "rb", "rc", "rrf", "rk")
        .orderBy("query_id", "rk")
    }),
  )

  def oracleSql: Map[String, String] = {
    // Shared CTE prefix: postings, stats, quantized idf, query terms,
    // BM25 contributions, per-(query,doc) decimal-summed scores.
    // Fractional literals are CAST to DOUBLE explicitly — DuckDB
    // parses bare 2.2 as DECIMAL, which would silently switch the
    // arithmetic to exact-decimal and diverge from Spark's IEEE path.
    val bm25Cte =
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
        |         len(string_split(text, ' ')) AS dl
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
        |  FROM toks GROUP BY doc_id, term),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
        |           / COUNT(*) AS avgdl
        |  FROM documents),
        |idf AS (
        |  SELECT term,
        |    ROUND(LN(CAST(1.0 AS DOUBLE) +
        |      ((n_docs - df) + CAST(0.5 AS DOUBLE)) /
        |      (df + CAST(0.5 AS DOUBLE))), 6) AS idf6
        |  FROM (SELECT term, COUNT(*) AS df
        |        FROM (SELECT DISTINCT doc_id, term FROM toks)
        |        GROUP BY term), stats),
        |q AS (
        |  SELECT doc_id AS query_id, term FROM tf WHERE doc_id < 20),
        |contrib AS (
        |  SELECT q.query_id, tf.doc_id,
        |    CAST(ROUND(idf.idf6 * ((tf.tf * CAST(2.2 AS DOUBLE)) /
        |      (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) +
        |        CAST(0.75 AS DOUBLE) *
        |        (CAST(tf.dl AS DOUBLE) / stats.avgdl)))), 6)
        |      AS DECIMAL(18,6)) AS s
        |  FROM q
        |  JOIN tf ON q.term = tf.term
        |  JOIN idf ON tf.term = idf.term
        |  CROSS JOIN stats),
        |scored AS (
        |  SELECT query_id, doc_id, CAST(SUM(s) AS DOUBLE) AS score
        |  FROM contrib GROUP BY query_id, doc_id)""".stripMargin
    Map(
      "q_retrieval_bm25" ->
        (bm25Cte +
          """,
            |ranked AS (
            |  SELECT query_id, doc_id, score,
            |    CAST(row_number() OVER (PARTITION BY query_id
            |      ORDER BY score DESC, doc_id) AS INT) AS rk
            |  FROM scored)
            |SELECT query_id, doc_id, score, rk
            |FROM ranked WHERE rk <= 10
            |ORDER BY query_id, rk""".stripMargin),
      "q_retrieval_ndcg" ->
        (bm25Cte +
          """,
            |rb AS (
            |  SELECT query_id, doc_id,
            |    ROUND(CAST(1.0 AS DOUBLE) /
            |      log2(rk + CAST(1.0 AS DOUBLE)), 6) AS disc
            |  FROM (SELECT query_id, doc_id,
            |          CAST(row_number() OVER (PARTITION BY query_id
            |            ORDER BY score DESC, doc_id) AS INT) AS rk
            |        FROM scored)
            |  WHERE rk <= 10),
            |cos AS (
            |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
            |    ROUND(list_inner_product(CAST(q.embedding AS DOUBLE[]),
            |                             CAST(c.embedding AS DOUBLE[])) /
            |      (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]),
            |                               CAST(q.embedding AS DOUBLE[]))) *
            |       sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]),
            |                               CAST(c.embedding AS DOUBLE[])))),
            |      6) AS cos_sim
            |  FROM embeddings q, embeddings c
            |  WHERE q.vec_id < 20),
            |rel AS (
            |  SELECT query_id, doc_id, CAST(11 - rk AS BIGINT) AS rel,
            |    ROUND(CAST(1.0 AS DOUBLE) /
            |      log2(rk + CAST(1.0 AS DOUBLE)), 6) AS ideal_disc
            |  FROM (SELECT query_id, doc_id,
            |          CAST(row_number() OVER (PARTITION BY query_id
            |            ORDER BY cos_sim DESC, doc_id) AS INT) AS rk
            |        FROM cos)
            |  WHERE rk <= 10),
            |dcg AS (
            |  SELECT rb.query_id,
            |    CAST(SUM(CAST(ROUND(
            |      CAST(COALESCE(rel.rel, 0) AS DOUBLE) * rb.disc, 6)
            |      AS DECIMAL(18,6))) AS DOUBLE) AS dcg
            |  FROM rb LEFT JOIN rel
            |    ON rb.query_id = rel.query_id AND rb.doc_id = rel.doc_id
            |  GROUP BY rb.query_id),
            |idcg AS (
            |  SELECT query_id,
            |    CAST(SUM(CAST(ROUND(
            |      CAST(rel AS DOUBLE) * ideal_disc, 6)
            |      AS DECIMAL(18,6))) AS DOUBLE) AS idcg
            |  FROM rel GROUP BY query_id)
            |SELECT dcg.query_id, dcg.dcg AS dcg, idcg.idcg AS idcg,
            |  dcg.dcg / idcg.idcg AS ndcg
            |FROM dcg JOIN idcg ON dcg.query_id = idcg.query_id
            |ORDER BY dcg.query_id""".stripMargin),
      "q_retrieval_fusion" ->
        (bm25Cte +
          """,
            |rb AS (
            |  SELECT query_id, doc_id,
            |    CAST(row_number() OVER (PARTITION BY query_id
            |      ORDER BY score DESC, doc_id) AS INT) AS rb
            |  FROM scored
            |  QUALIFY rb <= 50),
            |cos AS (
            |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
            |    ROUND(list_inner_product(CAST(q.embedding AS DOUBLE[]),
            |                             CAST(c.embedding AS DOUBLE[])) /
            |      (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]),
            |                               CAST(q.embedding AS DOUBLE[]))) *
            |       sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]),
            |                               CAST(c.embedding AS DOUBLE[])))),
            |      6) AS cos_sim
            |  FROM embeddings q, embeddings c
            |  WHERE q.vec_id < 20),
            |rc AS (
            |  SELECT query_id, doc_id,
            |    CAST(row_number() OVER (PARTITION BY query_id
            |      ORDER BY cos_sim DESC, doc_id) AS INT) AS rc
            |  FROM cos
            |  QUALIFY rc <= 50),
            |fused AS (
            |  SELECT COALESCE(rb.query_id, rc.query_id) AS query_id,
            |         COALESCE(rb.doc_id, rc.doc_id) AS doc_id,
            |         rb.rb, rc.rc,
            |    COALESCE(CAST(1.0 AS DOUBLE) /
            |      CAST(60 + rb.rb AS DOUBLE), CAST(0.0 AS DOUBLE)) +
            |    COALESCE(CAST(1.0 AS DOUBLE) /
            |      CAST(60 + rc.rc AS DOUBLE), CAST(0.0 AS DOUBLE)) AS rrf
            |  FROM rb FULL OUTER JOIN rc
            |    ON rb.query_id = rc.query_id AND rb.doc_id = rc.doc_id),
            |franked AS (
            |  SELECT query_id, doc_id, rb, rc, rrf,
            |    CAST(row_number() OVER (PARTITION BY query_id
            |      ORDER BY rrf DESC, doc_id) AS INT) AS rk
            |  FROM fused)
            |SELECT query_id, doc_id, rb, rc, rrf, rk
            |FROM franked WHERE rk <= 10
            |ORDER BY query_id, rk""".stripMargin),
    )
  }
}
