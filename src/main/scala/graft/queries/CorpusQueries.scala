package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.operators.Sampling

/** Corpus-construction pack: the three data-curation operators that
  * sit between "filtered corpus" and "training run" in an LLM data
  * pipeline — token-budget mixture admission, n-gram-LM quality
  * scoring (the CCNet/KenLM perplexity-filter shape), and exact
  * duplicated-substring detection (the Lee et al. 2022
  * "Deduplicating Training Data Makes Language Models Better"
  * operator family).
  *
  * Determinism (SURVEY §7.4): every score is either an exact integer
  * aggregate, ONE double division, or a round-before-exact-decimal-
  * sum mean (the q_sim_matrix rule) — no libm transcendentals, so
  * every key here hash-matches its DuckDB oracle bit-for-bit. The
  * LM score is deliberately the MEAN BIGRAM PROBABILITY, not its log
  * (perplexity's exp/log would drag in libm); it induces the same
  * keep/drop ordering for a threshold filter.
  *
  * Scale notes are per-operator below; the common theme is that
  * nothing shuffles document text — shuffles carry gram keys, md5
  * window hashes, or (group, count) cells.
  */
object CorpusQueries {

  /** Head/tail split threshold for the q_text_lm_score model join: a
    * bigram is HEAD iff it carries > 1/lmHeadFanout of all bigram
    * occurrences, so the head has at most lmHeadFanout rows
    * (pigeonhole) — always broadcastable — and every tail key is
    * bounded by N/lmHeadFanout occurrences — no hot reducer. 4096
    * caps the broadcast at a few hundred KB while bounding the worst
    * tail key to 0.025% of the corpus. */
  val lmHeadFanout = 4096L

  /** The corpus-LM document scores (doc_id, n_bigrams, lm_score) —
    * memoized ([[graft.operators.DerivedCache]]): q_text_lm_score
    * AND q_select_ccnet consume the identical frame, and the bigram
    * model build + head/tail join is exactly the shared
    * materialization worth paying once (the clusterPairs precedent).
    * See the q_text_lm_score registration comment for the full skew
    * discipline. */
  private def lmScores(s: SparkSession, d: String): DataFrame =
    graft.operators.DerivedCache.memo(
      s, s"lm_scores:bigram:fanout=$lmHeadFanout:$d")(lmScoresRaw(s, d))

  /** The un-memoized [[lmScores]] pipeline — exposed so PlanSpec can
    * pin the head/tail join shape (the memoized frame's own plan is
    * just the checkpoint scan). */
  private[graft] def lmScoresRaw(s: SparkSession, d: String)
      : DataFrame = {
      val big = bigrams(s, d)
      val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
      val c1 = big.groupBy("w1").agg(count(lit(1)).as("cnt1"))
      // nano-integer bigram probabilities: round(x·1e9, 0) is the
      // cross-engine-exact quantization (a round(x, 9) surface on
      // count RATIOS hits .5e-9 grid boundaries where Spark HALF_UP
      // and DuckDB scaled-double rounding disagree — caught by the
      // sf0.1 gate, 8/5000 docs); the summed nanos are exact BIGINTs
      val p = c2.join(c1, "w1")
        .select(col("w1"), col("w2"),
          round(col("cnt2").cast("double") / col("cnt1").cast("double") *
            lit(1e9), 0).cast("long").as("p_e9"), col("cnt2"))
      // cnt2 is by construction the stream frequency of (w1, w2) in
      // `big`, so the generalized head/tail operator applies
      // directly (this query's inline version is where the operator
      // came from; result provably identical, oracle hash unchanged)
      graft.operators.ScaleJoins
        .frequencySplitJoin(big, p, Seq("w1", "w2"), "cnt2",
          lmHeadFanout)
        .select("doc_id", "p_e9")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("p_e9")).cast("double") / count(lit(1)) / lit(1e9))
            .as("lm_score"))
    }

  /** Every 30-char window of every document (stride 1), keyed by the
    * first 60 bits of the window's md5 as a LONG — the same portable
    * md5-derived long-key trick the simhash family uses: an 8-byte
    * shuffle key any engine reproduces (`('0x' || substring(md5(w),
    * 1, 15))::BIGINT` in DuckDB), 4× narrower than hex text.
    * One narrow projection — the single expensive pass both dup-span
    * operators below derive everything from. */
  private def winHashes(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) >= 30)
      .select("doc_id", "text")
      // the per-char window-hash kernel is the CPU; spread it across
      // the cluster rather than across file splits (a sub-128 MB
      // corpus file is ONE split — one task — without this)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(
        graft.functions.HashExpressions
          .charWindowMd5_60(col("text"), 30)).as("h"))

  /** Per-doc duplicated-span profile from a (doc_id, h) window
    * frame, in ONE pass over the explode: collapse to per-(doc, h)
    * position counts (map-side combine eats within-doc repeats),
    * count distinct docs per h with a window over the collapsed
    * frame, then re-aggregate per doc. Two shuffles of the COLLAPSED
    * frame (8-byte keys), the window input is one row per distinct
    * (doc, window content) — never the raw position stream. */
  private def dupSpanProfile(wins: DataFrame, totalAs: String,
      dupAs: String): DataFrame = {
    val byDoc = wins.groupBy("doc_id", "h")
      .agg(count(lit(1)).as("cnt"))
    val nd = Window.partitionBy("h")
    byDoc.withColumn("ndocs", count(lit(1)).over(nd))
      .groupBy("doc_id")
      .agg(sum("cnt").as(totalAs),
        sum(when(col("ndocs") >= 2, col("cnt")).otherwise(0L))
          .as(dupAs))
      .select(col("doc_id"), col(totalAs), col(dupAs),
        // int-ratio surface: small denominators (e.g. 128 windows)
        // make exact half-grid hits realistic, so no round — bare
        // IEEE division is bit-identical (SURVEY 7.4 rule 10)
        (col(dupAs).cast("double") / col(totalAs).cast("double"))
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  /** Bigram occurrences of each document: one narrow projection
    * (split + transform + explode), no shuffle. */
  private def bigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select("doc_id", "text")
      // explode CPU must not be bound to file-split count (see
      // winHashes); the shuffle carries only the raw documents
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1)," +
          " i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token-budget mixture admission: each (lang, source) cell keeps
    // documents in portable-md5 order until half the cell's tokens
    // are admitted (budgets derived in-plan keep the query self-
    // contained; production passes a config frame — same broadcast).
    // Scale: budgets are |cells| rows (broadcast); admission is one
    // partitioned window — see Sampling.admitByTokenBudget's scaladoc
    // for the per-cell boundedness argument and the globalRank
    // escape hatch.
    "q_mixture_budget" -> ((s, d) => {
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          graft.operators.TextAnalysis.wsTokenCount(col("text"))
            .as("toks"))
      val budgets = perDoc.groupBy("lang", "source")
        .agg(expr("sum(toks) div 2").as("token_budget"))
      Sampling.admitByTokenBudget(perDoc, "doc_id",
          Seq("lang", "source"), col("toks"), budgets)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // Corpus-LM quality score: train an unsmoothed bigram model on
    // the corpus itself (cnt(w1,w2) / cnt(w1·) over bigram
    // occurrences), then score each document by its mean bigram
    // probability — the self-scoring shape of a CCNet-style
    // perplexity filter (low score = improbable token transitions =
    // gibberish/boilerplate candidates). Each probability is one
    // double division rounded to 9, the mean is an exact decimal sum
    // (order-independent) over those — cross-engine bit-identical.
    //
    // Scale / SKEW: token bigrams are Zipfian, so the occurrence-
    // stream ⋈ model equi-join must not shuffle raw gram keys — the
    // top bigram alone would land a corpus-fraction on one reducer.
    // The model therefore splits on a provable frequency threshold:
    // the HEAD (any bigram carrying > 1/lmHeadFanout of all
    // occurrences — at most lmHeadFanout rows by pigeonhole, the
    // Misra-Gries bound of operators/HeavyHitters) is BROADCAST and
    // scored map-side; the TAIL joins by shuffle, where every key is
    // ≤ N/lmHeadFanout occurrences by construction — no reducer can
    // receive more than 1/lmHeadFanout of the stream for one key.
    // Head rows are screened out of the tail join by a broadcast
    // anti-join, so hot occurrences never reach a shuffle at all.
    // The head∪tail partition covers the model exactly once, and the
    // doc-level mean is an order-independent exact decimal sum, so
    // the result (and the oracle hash) is identical to the plain
    // join. The model-build aggregations themselves are safe at any
    // skew: partial (map-side) aggregation collapses hot grams per
    // task before the shuffle; the c2 ⋈ c1 model join fans out per
    // DISTINCT successor (vocabulary-bounded, not corpus-bounded).
    "q_text_lm_score" -> ((s, d) => lmScores(s, d).orderBy("doc_id")),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020, the
    // Common Crawl curation pipeline's selection step): per language,
    // rank documents by LM score (best first) and split into
    // head/middle/tail at 1/3 and 2/3 of the language's CUMULATIVE
    // TOKENS — pretraining then keeps head(+middle). Composes the
    // memoized self-LM scores with one per-language window (cum token
    // sums in score order) and a broadcast |langs|-row totals join;
    // bucket thresholds are exact BIGINT compares (cum·3 ≤ tot), no
    // division. Scale: the window partitions by language — the same
    // per-group boundedness contract as every partitioned window
    // here; nothing shuffles text.
    "q_select_ccnet" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          graft.operators.TextAnalysis.wsTokenCount(col("text"))
            .cast("long").as("n_toks"))
      val scored = lmScores(s, d).join(docs, "doc_id")
      val w = Window.partitionBy("lang")
        .orderBy(col("lm_score").desc, col("doc_id"))
      val tot = scored.groupBy("lang")
        .agg(sum(col("n_toks")).cast("long").as("tot_toks"))
      scored
        .withColumn("cum_toks", sum(col("n_toks")).over(w).cast("long"))
        .join(broadcast(tot), "lang")
        .withColumn("bucket",
          when(col("cum_toks") * 3 <= col("tot_toks"), "head")
            .when(col("cum_toks") * 3 <= col("tot_toks") * 2, "middle")
            .otherwise("tail"))
        .select("doc_id", "lang", "n_toks", "cum_toks", "lm_score",
          "bucket")
        .orderBy("doc_id")
    }),

    // Exact duplicated-substring detection: every 30-char window of
    // every document (stride 1, so shared spans match regardless of
    // alignment — the property Lee et al. get from suffix arrays),
    // hashed with portable md5; a window is duplicated iff its
    // content appears in ≥ 2 distinct documents. Output is the
    // per-document duplicated-span profile used to drop or trim.
    // Scale: the window frame is ~n_chars rows of 32-char hashes —
    // a constant factor over the corpus, shuffled ONCE on the hash
    // (never the text); production cuts the constant with content-
    // defined anchors (winnowing) behind the same groupBy, and the
    // within-doc pre-distinct below already collapses repeated
    // windows before the shuffle.
    // Embedding-pipeline chunking: 50-token windows at stride 40
    // (10-token overlap), the prep step every RAG / embedding /
    // context-packing pipeline runs before encoding. Emits chunk
    // coordinates + a portable content hash per chunk (not the text:
    // at scale the chunk table is an INDEX, joined back to the corpus
    // by doc_id when the text is needed). Pure per-row generation —
    // no shuffle at all; the plan is scan → project → explode.
    "q_text_chunk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, greatest(1," +
            " cast(ceil((size(ws) - 10) / 40.0) as int)) - 1)," +
            " k -> struct(k AS chunk_id," +
            " size(slice(ws, k * 40 + 1, 50)) AS n_tokens," +
            " md5(cast(array_join(slice(ws, k * 40 + 1, 50), ' ')" +
            " as binary)) AS chunk_hash))")).as("c"))
        .select(col("doc_id"), col("c.chunk_id"), col("c.n_tokens"),
          col("c.chunk_hash"))
        .orderBy("doc_id", "chunk_id")),

    // The SCALE PATH for q_dedup_substring: content-defined chunking
    // (LBFS-style) keeps only windows whose hash ≡ 0 (mod 8) —
    // anchors chosen by CONTENT, so two documents sharing a span
    // anchor at the same in-span offsets regardless of alignment
    // (the property a fixed stride loses), at 1/8 the shuffle volume
    // of stride-1. Recall is probabilistic (a shared span of L chars
    // misses with ~(7/8)^(L-29)); the stride-1 operator above is the
    // exhaustive tier, this is the 100 TB screen.
    "q_dedup_cdc" -> ((s, d) =>
      dupSpanProfile(
        winHashes(s, d).filter(col("h") % 8 === 0),
        "n_anchors", "n_dup_anchors")),

    "q_dedup_substring" -> ((s, d) =>
      dupSpanProfile(winHashes(s, d), "n_windows", "n_dup_windows"))
  )

  /** The corpus-LM score CTE shared by the q_text_lm_score and
    * q_select_ccnet oracles — ends with `lm(doc_id, n_bigrams,
    * lm_score)`. */
  private val lmScoreCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |big AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM toks, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
      |c2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM big GROUP BY 1, 2),
      |c1 AS (SELECT w1, COUNT(*) AS cnt1 FROM big GROUP BY 1),
      |p AS (
      |  SELECT w1, w2,
      |    CAST(ROUND(CAST(cnt2 AS DOUBLE) / CAST(cnt1 AS DOUBLE)
      |      * 1000000000.0, 0) AS BIGINT) AS p_e9
      |  FROM c2 JOIN c1 USING (w1)),
      |lm AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(p_e9) AS DOUBLE) / COUNT(*) / 1000000000.0
      |      AS lm_score
      |  FROM big JOIN p USING (w1, w2)
      |  GROUP BY doc_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_mixture_budget" ->
      """WITH per_doc AS (
        |  SELECT doc_id, lang, source,
        |    len(string_split(text, ' ')) AS toks,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS admit_key
        |  FROM documents),
        |budgets AS (
        |  SELECT lang, source,
        |    CAST(SUM(toks) // 2 AS BIGINT) AS token_budget
        |  FROM per_doc GROUP BY lang, source),
        |cum AS (
        |  SELECT doc_id, lang, source, toks,
        |    SUM(toks) OVER (PARTITION BY lang, source
        |                    ORDER BY admit_key, doc_id) AS cum_tokens
        |  FROM per_doc)
        |SELECT c.doc_id, c.lang, c.source,
        |  CAST(c.toks AS BIGINT) AS n_tokens,
        |  CAST(c.cum_tokens AS BIGINT) AS cum_tokens
        |FROM cum c JOIN budgets b USING (lang, source)
        |WHERE c.cum_tokens - c.toks < b.token_budget
        |ORDER BY c.doc_id""".stripMargin,
    "q_text_lm_score" ->
      s"""$lmScoreCte
        |SELECT doc_id, n_bigrams, lm_score FROM lm
        |ORDER BY doc_id""".stripMargin,
    // Replays the full CCNet selection on top of the same LM CTE:
    // identical scores → identical per-language score order →
    // identical BIGINT cumulative token sums and bucket compares.
    "q_select_ccnet" ->
      s"""$lmScoreCte,
        |d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |s AS (
        |  SELECT lm.doc_id, d.lang, d.n_toks, lm.lm_score
        |  FROM lm JOIN d USING (doc_id)),
        |c AS (
        |  SELECT *,
        |    SUM(n_toks) OVER (PARTITION BY lang
        |      ORDER BY lm_score DESC, doc_id) AS cum_toks,
        |    SUM(n_toks) OVER (PARTITION BY lang) AS tot_toks
        |  FROM s)
        |SELECT doc_id, lang, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks,
        |  lm_score,
        |  CASE WHEN cum_toks * 3 <= tot_toks THEN 'head'
        |       WHEN cum_toks * 3 <= tot_toks * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_text_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |chunks AS (
        |  SELECT doc_id, k AS chunk_id,
        |    list_slice(ws, k * 40 + 1, k * 40 + 50) AS c
        |  FROM toks, UNNEST(generate_series(0,
        |    GREATEST(1, CAST(CEIL((len(ws) - 10) / 40.0) AS INT)) - 1))
        |    AS t(k))
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  CAST(len(c) AS INT) AS n_tokens,
        |  md5(array_to_string(c, ' ')) AS chunk_hash
        |FROM chunks
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_dedup_cdc" ->
      """WITH anchors AS (
        |  SELECT doc_id, h FROM (
        |    SELECT doc_id,
        |      ('0x' || substring(md5(substring(text, i, 30)), 1, 15))
        |        ::BIGINT AS h
        |    FROM documents,
        |      UNNEST(generate_series(1, length(text) - 29)) AS t(i)
        |    WHERE length(text) >= 30)
        |  WHERE h % 8 = 0),
        |doc_anchors AS (SELECT DISTINCT doc_id, h FROM anchors),
        |dups AS (
        |  SELECT h FROM doc_anchors GROUP BY h HAVING COUNT(*) >= 2),
        |per_doc AS (
        |  SELECT doc_id, COUNT(*) AS n_anchors
        |  FROM anchors GROUP BY doc_id),
        |dup_per AS (
        |  SELECT doc_id, COUNT(*) AS n_dup_anchors
        |  FROM anchors JOIN dups USING (h) GROUP BY doc_id)
        |SELECT p.doc_id, CAST(p.n_anchors AS BIGINT) AS n_anchors,
        |  CAST(COALESCE(d.n_dup_anchors, 0) AS BIGINT)
        |    AS n_dup_anchors,
        |  CAST(COALESCE(d.n_dup_anchors, 0) AS DOUBLE)
        |    / CAST(p.n_anchors AS DOUBLE) AS dup_frac
        |FROM per_doc p LEFT JOIN dup_per d USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,
    "q_dedup_substring" ->
      """WITH wins AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(substring(text, i, 30)), 1, 15))
        |      ::BIGINT AS h
        |  FROM documents,
        |    UNNEST(generate_series(1, length(text) - 29)) AS t(i)
        |  WHERE length(text) >= 30),
        |doc_wins AS (SELECT DISTINCT doc_id, h FROM wins),
        |dups AS (
        |  SELECT h FROM doc_wins GROUP BY h HAVING COUNT(*) >= 2),
        |per_doc AS (
        |  SELECT doc_id, COUNT(*) AS n_windows FROM wins GROUP BY doc_id),
        |dup_per AS (
        |  SELECT doc_id, COUNT(*) AS n_dup_windows
        |  FROM wins JOIN dups USING (h) GROUP BY doc_id)
        |SELECT p.doc_id, CAST(p.n_windows AS BIGINT) AS n_windows,
        |  CAST(COALESCE(d.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
        |  CAST(COALESCE(d.n_dup_windows, 0) AS DOUBLE)
        |    / CAST(p.n_windows AS DOUBLE) AS dup_frac
        |FROM per_doc p LEFT JOIN dup_per d USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin
  )
}
