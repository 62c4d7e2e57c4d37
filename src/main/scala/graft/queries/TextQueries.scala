package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text / document pack for LLM-training-data pipelines: exact
  * dedup, corpus statistics, and per-document quality signals over
  * the `documents` table. Exact dedup generalizes the reference's
  * processed-file anti-join dedup (`kinesis-to-humio.py:210-216`)
  * from file keys to content.
  *
  * Scale: every query is a single hash aggregate or a pure per-row
  * projection of codegen'd higher-order functions — no shuffle wider
  * than the group-by keys, no driver materialization. Exact dedup on
  * full text at 100 TB would group on a content hash instead
  * (`xxhash64(text)`) to shrink shuffle width; see
  * `q_dedup_exact_hash` which does exactly that and verifies the
  * groups are identical.
  */
object TextQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact content dedup: keep the lowest doc_id per distinct text.
    "q_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "text", "n_copies")
        .orderBy("doc_id")),

    // Scale-path variant: group on a 64-bit content hash so the
    // shuffle carries 8-byte keys instead of whole documents. The
    // doc_id/n_copies output is identical to q_dedup_exact absent
    // xxhash64 collisions.
    "q_dedup_exact_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(xxhash64(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")),

    "q_text_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          (sum(col("n_tokens")).cast("double") / count(lit(1)))
            .as("avg_tokens"))
        .orderBy("lang")),

    // Within-document repetition signals (the Gopher/MassiveText
    // repetition filters): fraction of 3-gram occurrences that are
    // repeats, and the share of bigram occurrences taken by the most
    // frequent bigram. One native codegen'd expression per row
    // (functions/HashExpressions: RepetitionStats — the interpreted
    // aggregate-fold formulation it replaced benched 10.9 s at
    // sf0.1); NO shuffle anywhere: at 100 TB this stays scan-bound.
    "q_text_repetition" -> ((s, d) => {
      val st = graft.functions.HashExpressions
        .repetitionStats(split(col("text"), " "))
      Tables.documents(s, d)
        .withColumn("r", st)
        .select(col("doc_id"),
          col("r.n_bigrams").as("n_bigrams"),
          col("r.n_trigrams").as("n_trigrams"),
          // rule 10: the fracs are INT ratios (dup count / n-gram
          // count) — surface them micro-quantized (scale-0 round is
          // half-grid-free on both engines) followed by ONE bare
          // IEEE division, never round(ratio, 6)
          (round(col("r.dup3_frac") * lit(1e6), 0) / lit(1e6))
            .as("dup3_frac"),
          (round(col("r.top2_frac") * lit(1e6), 0) / lit(1e6))
            .as("top2_frac"))
        .orderBy("doc_id")
    }),

    // Corpus n-gram frequency table (the CCNet/wordcount shape): top
    // 100 trigrams by occurrence count, ties broken by gram text.
    // Scale: explode feeds a hash aggregate with map-side partial
    // counts, so the shuffle carries one (gram, partial_count) row
    // per distinct gram per task — not one row per occurrence; the
    // top-100 is a TakeOrderedAndProject, never a global sort.
    "q_text_ngram_freq" -> ((s, d) => {
      // native gram-string kernel: the interpreted transform/
      // concat_ws lambda formulation was the slowest bench query
      val tri = graft.functions.HashExpressions
        .ngramStrings(split(col("text"), " "), 3)
      Tables.documents(s, d)
        .select(explode(tri).as("gram"))
        .groupBy("gram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram"))
        .limit(100)
    }),

    // Misra–Gries heavy hitters: tokens with frequency > N/(k+1),
    // found by a bounded-memory per-partition screen + exact recount
    // of the candidate union ([[graft.operators.HeavyHitters]] —
    // shuffles candidates, never the vocabulary). The fixture's
    // synthetic vocabulary (~31 tokens) is smaller than k, so here
    // the summary degenerates to exact tracking — HeavyHittersSpec
    // stresses the eviction path on vocab >> k; the gate pins the
    // deterministic output contract.
    "q_text_heavyhitters" -> ((s, d) =>
      graft.operators.HeavyHitters.frequent(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("token")),
        k = 100)
        .orderBy("token")),

    // Per-document quality signals: token count, vocabulary richness,
    // stopword ratio — the cheap heuristics used to filter training
    // corpora before expensive model-based scoring.
    "q_text_quality" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .withColumn("n_tokens", size(toks))
        .withColumn("n_unique", size(array_distinct(toks)))
        .withColumn("n_stop",
          size(filter(toks, t => t.isin("the", "a"))))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_unique"),
          (col("n_unique").cast("double") / col("n_tokens"))
            .as("uniq_ratio"),
          col("n_stop"),
          (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    // The MG screen + exact recount provably equals the plain
    // HAVING-threshold wordcount — which is the oracle.
    "q_text_heavyhitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY token),
        |tot AS (SELECT COUNT(*) AS n_total FROM t)
        |SELECT token, CAST(n AS BIGINT) AS n FROM c, tot
        |WHERE n * 101 > n_total ORDER BY token""".stripMargin,
    // LIMIT under a deterministic total order (n DESC, gram ASC) is
    // stable across engines: both take the identical first 100 rows.
    "q_text_ngram_freq" ->
      """SELECT g AS gram, COUNT(*) AS n
        |FROM (
        |  SELECT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                 FOR i IN range(1, len(w) - 1)]) AS g
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents))
        |GROUP BY g
        |ORDER BY n DESC, gram
        |LIMIT 100""".stripMargin,
    // Bigram/trigram lists via DuckDB list comprehensions over a
    // 1-based range; top-bigram multiplicity via unnest + group.
    // Fractions micro-quantized on both sides (rule 10: int ratios
    // never pass through round(x, k>0); scale-0 round then one bare
    // IEEE division, identical order: 1.0 - distinct/total, max/total).
    "q_text_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS bi,
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |       FOR i IN range(1, len(w) - 1)] AS tri
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents)),
        |top2 AS (
        |  SELECT doc_id, MAX(cnt) AS m FROM (
        |    SELECT doc_id, b, COUNT(*) AS cnt
        |    FROM g, unnest(bi) AS u(b)
        |    GROUP BY doc_id, b)
        |  GROUP BY doc_id)
        |SELECT g.doc_id,
        |  CAST(len(bi) AS INT) AS n_bigrams,
        |  CAST(len(tri) AS INT) AS n_trigrams,
        |  round((CASE WHEN len(tri) > 0
        |    THEN 1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri)
        |    ELSE 0.0 END) * 1e6, 0) / 1e6 AS dup3_frac,
        |  round((CASE WHEN len(bi) > 0
        |    THEN CAST(m AS DOUBLE) / len(bi)
        |    ELSE 0.0 END) * 1e6, 0) / 1e6 AS top2_frac
        |FROM g LEFT JOIN top2 ON g.doc_id = top2.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    // Oracle groups on the raw text (hashes differ across engines);
    // the grouped result is identical unless xxhash64 collides.
    "q_dedup_exact_hash" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)
        |    AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id, lang,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_unique,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
        |  CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS INT)
        |    AS n_stop,
        |  CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE)
        |    / len(toks) AS stop_ratio
        |FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
