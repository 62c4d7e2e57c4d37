package graft.operators

/** DuckDB replay of the [[Bpe]] trainer + encoder, as generated SQL —
  * the unrolled-iteration oracle pattern (q_ml_kmeans' Lloyd rounds,
  * q_ann_ivf/pq) applied to BPE.
  *
  * Why this is possible at all: two structural facts proven by
  * BpeSpec's equivalence test and exploited here.
  *
  *  1. '''Sequential-by-rank apply ≡ lowest-rank-first apply.''' A
  *     merge of rank r creates a token that no merge of rank < r can
  *     reference (the token did not exist when earlier merges were
  *     learned), so applying merges 0..n in order — each as ONE
  *     left-to-right non-overlapping pass — reaches the same fixpoint
  *     as [[Bpe.encodeWord]]'s repeated lowest-rank scan. That turns
  *     the per-word priority loop into an unrollable per-ROUND
  *     rewrite.
  *  2. '''Non-overlap is window-expressible.''' Candidates for merge
  *     (a, b) at positions i, i+1 can only chain when a = b (t[i+1]
  *     would need to equal both a and b); greedy left-to-right then
  *     means keeping every EVEN offset within each run of consecutive
  *     candidate positions — a gaps-and-islands window, not a scan.
  *
  * Each round is 5 CTEs over a tall (word, pos, tok) token table of
  * the DISTINCT words: `a` (adds lead token), `b` (the argmax pair
  * under the trainer's (-count, a, b) order, weighted by the
  * word-frequency table), `c` (candidate starts + run id), `k` (kept
  * starts by run parity), `t` (rewritten, re-indexed tokens). Corpus
  * words outside the training sample ride along with weight 0 — they
  * never influence the argmax (HAVING SUM(n) > 0, matching the
  * trainer which only counts sample pairs) but get rewritten, which
  * IS the encode phase; after the last round, per-word token counts
  * join back to documents. All CTEs are MATERIALIZED: the default
  * inlining would blow up exponentially on a multi-reference chain,
  * and DuckDB caps expression depth at 1000 (~160 rounds fits; the
  * registry uses 120 — see the nMerges note on the queries).
  *
  * Trainer fidelity notes: the corpus is ASCII (so `lower()` ≡
  * `toLowerCase(Locale.ROOT)` and DuckDB's binary VARCHAR order ≡
  * Scala's UTF-16 order for the tie-break), and rounds past
  * exhaustion (no pair left with weight > 0) are identity — `b` is
  * empty, nothing matches, the chain idles — exactly the trainer's
  * early stop.
  */
object BpeOracle {

  /** The [[Bpe.preTokenPattern]] as a DuckDB single-quoted literal
    * (single quotes process no escapes, so the backslash survives). */
  private val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Base CTEs + `rounds` unrolled merge rounds. `samplePred` selects
    * the training documents (weight-1; everything else weight-0). */
  def chainCtes(rounds: Int, samplePred: String): Seq[String] = {
    val base = Seq(
      s"""wrds AS MATERIALIZED (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$pat')) AS word
         |  FROM documents)""".stripMargin,
      s"""wf AS MATERIALIZED (
         |  SELECT word, SUM(CASE WHEN $samplePred THEN 1 ELSE 0 END) AS n
         |  FROM wrds GROUP BY word)""".stripMargin,
      """t0 AS MATERIALIZED (
        |  SELECT word, pos, substring(word, pos, 1) AS tok FROM (
        |    SELECT word, unnest(generate_series(1, length(word))) AS pos
        |    FROM wf))""".stripMargin)
    val perRound = (1 to rounds).flatMap { r =>
      val p = r - 1
      Seq(
        s"""a$r AS MATERIALIZED (
           |  SELECT word, pos, tok,
           |         lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
           |  FROM t$p)""".stripMargin,
        s"""b$r AS MATERIALIZED (
           |  SELECT a, b FROM (
           |    SELECT x.tok AS a, x.nxt AS b, SUM(w.n) AS cnt
           |    FROM a$r x JOIN wf w USING (word)
           |    WHERE x.nxt IS NOT NULL GROUP BY 1, 2 HAVING SUM(w.n) > 0)
           |  ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin,
        s"""c$r AS MATERIALIZED (
           |  SELECT word, pos,
           |         pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS g
           |  FROM a$r
           |  WHERE tok = (SELECT a FROM b$r) AND nxt = (SELECT b FROM b$r))""".stripMargin,
        s"""k$r AS MATERIALIZED (
           |  SELECT word, pos FROM (
           |    SELECT word, pos, MIN(pos) OVER (PARTITION BY word, g) AS rs
           |    FROM c$r) z
           |  WHERE (pos - rs) % 2 = 0)""".stripMargin,
        s"""t$r AS MATERIALIZED (
           |  SELECT x.word,
           |         ROW_NUMBER() OVER (PARTITION BY x.word ORDER BY x.pos) AS pos,
           |         CASE WHEN k.pos IS NOT NULL THEN x.tok || x.nxt
           |              ELSE x.tok END AS tok
           |  FROM a$r x
           |  LEFT JOIN k$r k ON k.word = x.word AND k.pos = x.pos
           |  LEFT JOIN k$r kp ON kp.word = x.word AND kp.pos = x.pos - 1
           |  WHERE kp.pos IS NULL)""".stripMargin)
    }
    base ++ perRound
  }

  /** Per-document BPE token counts (q_text_tokens_bpe's oracle). */
  def tokenCountsSql(rounds: Int, samplePred: String): String =
    s"""WITH ${chainCtes(rounds, samplePred).mkString(",\n")},
       |wcount AS MATERIALIZED (
       |  SELECT word, COUNT(*) AS ntok FROM t$rounds GROUP BY word)
       |SELECT d.doc_id, CAST(COALESCE(SUM(wc.ntok), 0) AS INT) AS bpe_tokens
       |FROM documents d
       |LEFT JOIN wrds w ON w.doc_id = d.doc_id
       |LEFT JOIN wcount wc ON wc.word = w.word
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** The learned merge table (q_bpe_train's oracle; full-corpus
    * weights, so samplePred = TRUE). */
  def mergeTableSql(rounds: Int): String = {
    val mt = (1 to rounds)
      .map(r => s"SELECT ${r - 1} AS rank, a, b FROM b$r")
      .mkString(" UNION ALL ")
    s"""WITH ${chainCtes(rounds, "TRUE").mkString(",\n")},
       |mt AS ($mt)
       |SELECT rank, a AS "left", b AS "right", a || b AS merged
       |FROM mt ORDER BY rank""".stripMargin
  }

  /** Sequence packing under the trained-BPE budget
    * (q_pack_sequences_bpe's oracle): the q_pack_sequences prefix-sum
    * replay with the chain's per-doc count as `t`. */
  def packSql(rounds: Int, samplePred: String, budget: Int): String =
    s"""WITH ${chainCtes(rounds, samplePred).mkString(",\n")},
       |wcount AS MATERIALIZED (
       |  SELECT word, COUNT(*) AS ntok FROM t$rounds GROUP BY word),
       |counted AS (
       |  SELECT d.doc_id, d.lang,
       |         COALESCE(SUM(wc.ntok), 0) AS t
       |  FROM documents d
       |  LEFT JOIN wrds w ON w.doc_id = d.doc_id
       |  LEFT JOIN wcount wc ON wc.word = w.word
       |  GROUP BY d.doc_id, d.lang)
       |SELECT doc_id, lang,
       |  CAST(floor((cum - t) / $budget) AS INT) AS window_id,
       |  CAST((cum - t) % $budget AS INT) AS offset_in_window
       |FROM (
       |  SELECT doc_id, lang, t,
       |    SUM(t) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM counted)
       |ORDER BY doc_id""".stripMargin
}
