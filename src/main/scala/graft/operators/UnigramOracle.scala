package graft.operators

/** DuckDB replay of the [[Unigram]] trainer + encoder, as generated
  * SQL — the unrolled-iteration oracle pattern ([[BpeOracle]], the
  * k-means/IVF Lloyd CTEs) applied to Viterbi EM.
  *
  * Structure: seed CTEs (pre-token frequency table, weighted
  * overlapping substring counts, top-K selection, micro-quantized
  * costs), then per EM round an UNROLLED per-position DP chain —
  * dp{r}_i holds, for every word of length ≥ i, the min-cost
  * segmentation of its first i characters as (cost, seg LIST), built
  * from dp{r}_{i−1..i−4} by joining the candidate piece table and
  * keeping row_number() = 1 under (cost ASC, piece-length DESC) —
  * exactly [[Unigram.segment]]'s tie rule. fin{r} collects each
  * word's full-length row; m{r}/c{r} re-count pieces from the
  * segmentations and re-quantize costs. Two EM rounds, then a third
  * DP chain under the final costs IS the encoder.
  *
  * All CTEs are MATERIALIZED (the BpeOracle lesson: default inlining
  * explodes on multi-reference chains). The chain length is
  * [[Unigram.MaxWordLen]] positions per round — the Spark side
  * enforces that bound loudly, so oracle and engine can never
  * silently diverge on a long token.
  */
object UnigramOracle {
  private val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  private val maxLen = Unigram.MaxWordLen
  private val maxPiece = Unigram.MaxPieceLen

  private def costCte(name: String, src: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT piece, CAST(round(ln(CAST(t.total AS DOUBLE) /
       |      CAST(cnt AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS cost
       |  FROM $src, (SELECT CAST(SUM(cnt) AS BIGINT) AS total
       |              FROM $src) t)""".stripMargin

  /** One DP chain under cost table `costs`: dp{tag}_0..dp{tag}_N +
    * fin{tag} (word, seg). */
  private def dpChain(tag: String, costs: String): Seq[String] = {
    val base =
      s"""dp${tag}_0 AS MATERIALIZED (
         |  SELECT word, CAST(0 AS BIGINT) AS cost,
         |         CAST([] AS VARCHAR[]) AS seg
         |  FROM wf)""".stripMargin
    val steps = (1 to maxLen).map { i =>
      val cands = (1 to math.min(maxPiece, i)).map { l =>
        s"""      SELECT d.word, d.cost + c.cost AS cost,
           |        list_append(d.seg, c.piece) AS seg, $l AS l
           |      FROM dp${tag}_${i - l} d JOIN $costs c
           |        ON len(d.word) >= $i
           |       AND c.piece = substr(d.word, ${i - l + 1}, $l)""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s"""dp${tag}_$i AS MATERIALIZED (
         |  SELECT word, cost, seg FROM (
         |    SELECT word, cost, seg, row_number() OVER (
         |      PARTITION BY word ORDER BY cost ASC, l DESC) AS rn
         |    FROM (
         |$cands))
         |  WHERE rn = 1)""".stripMargin
    }
    val fin = (1 to maxLen).map(i =>
        s"  SELECT word, seg FROM dp${tag}_$i WHERE len(word) = $i")
      .mkString("\n  UNION ALL\n")
    base +: steps :+
      s"""fin$tag AS MATERIALIZED (
         |$fin)""".stripMargin
  }

  private def mCte(r: Int): String =
    s"""m$r AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt FROM (
       |    SELECT wf.n, unnest(f.seg) AS piece
       |    FROM fin$r f JOIN wf ON f.word = wf.word)
       |  GROUP BY piece)""".stripMargin

  /** Seed + two EM rounds; `withEncode` appends the third DP chain
    * under the final costs (the encoder). */
  private def chain(withEncode: Boolean): String = {
    val seed = Seq(
      s"""wrds AS MATERIALIZED (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(lower(text), '$pat')) AS word
         |  FROM documents)""".stripMargin,
      """wf AS MATERIALIZED (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM wrds GROUP BY word)""".stripMargin,
      s"""subs AS MATERIALIZED (
         |  SELECT substr(word, i, l) AS piece, CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM wf,
         |       UNNEST(generate_series(1, len(word))) AS ti(i),
         |       UNNEST(generate_series(1, $maxPiece)) AS tl(l)
         |  WHERE i + l - 1 <= len(word)
         |  GROUP BY piece)""".stripMargin,
      """v0 AS MATERIALIZED (
        |  SELECT piece, cnt FROM subs WHERE len(piece) = 1
        |  UNION ALL
        |  SELECT piece, cnt FROM (
        |    SELECT piece, cnt,
        |      row_number() OVER (ORDER BY cnt DESC, piece) AS rk
        |    FROM subs WHERE len(piece) >= 2)
        |  WHERE rk <= 40)""".stripMargin,
      costCte("c0", "v0"))
    val r1 = dpChain("1", "c0") ++ Seq(mCte(1), costCte("c1", "m1"))
    val r2 = dpChain("2", "c1") ++ Seq(mCte(2), costCte("c2", "m2"))
    val enc = if (withEncode) dpChain("3", "c2") else Seq.empty
    "WITH " + (seed ++ r1 ++ r2 ++ enc).mkString(",\n")
  }

  /** q_unigram_train oracle: final vocabulary with counts + costs. */
  def vocabSql: String =
    chain(withEncode = false) +
      """
        |SELECT m2.piece, m2.cnt, c2.cost AS cost_micro
        |FROM m2 JOIN c2 USING (piece)
        |ORDER BY m2.piece""".stripMargin

  /** q_text_tokens_unigram oracle: per-document token counts under
    * the final vocabulary (third DP chain = the encoder). */
  def tokenCountSql: String =
    chain(withEncode = true) +
      """
        |SELECT w.doc_id, CAST(SUM(len(f.seg)) AS BIGINT) AS n_tokens
        |FROM wrds w JOIN fin3 f ON w.word = f.word
        |GROUP BY w.doc_id
        |ORDER BY w.doc_id""".stripMargin

  /** q_tokenizer_eval oracle: per-language fertility / compression
    * comparison of the three tokenizers (whitespace, BPE-regex,
    * trained unigram) — the encoder DP chain feeding a per-lang
    * rollup. Ratios are bare IEEE divisions of exact BIGINT sums
    * (SURVEY 7.4 rule 10). */
  def fertilitySql: String =
    chain(withEncode = true) +
      s"""
        |, uni AS MATERIALIZED (
        |  SELECT w.doc_id, CAST(SUM(len(f.seg)) AS BIGINT) AS uni_t
        |  FROM wrds w JOIN fin3 f ON w.word = f.word
        |  GROUP BY w.doc_id),
        |per AS (
        |  SELECT d.lang, len(d.text) AS chars,
        |    len(string_split(d.text, ' ')) AS ws_t,
        |    len(regexp_extract_all(lower(d.text),
        |        '${TextAnalysis.bpePattern}')) AS bpe_t,
        |    u.uni_t
        |  FROM documents d JOIN uni u ON d.doc_id = u.doc_id)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(chars) AS BIGINT) AS chars,
        |  CAST(SUM(ws_t) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(bpe_t) AS BIGINT) AS bpe_tokens,
        |  CAST(SUM(uni_t) AS BIGINT) AS uni_tokens,
        |  CAST(SUM(uni_t) AS DOUBLE) / CAST(SUM(ws_t) AS DOUBLE)
        |    AS fertility_uni_ws,
        |  CAST(SUM(chars) AS DOUBLE) / CAST(SUM(uni_t) AS DOUBLE)
        |    AS bytes_per_uni_token,
        |  CAST(SUM(chars) AS DOUBLE) / CAST(SUM(bpe_t) AS DOUBLE)
        |    AS bytes_per_bpe_token
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin
}
