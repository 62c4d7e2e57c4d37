package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnSearch, Bm25, IncrementalIndex}
import graft.sources.TxTable

/** Incremental index maintenance under the hash gate
  * ([[graft.operators.IncrementalIndex]]): the BM25 postings index
  * and the IVF cell-assignment index maintained PURELY from the
  * corpus TxTable's change feed — inserts post/assign, deletes
  * retract, updates replace, compactions fold to zero — with the
  * maintained state at EVERY corpus version read back by index time
  * travel and fingerprinted against DuckDB's direct replay of that
  * version's content, plus the IVM theorem made executable: the
  * maintained head must hash-equal the from-scratch rebuild
  * (EXCEPT ALL both ways = 0, computed once in the fixture and
  * emitted as a gated value the oracle pins to 0).
  *
  * At 100 TB this is the difference between "rebuild the index every
  * session" (a full corpus scan) and "the index follows the corpus
  * at the cost of each commit's churn" — the production story for a
  * live retrieval/dedup consumer. Reference scope: the reference's
  * processed-file registry is maintained per batch, not rebuilt
  * (kinesis-to-humio.py:141-166); this applies that discipline to
  * derived retrieval state.
  */
object IndexQueries {

  /** BM25 fixture: a five-version corpus lifecycle — create, append,
    * copy-on-write MERGE (updates %6=0 with ' v3', inserts %3=2
    * < 60), row-level DELETE (lang='de' OR doc_id%7=3), compaction —
    * with the postings index maintained transition by transition.
    * Returns (corpusDir, indexDir, index version after each apply,
    * rebuild-diff count). */
  private def bm25Fixture(s: SparkSession, d: String)
      : (String, String, Seq[java.lang.Long], java.lang.Long) =
    graft.operators.DerivedCache.memoValue(s, s"index_incr_fixture:$d") {
      def tmp(p: String) = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")), p)
        .toString
      val (corpus, index) = (tmp("graft_idxcorp_"), tmp("graft_idxpost_"))
      val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      require(TxTable.create(
        docs.filter(col("doc_id") % 3 === 0), corpus), "create lost CAS")
      TxTable.append(docs.filter(col("doc_id") % 3 === 1), corpus)
      val updates = docs.filter(col("doc_id") % 6 === 0)
        .select(col("doc_id"), col("lang"),
          concat(col("text"), lit(" v3")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 2 &&
          col("doc_id") < 60))
      TxTable.merge(s, corpus, updates)
      require(TxTable.delete(s, corpus,
        col("lang") === "de" || col("doc_id") % 7 === 3) == 4L,
        "delete must land as v4")
      require(TxTable.compact(s, corpus).contains(5L),
        "compact must land as v5")
      IncrementalIndex.initBm25(s, index)
      val ivs = (1L to 5L).map(v => Long.box(
        IncrementalIndex.applyBm25(s, corpus, index, v)))
      val maintained = TxTable.read(s, index)
        .select("doc_id", "term", "tf", "dl")
      val rebuilt = Bm25.postings(
        TxTable.read(s, corpus).select("doc_id", "text"))
      val diff = maintained.exceptAll(rebuilt).count() +
        rebuilt.exceptAll(maintained).count()
      (corpus, index, ivs, Long.box(diff))
    }

  /** IVF fixture: create / append / key-frame DELETE
    * ([[TxTable.deleteKeys]] — the churn-shaped retraction verb) /
    * compaction over the embeddings corpus, quantizer trained on v1
    * content and PINNED in its own TxTable, assignment index
    * maintained per transition. */
  private def ivfFixture(s: SparkSession, d: String)
      : (String, String, Seq[java.lang.Long], java.lang.Long) =
    graft.operators.DerivedCache.memoValue(s, s"index_ivf_fixture:$d") {
      def tmp(p: String) = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")), p)
        .toString
      val (corpus, index, cents) =
        (tmp("graft_ivfcorp_"), tmp("graft_ivfasgn_"), tmp("graft_ivfcent_"))
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 300)
        .select("vec_id", "embedding")
      require(TxTable.create(e.filter(col("vec_id") % 3 === 0), corpus,
        bucketKey = "vec_id"), "create lost CAS")
      // quantizer pinned on v1 content — incremental assignment is
      // exact only against a FIXED codebook (retraining = rebuild)
      IncrementalIndex.initIvf(s, corpus, index, cents,
        nCells = 8, kmeansIters = 2)
      TxTable.append(e.filter(col("vec_id") % 3 === 1), corpus,
        bucketKey = "vec_id")
      require(TxTable.deleteKeys(s, corpus,
        e.filter(col("vec_id") % 5 === 0).select("vec_id"),
        key = "vec_id", bucketKey = "vec_id") == 3L,
        "deleteKeys must land as v3")
      require(TxTable.compact(s, corpus, bucketKey = "vec_id")
        .contains(4L), "compact must land as v4")
      val quant = IncrementalIndex.loadCentroids(s, cents)
      val ivs = (1L to 4L).map(v => Long.box(
        IncrementalIndex.applyIvf(s, corpus, index, quant, v)))
      val maintained = TxTable.read(s, index).select("vec_id", "cell")
      val rebuilt = AnnSearch.assignCells(TxTable.read(s, corpus), quant)
        .select("vec_id", "cell")
      val diff = maintained.exceptAll(rebuilt).count() +
        rebuilt.exceptAll(maintained).count()
      (corpus, index, ivs, Long.box(diff))
    }

  /** SimHash index over the SAME lifecycle corpus as [[bm25Fixture]]
    * (the fixture memo hands back the corpus dir — built once),
    * maintained transition by transition. Returns the index dir. */
  private def simhashFixture(s: SparkSession, d: String): String =
    graft.operators.DerivedCache.memoValue(s, s"index_sh_fixture:$d") {
      val (corpus, _, _, _) = bm25Fixture(s, d)
      val index = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")),
        "graft_idxsh_").toString
      IncrementalIndex.initSimhash(s, index)
      (1L to 5L).foreach(v =>
        IncrementalIndex.applySimhash(s, corpus, index, v))
      index
    }

  /** Tall (chk, value) fingerprint rows for one index version. */
  private def tall(pairs: Seq[(String, org.apache.spark.sql.Column)])
      : Seq[org.apache.spark.sql.Column] =
    pairs.map { case (n, c) =>
      struct(lit(n).as("chk"), c.cast("long").as("value")) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Maintained-postings fingerprints at every corpus version (read
    // by INDEX time travel — the index table records the fold's own
    // history), plus the rebuild-equality flag. Scale: each row set
    // is a plain scan of that index version's files; the maintenance
    // itself (in the fixture) costs per-transition churn only.
    "q_index_incremental" -> ((s, d) => {
      import s.implicits._
      val (_, index, ivs, diff) = bm25Fixture(s, d)
      val perVersion = (1 to 5).map { k =>
        TxTable.read(s, index, Some(ivs(k - 1).longValue()))
          .agg(count(lit(1)).as("p"),
            countDistinct(col("doc_id")).as("docs"),
            countDistinct(col("term")).as("terms"),
            coalesce(sum(col("tf")), lit(0L)).as("toks"))
          .select(explode(array(tall(Seq(
            (s"v${k}_postings", col("p")),
            (s"v${k}_docs", col("docs")),
            (s"v${k}_terms", col("terms")),
            (s"v${k}_tokens", col("toks")))): _*)).as("kv"))
          .select(col("kv.chk").as("chk"), col("kv.value").as("value"))
      }.reduce(_ unionByName _)
      perVersion
        .unionByName(Seq(("z_rebuild_diff", diff.longValue()))
          .toDF("chk", "value"))
        .orderBy("chk")
    }),

    // END-TO-END: BM25 top-10 SERVED FROM THE MAINTAINED INDEX
    // ([[IncrementalIndex.bm25Index]] rehydrates idf/avgdl from the
    // maintained postings) and hash-gated against DuckDB's direct
    // BM25 replay over the corpus head — the maintained index is not
    // just content-equal to a rebuild, it SCORES bit-identically
    // (the q_retrieval_bm25 determinism discipline: idf6 grid,
    // DECIMAL(18,6) contribution sums). Queries are the sub-20 docs'
    // own term sets, like the retrieval family.
    "q_index_incremental_score" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val (_, index, _, _) = bm25Fixture(s, d)
      // scored frame memoized like the retrieval family's bm25Scored
      // — a live consumer re-derives idf/avgdl once per index
      // version, not per query batch
      graft.operators.DerivedCache.memo(s, s"idx_incr_scored:$d") {
        val idx = IncrementalIndex.bm25Index(s, index)
        val qterms = idx.postings.filter(col("doc_id") < 20)
          .select(col("doc_id").as("query_id"), col("term"))
        Bm25.score(qterms, idx)
      }
        .withColumn("rk", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("score").desc, col("doc_id").asc)).cast("int"))
        .filter(col("rk") <= 10)
        .select("query_id", "doc_id", "score", "rk")
        .orderBy("query_id", "rk")
    }),

    // The maintained SimHash near-dup index at corpus head, emitted
    // ROW-LEVEL: every (doc_id, fingerprint) must equal DuckDB's
    // bit-for-bit md5-vote replay over the lifecycle's final content
    // — the strongest possible gate (no summary, no flag: each of
    // the 64 bits of every maintained fingerprint is checked). At
    // 100 TB this table IS the dedup screen's standing state; a
    // corpus commit costs its churn, not a re-fingerprint pass.
    "q_index_incremental_simhash" -> ((s, d) => {
      val index = simhashFixture(s, d)
      TxTable.read(s, index).select("doc_id", "simhash")
        .orderBy("doc_id")
    }),

    // Maintained IVF assignment fingerprints per corpus version +
    // the pinned-quantizer rebuild-equality flag. Counts and id sums
    // are DuckDB-replayable; assignment EXACTNESS rides the flag
    // (cell ids derive from the kmeans codebook, gated separately by
    // q_ann_ivf's deterministic replay).
    "q_index_incremental_ivf" -> ((s, d) => {
      import s.implicits._
      val (_, index, ivs, diff) = ivfFixture(s, d)
      val perVersion = (1 to 4).map { k =>
        TxTable.read(s, index, Some(ivs(k - 1).longValue()))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("vec_id")), lit(0L)).as("ids"))
          .select(explode(array(tall(Seq(
            (s"v${k}_vecs", col("n")),
            (s"v${k}_id_sum", col("ids")))): _*)).as("kv"))
          .select(col("kv.chk").as("chk"), col("kv.value").as("value"))
      }.reduce(_ unionByName _)
      perVersion
        .unionByName(Seq(("z_rebuild_diff", diff.longValue()))
          .toDF("chk", "value"))
        .orderBy("chk")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // Replays each corpus version's postings straight from
    // `documents` (same tokenizer contract as q_retrieval_bm25's
    // oracle: single-space string_split): v1/v2 modulo slices, v3
    // the merge, v4 the delete, v5 = v4 (compaction folds zero).
    // z_rebuild_diff pins the maintained-equals-rebuilt theorem.
    "q_index_incremental" ->
      """WITH v1 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        |v2 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 IN (0, 1)),
        |v3 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN text || ' v3' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 3 IN (0, 1)
        |  UNION ALL
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 3 = 2 AND doc_id < 60),
        |v4 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN text || ' v3' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 3 IN (0, 1)
        |    AND NOT (lang = 'de' OR doc_id % 7 = 3)
        |  UNION ALL
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 3 = 2 AND doc_id < 60
        |    AND NOT (lang = 'de' OR doc_id % 7 = 3)),
        |versions AS (
        |  SELECT 1 AS v, * FROM v1
        |  UNION ALL SELECT 2, * FROM v2
        |  UNION ALL SELECT 3, * FROM v3
        |  UNION ALL SELECT 4, * FROM v4
        |  UNION ALL SELECT 5, * FROM v4),
        |tok AS (
        |  SELECT v, doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM versions),
        |p AS (
        |  SELECT v, doc_id, term, COUNT(*) AS tf
        |  FROM tok GROUP BY v, doc_id, term),
        |m AS (
        |  SELECT 'v' || v || '_postings' AS chk,
        |    CAST(COUNT(*) AS BIGINT) AS value FROM p GROUP BY v
        |  UNION ALL
        |  SELECT 'v' || v || '_docs',
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM p GROUP BY v
        |  UNION ALL
        |  SELECT 'v' || v || '_terms',
        |    CAST(COUNT(DISTINCT term) AS BIGINT) FROM p GROUP BY v
        |  UNION ALL
        |  SELECT 'v' || v || '_tokens',
        |    CAST(COUNT(*) AS BIGINT) FROM tok GROUP BY v
        |  UNION ALL
        |  SELECT 'z_rebuild_diff', CAST(0 AS BIGINT))
        |SELECT chk, value FROM m ORDER BY chk""".stripMargin,

    // Direct BM25 over the REPLAYED corpus head (v4 content: the
    // merge minus the delete) — the same scoring SQL as
    // q_retrieval_bm25's oracle, re-pointed at the lifecycle's final
    // content. The Spark side reads NOTHING but the maintained index
    // table, so a hash match here proves maintained state serves
    // queries bit-identically to a fresh build over the live corpus.
    "q_index_incremental_score" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN text || ' v3' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 3 IN (0, 1)
        |    AND NOT (lang = 'de' OR doc_id % 7 = 3)
        |  UNION ALL
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 3 = 2 AND doc_id < 60
        |    AND NOT (lang = 'de' OR doc_id % 7 = 3)),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
        |         len(string_split(text, ' ')) AS dl
        |  FROM corpus),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
        |  FROM toks GROUP BY doc_id, term),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
        |           / COUNT(*) AS avgdl
        |  FROM corpus),
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
        |  FROM contrib GROUP BY query_id, doc_id),
        |ranked AS (
        |  SELECT query_id, doc_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS INT) AS rk
        |  FROM scored)
        |SELECT query_id, doc_id, score, rk
        |FROM ranked WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin,

    // Bit-for-bit md5-vote fingerprint replay over the lifecycle
    // head (v4 content): same portable-simhash CTEs as
    // q_dedup_simhash's oracle, re-pointed at the replayed corpus.
    "q_index_incremental_simhash" -> {
      val votes = (0 until 60).map(j =>
        s"SUM(CASE WHEN (th >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j")
        .mkString(",\n    ")
      val fold = (0 until 60).map(j =>
        s"(CASE WHEN v$j > 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)")
        .mkString(" | ")
      s"""WITH corpus AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 6 = 0 THEN text || ' v3' ELSE text END
         |      AS text
         |  FROM documents WHERE doc_id % 3 IN (0, 1)
         |    AND NOT (lang = 'de' OR doc_id % 7 = 3)
         |  UNION ALL
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 3 = 2 AND doc_id < 60
         |    AND NOT (lang = 'de' OR doc_id % 7 = 3)),
         |toks AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
         |    AS tok
         |  FROM corpus),
         |h AS (
         |  SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT
         |    AS th
         |  FROM toks),
         |votes AS (
         |  SELECT doc_id,
         |    $votes
         |  FROM h GROUP BY doc_id),
         |fp AS (SELECT doc_id, $fold AS simhash FROM votes)
         |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin
    },

    // Replays the embeddings corpus lifecycle's vector sets: counts
    // and id sums per version; assignment exactness rides the
    // pinned-quantizer rebuild flag.
    "q_index_incremental_ivf" ->
      """WITH v1 AS (
        |  SELECT vec_id FROM embeddings
        |  WHERE vec_id < 300 AND vec_id % 3 = 0),
        |v2 AS (
        |  SELECT vec_id FROM embeddings
        |  WHERE vec_id < 300 AND vec_id % 3 IN (0, 1)),
        |v3 AS (
        |  SELECT vec_id FROM embeddings
        |  WHERE vec_id < 300 AND vec_id % 3 IN (0, 1)
        |    AND NOT vec_id % 5 = 0),
        |versions AS (
        |  SELECT 1 AS v, * FROM v1
        |  UNION ALL SELECT 2, * FROM v2
        |  UNION ALL SELECT 3, * FROM v3
        |  UNION ALL SELECT 4, * FROM v3),
        |m AS (
        |  SELECT 'v' || v || '_vecs' AS chk,
        |    CAST(COUNT(*) AS BIGINT) AS value FROM versions GROUP BY v
        |  UNION ALL
        |  SELECT 'v' || v || '_id_sum',
        |    CAST(SUM(vec_id) AS BIGINT) FROM versions GROUP BY v
        |  UNION ALL
        |  SELECT 'z_rebuild_diff', CAST(0 AS BIGINT))
        |SELECT chk, value FROM m ORDER BY chk""".stripMargin,
  )
}
