package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.MultimodalOps
import graft.operators.{AnnSearch, ApproxDedup, TextAnalysis}

/** Query registrations for the LLM-training-data operator pack:
  * approximate dedup (MinHash-LSH / SimHash / n-gram Jaccard),
  * ANN search (LSH-bucketed), text analysis (lang-ID, token counts,
  * fingerprints) and the multimodal plumbing pipeline.
  *
  * Oracle coverage: `q_text_tokens` is SQL-expressible and
  * hash-matched against DuckDB. The hash-based operators
  * (xxhash64 signatures, LSH buckets) have no DuckDB equivalent —
  * those keys take the driver's rows-only check and are pinned by
  * `ApproxDedupSpec` / `AnnSearchSpec` / `TextAnalysisSpec` against
  * Scala-computed ground truth instead.
  */
object LlmQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash" -> ((s, d) =>
      ApproxDedup.minhashPairs(
        Tables.documents(s, d).select("doc_id", "text"),
        n = 3, k = 32, bands = 8, threshold = 0.3)),

    // maxHamming=3: the largest threshold with guaranteed-complete
    // recall under 4-chunk bucketing (pigeonhole) — higher values
    // silently miss pairs that differ in every chunk.
    "q_dedup_simhash" -> ((s, d) =>
      ApproxDedup.simhashPairs(
        Tables.documents(s, d).select("doc_id", "text"), maxHamming = 3)),

    "q_dedup_ngram" -> ((s, d) =>
      ApproxDedup.ngramJaccardPairs(
        Tables.documents(s, d).select("doc_id", "text"),
        n = 2, maxId = 300, threshold = 0.2)),

    "q_ann_lsh" -> ((s, d) =>
      AnnSearch.lshTopK(Tables.embeddings(s, d), k = 5, maxId = 200)),

    "q_ann_ivf" -> ((s, d) =>
      AnnSearch.ivfTopK(Tables.embeddings(s, d), k = 5, maxId = 200)),

    "q_text_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")),

    "q_text_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).cast("int")
            .as("ws_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).cast("int")
            .as("bpe_tokens"))
        .orderBy("doc_id")),

    "q_text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.docFingerprint(col("text")).as("fingerprint"),
          size(TextAnalysis.chunkFingerprints(col("text"))).cast("int")
            .as("n_chunks"))
        .orderBy("doc_id")),

    "q_multimodal_pipeline" -> ((s, _) => MultimodalOps.pipeline(s)),

    // int8 embedding quantization with reconstruction diagnostics
    // (rows-only: per-engine float rounding makes the q arrays
    // oracle-unfriendly; bounds are spec-asserted instead).
    "q_embed_quantize" -> ((s, d) =>
      graft.operators.EmbeddingOps.quantized(Tables.embeddings(s, d))
        .select(col("vec_id"),
          round(col("scale"), 8).as("scale_r"),
          size(col("q")).as("dim"),
          round(col("max_abs_err"), 8).as("max_abs_err_r"),
          round(col("cos_recon"), 6).as("cos_recon_r"))
        .orderBy("vec_id"))
  )

  def oracleSql: Map[String, String] = Map(
    "q_text_tokens" ->
      s"""SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '${TextAnalysis.bpePattern}')) AS INT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
