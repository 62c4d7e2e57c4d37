package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Contamination, CorpusStats, LineDedup, PiiScrub, Sampling}

/** Corpus-curation query pack: PII scrubbing, benchmark
  * decontamination, boilerplate detection, and mixture sampling —
  * the governance side of a training-data pipeline (the LLM-pack
  * counterpart to [[LlmQueries]]'s dedup/ANN operators).
  *
  * All four are oracle-gated: PII redaction uses RE2-compatible
  * patterns that run identically on DuckDB; contamination counts are
  * hash-invariant observables (engine joins on 8-byte gram hashes,
  * oracle on gram strings); mixture sampling uses the portable md5
  * bucket; boilerplate grams are plain string aggregation.
  */
object CurationQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII-shaped strings derived deterministically from customer keys
    // (the synthetic corpus carries no real PII), then scrubbed +
    // audited. Exercises the full regex path on 1.5k/15k rows.
    "q_text_pii" -> ((s, d) => {
      val doc = concat(
        lit("Reach "), col("c_name"),
        lit(" at user"), col("c_custkey").cast("string"),
        lit("@mail.example.com or +1-555-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("c_custkey") % 200).cast("string"),
        lit(".0.7"))
      Tables.customer(s, d)
        .select(col("c_custkey"), doc.as("doc"))
        .select(col("c_custkey"),
          PiiScrub.countEmails(col("doc")).cast("int").as("n_emails"),
          PiiScrub.countPhones(col("doc")).cast("int").as("n_phones"),
          PiiScrub.countIps(col("doc")).cast("int").as("n_ips"),
          PiiScrub.scrub(col("doc")).as("scrubbed"))
        .orderBy("c_custkey")
    }),

    // Gopher-style quality rules via the shared
    // [[graft.operators.QualityRules]] core (one expression tree with
    // the S22 streaming admission twin — see its scaladoc for the
    // threshold adaptation and the rule-10 bare-ratio discipline).
    // One narrow projection pass — no shuffle before the output sort,
    // the per-row map shape that holds at any corpus size.
    "q_quality_gopher" -> ((s, d) => {
      import graft.operators.QualityRules
      Tables.documents(s, d)
        .withColumn("n_words", QualityRules.nWords(col("text")))
        .withColumn("mean_word_len", QualityRules.meanWordLen(col("text")))
        .withColumn("n_stop", QualityRules.nStop(col("text")))
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("n_stop"),
          QualityRules.verdict(col("n_words"), col("mean_word_len"),
            col("n_stop")).as("verdict"))
        .orderBy("doc_id")
    }),

    // 5-gram overlap screen: train = doc_id < 450, benchmark = the
    // rest. Engine joins on hashed grams (the 100 TB path: fixed
    // 8-byte shuffle width, broadcastable benchmark side); counts are
    // hash-invariant so the string-gram oracle reproduces them.
    "q_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      Contamination.overlap(
          docs.filter(col("doc_id") < 450),
          docs.filter(col("doc_id") >= 450), n = 5)
        .orderBy("doc_id")
    }),

    // Boilerplate screen: bigrams present in ≥40 of the 500 docs.
    "q_text_boilerplate" -> ((s, d) =>
      CorpusStats.boilerplateGrams(Tables.documents(s, d), n = 2, minDf = 40)
        .orderBy("gram")),

    // Line-level cross-document dedup (the C4/RefinedWeb curation
    // move): 10-token segments recurring in ≥2 distinct docs are
    // dropped from every doc, docs reassembled in segment order. The
    // frequent set broadcasts back (boilerplate segments are the
    // hottest possible join keys — never shuffle the corpus by
    // them); see [[graft.operators.LineDedup]] for the 100 TB plan
    // notes. Output travels as md5 + length of the cleaned text.
    "q_dedup_lines" -> ((s, d) =>
      LineDedup.cleanProfile(Tables.documents(s, d), width = 10,
          minDf = 2)
        .orderBy("doc_id")),

    // Provenance/lineage record per document: content address
    // (md5), the FULL list of failed curation gates (not just the
    // first — audits need every reason), and the keep verdict, all
    // stamped with the pipeline version. Per-row projection, no
    // shuffle except the output sort; at 100 TB this is the scan-
    // shaped audit trail a reproducible curation run writes next to
    // its output.
    "q_curation_provenance" -> ((s, d) => {
      val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      val alphaRatio = alpha.cast("double") / length(col("text")).cast("double")
      val gates = concat_ws(",",
        when(col("n_chars") < 100, lit("too_short")),
        when(col("n_chars") > 500, lit("too_long")),
        when(alphaRatio < 0.6, lit("low_alpha")),
        when(col("lang") === "zh", lit("lang_excluded")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("content_hash"),
          gates.as("failed_gates"),
          (gates === "").as("keep"),
          lit("curation-v1").as("pipeline_version"))
        .orderBy("doc_id")
    }),

    // Mixture downsampling: per-language keep-rates from a broadcast
    // config frame, md5-bucket membership, audited as per-lang counts.
    "q_data_mixture" -> ((s, d) => {
      import s.implicits._
      val rates = Seq(("en", 100), ("es", 50), ("de", 50),
        ("fr", 25), ("zh", 25)).toDF("lang", "rate")
      // defaultRate 25 mirrors the oracle's CASE ... ELSE 25, so the
      // two sides agree even for a lang outside the config frame.
      Sampling.sampleByRates(Tables.documents(s, d), "doc_id", "lang",
          rates, defaultRate = 25)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    }),

    // Reproducible training-order shuffle: portable md5 key, shard
    // assignment, shard-local position (16 independent window sorts,
    // never one global sort).
    "q_shuffle_shards" -> ((s, d) =>
      Sampling.shuffleShards(
          Tables.documents(s, d).select("doc_id"), "doc_id", shards = 16)
        .select(col("doc_id"), col("shuffle_key"), col("shard"),
          col("pos"))
        .orderBy("doc_id")),

    // Bloom-prescreened contamination: same answer as
    // q_contamination (the exact-confirm join kills Bloom false
    // positives), same oracle — what changes is the plan: the
    // training gram stream is filtered by a codegen'd might_contain
    // against the benchmark's Bloom filter BEFORE the shuffle, the
    // 100 TB decontamination shape.
    "q_contamination_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      Contamination.overlapBloom(
          docs.filter(col("doc_id") < 450),
          docs.filter(col("doc_id") >= 450), n = 5)
        .orderBy("doc_id")
    }),

    // Weighted sampling without replacement: Efraimidis–Spirakis
    // ranking keys from portable md5 uniforms, top-100 by
    // u^(1/n_chars) — longer docs proportionally likelier. The
    // oracle replays the identical draw from the same md5 bits.
    "q_sample_weighted" -> ((s, d) =>
      Sampling.weightedTopK(
          Tables.documents(s, d).select("doc_id", "n_chars"),
          col("doc_id"), col("n_chars").cast("double"), k = 100)
        .select(col("doc_id"), col("n_chars"),
          round(col("es_key"), 9).as("es_key"))),

    // Per-group uniform k-sample — the deterministic distributed
    // reservoir (keep the k smallest stable uniform keys per group;
    // see Sampling.reservoirPerGroup for the WindowGroupLimit
    // partial-top-k scale argument). 5 docs per language here: the
    // "eyeball a fixed-size sample of every slice" QA step.
    "q_sample_reservoir" -> ((s, d) =>
      Sampling.reservoirPerGroup(
          Tables.documents(s, d).select("doc_id", "lang", "source"),
          "doc_id", "lang", k = 5)
        .select("lang", "pos", "doc_id", "source")
        .orderBy("lang", "pos")),

    // DSIR data selection (Xie et al. 2023): score every non-src0
    // document by the log-likelihood ratio of its hashed unigrams
    // under target-vs-raw smoothed bucket models (target = src0),
    // keep the 100 most target-like. Scores are exact BIGINT micro-
    // nat dot products over a broadcast ≤1024-row model — see
    // ImportanceResampling for the one-pass 100 TB shape and the
    // micro-quantized-ln portability argument.
    "q_select_dsir" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.ImportanceResampling.dsirTopK(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"),
          "doc_id", "text", k = 100)
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "lang", "source", "n_toks", "score")
        .orderBy(col("score").desc, col("doc_id"))
    }),

    // DSIR's actual RESAMPLING step (vs q_select_dsir's pure top-k):
    // Gumbel-top-k over the same scores — sample ∝ exp(log w) at
    // τ=1 via deterministic md5-derived Gumbel noise, micro-
    // quantized so the sample key is an exact integer sum. Keeps
    // tail diversity that argmax selection destroys.
    "q_select_dsir_gumbel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.ImportanceResampling.dsirResample(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"),
          "doc_id", "text", k = 100)
        .select("doc_id", "n_toks", "score", "gumbel_micro",
          "sample_key")
        .orderBy(col("sample_key").desc, col("doc_id"))
    }),

    // URL-canonicalization dedup — the FIRST dedup a web-crawl
    // pipeline runs, on the cheapest key there is. URL-shaped
    // strings derive deterministically from document keys (the
    // q_text_pii precedent: the synthetic corpus carries no URLs)
    // with deliberate case/port/fragment/tracking-param/trailing-
    // slash variants; canonicalization collapses them and the dedup
    // is one hash aggregation on the canonical key (q_dedup_exact
    // shape). See operators/UrlCanonicalize for the rules.
    "q_dedup_url" -> ((s, d) => {
      val id = col("doc_id")
      // logical identity = (id%25, id%3, id%2) → ~150 canonical URLs
      // over 500 docs (3–4 raws each); every OTHER mod drives a raw
      // variant canonicalization must collapse
      val raw = concat(
        when(id % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
        when(id % 3 === 0, lit("CDN.")).otherwise(lit("cdn.")),
        lit("Example.COM"),
        when(id % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/docs/"), (id % 25).cast("string"),
        when(id % 4 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&b="), (id % 3).cast("string"),
        lit("&a="), (id % 2).cast("string"),
        when(id % 6 === 0, lit("#sec")).otherwise(lit("")))
      Tables.documents(s, d)
        .select(id, graft.operators.UrlCanonicalize.canonicalUrl(raw)
          .as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_raw"),
          min(id).cast("long").as("first_doc"))
        .orderBy("canonical_url")
    }),

    // THE pipeline: every curation stage composed as ONE declarative
    // plan — quality gate (per-language thresholds) → exact dedup
    // (lowest id per identical text) → benchmark decontamination
    // (5-gram screen) → mixture downsampling (md5 buckets) → per-
    // language report. Catalyst sees the whole dataflow: the gate's
    // per-row predicates push into the scan, dedup is one hash
    // window, the gram screen is the bounded hashed join, sampling
    // is a shuffle-free projection. This is the end-to-end shape a
    // 100 TB curation run executes — and the whole composition is
    // replayed by the DuckDB oracle.
    "q_pipeline_curation" -> ((s, d) => {
      val wsTok = graft.operators.TextAnalysis.wsTokenCount(col("text"))
      // 5. the report a training run starts from
      curatedDocs(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(wsTok).cast("long").as("tokens"))
        .orderBy("lang")
    }),

    // The pipeline's SINK: the curated set lands as a doc_id-bucketed,
    // within-bucket-sorted table ([[graft.sinks.CuratedCorpusSink]]),
    // then reads BACK from that layout — so the round trip through
    // the bucketed files is itself oracle-gated, and every downstream
    // join on doc_id scans it with no Exchange (CuratedCorpusSinkSpec
    // pins the consumer plan).
    "q_pipeline_curation_sink" -> ((s, d) => {
      import graft.sinks.CuratedCorpusSink
      CuratedCorpusSink.write(
          curatedDocs(s, d).select("doc_id", "lang", "n_chars"),
          table = "graft_curated_corpus", buckets = 16)
        .orderBy("doc_id")
    }),

    // Z-order layout audit: Morton-interleave (partkey, suppkey)
    // ([[graft.functions.ZOrder]], codegen'd bit twiddling), tile the
    // curve into 1024-cell buckets (= aligned 32x32 quadtree squares),
    // and report each tile's min/max per dimension — exactly the
    // file-level statistics a 100 TB table clustered by this key
    // would expose, where tile_area staying near 1024 (vs the full
    // domain for a single-column sort) is WHY a 2-D predicate prunes:
    // a query on (partkey range AND suppkey range) touches only tiles
    // whose box intersects it.
    // Corpus drift audit: chi-square contribution of every
    // (lang, source) cell between two corpus shards (even/odd
    // doc_id stands in for yesterday/today) — the monitoring query a
    // pipeline runs per ingest batch to catch a source going dark or
    // a language mix shifting. Determinism: the chi-square numerator
    // (o·N − n_shard·t)² and denominator N·n_shard·t are EXACT
    // BIGINTs; only the final division is double, on identical
    // operands with an identical expression tree in both engines.
    // Incremental corpus upsert — MERGE-INTO semantics as one
    // full-outer equi-join: a refresh batch (re-crawled documents +
    // brand-new ids, derived deterministically from the corpus
    // itself) merges into the snapshot; every row is classified
    // insert / update / keep and the audit rolls up per (lang,
    // action). This is the maintenance pass between crawls in a
    // training-data pipeline. Scale: ONE co-partitioned shuffle on
    // doc_id (at 100 TB both sides come pre-bucketed by doc_id —
    // ScaleJoins.bucketize — making the merge exchange-free, the
    // CuratedCorpusSink pattern); the audit aggregates cells, not
    // documents.
    "q_corpus_upsert" -> ((s, d) => {
      val corpus = Tables.documents(s, d)
        .select("doc_id", "lang", "text")
      val batch = corpus.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("lang"),
          concat(col("text"), lit(" v2")).as("text"))
        .unionByName(corpus.filter(col("doc_id") < 50)
          .select((col("doc_id") + lit(100000L)).as("doc_id"),
            col("lang"), col("text")))
      val merged = corpus.as("c")
        .join(batch.as("b"), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("b.lang"), col("c.lang")).as("lang"),
          coalesce(col("b.text"), col("c.text")).as("text"),
          when(col("b.text").isNull, lit("keep"))
            .when(col("c.text").isNull, lit("insert"))
            .otherwise(lit("update")).as("action"))
      merged.groupBy("lang", "action")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .orderBy("lang", "action")
    }),

    // Scale: one groupBy over (lang, source) — cells, not documents,
    // cross the single-row totals frame; contributions stay per-cell
    // (no float total), so nothing depends on summation order.
    "q_corpus_drift" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L))
            .as("n_a"),
          sum(when(col("doc_id") % 2 =!= 0, 1L).otherwise(0L))
            .as("n_b"))
      val tot = cells.agg(sum("n_a").as("na_tot"),
        sum("n_b").as("nb_tot"))
      val t = col("n_a") + col("n_b")
      val n = col("na_tot") + col("nb_tot")
      val dA = col("n_a") * n - col("na_tot") * t
      val dB = col("n_b") * n - col("nb_tot") * t
      cells.crossJoin(broadcast(tot)) // single-row totals frame
        // rule 10: chi2 is a RATIONAL (exact-int numerators over
        // exact-int denominators) — surface via scale-0 micro-
        // quantization + one bare IEEE division, never round(ratio, 9)
        .withColumn("chi2_cell", round(
          ((dA * dA).cast("double") / (n * col("na_tot") * t).cast("double")
            + (dB * dB).cast("double") / (n * col("nb_tot") * t).cast("double"))
            * lit(1e9), 0) / lit(1e9))
        .select(col("lang"), col("source"), col("n_a"), col("n_b"),
          col("chi2_cell"))
        .orderBy("lang", "source")
    }),

    "q_layout_zorder" -> ((s, d) => {
      import graft.functions.ZOrder
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").cast("long").as("x"),
          col("l_suppkey").cast("long").as("y"))
      li.select(col("x"), col("y"),
          ZOrder.z16(col("x"), col("y")).as("z"))
        .groupBy(shiftrightunsigned(col("z"), 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"),
          ((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
            .as("tile_area"))
        .orderBy("bucket")
    })
  )

  /** Stages 1–4 of the curation pipeline — quality gate → exact
    * dedup → decontamination → mixture downsampling — as ONE
    * declarative frame: Catalyst sees the whole dataflow (gate
    * predicates push into the scan, dedup is one hash window, the
    * gram screen is the bounded hashed join, sampling is a
    * shuffle-free projection). Shared by the report query and the
    * bucketed sink. */
  def curatedDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val wsTok = graft.operators.TextAnalysis.wsTokenCount(col("text"))
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      .cast("double") / length(col("text")).cast("double")
    // 1. quality gate on the training slice (zh is exempt from the
    // alpha rule — a latin-alphabet ratio means nothing for CJK)
    val quality = docs.filter(col("doc_id") < 450)
      .filter(col("n_chars").between(100, 500) && wsTok >= 10 &&
        (alpha >= 0.6 || col("lang") === "zh"))
    // 2. exact dedup: canonical = lowest doc_id per identical text
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("text")))
    val canonical = quality
      .withColumn("min_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("min_id")).drop("min_id")
    // 3. decontamination against the benchmark slice
    def grams(df: DataFrame) = df.select(
      col("doc_id"), explode(array_distinct(graft.operators.ApproxDedup
        .shingleHashes64(col("text"), 5))).as("gram"))
    val contaminated = grams(canonical)
      .join(grams(docs.filter(col("doc_id") >= 450))
        .select(col("gram")), "gram")
      .select("doc_id").distinct()
    val clean = canonical.join(contaminated, Seq("doc_id"), "left_anti")
    // 4. mixture downsampling on portable md5 buckets
    val rates = Seq(("en", 100), ("es", 50), ("de", 50),
      ("fr", 25), ("zh", 25)).toDF("lang", "rate")
    Sampling.sampleByRates(clean, "doc_id", "lang", rates,
      defaultRate = 25)
  }

  /** The DSIR score CTE shared by the q_select_dsir and
    * q_select_dsir_gumbel oracles — ends with `score(doc_id, n_toks,
    * score)` over the non-src0 pool. */
  private val dsirScoreCte =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |    ('0x' || substring(md5(w), 1, 8))::BIGINT % 1024 AS bkt
      |  FROM (SELECT doc_id, source,
      |          unnest(string_split(text, ' ')) AS w
      |        FROM documents)),
      |tcnt AS (SELECT bkt, COUNT(*) AS ct FROM tok
      |         WHERE source = 'src0' GROUP BY bkt),
      |rcnt AS (SELECT bkt, COUNT(*) AS cr FROM tok
      |         WHERE source <> 'src0' GROUP BY bkt),
      |tot AS (SELECT (SELECT SUM(ct) FROM tcnt) AS nt,
      |               (SELECT SUM(cr) FROM rcnt) AS nr),
      |lr AS (
      |  SELECT r.bkt,
      |    CAST(ROUND(ln(
      |        (CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) *
      |         CAST(tot.nr + 1024 AS DOUBLE)) /
      |        (CAST(r.cr + 1 AS DOUBLE) *
      |         CAST(tot.nt + 1024 AS DOUBLE))) * 1000000.0, 0)
      |      AS BIGINT) AS lr_micro
      |  FROM rcnt r LEFT JOIN tcnt t USING (bkt), tot),
      |docb AS (
      |  SELECT doc_id, bkt, COUNT(*) AS c FROM tok
      |  WHERE source <> 'src0' GROUP BY doc_id, bkt),
      |score AS (
      |  SELECT d.doc_id, CAST(SUM(d.c) AS BIGINT) AS n_toks,
      |         CAST(SUM(d.c * lr.lr_micro) AS BIGINT) AS score
      |  FROM docb d JOIN lr USING (bkt) GROUP BY d.doc_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // MERGE replay: the same full-outer join + COALESCE/CASE
    // classification; counts and char sums are exact integers.
    "q_corpus_upsert" ->
      """WITH corpus AS (
        |  SELECT doc_id, lang, text FROM documents),
        |batch AS (
        |  SELECT doc_id, lang, text || ' v2' AS text
        |  FROM corpus WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 100000, lang, text
        |  FROM corpus WHERE doc_id < 50),
        |m AS (
        |  SELECT doc_id,
        |    COALESCE(b.lang, c.lang) AS lang,
        |    COALESCE(b.text, c.text) AS text,
        |    CASE WHEN b.text IS NULL THEN 'keep'
        |         WHEN c.text IS NULL THEN 'insert'
        |         ELSE 'update' END AS action
        |  FROM corpus c FULL OUTER JOIN batch b USING (doc_id))
        |SELECT lang, action, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(text)) AS BIGINT) AS n_chars
        |FROM m GROUP BY 1, 2
        |ORDER BY lang, action""".stripMargin,
    // row_number is deterministic here: the window order
    // (shuffle_key, doc_id) is total within each shard.
    "q_shuffle_shards" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key,
        |  CAST(shuffle_key % 16 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shuffle_key % 16
        |    ORDER BY shuffle_key, doc_id) AS INT) AS pos
        |FROM k ORDER BY doc_id""".stripMargin,
    // The CASE compares the same unrounded int-ratio mean_word_len as
    // the output column (rule 10: no round on either side).
    "q_quality_gopher" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  CAST(len(replace(text, ' ', '')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS mean_word_len,
        |  CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
        |    ['the','be','to','of','and','that','have','with'])) AS INT)
        |    AS n_stop,
        |  CASE
        |    WHEN len(string_split(text, ' ')) < 30 THEN 'too_few_words'
        |    WHEN len(string_split(text, ' ')) > 90 THEN 'too_many_words'
        |    WHEN CAST(len(replace(text, ' ', '')) AS DOUBLE)
        |           / len(string_split(text, ' ')) < 3.0
        |      OR CAST(len(replace(text, ' ', '')) AS DOUBLE)
        |           / len(string_split(text, ' ')) > 10.0
        |      THEN 'word_len_out_of_band'
        |    WHEN len(list_intersect(list_distinct(string_split(text, ' ')),
        |      ['the','be','to','of','and','that','have','with'])) < 1
        |      THEN 'no_stopword'
        |    ELSE 'keep'
        |  END AS verdict
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_pii" ->
      s"""WITH c AS (
        |  SELECT c_custkey,
        |    'Reach ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
        |      || '@mail.example.com or +1-555-'
        |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.' || CAST(c_custkey % 200 AS VARCHAR) || '.0.7'
        |      AS doc
        |  FROM customer)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(doc, '${PiiScrub.emailPattern}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(doc, '${PiiScrub.phonePattern}')) AS INT)
        |    AS n_phones,
        |  CAST(len(regexp_extract_all(doc, '${PiiScrub.ipv4Pattern}')) AS INT)
        |    AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(doc,
        |    '${PiiScrub.emailPattern}', '<EMAIL>', 'g'),
        |    '${PiiScrub.phonePattern}', '<PHONE>', 'g'),
        |    '${PiiScrub.ipv4Pattern}', '<IP>', 'g') AS scrubbed
        |FROM c ORDER BY c_custkey""".stripMargin,
    // Same 5-gram windows as the engine's NgramHashes64 kernel,
    // including the short-doc fallback (docs with < n tokens emit one
    // gram of their full token run).
    "q_contamination" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 3, 2)),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents))
        |SELECT t.doc_id, count(DISTINCT t.gram) AS n_shared_grams,
        |       count(DISTINCT b.doc_id) AS n_bench_docs
        |FROM (SELECT * FROM g WHERE doc_id < 450) t
        |JOIN (SELECT * FROM g WHERE doc_id >= 450) b ON t.gram = b.gram
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // Identical to q_contamination by construction: the Bloom
    // prescreen is answer-preserving (no false negatives; positives
    // die in the exact-confirm join).
    "q_contamination_bloom" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 3, 2)),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents))
        |SELECT t.doc_id, count(DISTINCT t.gram) AS n_shared_grams,
        |       count(DISTINCT b.doc_id) AS n_bench_docs
        |FROM (SELECT * FROM g WHERE doc_id < 450) t
        |JOIN (SELECT * FROM g WHERE doc_id >= 450) b ON t.gram = b.gram
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // The oracle replays the exact draw: same md5 bits → same
    // uniforms → same u^(1/w) ranking keys (pow ulp differences
    // can't flip an order whose key gaps are ~1e-6; the printed key
    // is rounded on both sides).
    "q_sample_weighted" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |          AS BIGINT) + 1.0) / 4294967297.0 AS u
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  ROUND(pow(u, 1.0 / CAST(n_chars AS DOUBLE)), 9) AS es_key
        |FROM u
        |ORDER BY pow(u, 1.0 / CAST(n_chars AS DOUBLE)) DESC, doc_id
        |LIMIT 100""".stripMargin,
    // Replays the identical per-group draw: same md5 bits → same
    // uniform keys → same k smallest per language.
    "q_sample_reservoir" ->
      """WITH r AS (
        |  SELECT lang, doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
        |                                  1, 8))::BIGINT, doc_id)
        |      AS INT) AS pos
        |  FROM documents)
        |SELECT lang, pos, doc_id, source FROM r
        |WHERE pos <= 5 ORDER BY lang, pos""".stripMargin,
    // Replays the raw-URL derivation and every canonicalization rule
    // (regexp parts extraction, default-port strip, fragment drop,
    // utm filter, binary param sort, trailing-slash strip) — the
    // canonical keys group identically.
    "q_dedup_url" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        |    || (CASE WHEN doc_id % 3 = 0 THEN 'CDN.' ELSE 'cdn.' END)
        |    || 'Example.COM'
        |    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
        |    || '/docs/' || CAST(doc_id % 25 AS VARCHAR)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        |    || '?utm_source=feed&b=' || CAST(doc_id % 3 AS VARCHAR)
        |    || '&a=' || CAST(doc_id % 2 AS VARCHAR)
        |    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END)
        |      AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    regexp_replace(url, '#.*$', '') AS nofrag
        |  FROM raw),
        |pieces AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(nofrag,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)', 1))
        |      AS scheme,
        |    lower(regexp_extract(nofrag,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)', 2))
        |      AS host0,
        |    regexp_replace(regexp_extract(nofrag,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)', 3),
        |      '/+$', '') AS path,
        |    CASE WHEN contains(nofrag, '?')
        |         THEN regexp_replace(nofrag, '^[^?]*\?', '')
        |         ELSE '' END AS query0
        |  FROM parts),
        |canon AS (
        |  SELECT doc_id,
        |    CASE WHEN scheme = '' THEN url ELSE
        |    scheme || '://'
        |    || (CASE WHEN scheme = 'https'
        |             THEN regexp_replace(host0, ':443$', '')
        |             WHEN scheme = 'http'
        |             THEN regexp_replace(host0, ':80$', '')
        |             ELSE host0 END)
        |    || path
        |    || (CASE WHEN q = '' THEN '' ELSE '?' || q END)
        |    END AS canonical_url
        |  FROM (
        |    SELECT *,
        |      array_to_string(list_sort(list_filter(
        |        string_split(query0, '&'),
        |        p -> NOT starts_with(p, 'utm_') AND p <> '')), '&')
        |        AS q
        |    FROM pieces))
        |SELECT canonical_url, COUNT(*) AS n_raw,
        |  MIN(doc_id) AS first_doc
        |FROM canon GROUP BY canonical_url
        |ORDER BY canonical_url""".stripMargin,
    // Replays the full DSIR pipeline: same md5 token buckets, the
    // same smoothed count model, the identical IEEE double ratio
    // expression under ln, micro-quantized to the same BIGINT cell
    // values — doc scores are then exact integer dot products on
    // both engines.
    "q_select_dsir" ->
      s"""$dsirScoreCte
        |SELECT s.doc_id, doc.lang, doc.source, s.n_toks, s.score
        |FROM score s JOIN documents doc USING (doc_id)
        |ORDER BY s.score DESC, s.doc_id LIMIT 100""".stripMargin,
    // Same score CTE + the identical md5-uniform Gumbel chain: both
    // engines derive the same u, the same −ln(−ln(u)) double, the
    // same micro-quantized noise, the same exact integer sample key.
    "q_select_dsir_gumbel" ->
      s"""$dsirScoreCte,
        |g AS (
        |  SELECT doc_id, n_toks, score,
        |    CAST(ROUND(-ln(-ln(
        |      (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
        |                               1, 8)) AS BIGINT) + 1.0)
        |        / 4294967297.0)) * 1000000.0, 0) AS BIGINT)
        |      AS gumbel_micro
        |  FROM score)
        |SELECT doc_id, n_toks, score, gumbel_micro,
        |  score + gumbel_micro AS sample_key
        |FROM g
        |ORDER BY sample_key DESC, doc_id LIMIT 100""".stripMargin,
    // Replays the full five-stage composition; gram windows mirror
    // the engine's NgramHashes64 kernel (incl. the short-doc
    // fallback), dedup groups by the text itself (hash-invariant).
    "q_pipeline_curation" ->
      """WITH quality AS (
        |  SELECT * FROM documents
        |  WHERE doc_id < 450
        |    AND n_chars BETWEEN 100 AND 500
        |    AND len(string_split(text, ' ')) >= 10
        |    AND (CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |              AS DOUBLE) / CAST(len(text) AS DOUBLE) >= 0.6
        |         OR lang = 'zh')),
        |canon AS (
        |  SELECT * FROM quality
        |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)),
        |cg AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 3, 2)),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM canon)),
        |bg AS (
        |  SELECT unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 3, 2)),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM (SELECT string_split(text, ' ') AS toks
        |        FROM documents WHERE doc_id >= 450)),
        |clean AS (
        |  SELECT * FROM canon
        |  WHERE doc_id NOT IN (SELECT DISTINCT cg.doc_id
        |                       FROM cg JOIN bg ON cg.gram = bg.gram)),
        |mixed AS (
        |  SELECT * FROM clean
        |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |          ::BIGINT % 100 <
        |        CASE lang WHEN 'en' THEN 100 WHEN 'es' THEN 50
        |                  WHEN 'de' THEN 50 ELSE 25 END)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |FROM mixed GROUP BY lang ORDER BY lang""".stripMargin,
    // The sink key replays stages 1–4 and returns the curated rows
    // themselves — identical CTEs to q_pipeline_curation minus the
    // report aggregate; the engine side additionally round-trips the
    // rows through the bucketed table files.
    "q_pipeline_curation_sink" ->
      """WITH quality AS (
        |  SELECT * FROM documents
        |  WHERE doc_id < 450
        |    AND n_chars BETWEEN 100 AND 500
        |    AND len(string_split(text, ' ')) >= 10
        |    AND (CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |              AS DOUBLE) / CAST(len(text) AS DOUBLE) >= 0.6
        |         OR lang = 'zh')),
        |canon AS (
        |  SELECT * FROM quality
        |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)),
        |cg AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 3, 2)),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM canon)),
        |bg AS (
        |  SELECT unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 3, 2)),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM (SELECT string_split(text, ' ') AS toks
        |        FROM documents WHERE doc_id >= 450)),
        |clean AS (
        |  SELECT * FROM canon
        |  WHERE doc_id NOT IN (SELECT DISTINCT cg.doc_id
        |                       FROM cg JOIN bg ON cg.gram = bg.gram))
        |SELECT doc_id, lang, n_chars FROM clean
        |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        ::BIGINT % 100 <
        |      CASE lang WHEN 'en' THEN 100 WHEN 'es' THEN 50
        |                WHEN 'de' THEN 50 ELSE 25 END
        |ORDER BY doc_id""".stripMargin,
    "q_text_boilerplate" ->
      """SELECT gram, COUNT(*) AS df FROM (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks), 2)),
        |    i -> array_to_string(toks[i:i+1], ' ')))) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents))
        |GROUP BY gram HAVING COUNT(*) >= 40 ORDER BY gram""".stripMargin,
    "q_dedup_lines" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |segs AS (
        |  SELECT doc_id, k AS idx,
        |    array_to_string(list_slice(w, k * 10 + 1, k * 10 + 10), ' ')
        |      AS seg
        |  FROM ws, UNNEST(generate_series(0,
        |    CAST(CEIL(len(w) / 10.0) AS INT) - 1)) AS t(k)),
        |hashed AS (
        |  SELECT doc_id, idx, seg,
        |    ('0x' || substring(md5(seg), 1, 15))::BIGINT AS h
        |  FROM segs),
        |freq AS (
        |  SELECT h FROM hashed GROUP BY h
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |flagged AS (
        |  SELECT hashed.*, h IN (SELECT h FROM freq) AS is_freq
        |  FROM hashed),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_segs,
        |    SUM(CASE WHEN is_freq THEN 1 ELSE 0 END) AS n_dropped,
        |    COALESCE(string_agg(CASE WHEN NOT is_freq THEN seg END,
        |      ' ' ORDER BY idx), '') AS clean_text
        |  FROM flagged GROUP BY doc_id)
        |SELECT doc_id, CAST(n_segs AS INT) AS n_segs,
        |  CAST(n_dropped AS INT) AS n_dropped,
        |  md5(clean_text) AS clean_hash,
        |  CAST(len(clean_text) AS INT) AS clean_len
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_curation_provenance" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  concat_ws(',',
        |    CASE WHEN n_chars < 100 THEN 'too_short' END,
        |    CASE WHEN n_chars > 500 THEN 'too_long' END,
        |    CASE WHEN CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |              AS DOUBLE) / len(text) < 0.6 THEN 'low_alpha' END,
        |    CASE WHEN lang = 'zh' THEN 'lang_excluded' END)
        |    AS failed_gates,
        |  (concat_ws(',',
        |    CASE WHEN n_chars < 100 THEN 'too_short' END,
        |    CASE WHEN n_chars > 500 THEN 'too_long' END,
        |    CASE WHEN CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |              AS DOUBLE) / len(text) < 0.6 THEN 'low_alpha' END,
        |    CASE WHEN lang = 'zh' THEN 'lang_excluded' END) = '')
        |    AS keep,
        |  'curation-v1' AS pipeline_version
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_data_mixture" ->
      """SELECT lang, COUNT(*) AS n_kept FROM (
        |  SELECT lang,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 100 AS b
        |  FROM documents)
        |WHERE b < CASE lang WHEN 'en' THEN 100 WHEN 'es' THEN 50
        |                    WHEN 'de' THEN 50 ELSE 25 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Exact-integer chi-square pieces; the one double division uses
    // the identical operand pair and expression order as the engine.
    "q_corpus_drift" ->
      """WITH cells AS (
        |  SELECT lang, source,
        |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM documents GROUP BY lang, source),
        |tot AS (
        |  SELECT CAST(SUM(n_a) AS BIGINT) AS na_tot,
        |         CAST(SUM(n_b) AS BIGINT) AS nb_tot
        |  FROM cells)
        |SELECT lang, source, n_a, n_b,
        |  ROUND((
        |    CAST((n_a * (na_tot + nb_tot) - na_tot * (n_a + n_b)) *
        |         (n_a * (na_tot + nb_tot) - na_tot * (n_a + n_b))
        |      AS DOUBLE) /
        |    CAST((na_tot + nb_tot) * na_tot * (n_a + n_b) AS DOUBLE)
        |    +
        |    CAST((n_b * (na_tot + nb_tot) - nb_tot * (n_a + n_b)) *
        |         (n_b * (na_tot + nb_tot) - nb_tot * (n_a + n_b))
        |      AS DOUBLE) /
        |    CAST((na_tot + nb_tot) * nb_tot * (n_a + n_b) AS DOUBLE)
        |  ) * 1e9, 0) / 1e9 AS chi2_cell
        |FROM cells, tot ORDER BY lang, source""".stripMargin,
    // The same mask-spread interleave, step by step in BIGINT — every
    // shift/and/or is exact 64-bit on both engines.
    "q_layout_zorder" ->
      """WITH b AS (
        |  SELECT CAST(l_partkey AS BIGINT) AS x,
        |         CAST(l_suppkey AS BIGINT) AS y
        |  FROM lineitem),
        |s0 AS (SELECT x, y, x & 65535 AS vx, y & 65535 AS vy FROM b),
        |s1 AS (SELECT x, y,
        |  ((vx | (vx << 8)) & 16711935) AS vx,
        |  ((vy | (vy << 8)) & 16711935) AS vy FROM s0),
        |s2 AS (SELECT x, y,
        |  ((vx | (vx << 4)) & 252645135) AS vx,
        |  ((vy | (vy << 4)) & 252645135) AS vy FROM s1),
        |s3 AS (SELECT x, y,
        |  ((vx | (vx << 2)) & 858993459) AS vx,
        |  ((vy | (vy << 2)) & 858993459) AS vy FROM s2),
        |s4 AS (SELECT x, y,
        |  ((vx | (vx << 1)) & 1431655765) AS vx,
        |  ((vy | (vy << 1)) & 1431655765) AS vy FROM s3),
        |z AS (SELECT x, y, (vx | (vy << 1)) AS z FROM s4)
        |SELECT (z >> 10) AS bucket, COUNT(*) AS n,
        |  MIN(x) AS x_min, MAX(x) AS x_max,
        |  MIN(y) AS y_min, MAX(y) AS y_max,
        |  (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS tile_area
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
