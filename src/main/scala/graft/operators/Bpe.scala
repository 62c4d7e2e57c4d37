package graft.operators

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A real byte-pair-encoding tokenizer: a deterministic trainer that
  * learns a merge table from a corpus sample, and a distributed
  * encoder that applies the broadcast merge ranks per document.
  *
  * Production shape mirrored here: tokenizers are trained OFFLINE on
  * a bounded sample (driver-side, like any vocabulary artifact) and
  * applied AT SCALE as a narrow per-row pass — [[tokenCounts]] is one
  * `mapPartitions` over the corpus with the ranks map broadcast once,
  * no shuffle, no UDF registration. At 100 TB only the application
  * runs on the cluster; the merge table is a few KB of driver state.
  *
  * Determinism: training breaks count ties by lexicographically
  * smallest pair, so the merge table is a pure function of the sample
  * text; encoding merges the lowest-rank adjacent pair first (the
  * standard BPE apply order), so counts are a pure function of
  * (text, merges).
  */
object Bpe {
  /** Pre-tokenizer: alpha runs, digit runs, single non-space marks —
    * the same segmentation shape as most published BPE vocabularies
    * (and as [[TextAnalysis.bpePattern]], whose count this refines). */
  val preTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  private val preTokenRe = preTokenPattern.r

  def preTokens(text: String): Seq[String] =
    preTokenRe.findAllIn(text.toLowerCase(Locale.ROOT)).toSeq

  /** Learn `nMerges` merges from `texts`: classic BPE over pre-token
    * frequencies. Each round merges the most frequent adjacent symbol
    * pair (ties → lexicographically smallest pair). Stops early when
    * no pair repeats. */
  def train(texts: Seq[String], nMerges: Int): Seq[(String, String)] = {
    // word-frequency table over pre-tokens; each word is a symbol seq
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach(t => preTokens(t).foreach(w =>
      freq.update(w, freq.getOrElse(w, 0L) + 1L)))
    var words: Vector[(Vector[String], Long)] =
      freq.toVector.sortBy(_._1).map { case (w, n) =>
        (w.map(_.toString).toVector, n)
      }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toVector
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) => (mergePair(syms, best), n) }
        round += 1
      }
    }
    merges.result()
  }

  private def mergePair(syms: Vector[String],
                        pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** [[mergePair]] over live arrays — the distributed trainer's loop
    * body (no Vector re-wrapping per word per round). */
  private def mergePairArr(syms: Array[String],
                           pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    out.sizeHint(syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 &&
          syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Encode one pre-token: repeatedly merge the lowest-rank adjacent
    * pair until none of the learned merges applies. */
  def encodeWord(word: String,
                 rk: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        rk.get(p).foreach(r =>
          if (r < bestRank) { bestRank = r; bestPair = p })
        i += 1
      }
      if (bestPair == null) done = true
      else {
        syms = mergePair(syms, bestPair)
        done = syms.length < 2
      }
    }
    syms
  }

  def encode(text: String, rk: Map[(String, String), Int]): Seq[String] =
    preTokens(text).flatMap(encodeWord(_, rk))

  /** Deterministic bounded training sample: the `n` lowest-id
    * documents (TakeOrderedAndProject — never a full sort), collected
    * to the driver exactly like any offline vocabulary build. */
  def trainOnSample(docs: DataFrame, idCol: String, textCol: String,
                    sampleN: Int, nMerges: Int): Seq[(String, String)] = {
    val sample = docs.orderBy(col(idCol)).limit(sampleN)
      .select(textCol).collect().map(_.getString(0)).toSeq
    train(sample, nMerges)
  }

  /** DISTRIBUTED trainer: classic BPE (Sennrich et al., ACL'16 —
    * public algorithm) with the word-frequency table living on the
    * cluster for the whole run; only ONE row — the argmax pair —
    * reaches the driver per merge round.
    *
    * Scale shape vs [[trainOnSample]] (which collects a bounded text
    * sample and is the right call when a sample suffices): here the
    * vocabulary can be arbitrarily large. The corpus is read ONCE
    * into (symbols, freq) — at 100 TB the word-vocab frame is
    * millions of rows, not the corpus — and every round is two
    * narrow jobs over that frame: adjacent-pair explode + partial
    * agg (shuffle carries distinct pairs only), then a
    * TakeOrdered(1) under the (-count, a, b) total order, so the
    * tie-break is deterministic and no round sorts the full pair
    * set. The merge applies as a broadcast single-pair rewrite in a
    * typed map — no shuffle; the frame re-checkpoints every few
    * rounds (the [[PageRank]] iterative-lineage lesson). Result is a
    * pure function of the corpus, bit-equal to the serial reference
    * [[train]] on the same text (pinned by BpeSpec).
    */
  def trainDistributed(docs: DataFrame, textCol: String,
                       nMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The word-frequency build is the only corpus-sized pass — SQL
    // agg with map-side combine. The merge LOOP then runs on a plain
    // RDD[(Array[String], Long)]: a typed Dataset would pay a
    // Catalyst serialize/deserialize of the symbol array EVERY round
    // (the encoder round-trip dominated the loop's CPU 5:1 — at 32
    // contract rounds that was most of the key's wall time); the
    // object RDD keeps the vocab as live JVM arrays between rounds.
    val wordFreq = docs.select(col(textCol)).as[String]
      .flatMap(preTokens(_))
      .groupBy(col("value").as("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
    // same char-level seeding as the serial reference (String.map
    // over chars) — not split-by-regex, whose empty-string edge
    // semantics differ across engines
    var words = wordFreq.rdd
      .map { case (w, n) => (w.map(_.toString).toArray, n) }
    // Right-size the vocab frame ONCE: per-round latency is
    // scheduler-bound (every merge round launches a job over this
    // frame), so partition for ~256k words/task instead of
    // inheriting the corpus shuffle width — a 50k-word vocab runs
    // each round as 2 tasks, a 100M-word vocab as ~400. The count is
    // one extra job, paid once (it also materializes the build).
    words.localCheckpoint()
    val nPart = math.max(2, (words.count() / 262144L).toInt)
    words = words.repartition(nPart)
    words.localCheckpoint()
    words.count()
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    // the (-count, a, b) total order of the serial reference, applied
    // to the driver-combined exact counts — deterministic regardless
    // of map iteration order
    val argmaxOrd: Ordering[((String, String), Long)] =
      Ordering.by { case ((a, b), n) => (-n, a, b) }
    while (round < nMerges && !exhausted) {
      // Pair counting as ONE tree-aggregated job: each task folds its
      // words into a local pair→count map (no per-pair row objects),
      // partials combine EXECUTOR-SIDE down a 2-level tree, and the
      // driver's reduce step merges arriving results into ONE
      // accumulator — driver state is O(distinct pairs), NEVER
      // O(partitions × pairs) (a per-partition `collect()` of the
      // maps would centralize every partial at once: at ~400
      // partitions × a CJK-seeded alphabet that is a driver-OOM
      // class, not a codebook class). Still no shuffle at fixture
      // partition counts (the tree only inserts a combine stage when
      // partitions exceed the scale threshold) — the earlier
      // reduceByKey + takeOrdered shape paid two stages per round,
      // and at 32 contract rounds the loop is job-launch bound, not
      // data bound. The merged map is BOUNDED BY THE SYMBOL ALPHABET:
      // distinct adjacent pairs number at most (|base alphabet| +
      // merges-so-far)² — the same codebook class as the quantizer
      // collects. Plain RDD ops on purpose: an SQL explode/groupBy/
      // TakeOrdered here re-plans and re-codegens EVERY round — 5x
      // the wall time of the whole loop — for a dataflow this fixed.
      val total = words.treeAggregate(
        scala.collection.mutable.HashMap.empty[(String, String), Long])(
        seqOp = { (m, wc) =>
          val (syms, n) = wc
          var i = 0
          while (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            m.update(p, m.getOrElse(p, 0L) + n)
            i += 1
          }
          m
        },
        combOp = { (a, b) =>
          // merge the smaller map into the larger — combine cost is
          // min(|a|,|b|), and the result reuses the big accumulator
          val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
          small.foreach { case (p, n) =>
            big.update(p, big.getOrElse(p, 0L) + n)
          }
          big
        },
        depth = 2)
      if (total.isEmpty) exhausted = true
      else {
        val pair = total.min(argmaxOrd)._1
        merges += pair
        words = words.map { case (syms, n) => (mergePairArr(syms, pair), n) }
        round += 1
        // re-checkpoint every few rounds: deep map lineage would make
        // round k replay every earlier rewrite, but a handful of
        // narrow maps replay locally for free — checkpointing each
        // round doubles the per-round job count for nothing (the
        // [[PageRank]] lesson, amortized). RDD.localCheckpoint marks
        // lazily; the next round's counting job materializes it in
        // the same pass.
        if (round % 4 == 0) words.localCheckpoint()
      }
    }
    merges.result()
  }

  /** Distributed application: per-document real-BPE token counts in
    * one narrow pass, merge ranks broadcast once per job. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    withTokenCounts(docs.select(col(idCol).cast("long"), col(textCol)),
      textCol, merges).drop(textCol)

  /** Append a real-BPE token-count column to `docs`, preserving every
    * existing column — one narrow pass, NO join: downstream consumers
    * (e.g. sequence packing) get (id, shard, ..., tokens) without
    * shuffling the corpus back against its own counts. */
  def withTokenCounts(docs: DataFrame, textCol: String,
                      merges: Seq[(String, String)],
                      outCol: String = "bpe_tokens"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(ranks(merges))
    val outSchema = docs.schema
      .add(outCol, org.apache.spark.sql.types.IntegerType, nullable = false)
    val idx = docs.schema.fieldIndex(textCol)
    // the per-document merge loop is serial CPU; spread it across the
    // cluster rather than file splits (a sub-128 MB corpus file scans
    // as ONE task, which would run the whole corpus's BPE serially)
    docs.repartition(col(textCol)).mapPartitions { it =>
      val rk = bc.value
      it.map(r => org.apache.spark.sql.Row.fromSeq(
        r.toSeq :+ encode(r.getString(idx), rk).length))
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
