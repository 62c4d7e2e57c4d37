package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One packed document: its shard, identity, token count, and the
  * context-window bin FFD assigned it to. */
case class PackedDoc(shard: String, doc_id: Long, tokens: Long,
                     bin_id: Int)

/** Concat-and-chunk sequence packing — the standard pretraining
  * batching shape: documents are concatenated in a stable order and
  * the token stream is cut into fixed-`budget` context windows; each
  * document is assigned to the window its first token falls in.
  *
  * Window id is a pure function of the running token count
  * (`floor(tokens_before_doc / budget)`), so the whole operator is
  * one partitioned prefix-sum window — no sequential driver loop, no
  * state. That is what makes it a 100 TB operator: each shard (e.g. a
  * language or a source split) packs independently under one
  * hash-shuffle + sort, exactly like any partitioned window; a global
  * pack order would serialize and is deliberately not offered.
  */
object SequencePacking {
  /** Assign each doc a (shard-local) context-window id.
    *
    * @param docs   must contain `shard`, `ord` (stable in-shard
    *               order), and `tokens` (per-doc token count)
    * @param budget window size in tokens
    */
  def packWindows(docs: DataFrame, shard: String, ord: String,
                  tokens: String, budget: Int): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(shard).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(tokens)).over(w))
      .withColumn("window_id",
        floor((col("__cum") - col(tokens)) / budget).cast("int"))
      .withColumn("offset_in_window",
        ((col("__cum") - col(tokens)) % budget).cast("int"))
      .drop("__cum")
  }

  /** First-fit-decreasing bin packing that keeps documents WHOLE
    * under the token budget — the shape real pretraining pipelines
    * run when cross-document attention contamination matters (vs
    * [[packWindows]]' concat-and-chunk, which splits documents across
    * context windows). Classic FFD: within a shard, documents are
    * processed in (tokens DESC, doc_id ASC) order, each placed into
    * the lowest-numbered bin it fits; no fit opens a new bin. A
    * document larger than the budget gets a singleton bin (never
    * split, never dropped — the caller decides truncation policy).
    * FFD's guarantee: bin count ≤ 11/9·OPT + 1. OPT itself is
    * unknowable cheaply, so the spec asserts the bound against a
    * certified LOWER bound on OPT — max(ceil(total/budget),
    * #docs larger than budget/2): the first term is the splitting
    * relaxation, the second holds because two such docs never share
    * a bin. (Asserting against ceil(total/budget) alone would be
    * wrong: a corpus of docs all sized budget/2 + 1 packs one per
    * bin for ANY algorithm, n bins vs a ceil of ~n/2.)
    *
    * Scale shape: shards pack independently (one `groupByKey` task
    * per shard — the same per-shard parallelism contract as
    * [[packWindows]]); within a task the fold is the sequential FFD
    * scan over that shard's (id, tokens) pairs, 16 bytes/doc — the
    * fits-one-task precondition, enumerated in BoundedStateAuditSpec.
    * The linear first-fit probe is O(bins) per doc; production-size
    * shards would swap in the standard best-fit segment tree without
    * changing the output contract.
    *
    * Deterministic and engine-replayable: the (tokens DESC, doc_id)
    * order is a total order, so the assignment is a pure function of
    * the input — the DuckDB oracle replays it with a recursive CTE
    * carrying the bin-load list.
    */
  def packBinsFfd(docs: DataFrame, shard: String, id: String,
                  tokens: String, budget: Int): DataFrame = {
    require(budget > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(shard).cast("string").as("shard"),
        col(id).cast("long").as("doc_id"),
        col(tokens).cast("long").as("tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (sh: String, it: Iterator[(String, Long, Long)]) =>
        val ds = it.map { case (_, i, t) => (i, t) }.toArray
          .sortBy { case (i, t) => (-t, i) }
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.iterator.map { case (i, t) =>
          val idx = loads.indexWhere(_ + t <= budget)
          val bin =
            if (idx >= 0) { loads(idx) += t; idx }
            else { loads += t; loads.length - 1 }
          PackedDoc(sh, i, t, bin)
        }
      }
      .toDF()
  }
}
