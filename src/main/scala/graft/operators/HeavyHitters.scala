package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: bounded-memory candidate screen +
  * exact recount, with a DETERMINISTIC (hence oracle-gateable)
  * output despite the sketch's partition-dependent internals.
  *
  * Per partition, a k-counter Misra–Gries summary (MG'82): increment
  * a tracked item, start tracking while < k counters are live, else
  * decrement all (each decrement event burns k+1 occurrences, which
  * is the whole guarantee). Pigeonhole across partitions: any item
  * with global frequency > N/(k+1) must exceed n_p/(k+1) in at least
  * one partition, so it survives SOME local summary — the union of
  * local candidates is a superset of every global heavy hitter.
  *
  * The candidates then get EXACT counts in a second pass (broadcast
  * semi-join — the candidate set is ≤ k × #partitions, never
  * vocabulary-sized) and the filter `count × (k+1) > N` keeps
  * exactly the true heavy hitters. The candidate set varies with
  * partitioning; the filtered output never does — same discipline as
  * [[Skyline]] (internals partition-dependent, result provably not).
  *
  * Why this beats a plain wordcount at 100 TB: the full groupBy
  * shuffles the whole vocabulary (token-level cardinality); here the
  * shuffle carries only the bounded candidate set, and the heavy
  * screen happens map-side in O(k) memory per task — the same reason
  * CMS/HLL exist, but with an exact, provable output.
  */
object HeavyHitters {

  /** `tokens`: one string column `token`. Returns (token, n) for
    * every token with n > N/(k+1), N = total token count. */
  def frequent(tokens: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "need at least one counter")
    val spark = tokens.sparkSession
    import spark.implicits._
    val toks: Dataset[String] = tokens.select(col("token")).as[String]
    val candidates = toks.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // decrement-all: drop every counter by 1, evict zeros
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.filterInPlace((_, c) => c > 0)
        }
      }
      counters.keysIterator
    }.toDF("token").distinct()
    val total = tokens.agg(count(lit(1)).as("n_total"))
    tokens.join(broadcast(candidates), "token")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total)) // single-row frame
      .filter(col("n") * (k + 1) > col("n_total"))
      .select("token", "n")
  }
}
