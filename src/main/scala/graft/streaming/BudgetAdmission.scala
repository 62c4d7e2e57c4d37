package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Input row: one document offered to the mixture. */
case class AdmitDoc(doc_id: Long, group: String, n_tokens: Long)

/** Admitted document with the group's running token total AFTER it. */
case class AdmittedDoc(doc_id: Long, group: String, n_tokens: Long,
                       cum_tokens: Long)

/** Per-group admission state: tokens admitted so far. */
case class BudgetState(spent: Long)

/** Streaming token-budget admission (S15) — the streaming complement
  * of [[graft.operators.Sampling.admitByTokenBudget]]: documents
  * arrive on a stream, each (lang/source) group admits until its
  * token budget is met, then the gate closes. The batch operator
  * decides "which N tokens" by md5 order over a complete corpus; a
  * stream must decide ONLINE, so the contract is arrival order
  * across micro-batches (first-come-first-admitted) with the same
  * strictly-under-budget admission rule — the first document
  * CROSSING the budget is still admitted, after which the group
  * admits nothing. Within one micro-batch, rows are processed in
  * portable-md5 key order (doc_id tiebreak), so a replayed batch
  * admits identically regardless of row order inside it.
  *
  * State is ONE long per group (tokens spent) — O(groups), not
  * O(docs): the gate stays bounded on an unbounded stream, and a
  * group past budget does constant work per arriving row. Budgets
  * ride in as a plain map captured by the closure (mixture configs
  * are a handful of cells); groups absent from the map admit
  * nothing, matching the batch operator's inner budget join.
  */
object BudgetAdmission {

  /** First 32 bits of md5 over the id's decimal string — the same
    * portable admit key as `Sampling.admitByTokenBudget`, so batch
    * and stream order identically when a batch's rows tie. */
  def admitKey(id: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
  }

  def admit(docs: Dataset[AdmitDoc],
            budgets: Map[String, Long]): Dataset[AdmittedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.group)
      .flatMapGroupsWithState[BudgetState, AdmittedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[AdmitDoc],
         state: GroupState[BudgetState]) =>
          val budget = budgets.getOrElse(g, 0L)
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          val out = Seq.newBuilder[AdmittedDoc]
          rows.toSeq.sortBy(d => (admitKey(d.doc_id), d.doc_id))
            .foreach { d =>
              if (spent < budget) {
                spent += d.n_tokens
                out += AdmittedDoc(d.doc_id, g, d.n_tokens, spent)
              }
            }
          state.update(BudgetState(spent))
          out.result().iterator
      }
  }
}
