package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan regression guards: the scale properties the engine
  * is designed around (pushdown, pruning, broadcast, top-k without a
  * global sort, shuffle-free decode) asserted on the actual executed
  * plans so they can't silently regress.
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): SparkPlan =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan

  private def formatted(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_filter_pred: all predicates reach the parquet scan") {
    val f = formatted("q_filter_pred")
    assert(f.contains("PushedFilters:"))
    for (p <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThan(l_quantity"))
      assert(f.contains(p), s"missing pushed filter $p")
  }

  test("q_ann_filtered: the candidate predicate reaches the parquet " +
      "scan (filtered ANN never shuffles non-qualifying vectors)") {
    val f = formatted("q_ann_filtered")
    assert(f.contains("EqualTo(label,1)"),
      "label predicate not pushed to the candidate scan")
  }

  test("q_scan_project: scan reads only the projected columns") {
    val f = formatted("q_scan_project")
    assert(f.contains(
      "struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>"),
      "ReadSchema must be pruned to the 4 projected columns")
  }

  test("q_join_broadcast: dimension join is a broadcast hash join") {
    // AQE wraps the plan; the formatted explain shows the final join
    // strategy.
    assert(formatted("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_tpch_q19: per-side envelopes of the disjunction reach both scans") {
    // The OR-of-conjunctions spans both join sides and cannot move
    // below the join itself, but Catalyst must extract each side's
    // disjunction envelope into the parquet scans: quantity bounds on
    // lineitem, brand/size baskets on part.
    val f = formatted("q_tpch_q19")
    assert(f.contains("GreaterThanOrEqual(l_quantity,1.0)"),
      "lineitem scan must receive the quantity envelope")
    assert(f.contains("EqualTo(p_brand,Brand#1)"),
      "part scan must receive the brand/size envelope")
    assert(f.contains("BroadcastHashJoin"))
  }

  test("q_contamination: benchmark gram side broadcasts; no gram strings in the join") {
    val f = formatted("q_contamination")
    assert(f.contains("BroadcastHashJoin"),
      "benchmark side must broadcast")
    // The join key must be the 64-bit gram HASH, not the gram string:
    // formatted attribute refs carry an L suffix for bigint columns.
    assert("gram#\\d+L".r.findFirstIn(f).isDefined,
      "join gram column must be a bigint hash")
    assert("gram#\\d+(?!L)[,\\]]".r.findFirstIn(f).isEmpty,
      "no string-typed gram column may appear in the plan")
  }

  test("q_lateral_topn: LATERAL decorrelates to WindowGroupLimit, not a loop join") {
    val f = formatted("q_lateral_topn")
    assert(f.contains("WindowGroupLimit"),
      "correlated ORDER BY/LIMIT must compile to a group-limit window")
    assert(!f.contains("BroadcastNestedLoopJoin"),
      "decorrelation must not fall back to a nested loop")
  }

  test("q_agg_quantile_sketch: bottom-K prunes per partition before " +
      "the shuffle (WindowGroupLimit)") {
    // The KMV sample's scale claim: the rank-≤K filter must compile
    // to a group-limit window, which keeps only K rows per group
    // WITHIN each input partition ahead of the exchange — the
    // shuffle carries samples, never the fact table.
    val f = formatted("q_agg_quantile_sketch")
    assert(f.contains("WindowGroupLimit"),
      "rank-limit filter must compile to WindowGroupLimit")
    val flags = Verify.planFlags(plan("q_agg_quantile_sketch"))
    assert(flags.isEmpty, s"sketch plan must be antipattern-free: $flags")
  }

  test("q_agg_salted: two aggregation exchanges (salted partial, final)") {
    val f = formatted("q_agg_salted")
    // formatted mode lists exchange args as "Arguments: hashpartitioning(...)"
    val exchanges = "hashpartitioning\\(".r.findAllIn(f).length
    assert(exchanges >= 2,
      s"expected the salted partial + final re-aggregate exchanges, saw $exchanges")
  }

  test("q_sort_limit_topk: top-k avoids a global sort") {
    assert(plan("q_sort_limit_topk").collect {
      case t: TakeOrderedAndProjectExec => t }.nonEmpty)
  }

  test("q_join_multiway: revenue partial-agg runs below the joins; " +
      "customer is broadcast") {
    val f = formatted("q_join_multiway")
    assert(f.contains("BroadcastHashJoin"),
      "customer join must be broadcast")
    // The per-order partial aggregate must sit BELOW the joins: the
    // formatted explain prints root-first, so the l_orderkey-keyed
    // aggregate (which only exists in the pre-aggregated shape —
    // the naive join-then-agg plan groups by c_mktsegment alone)
    // must appear AFTER (deeper than) the first join operator.
    val aggIdx = f.indexOf("Keys [1]: [l_orderkey")
    val joinIdx = Seq("SortMergeJoin", "ShuffledHashJoin",
      "BroadcastHashJoin").map(f.indexOf).filter(_ >= 0).min
    assert(aggIdx >= 0, "expected a HashAggregate keyed on l_orderkey — " +
      "its absence means revenue is no longer pre-aggregated per order " +
      "and lineitem shuffles at full width twice")
    assert(aggIdx > joinIdx,
      "the l_orderkey aggregate must be deeper than the joins")
  }

  test("q_range_join: interval containment plans as an equi-join, " +
      "not a nested loop") {
    val f = formatted("q_range_join")
    assert(!f.contains("BroadcastNestedLoopJoin") &&
      !f.contains("CartesianProduct"),
      "banded range join must not degenerate to an O(n*m) plan")
  }

  test("q_tpch_q3: top-10 is TakeOrderedAndProject over a broadcast " +
      "customer filter") {
    val f = formatted("q_tpch_q3")
    assert(f.contains("TakeOrderedAndProject"))
    assert(f.contains("BroadcastHashJoin"))
  }

  test("partitioned writes prune partitions at read time") {
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toFile
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").mode("overwrite")
      .parquet(dir.getAbsolutePath)
    val pruned = spark.read.parquet(dir.getAbsolutePath)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // partition filter reached the scan; only the one directory reads
    assert(scan.partitionFilters.nonEmpty,
      "event_type predicate must become a partition filter")
    val allTypes = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_type").distinct().count()
    assert(allTypes > 1)
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of $allTypes partitions selected")
  }

  test("firehose decode path has zero shuffles") {
    val decodePlan = graft.firehose.FirehoseDecoder
      .decode(spark, graft.queries.PipelineQueries.fixtureDir
        .getAbsolutePath + "/*")
      .queryExecution.executedPlan
    assert(decodePlan.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      "decode must stay narrow end-to-end")
  }

  test("q_contamination_bloom: codegen'd might_contain prescreens the " +
      "training grams") {
    val f = formatted("q_contamination_bloom")
    assert(f.contains("might_contain"),
      "Bloom prescreen must appear in the plan")
    assert(f.contains("BroadcastHashJoin"),
      "exact-confirm join must still broadcast the benchmark side")
  }

  test("q_sample_weighted: weighted draw is TakeOrderedAndProject, " +
      "never a global sort") {
    assert(plan("q_sample_weighted").collect {
      case t: TakeOrderedAndProjectExec => t }.nonEmpty)
  }

  test("q_tpch_q17: the decorrelated per-part average broadcasts back " +
      "to the fact slice") {
    val f = formatted("q_tpch_q17")
    assert(f.contains("BroadcastHashJoin"),
      "per-part avg frame must broadcast")
    assert(f.contains("Keys [1]: [l_partkey"),
      "expected the per-part aggregate the correlation decorrelates to")
  }

  test("q_tpch_q21: EXISTS/NOT EXISTS compile to semi/anti hash joins, " +
      "not loops") {
    val f = formatted("q_tpch_q21")
    assert(f.contains("LeftSemi"), "EXISTS must be a left-semi join")
    assert(f.contains("LeftAnti"), "NOT EXISTS must be a left-anti join")
    assert(!f.contains("BroadcastNestedLoopJoin") &&
      !f.contains("CartesianProduct"),
      "correlated subqueries must not fall back to loop joins")
  }

  test("q_pipeline_curation: gate predicates reach the scan; no loop " +
      "joins anywhere in the five-stage plan") {
    val f = formatted("q_pipeline_curation")
    assert(f.contains("LessThan(doc_id,450)"),
      "training-slice predicate must push into the documents scan")
    assert(f.contains("GreaterThanOrEqual(n_chars,100)"),
      "quality-gate range must push into the scan")
    assert(!f.contains("BroadcastNestedLoopJoin") &&
      !f.contains("CartesianProduct"),
      "no stage may degenerate to a loop join")
  }

  test("q_events_anomaly: stats join carries no forced broadcast — " +
      "AQE picks broadcast at runtime from the ACTUAL frame size") {
    // The per-user stats frame scales with |users|: a broadcast()
    // hint would pin an OOM at 100M users. Here AQE must convert the
    // shuffle join to a broadcast join at runtime, because the
    // materialized frame is actually small — the adaptive final plan
    // shows the conversion the static plan can't promise.
    // The action must run on THIS DataFrame's QueryExecution —
    // df.write builds a separate one, leaving df's plan un-executed
    // and the assertion reading static planning, not the runtime
    // conversion. collect() executes df's own adaptive plan;
    // isFinalPlan=true proves AQE finished re-planning before we
    // read the join strategy out of it.
    val df = SparkEntry.queries("q_events_anomaly")(spark, dir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"),
      s"adaptive plan must have finalized:\n$finalPlan")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"expected AQE to broadcast the small stats side:\n$finalPlan")
  }

  test("registry-wide: no unpartitioned window operator outside the " +
      "allow-list") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // A window with no partition spec moves EVERY row to one task —
    // the one plan shape that cannot survive a 100× scale-up (the
    // r5 q_events_rfm defect class). Allow-list entries require a
    // boundedness justification: the operator's INPUT must be
    // provably O(config) or O(small-distinct), never O(data).
    val allowed = Map(
      "q_skew_report" -> ("counts-of-counts histogram: the window's " +
        "input is one row per DISTINCT per-key multiplicity — tens " +
        "of rows at any fact-table size"))
    // a.inputPlan, NOT a.executedPlan: on an un-executed adaptive
    // plan the latter materializes every query stage — it would
    // silently EXECUTE all 165 queries inside this test.
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    def unpartitioned(q: String): Seq[String] =
      flatten(plan(q)).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
      }
    val offenders = for {
      q <- SparkEntry.queries.keys.toSeq.sorted
      if !allowed.contains(q)
      node <- unpartitioned(q)
    } yield s"$q ($node)"
    assert(offenders.isEmpty,
      s"unpartitioned window operators outside the allow-list:\n  " +
        offenders.mkString("\n  "))
    // Allow-list accuracy: a listed query that no longer has the
    // window must be removed, so the list can't rot into a blanket
    // exemption.
    for ((q, why) <- allowed)
      assert(unpartitioned(q).nonEmpty,
        s"$q no longer contains an unpartitioned window — drop it " +
          s"from the allow-list (was justified as: $why)")
  }

  test("q_events_rfm: quintile ranks come from partitioned windows " +
      "over range slices, never a global ntile") {
    import org.apache.spark.sql.execution.window.WindowExec
    val f = formatted("q_events_rfm")
    assert(!f.contains("ntile"),
      "rfm must not plan a global ntile — quintiles come from the " +
        "closed-form bucket over a distributed rank")
    assert(f.contains("row_number"),
      "expected per-range-slice row_number ranks in the plan")
  }

  test("q_tpch_q1: single pass — one partial+final aggregate pair, " +
      "no second lineitem scan") {
    // Count detail-section headers "(n) Scan parquet" — the tree
    // rendering repeats each operator once more as an indented node.
    val f = formatted("q_tpch_q1")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(f).length
    assert(scans == 1, s"Q1 must read lineitem once, saw $scans scans")
  }

  test("planFlags catches a deliberately planted unsalted hot-key join") {
    // The q_text_lm_score defect class, re-created on purpose: bigram
    // occurrences shuffle-joined on the raw (w1, w2) gram key. The
    // gate must flag it, so any future query that ships this shape
    // fails verify_local unless allow-listed with a skew
    // justification.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val occ = (1 to 200).map(i => (i.toLong, "the", s"w$i"))
      .toDF("doc_id", "w1", "w2")
    val model = (1 to 200).map(i => ("the", s"w$i", 0.1)).toDF("w1", "w2", "p")
    // defeat auto-broadcast so the join plans as a shuffle join, the
    // shape the gate exists for
    val planted = occ.join(model.hint("shuffle_merge"), Seq("w1", "w2"))
    assert(Verify.planFlags(planted.queryExecution.executedPlan)
      .contains("hotkey_shuffle_join"),
      "the gate must flag a shuffle equi-join keyed on raw gram columns")
  }

  test("q_text_lm_score: heavy head broadcasts; only the bounded tail " +
      "shuffle-joins on gram keys") {
    // The skew fix's shape, pinned: the heavy-hitter head of the
    // bigram model reaches the occurrence stream through BROADCAST
    // joins (score + anti-screen), so the only gram-keyed shuffle
    // join left is the tail, whose per-key frequency is bounded by
    // N/lmHeadFanout by construction (the verify_local allow-list
    // entry's justification).
    // the registry frame is memo-checkpointed (its own plan is just
    // the checkpoint scan), so pin the shape on the raw builder
    val lmRaw = graft.queries.CorpusQueries.lmScoresRaw(spark, dir)
    val f = lmRaw.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val bhj = "BroadcastHashJoin".r.findAllIn(f).length
    assert(bhj >= 2,
      s"expected ≥2 broadcast joins (head score + anti screen), saw $bhj")
    assert(f.contains("LeftAnti"),
      "head occurrences must be screened out of the tail join by a " +
        "broadcast anti-join")
    // At sf0.001 the tail itself fits the auto-broadcast threshold
    // (no flag at all); at larger SFs the tail plans as the one
    // allow-listed gram-keyed shuffle join. Nothing else may flag.
    val flags = Verify.planFlags(lmRaw.queryExecution.executedPlan)
    assert(flags.toSet.subsetOf(Set("hotkey_shuffle_join")),
      s"only the allow-listed tail join may flag, saw $flags")
  }

  test("q_text_keywords: tf ⋈ df runs through the frequency-split " +
      "head/tail join") {
    // Same pin as q_text_lm_score, for the generalized operator
    // (ScaleJoins.frequencySplitJoin): the heavy df head reaches the
    // tf stream via BROADCAST joins (score + anti-screen), so any
    // term-keyed shuffle join left is the pigeonhole-bounded tail.
    val f = formatted("q_text_keywords")
    val bhj = "BroadcastHashJoin".r.findAllIn(f).length
    assert(bhj >= 2,
      s"expected ≥2 broadcast joins (head score + anti screen), saw $bhj")
    assert(f.contains("LeftAnti"),
      "head terms must be screened out of the tail join by a " +
        "broadcast anti-join")
    val flags = Verify.planFlags(plan("q_text_keywords"))
    assert(flags.toSet.subsetOf(Set("hotkey_shuffle_join")),
      s"only the bounded tail join may flag, saw $flags")
  }
}
