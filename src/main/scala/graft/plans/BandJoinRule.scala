package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Always-TRUE no-op predicate marking the overflow theta branch that
  * [[BandJoinRule]] emits in `hybrid` overflow mode. The rule runs in
  * a FIXPOINT optimizer batch, so the theta join it creates (which
  * still matches the point-in-range shape by construction) must be
  * self-identifying or the rule would re-split it every iteration;
  * the marker travels inside the wide-interval Filter's condition —
  * surviving conjunct splitting and pushdown, which relocate but
  * never drop a predicate — and the rule skips any candidate join
  * with a marker on either side. Non-foldable so ConstantFolding
  * cannot erase it; codegens to the literal `true`. */
case class BandOverflowMarker() extends LeafExpression with Predicate {
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = BooleanType
  override def eval(input: InternalRow): Any = true
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = code"", isNull = FalseLiteral,
      value = JavaCode.literal("true", BooleanType))
}

/** Optimizer rule: rewrite a point-in-range THETA join into the
  * banded EQUI-join of [[graft.operators.RangeJoin]] — automatically.
  *
  * A join whose only condition is `lo ≤ pt AND pt ≤ hi` (any
  * strictness, any operand order, `pt` from one side and `lo`/`hi`
  * from the other, integral types) has no equality key, so Spark
  * plans it as BroadcastNestedLoopJoin — O(n·m) work and an
  * un-shardable broadcast at scale. The manual fix is the banded
  * dataflow `RangeJoin.pointInInterval` implements with DataFrame
  * ops; this rule performs the SAME rewrite inside Catalyst, so a
  * user can write the natural `BETWEEN` predicate and still get the
  * hash-partitionable plan:
  *
  *   points:    + __band = pt div W                  (one band/row)
  *   intervals: + __band = explode(sequence(lo div W, hi div W))
  *   join:      equi on __band, then the ORIGINAL predicate as a
  *              residual filter (bounds, strictness, null semantics
  *              all preserved — the bands only prune candidates)
  *
  * Each qualifying pair meets exactly once (the point's single band),
  * so no dedup pass exists in the rewrite. Trunc-division is
  * monotone non-decreasing, so lo ≤ pt ≤ hi ⇒ band(pt) ∈
  * [band(lo), band(hi)] — negative values band coarser around zero,
  * never incorrectly.
  *
  * The INTERVAL-OVERLAP theta shape — `aS ≤ bE AND bS ≤ aE`, one
  * start and one end per side, crossed — is rewritten too (the
  * `RangeJoin.intervalOverlap` dataflow): BOTH sides explode to
  * their band ranges, the join runs on band equality, and because a
  * pair can share many bands, a first-shared-band conjunct
  * `band = greatest(aS div W, bS div W)` dedups each pair without a
  * distinct() — the overlap conjuncts guarantee that band lies in
  * both ranges. The point shape takes priority when both match.
  *
  * OPT-IN and bounded: fires only when `spark.graft.bandJoin.width`
  * is set to a positive long (the band width in point units — choose
  * ≈ the typical interval length; row expansion per interval is
  * length/width + 1). Guards: inner joins only, batch plans only, no
  * existing cross-side equality conjunct (those joins already
  * hash-partition — and the guard also makes the rule idempotent,
  * since the rewritten join carries a band equality).
  *
  * Intervals wider than [[MaxBandsPerRow]] bands follow
  * [[OverflowConf]]: `error` (default) raises a descriptive runtime
  * error; `hybrid` unions the banded plan over the ≤cap intervals
  * with the original theta join over the few over-cap ones (the
  * open-ended-sentinel class) — the classic hybrid range join, which
  * keeps any pre-existing slow-but-working query working. Shape
  * caveat (documented, accepted): the overlap matcher admits any two
  * crossed inequality conjuncts; if the two left-side expressions are
  * not really an interval, per-row band ranges can be huge and land
  * on the cap. See README "Band-join rule" for both caveats.
  */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.bandJoin.width"

  /** What to do with a POINT-shape interval whose band range exceeds
    * [[MaxBandsPerRow]]:
    *  - `error` (default): raise a descriptive runtime error — no
    *    silent unbounded row explosion;
    *  - `hybrid`: split the interval side at the cap. Narrow
    *    intervals take the banded equi-join; overflow-wide ones (the
    *    open-ended-sentinel class, typically a handful of rows) keep
    *    the original theta join — Spark broadcasts the small wide
    *    slice — and the two branches union. This is the classic
    *    hybrid range join: correct for ANY interval width, with the
    *    banded plan doing the bulk of the work. The OVERLAP shape
    *    keeps `error` semantics regardless (a wide interval there
    *    would need a 3-way split; use the explicit RangeJoin dataflow
    *    if you have open-ended overlap intervals). */
  val OverflowConf = "spark.graft.bandJoin.onOverflow"

  /** Hard per-row fan-out cap: an interval may expand to at most this
    * many band rows. Generous for any sane width choice (a well-tuned
    * band yields ~2 rows/interval); intervals beyond it raise a
    * descriptive error instead of materializing an unbounded array. */
  val MaxBandsPerRow = 4096L

  private def width: Option[Long] =
    try {
      val w = conf.getConfString(WidthConf, "").trim
      if (w.isEmpty) None else Some(w.toLong).filter(_ > 0)
    } catch { case _: NumberFormatException => None }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  /** (point, bound) for a lower-bound conjunct `pt ≥ lo` in either
    * written order/strictness, else None. */
  private def lowerBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(pt, lo) => Some((pt, lo))
      case GreaterThan(pt, lo) => Some((pt, lo))
      case LessThanOrEqual(lo, pt) => Some((pt, lo))
      case LessThan(lo, pt) => Some((pt, lo))
      case _ => None
    }

  private def upperBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(pt, hi) => Some((pt, hi))
      case LessThan(pt, hi) => Some((pt, hi))
      case GreaterThanOrEqual(hi, pt) => Some((pt, hi))
      case GreaterThan(hi, pt) => Some((pt, hi))
      case _ => None
    }

  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def bandOf(e: Expression, w: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(w))

  private val emptyBands = Literal.create(
    Array.empty[Long], ArrayType(LongType, containsNull = false))

  private def capError: Expression =
    Cast(new RaiseError(Literal(
      s"BandJoinRule: interval spans more than $MaxBandsPerRow " +
        s"bands; raise $WidthConf or exclude open-ended sentinel " +
        "intervals")),
      ArrayType(LongType, containsNull = false))

  /** Band span |band(hi) − band(lo)| in DOUBLE on purpose: a long
    * Subtract overflows for opposite-sign extreme endpoints (the
    * double-open-ended sentinel case) and would BYPASS the cap —
    * doubles cannot overflow, and ulp-level imprecision near 2^53 is
    * irrelevant against a 4096 threshold. */
  private def bandSpan(lo: Expression, hi: Expression, w: Long)
  : Expression =
    Abs(Subtract(
      Cast(bandOf(hi, w), org.apache.spark.sql.types.DoubleType),
      Cast(bandOf(lo, w), org.apache.spark.sql.types.DoubleType)))

  /** Band list lo div w .. hi div w with the per-row fan-out guards
    * the theta join never needed. `reversedEmpty`: the POINT shape
    * emits zero bands for lo > hi (the predicate is unsatisfiable);
    * the OVERLAP shape keeps the raw sequence (reversed endpoints
    * can still satisfy the overlap predicate, and a descending
    * sequence explodes to the same band SET), capping on the
    * absolute span instead. `capToEmpty`: hybrid mode pre-filters
    * over-cap rows into the theta branch, so the cap case emits zero
    * bands (belt and braces — it is unreachable behind the filter)
    * instead of an error. */
  private def guardedBandSeq(lo: Expression, hi: Expression, w: Long,
                             reversedEmpty: Boolean,
                             capToEmpty: Boolean = false): Expression = {
    val (bandLoE, bandHiE) = (bandOf(lo, w), bandOf(hi, w))
    val rawSeq = new Sequence(bandLoE, bandHiE)
      .withTimeZone(conf.sessionLocalTimeZone)
    val branches =
      (if (reversedEmpty) Seq((GreaterThan(bandLoE, bandHiE), emptyBands))
       else Nil) :+
        (GreaterThan(bandSpan(lo, hi, w),
          Literal(MaxBandsPerRow.toDouble)),
          if (capToEmpty) emptyBands else capError)
    CaseWhen(branches, Some(rawSeq))
  }

  /** Attach an exploded band column to one side of the join. */
  private def explodeBands(side: LogicalPlan, bands: Expression,
                           name: String): (LogicalPlan, Attribute) = {
    val attr = AttributeReference(name, LongType, nullable = false)()
    (Generate(Explode(bands), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(attr), side), attr)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) =>
      rewrite(plan, w, conf.getConfString(OverflowConf, "error"))
  }

  /** True when this subtree carries the hybrid-overflow marker — the
    * theta branch the rule itself emitted (or a join built on top of
    * one); skipping those keeps the fixpoint batch convergent. */
  private def hasOverflowMarker(p: LogicalPlan): Boolean =
    p.exists {
      case f: Filter =>
        f.condition.exists(_.isInstanceOf[BandOverflowMarker])
      case _ => false
    }

  /** The rewrite with an explicit band width — the session-extension
    * path reads the width from [[WidthConf]]; callers that already
    * know their band (e.g. a registry query demonstrating the rule)
    * apply this directly to an analyzed plan and avoid session-conf
    * mutation entirely. */
  def rewrite(plan: LogicalPlan, w: Long,
              onOverflow: String = "error"): LogicalPlan =
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.isStreaming &&
            !hasOverflowMarker(left) && !hasOverflowMarker(right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        // null-safe equality (<=>) hash-partitions just like =, so it
        // suppresses the rewrite for the same reason
        val crossEq = conjuncts.exists {
          case EqualTo(a, b) =>
            (from(a, left) && from(b, right)) ||
              (from(a, right) && from(b, left))
          case EqualNullSafe(a, b) =>
            (from(a, left) && from(b, right)) ||
              (from(a, right) && from(b, left))
          case _ => false
        }
        // both shapes read the same upper-bound candidate list
        val uppers =
          if (crossEq) Nil else conjuncts.flatMap(upperBound)
        // candidate (pt, lo, hi) with pt and bounds on OPPOSITE sides
        val banded: Option[(Expression, Expression, Expression)] =
          if (crossEq) None else {
          val lowers = conjuncts.flatMap(lowerBound)
          lowers.iterator.flatMap { case (pt, lo) =>
            uppers.collectFirst {
              case (pt2, hi) if pt2.semanticEquals(pt) &&
                  integral(pt) && integral(lo) && integral(hi) &&
                  ((from(pt, left) && from(lo, right) && from(hi, right)) ||
                   (from(pt, right) && from(lo, left) && from(hi, left))) =>
                (pt, lo, hi)
            }
          }.toSeq.headOption
        }
        // interval-overlap pattern (tried only when the point shape
        // is absent): two upper-bound conjuncts with CROSSED sides —
        // aS ≤ bE and bS ≤ aE — i.e. each side carries one start
        // bounded by the other side's end
        val overlap: Option[(Expression, Expression, Expression, Expression)] =
          if (crossEq || banded.nonEmpty) None else {
            uppers.iterator.flatMap { case (aS, bE) =>
              uppers.collectFirst {
                case (bS, aE) if integral(aS) && integral(bE) &&
                    integral(bS) && integral(aE) &&
                    from(aS, left) && from(bE, right) &&
                    from(bS, right) && from(aE, left) =>
                  (aS, aE, bS, bE)
              }
            }.toSeq.headOption
          }
        (banded, overlap) match {
          case (Some((pt, lo, hi)), _) =>
            val (pointSide, intervalSide) =
              if (from(pt, left)) (left, right) else (right, left)
            val hybrid = onOverflow == "hybrid"
            val capLit = Literal(MaxBandsPerRow.toDouble)
            // hybrid: only the ≤cap slice of the interval side takes
            // the banded path (a NULL-bound row satisfies neither
            // slice predicate and drops from both — it cannot satisfy
            // the join condition anyway)
            val narrowSide =
              if (hybrid)
                Filter(LessThanOrEqual(bandSpan(lo, hi, w), capLit),
                  intervalSide)
              else intervalSide
            val pBand = Alias(bandOf(pt, w), "__graft_band_p")()
            val pointPlan = Project(
              pointSide.output :+ pBand, pointSide)
            val (intervalPlan, iBandAttr) = explodeBands(narrowSide,
              guardedBandSeq(lo, hi, w, reversedEmpty = true,
                capToEmpty = hybrid),
              "__graft_band_i")
            // keep the original child order so downstream hints and
            // the output schema stay stable
            val (newLeft, newRight) =
              if (from(pt, left)) (pointPlan, intervalPlan)
              else (intervalPlan, pointPlan)
            val bandEq: Expression =
              EqualTo(pBand.toAttribute, iBandAttr)
            val banded = Project(j.output,
              Filter(cond,
                Join(newLeft, newRight, Inner, Some(bandEq), hint)))
            if (!hybrid) banded
            else {
              // overflow-wide intervals keep the ORIGINAL theta join;
              // the marker makes the branch self-identifying so the
              // fixpoint re-run skips it (see BandOverflowMarker).
              // Both branches project j.output, so the Union's schema
              // and attribute ids are exactly the join's.
              val wideSide = Filter(
                And(GreaterThan(bandSpan(lo, hi, w), capLit),
                  BandOverflowMarker()),
                intervalSide)
              val (thLeft, thRight) =
                if (from(pt, left)) (pointSide, wideSide)
                else (wideSide, pointSide)
              Union(Seq(banded,
                Project(j.output,
                  Join(thLeft, thRight, Inner, Some(cond), hint))))
            }
          case (None, Some((aS, aE, bS, bE))) =>
            // both sides explode to their band ranges; a pair can
            // share MANY bands, so the FIRST shared band —
            // greatest(band(aS), band(bS)), computable per candidate
            // row — dedups without a distinct() (the
            // RangeJoin.intervalOverlap argument: the conjuncts
            // bS ≤ aE and aS ≤ bE guarantee that band lies in both
            // ranges, for reversed endpoints too)
            val (aPlan, aBand) = explodeBands(left,
              guardedBandSeq(aS, aE, w, reversedEmpty = false),
              "__graft_band_a")
            val (bPlan, bBand) = explodeBands(right,
              guardedBandSeq(bS, bE, w, reversedEmpty = false),
              "__graft_band_b")
            val firstShared = EqualTo(aBand,
              Greatest(Seq(bandOf(aS, w), bandOf(bS, w))))
            Project(j.output,
              Filter(And(cond, firstShared),
                Join(aPlan, bPlan, Inner,
                  Some(EqualTo(aBand, bBand)), hint)))
          case _ => j
        }
    }
}
