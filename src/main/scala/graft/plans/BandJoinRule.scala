package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

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
  * OPT-IN and bounded: fires only when `spark.graft.bandJoin.width`
  * is set to a positive long (the band width in point units — choose
  * ≈ the typical interval length; row expansion per interval is
  * length/width + 1). Guards: inner joins only, batch plans only, no
  * existing cross-side equality conjunct (those joins already
  * hash-partition — and the guard also makes the rule idempotent,
  * since the rewritten join carries a band equality).
  */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.bandJoin.width"

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

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => rewrite(plan, w)
  }

  /** The rewrite with an explicit band width — the session-extension
    * path reads the width from [[WidthConf]]; callers that already
    * know their band (e.g. a registry query demonstrating the rule)
    * apply this directly to an analyzed plan and avoid session-conf
    * mutation entirely. */
  def rewrite(plan: LogicalPlan, w: Long): LogicalPlan =
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.isStreaming =>
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
        // candidate (pt, lo, hi) with pt and bounds on OPPOSITE sides
        val banded: Option[(Expression, Expression, Expression)] =
          if (crossEq) None else {
          val lowers = conjuncts.flatMap(lowerBound)
          val uppers = conjuncts.flatMap(upperBound)
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
        banded match {
          case None => j
          case Some((pt, lo, hi)) =>
            val (pointSide, intervalSide) =
              if (from(pt, left)) (left, right) else (right, left)
            val pBand = Alias(bandOf(pt, w), "__graft_band_p")()
            val pointPlan = Project(
              pointSide.output :+ pBand, pointSide)
            val iBandAttr = AttributeReference(
              "__graft_band_i", LongType, nullable = false)()
            // Sequence is TimeZoneAwareExpression: without an explicit
            // zone it stays UNRESOLVED and fails plan validation, even
            // for integral sequences that never consult it
            val bandLoE = bandOf(lo, w)
            val bandHiE = bandOf(hi, w)
            val rawSeq = new Sequence(bandLoE, bandHiE)
              .withTimeZone(conf.sessionLocalTimeZone)
            val emptyBands = Literal.create(
              Array.empty[Long], ArrayType(LongType, containsNull = false))
            // Per-row fan-out guards the theta join never needed:
            // (a) reversed bounds (lo > hi) match nothing under the
            //     theta predicate, but Sequence would default to
            //     step -1 and fabricate a DESCENDING band list —
            //     emit zero bands instead;
            // (b) an interval spanning more than MaxBandsPerRow bands
            //     (an open-ended Long.MaxValue sentinel, or a width
            //     chosen far too small) would materialize an
            //     arbitrarily long array per row — fail LOUDLY with
            //     the remedy in the message rather than let the
            //     executor OOM or hit Sequence's opaque length error.
            val bandSeq = CaseWhen(
              Seq(
                (GreaterThan(bandLoE, bandHiE), emptyBands),
                (GreaterThan(Subtract(bandHiE, bandLoE),
                  Literal(MaxBandsPerRow)),
                  Cast(new RaiseError(Literal(
                    s"BandJoinRule: interval spans more than " +
                      s"$MaxBandsPerRow bands; raise $WidthConf or " +
                      "exclude open-ended sentinel intervals")),
                    ArrayType(LongType, containsNull = false)))),
              Some(rawSeq))
            val intervalPlan = Generate(
              Explode(bandSeq),
              unrequiredChildIndex = Nil, outer = false,
              qualifier = None, generatorOutput = Seq(iBandAttr),
              intervalSide)
            // keep the original child order so downstream hints and
            // the output schema stay stable
            val (newLeft, newRight) =
              if (from(pt, left)) (pointPlan, intervalPlan)
              else (intervalPlan, pointPlan)
            val bandEq: Expression =
              EqualTo(pBand.toAttribute, iBandAttr)
            Project(j.output,
              Filter(cond,
                Join(newLeft, newRight, Inner, Some(bandEq), hint)))
        }
    }
}
