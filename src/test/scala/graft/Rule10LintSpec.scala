package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Automated SURVEY §7.4 rule-10 lint: never surface a RATIO OF
  * EXACT VALUES through `round(x, k)` with k > 0 — rationals land on
  * the 10⁻ᵏ half-grid often, where Spark's exact-binary HALF_UP and
  * DuckDB's scale-then-round disagree (four sf0.1 gate hits in r9).
  * The r9 sweep was manual (14 output surfaces + the dedup threshold
  * kernels); this spec makes it a standing registry-wide gate.
  *
  * Two complementary walks:
  *   - ENGINE side: every registry key's OPTIMIZED logical plan
  *     (CollapseProject has inlined aliases, so ratio provenance is
  *     visible) is searched for Round/BRound nodes with scale > 0
  *     whose argument is EXACT-RATIONAL-VALUED — built from
  *     integral/decimal/boolean leaves and literals by +,−,×,÷,%,
  *     aggregates (sum/count/avg/min/max) and conditionals. Double
  *     attributes and transcendental functions break exactness, so
  *     the sanctioned absorbers (round(cosine, 6), round(·,6) over
  *     ln/log2 values) never flag. Frames a key memoizes via
  *     DerivedCache are checkpointed before consumers see them, so
  *     their INTERNAL rounds are covered by the oracle-side walk
  *     (the SQL replays the full kernel inline).
  *   - ORACLE side: every oracleSql text is scanned for ROUND(expr,
  *     k > 0) via balanced-paren extraction; an expr is suspect when
  *     it contains a division or AVG( and NO transcendental marker
  *     (LN/LOG/SQRT/EXP/POWER/list_inner_product/...) and none of
  *     the DOCUMENTED absorber identifiers (idf6/disc — ln- and
  *     log2-derived per the r9 audit). New rational rounds fail the
  *     spec until they are rewritten to integer micro-quantization
  *     (round(x·10ᵏ, 0) → exact BIGINT sums → one bare IEEE division
  *     at the surface).
  *
  * A seeded violation turns each walk red (tested below), the
  * current registry is green.
  */
class Rule10LintSpec extends SparkSpec {

  private def isExactType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Is `e` exact-rational-valued (rule 10's hazard class)? */
  private def exactValued(e: Expression): Boolean = e match {
    case c: Cast => exactValued(c.child)
    case _: Literal => true // any literal is an exact rational
    case a: Attribute => isExactType(a.dataType)
    case b: BinaryArithmetic => // + − × ÷ % div pmod all preserve rationality
      exactValued(b.left) && exactValued(b.right)
    case u: UnaryMinus => exactValued(u.child)
    case a: Abs => exactValued(a.child)
    case ae: AggregateExpression => ae.aggregateFunction match {
      case s: Sum => exactValued(s.child)
      case _: Count => true
      case a: Average => exactValued(a.child) // hidden sum/count ratio
      case m: Min => exactValued(m.child)
      case m: Max => exactValued(m.child)
      case _ => false
    }
    case i: If => exactValued(i.trueValue) && exactValued(i.falseValue)
    case cw: CaseWhen =>
      cw.branches.forall(b => exactValued(b._2)) &&
        cw.elseValue.forall(exactValued)
    case c: Coalesce => c.children.forall(exactValued)
    case al: Alias => exactValued(al.child)
    case _ => false
  }

  /** Does the rounded expression contain a division that can leave
    * the 10⁻ᵏ grid? A division by a FOLDABLE literal d with
    * 10ᵏ mod d = 0 keeps every exact-int numerator ON the grid
    * (n/5 at k=6, n/100 at k≥2 ...), so it cannot produce a
    * half-grid boundary; any other division (data-dependent
    * denominator, or literal not dividing 10ᵏ) can. Average is a
    * hidden sum/count division. */
  private def hazardousDivision(e: Expression, k: Int): Boolean = {
    val divs = e.collect { case d: Divide => d }
    val avgs = e.collect {
      case ae: AggregateExpression
          if ae.aggregateFunction.isInstanceOf[Average] => ae }
    avgs.nonEmpty || divs.exists { d =>
      !(d.right.foldable && {
        Option(d.right.eval()).exists { v =>
          val dv = v match {
            case x: java.lang.Number => x.doubleValue()
            case x: Decimal => x.toDouble
            case _ => Double.NaN
          }
          dv != 0 && dv == math.rint(dv) &&
            math.pow(10, k) % dv == 0
        }
      })
    }
  }

  /** Rule-10 violations in a plan: "round(<exact rational with a
    * grid-escaping division>, k>0)". */
  private def planFlags(plan: LogicalPlan): Seq[String] =
    plan.flatMap { node =>
      node.expressions.flatMap(_.collect {
        case r: RoundBase
            if r.right.foldable &&
              Option(r.right.eval()).exists(_.asInstanceOf[Int] > 0) &&
              exactValued(r.left) &&
              hazardousDivision(r.left,
                r.right.eval().asInstanceOf[Int]) =>
          s"round(${r.left.sql}, ${r.right.eval()})"
      })
    }

  /** ROUND(arg, k>0) occurrences in SQL text whose arg is a
    * division/AVG of non-transcendental terms. */
  private[graft] def sqlFlags(sql: String): Seq[String] = {
    val up = sql.toUpperCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.Buffer.empty[String]
    var i = up.indexOf("ROUND(")
    while (i >= 0) {
      // balanced-paren extraction of the argument list
      var depth = 1; var j = i + 6
      var topComma = -1
      while (j < up.length && depth > 0) {
        up.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 1 && topComma < 0 => topComma = j
          case _ =>
        }
        j += 1
      }
      if (depth == 0 && topComma > 0) {
        val arg = up.substring(i + 6, topComma).trim
        val scale = up.substring(topComma + 1, j - 1).trim
        val transcendental = Seq("LN(", "LOG", "SQRT(", "EXP(", "POW",
          "SIN(", "COS(", "LIST_INNER_PRODUCT", "LIST_COSINE")
        // documented rule-10 absorbers (r9 audit): idf6 is ln-derived,
        // disc/ideal_disc are log2-derived — transcendental by
        // provenance even where the referencing ROUND no longer shows
        // the ln/log2 call. WORD-boundary matches only: a substring
        // match would let L_DISCOUNT smuggle a real ratio past the
        // lint under the DISC absorber.
        val absorberRe = "\\b(IDF6|DISC|IDEAL_DISC)\\b".r
        // the textual walk flags ratios formed DIRECTLY from exact
        // aggregates/lengths inside the round argument — identifier
        // provenance (a CTE column that is already double) is the
        // ENGINE walk's job, where the optimizer has inlined it
        val exactSource = Seq("SUM(", "COUNT(", "LEN(")
        if (scale.toIntOption.exists(_ > 0) &&
            (arg.contains("/") || arg.contains("AVG(")) &&
            exactSource.exists(arg.contains) &&
            !transcendental.exists(arg.contains) &&
            absorberRe.findFirstIn(arg).isEmpty)
          out += s"ROUND($arg, $scale)"
      }
      i = up.indexOf("ROUND(", i + 6)
    }
    out.toSeq
  }

  test("seeded violations turn both walks red") {
    // engine side: classic sum/count ratio through round(·, 3)
    val bad = spark.range(10)
      .agg(round(sum(col("id")) / count(lit(1)), 3).as("r"))
    assert(planFlags(bad.queryExecution.optimizedPlan).nonEmpty,
      "plan walk must flag round(sum/count, 3)")
    // decimal ratio is exact too
    val badDec = spark.range(10)
      .select(round(col("id").cast("decimal(18,2)") / lit(7), 2).as("r"))
    assert(planFlags(badDec.queryExecution.optimizedPlan).nonEmpty,
      "plan walk must flag decimal ratios")
    // sanctioned shapes stay green: micro-quantization (scale 0) and
    // transcendental absorbers
    val ok1 = spark.range(10)
      .select(round(col("id").cast("double") * 1e6, 0).as("q"))
    assert(planFlags(ok1.queryExecution.optimizedPlan).isEmpty,
      "scale-0 micro-quantization must not flag")
    val ok2 = spark.range(10)
      .select(round(sqrt(col("id").cast("double")) / lit(3), 6).as("s"))
    assert(planFlags(ok2.queryExecution.optimizedPlan).isEmpty,
      "transcendental-valued rounds must not flag")
    // oracle side
    assert(sqlFlags(
      "SELECT ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 3) FROM t").nonEmpty,
      "sql walk must flag a rational ROUND")
    assert(sqlFlags(
      "SELECT ROUND(SQRT(x) / 3, 6), ROUND(x * 1e9, 0) FROM t").isEmpty,
      "sql walk must pass transcendental and scale-0 rounds")
  }

  test("registry-wide: no rational round(·, k>0) at any engine surface") {
    val dir = "/root/testdata/sf0.001"
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        planFlags(fn(spark, dir).queryExecution.optimizedPlan)
          .map(v => s"$name: $v")
    }
    assert(violations.isEmpty,
      s"rule-10 violations in engine plans:\n${violations.mkString("\n")}")
  }

  test("registry-wide: no rational ROUND(·, k>0) in any oracle SQL") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => sqlFlags(sql).map(v => s"$name: $v")
    }
    assert(violations.isEmpty,
      s"rule-10 violations in oracle SQL:\n${violations.mkString("\n")}")
  }
}
