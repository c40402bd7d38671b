package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule that rewrites a naive point-in-interval join into the
  * banded equi-join of [[graft.operators.Joins.rangeJoin]] — AUTOMATICALLY.
  *
  * A join whose only cross-side condition is `lo <= point AND point <= hi`
  * has no equi keys, so Spark plans a BroadcastNestedLoopJoin:
  * O(points × intervals) comparisons and an unbounded broadcast — the
  * plan a user gets from the obvious
  * `points.join(intervals, p >= lo && p <= hi)`. This rule intercepts
  * that logical shape and re-expresses it with band arithmetic:
  *
  *   points   + `_band = point div W`
  *   intervals + explode(sequence(lo div W, hi div W)) as `_band`
  *   join on `_band` equality AND the original range condition
  *
  * Each match meets in exactly one band (the point's), so the rewrite is
  * EXACTLY the original join — verified by the same oracle as the
  * explicit operator. After the rewrite the planner sees an equi key and
  * picks a hash/sort-merge join; the nested loop never exists.
  *
  * This is the (c)-tier Catalyst extension of SURVEY §7.3 — a
  * `Rule[LogicalPlan]` registered via `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]) or `spark.experimental.extraOptimizations`
  * — used exactly where built-in operators can't express the semantics:
  * the USER wrote the nested-loop shape; only the optimizer can rewrite
  * every occurrence without the user knowing the banded form exists.
  *
  * Band width comes from `spark.graft.rangeJoin.bandWidth` (default 1024;
  * near the typical interval length is ideal — replication is
  * len/W + 1 per interval). Fires only on INNER joins whose condition is
  * exactly the two range conjuncts (plus optional extra conjuncts that
  * stay as residual filters), with NO cross-side equi conjunct (those
  * joins are already hash-joinable) and integral point/bound types.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BAND_WIDTH_KEY = "spark.graft.rangeJoin.bandWidth"

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, lo, hi) when the conjuncts contain a lower and an upper bound
    * on the SAME point expression from `pointSide`, with bounds from
    * `boundSide`. */
  private def extractRange(
      conjuncts: Seq[Expression],
      pointSide: LogicalPlan,
      boundSide: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def fromPoint(e: Expression) =
      e.references.subsetOf(pointSide.outputSet) && integral(e) && e.deterministic
    def fromBound(e: Expression) =
      e.references.subsetOf(boundSide.outputSet) && integral(e) && e.deterministic
    // strict bounds band identically: the lo..hi band cover is a superset
    // of the strict interval's, and the original conjunct stays in the
    // join condition as the exact residual
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(p, lo) if fromPoint(p) && fromBound(lo) => (p, lo)
      case LessThanOrEqual(lo, p) if fromPoint(p) && fromBound(lo) => (p, lo)
      case GreaterThan(p, lo) if fromPoint(p) && fromBound(lo) => (p, lo)
      case LessThan(lo, p) if fromPoint(p) && fromBound(lo) => (p, lo)
    }
    val upper = conjuncts.collectFirst {
      case LessThanOrEqual(p, hi) if fromPoint(p) && fromBound(hi) => (p, hi)
      case GreaterThanOrEqual(hi, p) if fromPoint(p) && fromBound(hi) => (p, hi)
      case LessThan(p, hi) if fromPoint(p) && fromBound(hi) => (p, hi)
      case GreaterThan(hi, p) if fromPoint(p) && fromBound(hi) => (p, hi)
    }
    (lower, upper) match {
      case (Some((p1, lo)), Some((p2, hi))) if p1.semanticEquals(p2) =>
        Some((p1, lo, hi))
      case _ => None
    }
  }

  private def hasCrossEquiKey(
      conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !hasCrossEquiKey(
          splitConjunctivePredicates(cond), left, right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // validate eagerly: width 0 would make every IntegralDivide null
      // under non-ANSI mode and the rewritten join silently EMPTY; a
      // non-numeric string would otherwise surface as a bare
      // NumberFormatException from inside the optimizer
      val wRaw = conf.getConfString(BAND_WIDTH_KEY, "1024")
      val wVal = try wRaw.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$BAND_WIDTH_KEY must be a positive long, got '$wRaw'")
      }
      require(wVal > 0, s"$BAND_WIDTH_KEY must be positive, got $wVal")
      val w = Literal(wVal)
      // points left / intervals right, then the mirrored orientation
      val oriented =
        extractRange(conjuncts, left, right).map(t => (left, right, t, false))
          .orElse(extractRange(conjuncts, right, left)
            .map(t => (right, left, t, true)))
      oriented match {
        case Some((pts, iv, (point, lo, hi), mirrored)) =>
          val pBand = Alias(IntegralDivide(asLong(point), w), "_graft_band_p")()
          val ptsBanded = Project(pts.output :+ pBand, pts)
          // Sequence is TimeZoneAware: built outside the analyzer, it must
          // carry the session zone explicitly or it stays unresolved
          val seq = Sequence(
            IntegralDivide(asLong(lo), w), IntegralDivide(asLong(hi), w), None)
            .withTimeZone(conf.sessionLocalTimeZone)
          val explode = Explode(seq)
          val bandAttr = AttributeReference("_graft_band_i", LongType,
            nullable = explode.elementSchema.head.nullable)()
          // drop empty intervals before exploding: sequence(a, b) with
          // a > b generates DESCENDING bands the residual then discards
          val ivNonEmpty = Filter(LessThanOrEqual(asLong(lo), asLong(hi)), iv)
          val ivBanded = Generate(explode, unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(bandAttr), child = ivNonEmpty)
          val bandEq = EqualTo(pBand.toAttribute, bandAttr)
          // in the mirrored orientation the children swap sides, so the
          // per-side hints must swap with them — or a broadcast hint on
          // the small intervals table would broadcast the points table
          val orientedHint =
            if (mirrored) hint.copy(leftHint = hint.rightHint,
              rightHint = hint.leftHint)
            else hint
          val rewritten = Join(ptsBanded, ivBanded, Inner,
            Some(conjuncts.foldLeft[Expression](bandEq)(And(_, _))), orientedHint)
          // restore the original output (schema AND attribute order)
          Project(j.output, rewritten)
        case None => j
      }
  }
}
