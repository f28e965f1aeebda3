package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: plans a PURE range join (`p BETWEEN lo AND hi`, no
  * equi keys) as a bin-keyed HASH join instead of the
  * BroadcastNestedLoopJoin Spark falls back to — the transparent,
  * logical-plan form of [[graft.operators.RangeBinJoin.pointInInterval]]
  * (users write the natural theta join; the engine plans it scalably).
  *
  * Opt-in and explicit, like the published range-join hints in
  * Spark-family engines: fires only when
  * `spark.graft.rangeJoin.binWidth` is set (choosing a bin width in the
  * optimizer without data statistics is guesswork — the session owner
  * states it). Rewrite, for `points ⋈ intervals ON p ≥ lo AND p ≤ hi`:
  *
  *   Project(original output,
  *     Join(Project(points + __bin_pt = floor(p/w)),
  *          Generate(explode(sequence(floor(lo/w), floor(hi/w))) AS
  *                   __bin_iv,
  *                   Filter(hi ≥ lo, intervals)),
  *          Inner, __bin_pt = __bin_iv AND <original condition>))
  *
  * A (point, interval) pair shares exactly one bin — the point's — so
  * the rewrite emits no duplicates; the original condition rides along
  * as the exact residual, so the output is bit-identical to the theta
  * join (RangeSpec asserts it). The `hi ≥ lo` pre-filter drops inverted
  * intervals (they match nothing; an unguarded descending sequence()
  * would throw). NULL bounds yield a NULL sequence → Generate emits no
  * row, matching the theta join's three-valued logic. The rewritten
  * join carries an equality conjunct, so the rule cannot re-match its
  * own output (fixed-point safe).
  *
  * Strict `>` / `<` bounds are accepted too: inclusive bin covers are a
  * superset of the candidates, and the residual restores exactness.
  * Injected via [[graft.GraftExtensions]] (injectOptimizerRule — the
  * fourth extension surface next to functions, the planner strategy and
  * the check rule); tests attach it with
  * `spark.experimental.extraOptimizations`.
  */
object RangeBinJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Validated conf read (round-7 advice): a non-numeric value would
    * otherwise throw NumberFormatException inside the optimizer for
    * EVERY query, and w ≤ 0 builds divide-by-zero / descending Sequence
    * expressions that fail at execution — a bad session conf must not
    * break unrelated query planning. Invalid values log once per plan
    * and leave the rule inert. */
  private def width: Option[Double] =
    Option(SQLConf.get.getConfString("spark.graft.rangeJoin.binWidth", null))
      .flatMap { raw =>
        val parsed = scala.util.Try(raw.trim.toDouble).toOption
          .filter(w => w > 0 && !w.isNaN && !w.isInfinity)
        if (parsed.isEmpty) logWarning(
          s"ignoring invalid spark.graft.rangeJoin.binWidth='$raw' " +
            "(requires a finite number > 0); range-join rewrite is inert")
        parsed
      }

  /** (point expr, lo expr, hi expr, pointsOnLeft) when the condition is
    * a pure range join between the two sides. */
  private def rangePattern(cond: Expression, left: LogicalPlan,
                           right: LogicalPlan):
      Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    // an equi conjunct across the sides means Spark already has a hash
    // key — leave the join alone (also the fixed-point guard)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None
    // normalize every comparison to (smaller, larger)
    val bounds = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (b, a)
      case GreaterThan(a, b) => (b, a)
      case LessThanOrEqual(a, b) => (a, b)
      case LessThan(a, b) => (a, b)
    }
    // p ≥ lo: (lo, p); p ≤ hi: (p, hi) — find a p appearing as the upper
    // of one bound and the lower of another, with lo/hi on the other side
    val candidates = for {
      (lo, p1) <- bounds
      (p2, hi) <- bounds
      if p1.semanticEquals(p2)
      ps <- sideOf(p1)
      ls <- sideOf(lo)
      hs <- sideOf(hi)
      if ls != ps && hs != ps && ls == hs
    } yield (p1, lo, hi, ps)
    candidates.headOption
  }

  /** Session timezone for the hand-built Cast/Sequence nodes: this rule
    * runs AFTER analysis, so ResolveTimeZone will not visit them — an
    * unset timeZoneId would leave the plan unresolved. */
  private def tz: Option[String] = Some(SQLConf.get.sessionLocalTimeZone)

  private def floorDiv(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType, tz), Literal(w, DoubleType)))

  def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rangePattern(cond, left, right) match {
          case Some((p, lo, hi, pointsOnLeft)) =>
            val (ptPlan, ivPlan) = if (pointsOnLeft) (left, right) else (right, left)
            val ivValid = Filter(GreaterThanOrEqual(
              Cast(hi, DoubleType, tz), Cast(lo, DoubleType, tz)), ivPlan)
            val binIv = AttributeReference("__bin_iv", LongType)()
            val gen = Generate(
              Explode(Sequence(floorDiv(lo, w), floorDiv(hi, w),
                Some(Literal(1L, LongType)), tz)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binIv), child = ivValid)
            val binPt = Alias(floorDiv(p, w), "__bin_pt")()
            val ptProj = Project(ptPlan.output :+ binPt, ptPlan)
            val newJoin = Join(ptProj, gen, Inner,
              Some(And(EqualTo(binPt.toAttribute, binIv), cond)), hint)
            Project(j.output, newJoin)
          case None => j
        }
    }
  }
}
