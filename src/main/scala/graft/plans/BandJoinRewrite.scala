package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: plan NAIVELY-WRITTEN band joins scalably.
  *
  * A user who wants "rows of L paired with rows of R within δ" writes the
  * obvious thing — `l.join(r, abs(l("a") - r("b")) <= δ)` — and Catalyst,
  * seeing a join with no equality conjunct, plans a
  * BroadcastNestedLoopJoin: |L|·|R| predicate evaluations, the plan that
  * does not terminate at 100 TB. `ScaleOps.q81BandJoin` shows the manual
  * fix (δ-epoch quantization + ±1-epoch probe explode + equi-join + exact
  * post-filter); this rule teaches the OPTIMIZER that rewrite, so the
  * naive spelling gets the linear plan automatically:
  *
  * {{{ Join(L, R, |a−b| ≤ δ ∧ rest)
  *     ⇒ Project(L ++ R,
  *         Filter(|a−b| ≤ δ ∧ rest,
  *           Join(Explode(epochs(a)) ⋈ epoch(b)))) }}}
  *
  * Every matching pair meets in exactly one (probe-epoch, build-epoch)
  * combination — the probe's three replicas have distinct epoch values —
  * so the rewrite needs no dedup and is semantics-preserving row-for-row
  * (the original condition is re-applied in full as the post-filter; a
  * NULL operand kills the pair in both formulations).
  *
  * Fires only when it is the difference between linear and quadratic:
  * inner/cross joins whose condition has a `|a−b| ≤ δ` conjunct with one
  * side from each child (LongType, positive literal δ) and NO cross-side
  * equality conjunct — if an equality exists, Catalyst already hash-joins
  * on it and the band is a cheap post-filter. The helper epoch columns are
  * pruned by the final Project, and the rule cannot re-fire on its own
  * output (the rewritten join HAS an equality conjunct).
  *
  * Install per-application via `spark.sql.extensions=graft.GraftExtensions`
  * or per-session via [[BandJoinRewrite.install]].
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  /** Session-local installation (the extraOptimizations hook runs after
    * the main optimizer batches — join selection happens at physical
    * planning, so the rewrite still lands).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      val crossEquality = conjuncts.exists {
        case EqualTo(a, b) => straddles(a, b, left, right)
        case EqualNullSafe(a, b) => straddles(a, b, left, right)
        case _ => false
      }
      if (crossEquality) j
      else findBand(conjuncts, left, right) match {
        case Some((lExpr, rExpr, delta)) =>
          rewrite(j, left, right, lExpr, rExpr, delta, cond, hint)
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def straddles(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty)

  /** Find a `abs(x − y) ≤ δ` conjunct with x from one side, y from the
    * other, both LongType, δ a positive integral literal. Returns
    * (left-side expr, right-side expr, δ).
    */
  private def findBand(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, Long)] =
    conjuncts.collectFirst {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), DeltaLiteral(d))
          if sidesMatch(x, y, left, right).isDefined =>
        val (l, r) = sidesMatch(x, y, left, right).get
        (l, r, d)
      case GreaterThanOrEqual(DeltaLiteral(d), Abs(Subtract(x, y, _), _))
          if sidesMatch(x, y, left, right).isDefined =>
        val (l, r) = sidesMatch(x, y, left, right).get
        (l, r, d)
    }

  private object DeltaLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) if v > 0 => Some(v)
      case Literal(v: Int, _) if v > 0 => Some(v.toLong)
      case Cast(Literal(v: Int, _), LongType, _, _) if v > 0 => Some(v.toLong)
      case _ => None
    }
  }

  private def sidesMatch(x: Expression, y: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] =
    if (x.dataType != LongType || y.dataType != LongType) None
    else if (x.references.nonEmpty && y.references.nonEmpty &&
      x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet))
      Some((x, y))
    else if (x.references.nonEmpty && y.references.nonEmpty &&
      x.references.subsetOf(right.outputSet) && y.references.subsetOf(left.outputSet))
      Some((y, x))
    else None

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      lExpr: Expression, rExpr: Expression, delta: Long,
      origCond: Expression, hint: JoinHint): LogicalPlan = {
    val d = Literal(delta, LongType)
    val one = Literal(1L, LongType)
    // probe side: epoch base + explode to {e0−1, e0, e0+1}
    val e0 = Alias(IntegralDivide(lExpr, d), "graft_band_e0")()
    val lProj = Project(left.output :+ e0, left)
    val e0Ref = e0.toAttribute
    val arr = CreateArray(Seq(Subtract(e0Ref, one), e0Ref, Add(e0Ref, one)))
    val epochAttr = AttributeReference("graft_band_epoch", LongType,
      nullable = arr.dataType.asInstanceOf[ArrayType].containsNull)()
    val gen = Generate(Explode(arr), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(epochAttr), child = lProj)
    // build side: its own epoch
    val rEpoch = Alias(IntegralDivide(rExpr, d), "graft_band_epoch_r")()
    val rProj = Project(right.output :+ rEpoch, right)
    // equi-join on the epoch, then the ORIGINAL condition in full
    val newJoin = Join(gen, rProj, Inner,
      Some(EqualTo(epochAttr, rEpoch.toAttribute)), hint)
    val filtered = Filter(origCond, newJoin)
    Project(j.output, filtered)
  }
}
