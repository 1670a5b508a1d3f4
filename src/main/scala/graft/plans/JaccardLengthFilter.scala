package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaccardSorted

/** Catalyst optimizer rule: plant the set-similarity LENGTH FILTER in
  * front of exact-Jaccard predicates.
  *
  * For sorted-distinct sets, `J(a,b) = |a∩b| / |a∪b| ≤ min(|a|,|b|) /
  * max(|a|,|b|)`, so `J(a,b) ≥ t` implies `|a| ≥ t·|b| AND |b| ≥ t·|a|`
  * (the length filter of the similarity-join literature — Chaudhuri et
  * al., "A Primitive Operator for Similarity Joins", ICDE 2006; PPJoin's
  * first pruning tier). `size()` on Spark arrays is O(1) metadata, while
  * `jaccard_sorted` walks both arrays — on an all-pairs verification the
  * guard short-circuits the merge for every length-mismatched pair, and
  * conjunct-level codegen evaluates it first.
  *
  * The rewrite is `jaccard_sorted(a, b) >= t` (t foldable, both sides
  * attributes) → `size(a) >= t*size(b) AND size(b) >= t*size(a) AND
  * <original>`. Null semantics are preserved: a null array makes both
  * the guard and the original predicate null, and `Filter`/join
  * conditions treat null as false either way. Restricting the operands
  * to attributes means the guard never duplicates non-trivial compute
  * (CSE inside whole-stage codegen would usually absorb it, but there is
  * no reason to lean on that).
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) — the rule joins the operator-optimization
  * fixpoint, so it must be (and is) idempotent: a predicate whose
  * conjunction already carries its guard is left untouched.
  */
object JaccardLengthFilter extends Rule[LogicalPlan] with PredicateHelper {

  private def dSize(e: Expression): Expression =
    Cast(Size(e), DoubleType)

  private def guard(jac: JaccardSorted, t: Expression): (Expression, Expression) = {
    val td = Cast(t, DoubleType)
    (GreaterThanOrEqual(dSize(jac.left), Multiply(td, dSize(jac.right))),
      GreaterThanOrEqual(dSize(jac.right), Multiply(td, dSize(jac.left))))
  }

  private def cheap(e: Expression): Boolean = e match {
    case _: Attribute => true
    case Alias(c, _) => cheap(c)
    case _ => false
  }

  private def rewrite(cond: Expression): Expression = {
    val present = splitConjunctivePredicates(cond)
    cond.transformUp {
      case gte @ GreaterThanOrEqual(jac: JaccardSorted, t)
          if t.foldable && cheap(jac.left) && cheap(jac.right) =>
        val (ga, gb) = guard(jac, t)
        if (present.exists(_.semanticEquals(ga))) gte
        else And(And(ga, gb), gte)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val c = rewrite(cond)
      if (c.fastEquals(cond)) f else f.copy(condition = c)
    case j @ Join(_, _, _, Some(cond), _) =>
      val c = rewrite(cond)
      if (c.fastEquals(cond)) j else j.copy(condition = Some(c))
  }
}
