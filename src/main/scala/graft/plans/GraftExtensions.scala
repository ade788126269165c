package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: fold `pow(sqrt(x), 2)` → `x` (guarded for
  * x < 0 → NaN, matching the original's sqrt-of-negative behavior).
  *
  * This is the algebraic waste the reference commits in its assignment
  * hot loop — `pow(getDistance(p, c), 2)` re-squares an already-sqrt'd
  * distance (mapper.py:42, distance at mapper.py:19-27; same shape at
  * master.py:329). Our own kernels never produce the pattern (they
  * compare squared distances directly, SURVEY §4), but user-authored
  * queries can; the rule removes both transcendental calls.
  *
  * Note: for x ≥ 0 the fold IMPROVES precision (the sqrt→square round
  * trip loses ulps), so it is not applied under oracle-checked queries —
  * it ships as an opt-in via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
  * `spark.experimental.extraOptimizations`.
  */
object FoldSquaredSqrt extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // Only fold deterministic children: `child` appears twice in the
    // rewrite, so a nondeterministic one would be evaluated twice with
    // different values. NULL guard first: If's else-branch fires when the
    // predicate is null, which would turn NULL into NaN without it.
    case Pow(Sqrt(child), Literal(2.0, DoubleType)) if child.deterministic =>
      If(IsNull(child), Literal(null, DoubleType),
        If(GreaterThanOrEqual(child, Literal(0.0, DoubleType)),
          child, Literal(Double.NaN, DoubleType)))
  }
}

/** Catalyst optimizer rule: strength-reduce `pow(x, 2.0)` → `x * x`.
  *
  * The reference squares distances with `pow(d, 2)` (mapper.py:42,
  * master.py:329); `java.lang.Math.pow` is a transcendental call (~20×
  * a multiply) while `x*x` is one instruction — and for the exponent 2
  * the results are bit-identical (pow(x,2) is exact for doubles), so
  * unlike FoldSquaredSqrt this rewrite is value-preserving on EVERY
  * input including NULL/NaN/±Inf. Only deterministic children are
  * folded: `x` appears twice after the rewrite.
  */
object FoldPowTwo extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Pow(child, Literal(2.0, DoubleType)) if child.deterministic =>
      Multiply(child, child)
  }
}

/** Session-extension entry point: register with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FoldSquaredSqrt)
    e.injectOptimizerRule(_ => FoldPowTwo)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
