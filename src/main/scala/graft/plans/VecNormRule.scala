package graft.plans

import org.apache.spark.sql.catalyst.expressions.Sqrt
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{VecDot, VecNorm}

/**
 * Optimizer rule: `sqrt(vec_dot(x, x))` → `vec_norm(x)`.
 *
 * A user scoring cosine similarity in SQL naturally writes the norm as
 * `SQRT(vec_dot(v, v))`; [[VecNorm]] computes the IDENTICAL arithmetic
 * (left-to-right `s += v(i)*v(i)` then `sqrt`) in ONE array traversal
 * instead of materializing the dot then applying sqrt — and, fused,
 * the expression stays a single codegen'd loop. The rewrite fires only
 * when both [[VecDot]] children are semantically the same expression,
 * so it is bit-exact by construction (same slots, same order, same
 * ops).
 *
 * Registered by GraftExtensions (`injectOptimizerRule`) at session
 * build, or appended to `spark.experimental.extraOptimizations` by
 * `GraftFunctions.register` on a live session — both public extension
 * points, no internals.
 */
object VecNormRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Sqrt(VecDot(a, b)) if a.semanticEquals(b) => VecNorm(a)
    }
}
