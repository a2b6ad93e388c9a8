package graft.plans

import org.apache.spark.sql.catalyst.expressions.{GreaterThan, If, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: cosine(x, x) == 1 whenever x has positive norm, and null
  * otherwise (matching CosineSimilarity's zero-norm/null semantics) — so a
  * self-similarity collapses from dot+two norms to one squared-norm pass.
  * Algebraic rewrites like this are exactly what Rule[LogicalPlan]
  * injection is for: callers write the natural expression, the optimizer
  * removes the redundancy everywhere it appears.
  */
object SelfCosineRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.deterministic && l.canonicalized == r.canonicalized =>
        If(GreaterThan(ArrayNormSq(l), Literal(0.0, DoubleType)),
          Literal(1.0, DoubleType), Literal(null, DoubleType))
    }
}
