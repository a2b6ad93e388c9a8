package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Divide, EqualTo, If, Literal, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: cosine(x, x) needs only ONE squared-norm accumulation —
  * for self-similarity, dot == |x|^2 bit-for-bit (identical accumulation
  * sequence), so the rewrite substitutes s = graft_norm_sq(x) and computes
  * `if (s == 0) null else s / (sqrt(s) * sqrt(s))`. This reproduces
  * CosineSimilarity's EXACT semantics for every input — finite (bitwise
  * equal result), zero norm (null), NaN elements (NaN), overflow to Inf
  * (NaN) — while replacing three accumulators with one; an optimizer rule
  * must never change observable results, only cost.
  */
object SelfCosineRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.deterministic && l.canonicalized == r.canonicalized =>
        val s = ArrayNormSq(l)
        If(EqualTo(s, Literal(0.0, DoubleType)),
          Literal(null, DoubleType),
          Divide(s, Multiply(Sqrt(s), Sqrt(s))))
    }
}
