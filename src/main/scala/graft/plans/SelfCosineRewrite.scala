package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** cosine(x, x) in ONE accumulation: for self-similarity the three fused
  * accumulators of [[CosineSimilarity]] are the identical sequence
  * (dot == na == nb bit-for-bit), so a single squared-norm pass suffices
  * and the result is `s / (sqrt(s) * sqrt(s))` — kept in that exact form
  * (never folded to 1.0) so NaN/Inf inputs flow through the same floating
  * ops as the generic path. Null element, zero norm → null, matching
  * [[CosineSimilarity]]'s (r8-fixed) semantics.
  *
  * Produced only by [[SelfCosineRewrite]]; not registered as a SQL
  * function. This replaced an earlier If/Divide/Sqrt tree over
  * `graft_norm_sq`: that tree referenced the norm FOUR times and Spark's
  * subexpression elimination cannot dedupe across an If whose branches
  * share nothing, so the "optimization" evaluated four array scans where
  * the unrewritten fused loop did one (review r8). An optimizer rule must
  * never change observable results, only cost — and the cost must
  * actually go DOWN.
  */
case class SelfCosine(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_self_cosine"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble; s += v * v; i += 1
    }
    // null, not NaN, for EVERY non-finite path — including Inf elements,
    // where the norm is +Inf (not NaN) but the quotient Inf/Inf is NaN:
    // the rewrite must not reintroduce the rank-#1 corrupt row the
    // two-sided expression guards against (review r9, second pass)
    if (s == 0.0 || s.isNaN) null
    else {
      val r = s / (math.sqrt(s) * math.sqrt(s))
      if (r.isNaN) null else r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) {
         |  if ($s == 0.0 || java.lang.Double.isNaN($s)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $s / (java.lang.Math.sqrt($s) * java.lang.Math.sqrt($s));
         |    if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: cosine(x, x) needs only ONE squared-norm accumulation —
  * substitute the single-pass [[SelfCosine]] for the two-sided fused loop.
  * Exact semantics preserved for every input — finite (bitwise-equal
  * result: the self-dot and both self-norms are the identical accumulation
  * sequence), zero norm (null), null element (null), NaN/Inf (same
  * floating ops, same propagation).
  */
object SelfCosineRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if l.deterministic && l.canonicalized == r.canonicalized =>
        SelfCosine(l)
    }
}
