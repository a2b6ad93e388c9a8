package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Size, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count without the tokens: `size(graft_tokenize(x))` materializes an
  * array of UTF8Strings only to take its length; this expression counts
  * token boundaries in one char scan, skipping the token array and the
  * per-token UTF8String allocations. (It still pays the lowered-string
  * copy the tokenizer spec requires — "allocation-free" would need an
  * ASCII fast path over the raw UTF8String bytes; honest scope, r8.)
  * Returns INT to be a drop-in for `size(...)`.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  val info: ExpressionInfo = new ExpressionInfo(classOf[TokenCount].getName, "graft_token_count")

  /** Same scan as Tokenize.tokenize, counting transitions instead of
    * building tokens. Lowercasing first is REQUIRED for parity: some
    * non-ASCII uppercase chars lower into ASCII token chars (U+0130 -> "i" +
    * combining dot, Kelvin K -> k), so classification happens on the same
    * lowered string Tokenize scans.
    */
  def count(s: UTF8String): Int = {
    val str = s.toLowerCase.toString
    var n = 0
    var inTok = false
    var i = 0
    val len = str.length
    while (i < len) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (!inTok) { n += 1; inTok = true }
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        inTok = false
      } // removed chars neither extend nor break a token
      i += 1
    }
    n
  }
}

/** Optimizer rule: collapse `size(graft_tokenize(x))` to
  * `graft_token_count(x)` — the array is never needed when only its length
  * is consumed. Null semantics match except under legacySizeOfNull (where
  * size(null) is -1, not null), so the rewrite is skipped for nullable
  * input in legacy mode.
  */
object TokenCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(t: Tokenize, legacy) if !legacy || !t.child.nullable =>
      TokenCount(t.child)
  }
}
