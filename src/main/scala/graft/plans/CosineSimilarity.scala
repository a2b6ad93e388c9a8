package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two ArrayType(FloatType) columns.
  *
  * The composed form (zip_with + aggregate, VectorFunctions.cosine) walks
  * the arrays three times through generic higher-order-function machinery;
  * this expression is a single fused primitive loop emitted directly into
  * whole-stage codegen — the shape the E3 hot path wants when reranking
  * billions of candidate pairs. Semantics match VectorFunctions.cosine
  * bit-for-bit on finite inputs: products/accumulation in double,
  * left-to-right, null when either vector has zero norm, lengths differ,
  * or ANY element is null (the composed form propagates element nulls to
  * a null result; reading a null slot as 0.0 would return a confidently
  * wrong similarity — review r8).
  * A NaN RESULT (non-finite elements upstream) is returned as null
  * rather than propagated (review r9): Spark sorts NaN above every
  * double, so a single corrupt embedding would otherwise rank #1 in
  * every descending top-k window — null sorts last under desc and the
  * row falls out. The composed form's `when(norm > 0)` guard nulls the
  * same inputs (NaN norm fails the comparison), so parity holds there
  * too; the check is one isNaN on the final double, not per element.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else {
      val r = dot / (math.sqrt(na) * math.sqrt(nb))
      // a NaN similarity (non-finite element upstream) would rank FIRST
      // under a descending sort — Spark orders NaN above every double —
      // promoting the corrupt row into every top-k (review r9); null
      // sorts last under desc and falls out of the window instead
      if (r.isNaN) null else r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    final double $x = (double) $a.getFloat($i);
         |    final double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($anyNull || $na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |    if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "graft_cosine")
}
