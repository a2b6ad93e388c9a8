package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native ADC (asymmetric distance computation) lookup-sum for the PQ /
  * IVF-PQ scan: `codes` is the corpus row's array<int> of m subspace code
  * indices, `table` the query's array<array<double>> of per-subspace
  * centroid distances — value = Σ_s table[s][codes[s]].
  *
  * The composed form (`aggregate(zip_with(codes, table, element_at...))`,
  * ProductQuantization.adcDistanceComposed) runs through interpreted
  * higher-order-function lambdas with a per-row array allocation — on the
  * ADC scan, which touches |Q| x corpus/nCells x nProbe rows, that
  * machinery IS the cost (measured: the fixture-scale probe lost to exact
  * brute force on constant factor alone). This expression is the m-lookup
  * loop emitted straight into whole-stage codegen. Semantics match the
  * composed form bit-for-bit on every input the encoder can produce
  * (doubles accumulated left-to-right; null when lengths differ — zip_with
  * pads with null there). The one divergence is deliberate: a CORRUPT code
  * outside its table row yields null here, where the composed form's
  * ANSI element_at throws and fails the whole scan — [[encode]] guarantees
  * codes in [0, kCodes), so the case is unreachable from this library and
  * a row-local null beats a job-killing exception when it isn't.
  */
case class AdcDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<double>>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != table.numElements()) return null
    var sum = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s) || table.isNullAt(s)) return null
      val row = table.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      sum += row.getDouble(c)
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val sum = ctx.freshName("sum")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      val bad = ctx.freshName("bad")
      s"""
         |final int $m = $a.numElements();
         |if ($m != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    if ($a.isNullAt($s) || $b.isNullAt($s)) { $bad = true; break; }
         |    final org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($s);
         |    final int $c = $a.getInt($s);
         |    if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) { $bad = true; break; }
         |    $sum += $row.getDouble($c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcDistance {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[AdcDistance].getName, "graft_adc_distance")
}
