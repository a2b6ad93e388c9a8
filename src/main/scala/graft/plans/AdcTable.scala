package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native per-query ADC lookup-table builder: value[s][j] = squared L2
  * distance between the query's subspace-s slice and codebook centroid
  * (s, j), computed in double, accumulated left-to-right — bit-identical
  * to the composed `array(array(aggregate(zip_with(slice(...)...))))`
  * form it replaces (ProductQuantization.adcTable; parity pinned in
  * PqEncodeSpec).
  *
  * Like [[PqEncode]]/[[LshBits]], the codebooks ride as a field: the
  * composed form embedded m x kCodes x (dim/m) literal nodes in the plan
  * (1,024 at the catalog's 8x16x8), and at |Q| ~ 10 query rows the
  * ANALYSIS of that tree — re-planned per probe entry — far outweighed
  * the arithmetic (r15 profile: the PQ probe entries spent ~1 s of
  * driver gap on ~0.3 s of jobs).
  *
  * Null/shape degrade matches the composed form: a subspace whose slice
  * is incomplete or carries a null slot yields NULL entries for that
  * subspace's whole row (zip_with pads null → aggregate nulls out); a
  * null embedding yields a null result (composed slice(null) nulls every
  * level); NaN slots propagate NaN distances.
  */
case class AdcTable(child: Expression, books: Array[Array[Array[Float]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_adc_table"

  @transient private lazy val flat: Array[Array[Double]] =
    books.map(book => book.flatten.map(_.toDouble))
  @transient private lazy val kPer: Array[Int] = books.map(_.length)
  private val d: Int = books(0)(0).length
  private val m: Int = books.length

  /** Shared by eval and codegen: the m x kCodes table of one row. */
  private[plans] def tableOf(emb: ArrayData): GenericArrayData = {
    val out = new Array[Any](m)
    if (emb == null) {
      var s = 0
      while (s < m) { out(s) = new GenericArrayData(new Array[Any](kPer(s))); s += 1 }
      return new GenericArrayData(out)
    }
    val n = emb.numElements()
    var s = 0
    while (s < m) {
      val k = kPer(s)
      val base = s * d
      var ok = base + d <= n
      if (ok) {
        var i = 0
        while (ok && i < d) { if (emb.isNullAt(base + i)) ok = false; i += 1 }
      }
      val row = new Array[Any](k)
      if (ok) {
        val book = flat(s)
        var j = 0
        while (j < k) {
          var dist = 0.0
          val off = j * d
          var i = 0
          while (i < d) {
            val diff = emb.getFloat(base + i).toDouble - book(off + i)
            dist += diff * diff
            i += 1
          }
          row(j) = dist
          j += 1
        }
      } // else: k null entries, as the composed form nulls the subspace
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    tableOf(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTable", this, classOf[AdcTable].getName)
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val resultCode =
      code"""
            |${childGen.code}
            |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            |  $ref.tableOf(${childGen.isNull} ? null : ${childGen.value});
          """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
