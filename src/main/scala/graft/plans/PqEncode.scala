package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native PQ encoder: `emb` is an array<float> embedding, `books` the m x
  * kCodes x d residual codebooks (carried as a literal field, not a child —
  * they are fit-time constants). Value = array<int> of length m, element s
  * = index of the nearest subspace-s centroid under squared L2 in double
  * precision, ties to the LOWEST index.
  *
  * The composed form this replaces (ProductQuantization.encode: per
  * centroid an `aggregate(zip_with(slice(emb), centroid, ...))`) expands to
  * m x kCodes interpreted higher-order-function chains — 128 lambda
  * evaluations plus as many array allocations per ROW at the catalog's
  * (m=8, k=16). Profiled at sf0.1 this round: the codes write of the
  * IVF-PQ build spent 3.2 s in ONE task evaluating that tree over 2,000
  * rows (~1.6 ms/row of pure expression machinery). This expression is the
  * same arithmetic as one fused loop inside whole-stage codegen.
  *
  * Semantics match the composed form on every input the index paths can
  * produce:
  *  - accumulation is (emb[i] - center[i])^2 summed left-to-right in
  *    DOUBLE (the composed form casts each slice element to double against
  *    the double centroid literal);
  *  - the argmin is first-min (array_position returns the FIRST match);
  *    NaN distances rank greatest, matching Spark's double ordering in
  *    array_min;
  *  - a subspace whose slice is incomplete (embedding shorter than
  *    (s+1) x d) or carries a null slot yields a NULL code for that
  *    subspace, exactly as the composed zip_with/aggregate chain nulls
  *    out — the degrade-don't-crash contract OperatorsSpec pins;
  *  - a NULL embedding yields an array of m null codes (the composed
  *    form's array(...) constructor is never null — its elements are),
  *    so the expression itself is never null.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_encode"

  // flattened [m][k*d] double copy: one contiguous read pattern per subspace
  @transient private lazy val flat: Array[Array[Double]] =
    books.map(book => book.flatten.map(_.toDouble))
  @transient private lazy val kPer: Array[Int] = books.map(_.length)
  private val d: Int = books(0)(0).length
  private val m: Int = books.length

  /** Shared by eval and codegen (via reference object): encode one row.
    * A null embedding yields m null codes (see class doc).
    */
  private[plans] def encodeRow(emb: ArrayData): GenericArrayData = {
    val out = new Array[Any](m)
    if (emb == null) return new GenericArrayData(out)
    val n = emb.numElements()
    var s = 0
    while (s < m) {
      val base = s * d
      var ok = base + d <= n
      if (ok) {
        var i = 0
        while (ok && i < d) { if (emb.isNullAt(base + i)) ok = false; i += 1 }
      }
      if (ok) {
        val book = flat(s)
        val k = kPer(s)
        var best = 0
        var bestD = Double.NaN // NaN sentinel: any real distance replaces it
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
          // first-min with NaN-greatest (Spark double ordering):
          // j replaces best only when strictly smaller under that order
          if (j == 0 || java.lang.Double.compare(dist, bestD) < 0) {
            bestD = dist; best = j
          }
          j += 1
        }
        out(s) = best
      } // else: null code for this subspace
      s += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    encodeRow(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the loop body is identical either way; route codegen through the
    // expression instance so eval and codegen cannot drift. Not
    // defineCodeGen: that null-propagates a null child, while this
    // expression maps a null embedding to m null codes and is itself
    // never null.
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val resultCode =
      code"""
            |${childGen.code}
            |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            |  $ref.encodeRow(${childGen.isNull} ? null : ${childGen.value});
          """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqEncode].getName, "graft_pq_encode")
}
