package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native sign-bit LSH signature accumulator: `planes` is the
  * numPlanes x dim hyperplane matrix (fit-time constant, carried as a
  * field), value = Σ_p (dot(emb, planes[p]) >= 0 ? 1L << p : 0L).
  *
  * The composed form this replaces (Similarity.lshSignature's per-plane
  * `aggregate(zip_with(emb, <dim literal array>, ...))`) embeds
  * numPlanes x dim literal nodes in the plan — 4,096 at the catalog's
  * (64 planes, D=64) — and the ANALYSIS/optimization/codegen of that tree
  * dominated the whole query (profiled r15: e3_ann_lsh spent 1.1 s of its
  * 1.3 s wall in driver gaps with ~0.1 s of actual job time). This
  * expression is one plan node; arithmetic is bit-identical to the
  * composed form (per plane: left-to-right Σ emb[i].toDouble * w[i],
  * exactly the zip_with+aggregate accumulation order; bit set on
  * dot >= 0.0).
  *
  * Null/shape handling stays OUTSIDE (the caller's raise_error guard):
  * this expression assumes a non-null embedding of length >= dim and
  * reads exactly dim elements per plane; the caller guards first, exactly
  * as it guarded the composed form. A null element yields bit 0 for that
  * plane (null dot fails `>= 0`), matching the composed form's
  * when(dot >= 0, ...).otherwise(0).
  */
case class LshBits(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_lsh_bits"

  private val dim: Int = planes(0).length

  /** Shared by eval and codegen: the full signature of one row. */
  private[plans] def bitsOf(emb: ArrayData): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var dot = 0.0
      var ok = true
      var i = 0
      while (i < dim) {
        if (emb.isNullAt(i)) { ok = false; i = dim }
        else { dot += emb.getFloat(i).toDouble * w(i); i += 1 }
      }
      // null slot -> null dot -> the composed when(dot >= 0, ...) falls
      // to otherwise(0): bit stays clear. A NaN dot sets the bit: Spark's
      // SQL comparison orders NaN above every double, so the composed
      // `dot >= 0` is TRUE there (unlike Java's) — parity-pinned in
      // PqEncodeSpec's NaN row.
      if (ok && (dot >= 0.0 || java.lang.Double.isNaN(dot))) sig |= 1L << p
      p += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    bitsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBits", this, classOf[LshBits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bitsOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
