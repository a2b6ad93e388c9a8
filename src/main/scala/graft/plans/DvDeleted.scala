package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.DvBitmap

/** Deletion-vector predicate (r12): true iff `(file, pos)` — the scan's
  * `_metadata.file_path` / `_metadata.row_index` — is a DELETED row of a
  * merge-on-read manifest table. The broadcast maps each dv-carrying data
  * file's path to its compressed [[graft.sources.DvBitmap]]; a scan
  * filtered on `!DvDeleted(...)` applies vectors with ZERO extra
  * exchanges and stays inside whole-stage codegen — the replacement for
  * the r11 `(fkey, pos)` anti-join, which silently degraded to a full
  * shuffle of the data scan once accumulated deletes outgrew the
  * broadcast-join threshold (VERDICT r11 #1). Codegen references the
  * BROADCAST handle, not the map, so tasks ship bytes proportional to the
  * plan, never to the deletes.
  */
case class DvDeleted(left: Expression, right: Expression,
                     bitmaps: Broadcast[Map[UTF8String, DvBitmap]])
  extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string file, long pos), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_dv_deleted"

  override protected def nullSafeEval(file: Any, pos: Any): Any =
    DvBitmap.deleted(bitmaps.value, file.asInstanceOf[UTF8String],
      pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("dvBitmaps", bitmaps,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (file, pos) =>
      s"""${ev.value} = graft.sources.DvBitmap.deleted(
         |  (scala.collection.immutable.Map) $bc.value(), $file, $pos);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
