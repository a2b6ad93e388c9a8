package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Commit attribution for the versioned change feed (r13, VERDICT r12
  * #5): maps a scan row's `_metadata.file_path` to the manifest version
  * whose commit ADDED that file, via a broadcast path→version map built
  * from the manifest walk (driver-side, no data reads). Keeps a batched
  * multi-version insert scan in ONE pass — the alternative is one scan
  * per version. Codegen references the broadcast handle, the
  * [[DvDeleted]] discipline. A path absent from the map is a walk bug,
  * not data-dependent — it throws rather than mis-attribute.
  */
case class CommitVersionOf(child: Expression,
                           versions: Broadcast[Map[UTF8String, Long]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string file path, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_commit_version_of"

  override protected def nullSafeEval(file: Any): Any =
    CommitVersionOf.lookup(versions.value, file.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("commitVersions", versions,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, file =>
      s"""${ev.value} = graft.plans.CommitVersionOf.lookup(
         |  (scala.collection.immutable.Map) $bc.value(), $file);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CommitVersionOf {
  def lookup(m: Map[UTF8String, Long], file: UTF8String): Long =
    m.getOrElse(file, throw new IllegalStateException(
      s"file $file missing from the change feed's commit-version map — " +
        "attribution walk bug; refusing rather than mis-attribute"))
}
