package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExtractValue, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.{ManifestFileIndex, ManifestStore}

/** Planner-side deletion-vector application for graft-manifest FORMAT
  * reads (r13): a registered catalog table (or
  * `spark.read.format("graft-manifest")`) whose snapshot carries live
  * merge-on-read vectors used to REFUSE at `createRelation` — with the
  * extensions installed, this rule instead wraps the relation in the same
  * scan-side bitmap predicate the library read path uses
  * (`Filter(NOT graft_dv_deleted(_metadata.file_path,
  * _metadata.row_index), scan)`), so SQL SELECT over a table a SQL
  * DELETE/UPDATE/MERGE just touched reads exactly the live rows. Without
  * the extensions the format keeps its loud refusal — there is no session
  * state in which vectors silently fail to apply.
  *
  * Scope: ONLY relations whose [[ManifestFileIndex]] was minted by the
  * format/catalog path (`applyDvInPlanner = true`) with live vectors.
  * Library-internal slice scans manage vectors themselves — including the
  * change feed's POSITIVE use of a dv diff — and are never touched.
  * The wrapped relation is a fresh tagged copy, so re-analysis of a plan
  * that embeds an already-wrapped subtree cannot double-filter, and the
  * catalog's shared relation-cache instance is never mutated.
  */
class ManifestDvApplyRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import ManifestDvApplyRule._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case lr: LogicalRelation if needsDv(lr) =>
      val idx = lr.relation.asInstanceOf[HadoopFsRelation]
        .location.asInstanceOf[ManifestFileIndex]
      val dvE = idx.snapshot.files.filter(_.dv.exists(_.rows > 0))
      // materialize the metadata column in the relation's OUTPUT (this
      // rule runs after AddMetadataColumns, so it does that rule's work
      // itself) and project it away above the filter — upper operators
      // keep seeing exactly lr.output, under the original attribute ids
      val withMeta = lr.withMetadataColumns().asInstanceOf[LogicalRelation]
      withMeta.setTagValue(DvAppliedTag, ())
      val meta = withMeta.output.find(_.name == "_metadata").getOrElse(
        sys.error("file relation exposes no _metadata column — cannot apply " +
          "deletion vectors"))
      val filePath = ExtractValue(meta, Literal("file_path"), conf.resolver)
      val rowIndex = ExtractValue(meta, Literal("row_index"), conf.resolver)
      org.apache.spark.sql.catalyst.plans.logical.Project(lr.output,
        Filter(Not(DvDeleted(filePath, rowIndex,
          ManifestStore.dvBroadcastFor(spark, dvE))), withMeta))
  }

  private def needsDv(lr: LogicalRelation): Boolean =
    lr.getTagValue(DvAppliedTag).isEmpty && (lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case idx: ManifestFileIndex =>
          idx.applyDvInPlanner &&
            idx.snapshot.files.exists(_.dv.exists(_.rows > 0))
        case _ => false
      }
      case _ => false
    })
}

object ManifestDvApplyRule {

  private val DvAppliedTag = TreeNodeTag[Unit]("graft.manifest.dvApplied")

  // sessions whose analyzer carries this rule: the format's createRelation
  // consults it to decide "hand the planner a dv-carrying relation" vs the
  // extension-less loud refusal. Weak keys — sessions must stay GC-able.
  // Synchronized (advice r13): register runs during one session's analyzer
  // construction while enabledFor reads on every format read from any
  // other session/thread — a bare WeakHashMap would race (corruption, or
  // a missed registration surfacing as a spurious dv refusal).
  private val sessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  private[graft] def register(spark: SparkSession): Unit = {
    sessions.add(spark): Unit
  }

  /** Is the dv-apply rule installed in this session's analyzer? Forces the
    * analyzer's construction first (rule builders run there), so the
    * answer is never a not-yet-initialized false negative.
    */
  private[graft] def enabledFor(spark: SparkSession): Boolean = {
    spark.sessionState.analyzer // force: extension rule builders run here
    sessions.contains(spark)
  }
}
