package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL time travel on registered graft-manifest tables (r13):
  * `SELECT ... FROM t VERSION AS OF <n>` resolves to the exact committed
  * snapshot `n` — the same replay [[ManifestStore.readVersion]] serves
  * (that version's own schema and file list, deletion vectors applied).
  * Spark's analyzer refuses time travel on any v1 relation during
  * RESOLUTION, so this runs as a HINT-batch rule (before resolution) and
  * substitutes the travelled relation for exactly the session-catalog
  * tables whose provider is `graft-manifest`; everything else passes
  * through to Spark's own handling untouched.
  *
  * `TIMESTAMP AS OF <ts>` (r14, VERDICT r13 #3) resolves to the NEWEST
  * version committed at or before `ts`, by manifest mtime
  * ([[ManifestStore.versionAtOrBefore]] — see its clock-skew caveat:
  * mtimes are the store's write clock, not a transactional commit clock;
  * `history()` shows exactly what a timestamp lands on, and
  * version-precise replays should use `VERSION AS OF`). The timestamp
  * must be a foldable expression (a literal or literal cast) — it is
  * evaluated in the session time zone.
  */
class ManifestTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
      manifestRootOf(u) match {
        case None => tt
        case Some((root, alias)) =>
          val v = (ts, version) match {
            case (None, Some(vs)) =>
              try vs.toLong catch {
                case _: NumberFormatException => throw new IllegalArgumentException(
                  s"VERSION AS OF on a graft-manifest table must be a version " +
                    s"number, got '$vs'")
              }
            case (Some(tsExpr), _) =>
              val millis = evalTimestampMillis(tsExpr, root)
              ManifestStore.versionAtOrBefore(spark, root, millis).getOrElse(
                throw new java.util.NoSuchElementException(
                  s"TIMESTAMP AS OF $tsExpr predates the retained history " +
                    s"under $root — no committed version is at or before it " +
                    "(ManifestStore.history lists per-version commit times)"))
            case (None, None) => throw new IllegalArgumentException(
              s"time travel on $root needs VERSION AS OF <n> or " +
                "TIMESTAMP AS OF <ts>")
          }
          SubqueryAlias(alias,
            ManifestStore.readVersion(spark, root, v).queryExecution.analyzed)
      }
  }

  /** Evaluate a `TIMESTAMP AS OF` expression to epoch millis: it must be
    * foldable (this rule runs BEFORE resolution, so non-literal
    * expressions cannot be evaluated here — and a non-deterministic
    * timestamp would make the travelled version irreproducible anyway).
    */
  private def evalTimestampMillis(tsExpr: org.apache.spark.sql.catalyst.expressions.Expression,
                                  root: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.TimestampType
    require(tsExpr.resolved && tsExpr.foldable,
      s"TIMESTAMP AS OF on a graft-manifest table ($root) must be a literal " +
        s"timestamp — got $tsExpr (evaluated before resolution; bind " +
        "function results yourself)")
    val cast = Cast(tsExpr, TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone))
    val micros = cast.eval(null)
    require(micros != null,
      s"TIMESTAMP AS OF value $tsExpr does not parse as a timestamp")
    Math.floorDiv(micros.asInstanceOf[Long], 1000L)
  }

  /** The manifest root behind a bare/qualified SESSION-CATALOG table name
    * whose provider is graft-manifest; None for anything else (temp
    * views, other providers, other catalogs) — those keep Spark's own
    * semantics and errors.
    */
  private def manifestRootOf(u: UnresolvedRelation): Option[(String, String)] = {
    val ident = u.multipartIdentifier match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case _ => return None
    }
    val cat = spark.sessionState.catalog
    if (!cat.tableExists(ident)) return None
    val meta = try cat.getTableMetadata(ident)
    catch { case scala.util.control.NonFatal(_) => return None }
    if (!meta.provider.exists(_.equalsIgnoreCase("graft-manifest"))) return None
    meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri.map(_.toString))
      .map(_ -> ident.table)
  }
}
