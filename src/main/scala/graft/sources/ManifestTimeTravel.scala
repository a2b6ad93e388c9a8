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
  * `TIMESTAMP AS OF` is refused with the recipe: the manifest records no
  * commit timestamps (file mtimes are not a stable clock across
  * stores/rewrites), and guessing one would silently travel to the wrong
  * version — name the version (`ManifestStore.snapshotAt` enumerates
  * them).
  */
class ManifestTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
      manifestRootOf(u) match {
        case None => tt
        case Some((root, alias)) =>
          require(ts.isEmpty && version.isDefined,
            s"TIMESTAMP AS OF is not supported on a graft-manifest table " +
              s"($root) — the manifest records versions, not commit " +
              "timestamps; use VERSION AS OF <n> " +
              "(ManifestStore.snapshotAt enumerates committed versions)")
          val v = try version.get.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"VERSION AS OF on a graft-manifest table must be a version " +
                s"number, got '${version.get}'")
          }
          SubqueryAlias(alias,
            ManifestStore.readVersion(spark, root, v).queryExecution.analyzed)
      }
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
