package graft.sources

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.graftshim.DatasetShim

/** The SQL write idiom of a manifest table (r12, VERDICT r11 #5):
  * `INSERT INTO <registered graft-manifest table> ...` lands as ONE
  * committed manifest version through the normal [[ManifestStore.append]]
  * commit protocol — create-exclusive claim, rebase on a lost race, stats
  * harvested, `_latest` hint. Without this rewrite, Spark plans an
  * [[InsertIntoHadoopFsRelationCommand]] for any `HadoopFsRelation`-backed
  * table, which would write bare parquet under the table root that NO
  * manifest references — invisible to every reader and outside the commit
  * protocol. The rewrite intercepts exactly the commands whose file index
  * is a [[ManifestFileIndex]] (postHoc-resolution rule, installed by
  * [[graft.plans.GraftExtensions]]; sessions without the extensions
  * should write through the library API or
  * `df.write.format("graft-manifest").mode("append")`, which needs no
  * extensions).
  *
  * `INSERT OVERWRITE` is refused with the recipe — truncate-and-swap is a
  * DIFFERENT protocol step (a rewrite commit) with isolation decisions
  * the caller must make explicitly; static `PARTITION (col=...)` clauses
  * and `IF NOT EXISTS` are refused likewise (hive-ism the manifest
  * contract does not model).
  */
object ManifestInsertRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case i: InsertIntoHadoopFsRelationCommand
        if i.fileIndex.exists(_.isInstanceOf[ManifestFileIndex]) =>
      require(i.mode == SaveMode.Append || i.mode == SaveMode.Overwrite,
        s"mode(${i.mode}) is not supported on a graft-manifest table " +
          s"(${i.outputPath}) — use INSERT INTO / INSERT OVERWRITE, or the " +
          "library API")
      require(i.staticPartitions.isEmpty && !i.ifPartitionNotExists,
        s"static PARTITION clauses are not supported on a graft-manifest " +
          s"table (${i.outputPath}) — write the partition column as data " +
          "(dynamic partitioning); the manifest records each file's values")
      // the relation's partitionSchema is authoritative once the table has
      // commits; a column-list CREATE's pre-first-insert relation carries
      // none (the v1 provider seam loses PARTITIONED BY), so the FIRST
      // insert falls back to the catalog's declared partitioning (r14)
      val partCols =
        if (i.partitionColumns.nonEmpty) i.partitionColumns.map(_.name)
        else i.catalogTable.map(_.partitionColumnNames).getOrElse(Seq.empty)
      // INSERT OVERWRITE (r15) = DYNAMIC partition overwrite: exactly the
      // partitions present in the incoming rows are replaced, atomically —
      // one commit, never Spark's delete-then-write (which would leave a
      // reader-visible gap and writes no manifest). Unpartitioned tables
      // refuse inside the command with the replaceWhere recipe.
      ManifestInsertCommand(
        i.fileIndex.get.asInstanceOf[ManifestFileIndex].root.toString,
        partCols,
        i.query, i.outputColumnNames,
        i.catalogTable.map(_.identifier),
        overwrite = i.mode == SaveMode.Overwrite)

    // CTAS with PARTITIONED BY: Spark's v1 CreateDataSourceTableAsSelect
    // hands a CreatableRelationProvider only (mode, options, data) — the
    // declared partitioning stays on the CatalogTable and never reaches
    // the provider. Thread it through the one channel the provider DOES
    // see: the same options key DataFrameWriter.partitionBy uses (r14).
    case c: org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand
        if c.table.provider.exists(_.equalsIgnoreCase("graft-manifest")) &&
          c.table.partitionColumnNames.nonEmpty &&
          !c.table.storage.properties.contains(
            org.apache.spark.sql.execution.datasources.DataSourceUtils.PARTITIONING_COLUMNS_KEY) =>
      val key = org.apache.spark.sql.execution.datasources.DataSourceUtils.PARTITIONING_COLUMNS_KEY
      val encoded = org.apache.spark.sql.execution.datasources.DataSourceUtils
        .encodePartitioningColumns(c.table.partitionColumnNames)
      c.copy(table = c.table.copy(storage = c.table.storage.copy(
        properties = c.table.storage.properties + (key -> encoded))))

    // ALTER TABLE ... ADD COLUMNS on a registered graft-manifest table
    // (r14): Spark's v1 command only updates the CATALOG, which would
    // desynchronize it from the manifest (the schema's owner) — reads
    // verify the two agree and would refuse afterwards. Route it through
    // a schema-widening manifest commit + the catalog update together.
    // Non-manifest providers keep Spark's own command untouched.
    case a: org.apache.spark.sql.execution.command.AlterTableAddColumnsCommand
        if {
          val cat = org.apache.spark.sql.SparkSession.active.sessionState.catalog
          cat.tableExists(a.table) &&
            (try cat.getTableMetadata(a.table).provider
              .exists(_.equalsIgnoreCase("graft-manifest"))
            catch { case scala.util.control.NonFatal(_) => false })
        } =>
      ManifestAddColumnsCommand(a.table, a.colsToAdd)

    case other => other
  }
}

/** One `ALTER TABLE ... ADD COLUMNS` = one schema-widening manifest commit
  * ([[ManifestStore.addColumns]] — nullable only, old files null-fill) plus
  * the catalog schema update, kept in ONE command so the two owners of the
  * schema cannot desynchronize.
  */
final case class ManifestAddColumnsCommand(
    table: org.apache.spark.sql.catalyst.TableIdentifier,
    colsToAdd: Seq[org.apache.spark.sql.types.StructField])
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalog
    val meta = cat.getTableMetadata(table)
    val root = meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri.map(_.toString)).getOrElse(
        throw new IllegalArgumentException(s"$table records no path"))
    ManifestStore.addColumns(spark, root, colsToAdd)
    val newFull = org.apache.spark.sql.types.StructType(
      meta.schema.fields.filterNot(f =>
        meta.partitionColumnNames.contains(f.name)) ++
        colsToAdd ++ meta.partitionSchema.fields)
    cat.alterTable(meta.copy(schema = newFull))
    cat.refreshTable(table)
    Seq.empty
  }
}

/** SQL row-level DML on registered graft-manifest tables (r13, VERDICT
  * r12 #3): `DELETE FROM`, `UPDATE` and the canonical `MERGE INTO` land as
  * ONE merge-on-read manifest commit each, through the same library paths
  * as [[ManifestStore.deleteWhereMergeOnRead]] /
  * [[ManifestStore.upsertByKeyMergeOnRead]] — deletion vectors + an
  * update/insert batch, data files byte-identical, the change feed sees
  * the exact row-level changes. Installed postHoc by
  * [[graft.plans.GraftExtensions]]; without it Spark's planner refuses
  * these statements on any v1 table, so there is no silent-fallback risk.
  *
  * Scope, stated where the cause is nameable:
  *  - conditions must be deterministic and subquery-free (rewrite the
  *    subquery as a MERGE source or use the library API);
  *  - MERGE supports the canonical upsert shape — an equality join on
  *    same-named key columns, `WHEN MATCHED THEN UPDATE SET *` (or the
  *    explicit per-column equivalent), `WHEN NOT MATCHED THEN INSERT *`
  *    with the SAME assignments. Clause conditions, DELETE actions,
  *    `NOT MATCHED BY SOURCE` and schema evolution are refused with the
  *    recipe (the library API expresses the rest).
  *
  * File pruning: each conjunct of the condition that translates to the
  * public `sources.Filter` ADT prunes the candidate file list (stats +
  * partition values); untranslatable conjuncts only widen the candidate
  * set — the FULL condition is always applied exactly as a Column.
  */
object ManifestDmlRewrite extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.catalyst.expressions._

  /** The manifest root + catalog identity behind a DML target, unwrapping
    * aliases. None when the target is not a graft-manifest table (the
    * rule must not touch other formats' DML).
    */
  private def manifestTarget(plan: LogicalPlan)
      : Option[(String, Option[org.apache.spark.sql.catalyst.TableIdentifier])] =
    plan match {
      case SubqueryAlias(_, child) => manifestTarget(child)
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if fs.location.isInstanceOf[ManifestFileIndex] =>
            Some((fs.location.asInstanceOf[ManifestFileIndex].root.toString,
              lr.catalogTable.map(_.identifier)))
          case _ => None
        }
      case _ => None
    }

  private def requireExpressible(cond: Expression, stmt: String): Unit = {
    require(cond.deterministic,
      s"$stmt on a graft-manifest table needs a deterministic condition — " +
        s"got $cond")
    require(!cond.exists(_.isInstanceOf[PlanExpression[_]]),
      s"$stmt on a graft-manifest table does not support subqueries in the " +
        "condition — express it as MERGE INTO with the subquery as the " +
        "source, or use the library API")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(t, cond) if cond.resolved && manifestTarget(t).isDefined =>
      val (root, ident) = manifestTarget(t).get
      requireExpressible(cond, "DELETE")
      ManifestDeleteCommand(root, cond, ident)

    case UpdateTable(t, assignments, condOpt)
        if manifestTarget(t).isDefined && condOpt.forall(_.resolved) &&
          assignments.forall(a => a.key.resolved && a.value.resolved) =>
      val (root, ident) = manifestTarget(t).get
      val cond = condOpt.getOrElse(Literal.TrueLiteral)
      requireExpressible(cond, "UPDATE")
      assignments.foreach(a => requireExpressible(a.value, "UPDATE SET"))
      val set = assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new IllegalArgumentException(
            s"UPDATE SET target must be a top-level column — got $other " +
              "(nested-field assignment is not supported on a graft-manifest " +
              "table; rewrite the whole struct column)")
        }
        name -> a.value
      }
      require(set.map(_._1).distinct.size == set.size,
        s"UPDATE assigns a column twice: ${set.map(_._1)}")
      ManifestUpdateCommand(root, cond, set, ident)

    case m @ MergeIntoTable(t, s, mergeCond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution)
        if manifestTarget(t).isDefined && mergeCond.resolved =>
      val (root, ident) = manifestTarget(t).get
      def refuse(what: String): Nothing = throw new IllegalArgumentException(
        s"MERGE INTO a graft-manifest table supports the canonical upsert " +
          s"shape only (equality ON over same-named key columns, WHEN " +
          s"MATCHED THEN UPDATE SET *, WHEN NOT MATCHED THEN INSERT *) — " +
          s"$what. Use ManifestStore.upsertByKey[MergeOnRead] for other " +
          "shapes")
      if (notMatchedBySource.nonEmpty) refuse("NOT MATCHED BY SOURCE actions are not supported")
      if (withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION is not supported")
      requireExpressible(mergeCond, "MERGE ON")
      val updAssigns = matched match {
        case Seq(UpdateAction(None, as, _)) => as
        case other => refuse(s"matched actions were $other")
      }
      val insAssigns = notMatched match {
        case Seq(InsertAction(None, as)) => as
        case other => refuse(s"not-matched actions were $other")
      }
      // UPDATE and INSERT must assign identically — the upsert writes ONE
      // updates batch that serves both roles
      val updByCol = updAssigns.map(a => a.key.canonicalized -> a.value.canonicalized).toMap
      val insByCol = insAssigns.map(a => a.key.canonicalized -> a.value.canonicalized).toMap
      if (updByCol != insByCol)
        refuse("UPDATE and INSERT assignments differ")
      // the target's output attribute set, for classifying condition sides
      val targetAttrs = t.outputSet
      def splitConjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
        case other => Seq(other)
      }
      val keyCols = splitConjuncts(mergeCond).map {
        case EqualTo(l, r) =>
          val (tgt, src) =
            if (l.references.subsetOf(targetAttrs)) (l, r)
            else if (r.references.subsetOf(targetAttrs)) (r, l)
            else refuse(s"condition conjunct $l = $r mixes sides")
          val name = tgt match {
            case ar: AttributeReference => ar.name
            case other => refuse(s"target side of $other = $src is not a bare column")
          }
          // the key column's assignment must BE the source side of its
          // equality, or the updates frame's join key would disagree with
          // the ON clause
          val assigned = updAssigns.find(_.key match {
            case ar: AttributeReference => ar.name == name
            case _ => false
          }).getOrElse(refuse(s"key column $name has no assignment"))
          if (assigned.value.canonicalized != src.canonicalized)
            refuse(s"key column $name is assigned ${assigned.value}, not its " +
              s"ON-clause source expression $src")
          name
        case other => refuse(s"condition conjunct $other is not an equality")
      }
      val srcProjection = updAssigns.map { a =>
        val name = a.key.asInstanceOf[AttributeReference].name
        (name, a.value)
      }
      ManifestMergeCommand(root, s, srcProjection, keyCols, ident)

    case other => other
  }
}

private[sources] object ManifestDml {
  import org.apache.spark.sql.catalyst.expressions._

  /** Rebind a resolved condition/assignment to NAME references: the
    * command executes it against a fresh scan of the table whose attribute
    * ids differ from the analyzed relation's.
    */
  def byName(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(e.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
    })

  /** Best-effort pruning filters: each translatable conjunct. */
  def pruningOf(cond: Expression): Seq[org.apache.spark.sql.sources.Filter] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).flatMap(org.apache.spark.sql.graftshim.FilterShim.translate)
  }

  /** Run a MoR commit with retry on ABANDONMENT (-1: a concurrent rewrite
    * superseded a touched file between snapshot and commit — re-resolve
    * and retry, exactly what a human would do; the library returns -1
    * instead so callers choose their policy).
    */
  def retryingMor(what: String, root: String, attempts: Int = 3)
                 (op: => (Long, Int, Long)): Long = {
    var i = 0
    while (i < attempts) {
      val (n, _, v) = op
      if (v != -1L) return n
      i += 1
    }
    throw new IllegalStateException(
      s"$what on $root abandoned $attempts times (concurrent rewrites kept " +
        "superseding the touched files) — quiesce maintenance and retry")
  }
}

/** One SQL DELETE = one merge-on-read manifest commit (deletion vectors;
  * op=mor-delete). Returns the count of deleted rows.
  */
final case class ManifestDeleteCommand(root: String,
                                       cond: org.apache.spark.sql.catalyst.expressions.Expression,
                                       table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "num_affected_rows", org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // 'graft.isolation' = 'serializable' (TBLPROPERTIES, r15) upgrades the
    // statement to the quiescent-pass loop: zero matching rows as of a
    // still-head version, appends racing this DELETE notwithstanding —
    // see [[ManifestStore.deleteWhereSerializable]]. The default stays
    // WriteSerializable (one MoR pass, Delta-default semantics).
    val serializable = ManifestStore.latestSnapshot(spark, root)
      .exists(_.properties.get("graft.isolation").contains("serializable"))
    val n =
      if (serializable)
        ManifestStore.serializableDeleteLoop(spark, root, maxPasses = 10) { head =>
          ManifestStore.deleteMorExpr(spark, root, head,
            ManifestDml.pruningOf(cond), ManifestDml.byName(cond))
        }._1
      else ManifestDml.retryingMor("DELETE", root) {
        val before = ManifestStore.latestSnapshot(spark, root).getOrElse(
          throw new java.util.NoSuchElementException(s"no committed manifest under $root"))
        ManifestStore.deleteMorExpr(spark, root, before,
          ManifestDml.pruningOf(cond), ManifestDml.byName(cond))
      }
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    Seq(Row(n))
  }
}

/** One SQL UPDATE = one merge-on-read manifest commit (deletion vectors +
  * the updated rows' batch; op=mor-update). Returns the updated-row count.
  */
final case class ManifestUpdateCommand(root: String,
                                       cond: org.apache.spark.sql.catalyst.expressions.Expression,
                                       set: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
                                       table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "num_affected_rows", org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val n = ManifestDml.retryingMor("UPDATE", root) {
      val before = ManifestStore.latestSnapshot(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(s"no committed manifest under $root"))
      ManifestStore.updateMorExpr(spark, root, before,
        ManifestDml.pruningOf(cond), ManifestDml.byName(cond),
        set.map { case (k, v) => k -> ManifestDml.byName(v) }.toMap)
    }
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    Seq(Row(n))
  }
}

/** One SQL MERGE (canonical upsert shape) = one merge-on-read manifest
  * commit through [[ManifestStore.upsertByKeyMergeOnRead]]: matched keys'
  * old rows become deletion-vector positions, the source batch appends —
  * the change feed reads exactly those row-level changes. Returns the
  * replaced-row count (inserted rows = source rows − replaced).
  */
final case class ManifestMergeCommand(root: String,
                                      source: LogicalPlan,
                                      srcProjection: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
                                      keyCols: Seq[String],
                                      table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "num_affected_rows", org.apache.spark.sql.types.LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // the assignments' value expressions are resolved against `source`'s
    // own attribute ids, so they plan directly over ofRows(source) — no
    // name rebinding needed (and none possible: source names may differ
    // from target names)
    val updates = DatasetShim.ofRows(spark, source).select(
      srcProjection.map { case (name, e) =>
        org.apache.spark.sql.graftshim.ColumnShim.column(e).as(name)
      }: _*)
    val n = ManifestDml.retryingMor("MERGE", root) {
      ManifestStore.upsertByKeyMergeOnRead(spark, root, updates, keyCols)
    }
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    Seq(Row(n))
  }
}

/** One SQL INSERT = one [[ManifestStore.append]] commit. Concurrent
  * INSERTs rebase and union exactly like concurrent library appends (the
  * o12 contract). The query's output is renamed to the table's column
  * names (Spark already aligned and cast it during insertion resolution).
  */
final case class ManifestInsertCommand(root: String,
                                       partitionBy: Seq[String],
                                       query: LogicalPlan,
                                       outputColumnNames: Seq[String],
                                       table: Option[
                                         org.apache.spark.sql.catalyst.TableIdentifier],
                                       overwrite: Boolean = false)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df = DatasetShim.ofRows(spark, query).toDF(outputColumnNames: _*)
    if (overwrite) {
      val (_, _, v) = ManifestStore.overwriteDynamicPartitions(spark, df, root)
      if (v == -1L) throw new IllegalStateException(
        s"INSERT OVERWRITE under $root abandoned — a concurrent rewrite " +
          "superseded a touched partition's file; re-run")
    } else ManifestStore.append(spark, df, root, partitionBy = partitionBy)
    // a same-session SELECT resolves through the catalog's relation cache,
    // whose LogicalRelation pins the PRE-insert snapshot — invalidate it
    // by identifier, exactly as InsertIntoHadoopFsRelationCommand does
    // after writing (review r12; o23 previously needed a manual REFRESH
    // TABLE; refreshByPath alone misses, the cache keys on the table)
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    Seq.empty
  }
}
