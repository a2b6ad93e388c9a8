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
      require(i.mode == SaveMode.Append,
        s"INSERT OVERWRITE is not supported on a graft-manifest table " +
          s"(${i.outputPath}) — the manifest commit protocol expresses " +
          "overwrites as explicit rewrites (compact/deleteWhere/upsertByKey); " +
          "use INSERT INTO, or the library API")
      require(i.staticPartitions.isEmpty && !i.ifPartitionNotExists,
        s"static PARTITION clauses are not supported on a graft-manifest " +
          s"table (${i.outputPath}) — write the partition column as data " +
          "(dynamic partitioning); the manifest records each file's values")
      ManifestInsertCommand(
        i.fileIndex.get.asInstanceOf[ManifestFileIndex].root.toString,
        i.partitionColumns.map(_.name),
        i.query, i.outputColumnNames,
        i.catalogTable.map(_.identifier))
    case other => other
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
                                         org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df = DatasetShim.ofRows(spark, query).toDF(outputColumnNames: _*)
    ManifestStore.append(spark, df, root, partitionBy = partitionBy)
    // a same-session SELECT resolves through the catalog's relation cache,
    // whose LogicalRelation pins the PRE-insert snapshot — invalidate it
    // by identifier, exactly as InsertIntoHadoopFsRelationCommand does
    // after writing (review r12; o23 previously needed a manual REFRESH
    // TABLE; refreshByPath alone misses, the cache keys on the table)
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    Seq.empty
  }
}
