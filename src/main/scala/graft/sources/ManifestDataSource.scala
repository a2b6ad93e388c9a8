package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** `spark.read.format("graft-manifest").load(tableRoot)` — the idiomatic
  * entry to a [[ManifestStore]] table (VERDICT r10 #1). The relation is a
  * `HadoopFsRelation` over a [[ManifestFileIndex]], so a plain
  * `.where(col("x") === v)` gets manifest-stats file skipping THROUGH THE
  * PLANNER (no hand-built `sources.Filter` ADT needed), the scan is
  * Spark's native vectorized parquet path, and planning never lists a
  * data directory. Options:
  *
  *  - `versionAsOf` — time travel to an exact committed version (replays
  *    that version's schema, like [[ManifestStore.readVersion]]).
  *
  * Notes: partition columns surface LAST in the schema (the hive-table
  * convention for file-based relations); the write path stays the library
  * API ([[ManifestStore.append]] and friends) — a format-level write
  * cannot express the commit protocol's rebase/abandon contract, so
  * `df.write.format("graft-manifest")` is refused by Spark (no
  * CreatableRelationProvider) rather than committing blind.
  */
final class ManifestDataSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      """graft-manifest needs exactly one table root: spark.read.format("graft-manifest").load(<root>)"""))
    val snap = parameters.get("versionAsOf") match {
      case Some(v) => ManifestStore.snapshotAt(spark, root, v.toLong).getOrElse(
        throw new java.util.NoSuchElementException(
          s"no intact manifest v$v under $root"))
      case None => ManifestStore.latestSnapshot(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"no committed manifest under $root"))
    }
    // a bare relation cannot attach the deletion-vector filter — reading
    // through it would RESURRECT deleted rows; refuse with the recipe
    // (ManifestStore.table and read/readWhere all apply vectors)
    require(snap.files.forall(_.dv.forall(_.rows == 0L)),
      s"table under $root carries live deletion vectors (merge-on-read " +
        "deletes) which the raw format relation cannot apply — run " +
        "ManifestStore.materializeDeletes(spark, root) first, or read via " +
        "ManifestStore.table/read/readWhere (all apply vectors)")
    ManifestStore.relationFor(spark, root, snap)
  }
}
