package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Everything derives from queries.Catalog; add a QueryDef there and it is
  * verified + benchmarked automatically.
  */
object SparkEntry {

  /** Flagship query (W1: per-group top/bottom-5 by anomaly score — the
    * MNISTAnomalyDetector ranking) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("w1_top_bottom_per_group").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (seeded,
    * ML-backed) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
