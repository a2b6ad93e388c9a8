package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named DataFrame query over a fixture directory plus
  * (when SQL-expressible) the equivalent DuckDB SQL the driver uses as the
  * correctness oracle. Column names/types must match between the two — the
  * harness sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Oracle-checked query. Callers apply `.stripMargin` themselves so SQL
    * containing literal '|' (regexes, string data) is never mangled here.
    */
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle.trim))

  /** Non-SQL-expressible operator (seeded/ML/binary): driver records a
    * weaker rows-only check.
    */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
