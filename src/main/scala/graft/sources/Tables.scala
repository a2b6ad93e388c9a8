package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the fixture star schema (see /root/repo/FIXTURES.md).
  *
  * Schema-on-read from Parquet: column pruning and predicate pushdown reach
  * the scan automatically (verify with `.explain("formatted")` — the scans
  * must show `PushedFilters` and a narrowed `ReadSchema`). At 100 TB these
  * tables would be date-partitioned (`l_shipdate`/`o_orderdate` month) so
  * partition pruning kicks in; the API here is path-based and agnostic.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) — surfaced as a microsecond
    * TimestampType column (integer `div` keeps the conversion exact; a
    * double division would lose precision on epoch-nanos magnitudes).
    * Requires spark.sql.legacy.parquet.nanosAsLong=true (GraftSession).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
