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
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations and plain microsecond TIMESTAMP (no timezone flag →
    * TIMESTAMP_NTZ in Spark) in others; normalize both to a session-UTC
    * TimestampType column so every downstream `unix_millis`/window call
    * sees one type. The nanos path needs
    * spark.sql.legacy.parquet.nanosAsLong=true (GraftSession) and integer
    * `div` (a double division would lose precision on epoch-nanos
    * magnitudes); the NTZ path is an exact reinterpret because the
    * session timezone is pinned to UTC, which is also how the DuckDB
    * oracle reads the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ reinterpret is exact ONLY under a zero-offset session:
        // any other zone silently shifts every wall-clock value by its
        // offset — enforce the documented precondition instead of assuming
        // it (GraftSession and the harnesses pin UTC; a notebook might
        // not). Equivalence is by ZoneId rules, not string equality, so
        // "Etc/UTC"/"GMT"/"Z"/"+00:00" sessions are accepted (review r9).
        val tz = s.conf.get("spark.sql.session.timeZone")
        val isUtc =
          try java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS)
            .normalized() == java.time.ZoneOffset.UTC
          catch { case _: java.time.DateTimeException => false }
        require(isUtc,
          s"Tables.events requires a UTC-equivalent spark.sql.session.timeZone " +
            s"(got '$tz'): the NTZ ts column reinterprets as UTC instants; a " +
            "non-UTC session would silently shift every timestamp")
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
