package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the test harness (`local[32]`, single JVM) but the
  * same settings are what we would ship on a 1000-executor cluster:
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *     and dynamic broadcast conversion are the backbone of the 100 TB plan.
  *   - UTC session timezone so timestamp semantics match the DuckDB oracle
  *     and are stable across cluster nodes.
  *   - Shuffle partitions sized to the parallelism of the harness; on a real
  *     cluster this is set to 2-3x total cores and AQE coalesces down.
  */
object GraftSession {
  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions())
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // fixture `events.ts` is parquet TIMESTAMP(NANOS); read as long and
      // convert in Tables.events (Spark has no nanosecond timestamp type)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // above this many IN values, parquet pushdown degrades to a min/max
      // range that spans most row groups; the engine pushes candidate-id
      // sets of up to ~1000 (dedupIncremental's verification cut), so raise
      // the default (10) to keep those point-lookups row-group-skippable
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1000")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  def getOrCreate(cores: Int = 32): SparkSession = {
    val spark = builder(cores).getOrCreate()
    // getOrCreate silently reuses any pre-existing session, ignoring the
    // builder's configs — fail loudly if that session disagrees on the
    // settings correctness OR the engine's plans depend on (review r9: a
    // timezone-only check let a foreign UTC session slip through WITHOUT
    // GraftExtensions — every graft_* SQL call then fails at analysis and
    // the native rewrites silently never fire).
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "reused SparkSession has non-UTC session timezone; oracle comparisons would drift")
    require(
      spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine")),
      "reused SparkSession lacks GraftExtensions (graft_* functions and the " +
        "native rewrites are not installed) — it was built by a foreign " +
        "SparkSession.builder; stop it or build through GraftSession first")
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
