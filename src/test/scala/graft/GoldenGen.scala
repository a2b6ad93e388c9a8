package graft

import graft.queries.Catalog

/** Regenerates the stored golden tables that oracle SQL pins by path
  * (currently `e5_compression_ratio` — deflate is deterministic but not
  * computable in DuckDB, so its oracle reads a committed parquet instead).
  *
  * Run `sbt "Test/runMain graft.GoldenGen"` AFTER any fixture
  * regeneration that changes document text, then commit the refreshed
  * parquet under tools/golden/. A stale golden fails the round's
  * correctness gate loudly (hash mismatch) rather than silently — that is
  * the point of the pin: it catches deflate/JDK drift, code regressions,
  * and fixture drift, at the cost of this one regeneration step.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate(8)
    Catalog.byName("e5_compression_ratio").run(spark, sfDir)
      .coalesce(1).write.mode("overwrite")
      .parquet("/root/repo/tools/golden/e5_compression_ratio_sf0.01")
    spark.stop()
  }
}
