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
    // output dir is derived from the fixture dir's basename so running at
    // another scale writes a NEW golden (e.g. ..._sf0.1) instead of
    // silently poisoning the sf0.01 one the committed oracle SQL pins
    val sfName = new java.io.File(sfDir).getName
    val spark = GraftSession.getOrCreate(8)
    Catalog.byName("e5_compression_ratio").run(spark, sfDir)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"/root/repo/tools/golden/e5_compression_ratio_$sfName")
    spark.stop()
  }
}
