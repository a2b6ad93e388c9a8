package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg: regex over query names (dev iteration on a few
    // queries without dumping the whole catalog); driver passes two args
    val (sfDir, outDir, nameFilter) = args match {
      case Array(s, o) => (s, o, ".*")
      case Array(s, o, f) => (s, o, f)
      case _ =>
        System.err.println("usage: graft.Verify <sfDir> <outDir> [nameFilterRegex]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Same GraftSession config (AQE, UTC, shuffle partitions) the engine is
    // designed around — see ADVICE.md round 1.
    val spark = GraftSession.getOrCreate(cpus)
    new java.io.File(outDir).mkdirs()
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(nameFilter)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // per-query persists must not accumulate: release the operator
        // library's pinned intermediates, then drop any remaining cache
        graft.operators.Pinned.release()
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must not poison the rest of the dump: release its
        // pinned intermediates too (review r9 — Bench already did), and
        // remove any stale/partial dump at this name so the driver's
        // compare can never read a PREVIOUS run's data for a query that
        // did not actually produce output this run
        graft.operators.Pinned.release()
        spark.catalog.clearCache()
        try {
          val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    // One shared escaper with Bench (review r9).
    def q(s: String): String = JsonText.quote(s)
    // Golden-pinned oracles (committed parquet under tools/golden/<n>_sf0.01)
    // and fixed-path oracles (s4's read_blob) are pinned AT sf0.01 — the
    // driver's gate SF. At any other SF they would false-mismatch against
    // data they never described (ADVICE r6), so a non-gate run drops them
    // from oracle_sql.json and those queries fall back to the rows-only
    // check. Membership is the STRUCTURAL QueryDef.pinnedSql flag, not a
    // string convention on the SQL text.
    val atGateSf = sfDir.replaceAll("/+$", "").endsWith("sf0.01")
    val pinned = graft.queries.Catalog.all.filter(_.pinnedAtGateSf).map(_.name).toSet
    val json = SparkEntry.oracleSql
      .filter(_._1.matches(nameFilter))
      .filter { case (name, _) => atGateSf || !pinned(name) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failed > 0) System.err.println(s"[verify] $failed queries failed")
    spark.stop()
    // Nonzero exit so any harness gating on the exit code sees a partial
    // dump as failure rather than success (ADVICE round 2).
    if (failed > 0) sys.exit(1)
  }
}
