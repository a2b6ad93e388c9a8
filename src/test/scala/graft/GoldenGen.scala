package graft

import graft.queries.Catalog

/** Regenerates the stored golden tables that oracle SQL pins by path —
  * the deterministic-but-not-DuckDB-computable entries
  * (`e5_compression_ratio`: deflate; `e5_bpe_merges` / `e5_bpe_encode`:
  * iterative merge learning; `a10_approx_distinct`: Spark's HLL++;
  * `e5_heavy_hitters_cms`: seeded count-min sketch; `m5_word2vec_table`:
  * seeded single-partition Word2Vec fit). Pin eligibility = deterministic
  * AND partition-invariant (sketches: commutative register/counter
  * merges; m5: one-partition fit with re-run equality in CatalogSpec).
  *
  * Run `sbt "Test/runMain graft.GoldenGen"` AFTER any fixture
  * regeneration that changes document text, then commit the refreshed
  * parquet under tools/golden/. A stale golden fails the round's
  * correctness gate loudly (hash mismatch) rather than silently — that is
  * the point of the pin: it catches deflate/JDK drift, code regressions,
  * and fixture drift, at the cost of this one regeneration step.
  */
object GoldenGen {
  /** Every golden-pinned catalog entry; oracle SQL in TextQueries reads
    * `tools/golden/<name>_sf0.01` for each.
    */
  val pinned: Seq[String] =
    Seq("e5_compression_ratio", "e5_bpe_merges", "e5_bpe_encode",
      "a10_approx_distinct", "e5_heavy_hitters_cms", "m5_word2vec_table")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // output dir is derived from the fixture dir's basename so running at
    // another scale writes a NEW golden (e.g. ..._sf0.1) instead of
    // silently poisoning the sf0.01 one the committed oracle SQL pins
    val sfName = new java.io.File(sfDir).getName
    val spark = GraftSession.getOrCreate(8)
    pinned.foreach { name =>
      // path layout owned by queries.Golden (the same object the oracle
      // SQL reads through), parameterized only by the sf suffix
      val out = graft.queries.Golden.dir(name, sfName)
      Catalog.byName(name).run(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(out)
      println(s"[golden] wrote $out")
    }
    spark.stop()
  }
}
