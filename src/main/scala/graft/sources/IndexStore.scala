package graft.sources

/** Scratch locations for pre-built index artifacts (PQ codebooks+codes,
  * dedup signature/band indexes) keyed by fixture directory.
  *
  * The catalog's `_build` entries write here at "ingest" and the `_probe`
  * entries read back — so BENCH times the build cost and the per-query
  * probe cost as separate numbers (VERDICT r4 #2: a probe-path regression
  * must not hide under one-time build noise). Probe entries fall back to
  * building-if-absent, so they stay runnable standalone; within one
  * Bench/Verify pass the alphabetical query order (`x` < `x_probe`)
  * guarantees the build ran first and the probe timing is probe-only.
  */
object IndexStore {

  /** Collision-free tag for a fixture directory: the sanitized name for
    * readability PLUS a hash of the raw path — sanitization alone
    * collapses distinct dirs ('/data/sf-1' vs '/data/sf_1') onto one tag,
    * and the second fixture's probe entries would then silently READ the
    * first fixture's prebuilt artifacts instead of rebuilding.
    */
  private def tag(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      Integer.toHexString(sfDir.hashCode)

  /** Root scratch dir for a fixture directory's index artifacts. */
  def root(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_index/${tag(sfDir)}"

  /** Catalog-safe table-name tag for a fixture directory (bucketed band
    * indexes are managed tables, so their names carry the fixture tag).
    */
  def tableTag(sfDir: String): String = tag(sfDir).toLowerCase

  def exists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
