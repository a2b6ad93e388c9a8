package graft

/** sf0.1 → sf1 growth probe for the manifest-LIFECYCLE catalog entries
  * (the r10 methodology: run each named query cold in its own process per
  * SF so the ratios are apples-to-apples; the RATIO per 10× data is the
  * measurement, not the cold absolute). r13 adds the round's new entries
  * (SQL DML, IVM min/max, attributed feed, replication) to the r10 set.
  * `tools/run.sh graft.LifecycleGrowth <sfDir> [names]`; numbers land in
  * SCALE.md.
  */
object LifecycleGrowth {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "o23_manifest_sql_insert", "o24_manifest_change_feed",
      "o25_manifest_stream", "o26_manifest_ivm",
      "o27_manifest_sql_dml", "o28_manifest_ivm_minmax",
      "o29_manifest_cdf_versions", "o30_manifest_replicate"))
    val spark = GraftSession.getOrCreate(32)
    for (n <- names) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      println(f"GROWTH dir=$dir q=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
    }
    spark.stop()
  }
}
