package graft

/** Snapshot-RESOLUTION SLO for the manifest store's `_latest` pointer
  * (r11, VERDICT r10 #2): accrue ≥1,000 committed versions on one table
  * and measure `latestSnapshot` latency at growing version counts, hinted
  * (the production path: hint read + forward probe + head manifest) vs
  * unhinted (the pre-r11 path: full `_manifests/` listing + name parse).
  * The hinted arm must stay FLAT as versions accrue — on an object store
  * the unhinted arm is O(versions) LIST pages per micro-batch, the exact
  * cost a week-long streaming sink multiplies by ~100k.
  * `Test/runMain graft.ManifestResolveSlo [nVersions]`; numbers land in
  * SCALE.md.
  */
object ManifestResolveSlo {
  def main(args: Array[String]): Unit = {
    val nVersions = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = GraftSession.getOrCreate(8)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-mrslo").toString

    def timeMs(reps: Int)(f: => Unit): Double = {
      val lats = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      lats(lats.size / 2) // p50
    }

    val checkpoints = Seq(10, 100, nVersions).distinct.sorted
    var committed = 0
    for (cp <- checkpoints) {
      while (committed < cp) {
        graft.sources.ManifestStore.append(spark,
          Seq((committed.toLong, s"v$committed")).toDF("id", "payload"), root)
        committed += 1
      }
      val hinted = timeMs(50) {
        require(graft.sources.ManifestStore
          .latestSnapshot(spark, root).get.version == cp.toLong)
      }
      val unhinted = timeMs(50) {
        require(graft.sources.ManifestStore
          .latestSnapshotUnhinted(spark, root).get.version == cp.toLong)
      }
      println(f"MANIFESTRESOLVE versions=$cp%5d hinted_p50=$hinted%.2fms " +
        f"unhinted_p50=$unhinted%.2fms ratio=${unhinted / hinted}%.2fx")
    }
    spark.stop()
  }
}
