package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.Sink

/** Compaction throughput measurement for SCALE.md: fragments the sf0.1
  * documents table into a small-files directory (flat) and a hive-partitioned
  * variant (per-lang leaves), then times `Sink.compactParquet` /
  * `compactPartitions` and prints MB/s plus before/after file counts. The
  * flat run uses target = bytes/8 to exercise real bin packing; the
  * partitioned run collapses each leaf to one file (the maintenance-job
  * shape). `Test/runMain graft.CompactBench [srcDir]`.
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate(32)
    val docs = spark.read.parquet(s"$src/lineitem.parquet")
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirBytes(p: String): Long =
      fs.listStatus(new Path(p)).filter(_.isFile).map(_.getLen).sum

    // flat: 512 small files, target bytes/8
    val flat = java.nio.file.Files.createTempDirectory("graft-cbench-flat").toString
    docs.repartition(512).write.mode("overwrite").parquet(flat)
    val flatBytes = dirBytes(flat)
    val t0 = System.nanoTime()
    val (fb, fa) = Sink.compactParquet(spark, flat, flatBytes / 8)
    val flatSec = (System.nanoTime() - t0) / 1e9
    println(f"flat: $fb files (${flatBytes / 1e6}%.1f MB) -> $fa files in " +
      f"$flatSec%.2f s = ${flatBytes / 1e6 / flatSec}%.1f MB/s")

    // partitioned: per-lang document leaves fragmented 64x, each collapses to 1
    val part = java.nio.file.Files.createTempDirectory("graft-cbench-part").toString
    spark.read.parquet(s"$src/documents.parquet")
      .repartition(64).write.mode("overwrite").partitionBy("lang").parquet(part)
    val t1 = System.nanoTime()
    val report = Sink.compactPartitions(spark, part, 1L << 30)
    val partSec = (System.nanoTime() - t1) / 1e9
    val (pb, pa) = report.values.foldLeft((0, 0)) { case ((b, a), (lb, la)) => (b + lb, a + la) }
    println(f"partitioned: ${report.size} leaves, $pb -> $pa files in $partSec%.2f s " +
      f"(concurrent pool)")
    spark.stop()
  }
}
