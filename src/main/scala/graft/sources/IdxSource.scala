package graft.sources

import java.io.DataInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IDX-format (MNIST-style) binary source (SURVEY S7 —
  * MnistDataSetIterator, reference chapter3/MNISTAnomalyDetector.java:41).
  *
  * Parses the standard IDX encoding: magic(4) = 0x00 0x00 dtype dims,
  * then dims big-endian int32 sizes, then row-major payload. Images become
  * (idx, pixels: array<float> scaled to [0,1]); labels (idx, label: int).
  *
  * Files are read via binaryFiles (distributed, one task per file); each
  * file's records are emitted from executors — fine for the many-shard
  * layout real datasets use. Pair image and label shards with a join on idx.
  */
object IdxSource {

  /** Global record index: shard ordinal (files sorted by path) in the high
    * 32 bits, in-file position in the low 32. Image and label sources shard
    * identically in the standard layout, so the ids line up for the join.
    */
  private def shardedIdx(shard: Long, i: Long): Long = (shard << 32) | i

  /** Sorted-path → shard-ordinal map for a glob (driver-side, tiny). */
  private def shardOrdinals(spark: SparkSession, path: String): Map[String, Long] =
    spark.sparkContext.binaryFiles(path).keys.collect().sorted
      .zipWithIndex.map { case (p, i) => p -> i.toLong }.toMap

  def readImages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val ordinals = spark.sparkContext.broadcast(shardOrdinals(spark, path))
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (file, pds) =>
      val shard = ordinals.value(file)
      val in = new DataInputStream(pds.open())
      try {
        val magic = in.readInt()
        require((magic & 0xffffff00) == 0x00000800, s"not an idx ubyte file: $magic")
        val dims = magic & 0xff
        val n = in.readInt()
        val recLen = (1 until dims).map(_ => in.readInt()).product
        (0 until n).iterator.map { i =>
          val buf = new Array[Byte](recLen)
          in.readFully(buf)
          (shardedIdx(shard, i.toLong), buf.map(b => (b & 0xff) / 255.0f))
        }.toVector
      } finally in.close()
    }
    rows.toDF("idx", "pixels")
  }

  def readLabels(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val ordinals = spark.sparkContext.broadcast(shardOrdinals(spark, path))
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (file, pds) =>
      val shard = ordinals.value(file)
      val in = new DataInputStream(pds.open())
      try {
        val magic = in.readInt()
        require((magic & 0xffffff00) == 0x00000800, s"not an idx ubyte file: $magic")
        val n = in.readInt()
        val buf = new Array[Byte](n)
        in.readFully(buf)
        buf.iterator.zipWithIndex
          .map { case (b, i) => (shardedIdx(shard, i.toLong), (b & 0xff)) }.toVector
      } finally in.close()
    }
    rows.toDF("idx", "label")
  }

  /** (idx, pixels, label) — the MNIST training-table shape. */
  def readDataset(spark: SparkSession, imagesPath: String, labelsPath: String): DataFrame =
    readImages(spark, imagesPath).join(readLabels(spark, labelsPath), "idx")
      .select(col("idx"), col("pixels"), col("label"))
}
