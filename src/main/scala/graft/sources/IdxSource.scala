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

  /** Shared shard scaffold for both readers (review r9 — the listing-race
    * posture, magic check, and swapped-arguments guard must not drift
    * between them): ONE binaryFiles RDD drives both the ordinal map and
    * the data read — two separate listings would race a file landing in
    * between (executor lookup crash, or silently shifted shard ids
    * mis-pairing the image/label join). `parse` runs entirely inside the
    * stream's lifetime and must return an iterator that no longer touches
    * it (buffer the payload, decode on demand).
    */
  private def readShards[T: scala.reflect.ClassTag](
      spark: SparkSession, path: String, what: String, requiredDims: Int)
      (parse: (DataInputStream, Long, String) => Iterator[T]): org.apache.spark.rdd.RDD[T] = {
    val files = spark.sparkContext.binaryFiles(path)
    val ordinals = spark.sparkContext.broadcast(
      files.keys.collect().sorted.zipWithIndex.map { case (p, i) => p -> i.toLong }.toMap)
    files.flatMap { case (file, pds) =>
      val shard = ordinals.value(file)
      val in = new DataInputStream(pds.open())
      try {
        val magic = in.readInt()
        require((magic & 0xffffff00) == 0x00000800, s"not an idx ubyte file: $magic")
        // a swapped images/labels argument would otherwise consume its
        // header as garbage record geometry and "succeed"
        require((magic & 0xff) == requiredDims,
          s"idx $what file must have $requiredDims dims, got ${magic & 0xff} in $file")
        parse(in, shard, file)
      } finally in.close()
    }
  }

  def readImages(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readShards(spark, path, "image", requiredDims = 3) { (in, shard, file) =>
      val n = in.readInt()
      // dimension product in LONG first: an Int product can wrap to a
      // small positive value on forged/corrupt headers and pass the n*recLen
      // bound with a wrong record length (advice r9)
      val dims = (1 until 3).map(_ => in.readInt().toLong)
      require(dims.forall(d => d > 0 && d <= Int.MaxValue.toLong),
        s"idx image dims out of range (${dims.mkString("x")}) in $file — corrupt header")
      val recLenL = dims.product
      require(recLenL <= Int.MaxValue.toLong,
        s"idx image record length out of range ($recLenL) in $file — corrupt header")
      val recLen = recLenL.toInt
      // ONE raw-payload buffer, records decoded on demand: materializing
      // decoded float arrays per shard held ~4x the file bytes plus
      // object overhead on the task heap (review r9)
      require(n >= 0 && n.toLong * recLen <= (Int.MaxValue - 8).toLong,
        s"idx image shard too large to buffer (n=$n, recLen=$recLen) in $file — reshard")
      val payload = new Array[Byte](n * recLen)
      in.readFully(payload)
      (0 until n).iterator.map { i =>
        val off = i * recLen
        val px = new Array[Float](recLen)
        var j = 0
        while (j < recLen) { px(j) = (payload(off + j) & 0xff) / 255.0f; j += 1 }
        (shardedIdx(shard, i.toLong), px)
      }
    }.toDF("idx", "pixels")
  }

  def readLabels(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readShards(spark, path, "label", requiredDims = 1) { (in, shard, _) =>
      val n = in.readInt()
      // same corrupt-header posture as readImages (review r10): a negative
      // count must refuse with the filename, not NegativeArraySizeException
      require(n >= 0, s"idx label count out of range ($n) - corrupt header")
      val buf = new Array[Byte](n)
      in.readFully(buf)
      (0 until n).iterator.map(i => (shardedIdx(shard, i.toLong), buf(i) & 0xff))
    }.toDF("idx", "label")
  }

  /** (idx, pixels, label) — the MNIST training-table shape. */
  def readDataset(spark: SparkSession, imagesPath: String, labelsPath: String): DataFrame =
    readImages(spark, imagesPath).join(readLabels(spark, labelsPath), "idx")
      .select(col("idx"), col("pixels"), col("label"))

  /** Export a (pixels: array<double> in [0,1], label: int) frame as
    * SHARDED IDX ubyte files — one `images-NNNNN-idx3-ubyte` /
    * `labels-NNNNN-idx1-ubyte` pair per non-empty partition, the
    * many-shard layout [[readDataset]] consumes (shard ordinals follow
    * sorted filenames, and a partition writes both files or neither, so
    * image/label ids line up on read-back). Pixels are quantized
    * `round(p * 255)` IN DOUBLE (half-up), clamped to ubyte range.
    *
    * Per-task memory is O(partition bytes): each record is `side*side`
    * bytes and the shard is buffered before its header (IDX puts the
    * record count up front and not every FileSystem supports seek-back)
    * — size partitions accordingly, same bound as the training loop.
    * Files land via create-then-rename so a killed task never leaves a
    * half-written shard under the visible name.
    */
  def writeDataset(df: DataFrame, dir: String, side: Int): Unit = {
    require(side > 0, s"side must be positive: $side")
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dim = side * side
    df.select(col("pixels").cast("array<double>"), col("label").cast("int"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val imgBuf = new java.io.ByteArrayOutputStream()
          val lblBuf = new java.io.ByteArrayOutputStream()
          var n = 0
          for (r <- it) {
            require(!r.isNullAt(0),
              "IDX export: null pixels array cannot serialize - filter or repair the row")
            val px = r.getSeq[Double](0)
            require(px.length == dim, s"record has ${px.length} pixels, expected $dim")
            require(!px.contains(null),
              "IDX export: null pixel element cannot serialize - repair the row")
            val rec = new Array[Byte](dim)
            var i = 0
            while (i < dim) {
              val q = math.round(px(i) * 255.0)
              rec(i) = math.max(0L, math.min(255L, q)).toByte
              i += 1
            }
            imgBuf.write(rec)
            // labels must FIT the format: silently clamping a 300-class
            // label to 255 would corrupt the training table undetectably
            val label = r.getInt(1)
            require(label >= 0 && label <= 255,
              s"IDX ubyte labels must be in [0, 255], got $label")
            lblBuf.write(label)
            n += 1
          }
          def header(magic: Int, dims: Seq[Int]): Array[Byte] = {
            val b = java.nio.ByteBuffer.allocate(4 + 4 * dims.length)
            b.putInt(magic); dims.foreach(b.putInt); b.array()
          }
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(conf.value)
          fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
          // tmp name carries the task ATTEMPT id, not just the partition:
          // a speculative or zombie attempt of the same partition must not
          // truncate the stream another attempt is mid-write on (the
          // rename target is still last-writer-wins, which is idempotent —
          // both attempts write identical bytes)
          val attempt = org.apache.spark.TaskContext.get.taskAttemptId()
          def emit(name: String, head: Array[Byte], payload: Array[Byte]): Unit = {
            val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp-$pid-$attempt")
            val out = fs.create(tmp, true)
            try { out.write(head); out.write(payload) } finally out.close()
            val target = new org.apache.hadoop.fs.Path(dir, name)
            fs.delete(target, false)
            if (!fs.rename(tmp, target))
              throw new java.io.IOException(s"IDX shard rename failed: $tmp -> $target")
          }
          emit(f"images-$pid%05d-idx3-ubyte",
            header(0x00000803, Seq(n, side, side)), imgBuf.toByteArray)
          emit(f"labels-$pid%05d-idx1-ubyte",
            header(0x00000801, Seq(n)), lblBuf.toByteArray)
        }
      }
  }
}
