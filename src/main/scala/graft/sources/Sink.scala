package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output layout control (the write half of the 100 TB story):
  *
  *  - partitioned writes give readers partition pruning (a date filter
  *    touches only matching directories — verified in SinkSpec's explain);
  *  - bucketed tables give shuffle-free joins/aggregations on the bucket
  *    key: two tables bucketed the same way join without an Exchange,
  *    which at fact-to-fact scale is the difference between a co-located
  *    join and re-shuffling 100 TB.
  */
object Sink {

  /** Write parquet partitioned by the given columns (hive-style dirs). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Save as a bucketed+sorted managed table (bucket pruning + shuffle-free
    * joins on `bucketCol` for any reader that joins on the same key).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Write parquet clustered along the Z-order curve of `dims`, so min/max
    * file statistics stay tight in EVERY listed dimension and multi-column
    * predicates skip files (see [[graft.operators.Layout]]). `files` bounds
    * the output file count (one per range partition).
    */
  def writeZOrdered(df: DataFrame, path: String,
                    dims: Seq[org.apache.spark.sql.Column],
                    files: Int, bits: Int = 16): Unit =
    graft.operators.Layout.zOrder(df, dims, files, bits)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Write parquet with per-column bloom filters — the data-skipping story
    * for POINT lookups on high-cardinality columns with no friendly layout:
    * min/max stats only skip when the column is clustered (sort/Z-order), but
    * an id sprayed uniformly across files spans every file's min/max range.
    * A bloom filter answers "definitely absent" per row group regardless of
    * layout, so the reader (parquet-mr row-group filtering under Spark's
    * pushed-down equality predicates) skips non-matching groups at footer
    * time. Size the filter with `expectedNdv` ~ the per-row-group distinct
    * count — undersizing inflates the false-positive rate and quietly turns
    * skipping off.
    *
    * parquet-mr drops the bloom when a chunk stays FULLY dictionary-encoded
    * (the dictionary is already an exact membership filter, so nothing is
    * lost). A production high-cardinality id overflows the dictionary page
    * and falls to plain encoding naturally; `disableDictionary` forces that
    * path for small/test data so the filter's presence can be asserted.
    */
  def writeBloomFiltered(df: DataFrame, path: String, cols: Seq[String],
                         expectedNdv: Long = 1L << 20,
                         disableDictionary: Boolean = false): Unit = {
    require(cols.nonEmpty, "writeBloomFiltered: no columns given")
    val writer = cols.foldLeft(df.write.mode(SaveMode.Overwrite)) { (w, c) =>
      val base = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
      if (disableDictionary) base.option(s"parquet.enable.dictionary#$c", "false")
      else base
    }
    writer.parquet(path)
  }

  /** Hidden siblings used by the compaction swap. `.`-prefixed names are
    * invisible to Hadoop/Spark file discovery, so concurrent readers of the
    * table root never see a half-written rewrite as a data partition.
    */
  private def tmpFor(dir: Path) = new Path(dir.getParent, s".${dir.getName}._compact_tmp")
  private def oldFor(dir: Path) = new Path(dir.getParent, s".${dir.getName}._compact_old")

  /** Compact a FLAT parquet directory of many small files into
    * ~`targetFileBytes` outputs — the small-files problem: a day of
    * micro-batch ingest (e.g. the streaming curate sink's per-batch appends)
    * leaves thousands of KB-size files whose per-file open + footer-read cost
    * comes to dominate every later scan.
    *
    * The rewrite is a pure file merge, not a shuffle: a scoped session reads
    * the SNAPSHOT of current files with `maxPartitionBytes = targetFileBytes`
    * (open cost zeroed), so the scan itself packs inputs into ~target-byte
    * splits and each task writes one output — a narrow-only plan whose bytes
    * are bounded by construction (compressed-to-compressed, so the ratio
    * carries over). Note any rewrite that merges files re-mixes row order;
    * a layout-sensitive directory (Z-order, sorted) should be re-laid-out
    * via [[writeZOrdered]] instead, and parquet writer properties (e.g.
    * bloom filters) must be re-specified via `writerOptions`.
    *
    * Crash safety: the new files land in a hidden temp sibling, the original
    * is renamed aside, the temp renamed in, then the old copy dropped — every
    * interruption point leaves a complete copy on disk, and the next call
    * recovers an aborted swap before doing anything else. The swap is still
    * two metadata ops, not one atomic commit: compaction assumes one logical
    * writer per leaf (compact SEALED partitions — yesterday's `date=…`, a
    * cell not being appended this cycle). A sweep adopts files that landed
    * after the snapshot, which narrows but does not close the concurrent-
    * append window; closing it is what a transactional table format's
    * optimistic commit is for.
    *
    * Returns (filesBefore, filesAfter) — filesAfter is the real written
    * count (size-desc bin packing can exceed the byte-derived minimum by a
    * bin or two).
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileBytes: Long = 128L << 20,
                     writerOptions: Map[String, String] = Map.empty): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.makeQualified(new Path(path))
    val tmp = tmpFor(dir)
    val old = oldFor(dir)
    // recover a swap aborted between rename-aside and rename-in: the data is
    // complete in `old`; restore it before touching anything else
    if (!fs.exists(dir) && fs.exists(old) && !fs.rename(old, dir))
      throw new java.io.IOException(s"compactParquet: recovery rename $old -> $dir failed")
    fs.delete(tmp, true)
    fs.delete(old, true)

    def parquetFiles() = fs.listStatus(dir).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    val snapshot = parquetFiles()
    val before = snapshot.length
    if (before == 0) return (0, 0)

    // scoped session: packing knobs must not leak into concurrent queries
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.files.maxPartitionBytes", targetFileBytes.toString)
    scoped.conf.set("spark.sql.files.openCostInBytes", "0")
    // without this, totalBytes/defaultParallelism shrinks the split size and
    // re-fragments small directories across `parallelism` output files
    scoped.conf.set("spark.sql.files.minPartitionNum", "1")
    val writer = writerOptions.foldLeft(
      scoped.read.parquet(snapshot.map(_.getPath.toString).toIndexedSeq: _*)
        .write.mode(SaveMode.Overwrite)) { case (w, (k, v)) => w.option(k, v) }
    writer.parquet(tmp.toString)

    // adopt any file that landed after the snapshot so the swap cannot drop
    // it (belt-and-braces — see the single-writer note in the scaladoc)
    val snapshotNames = snapshot.map(_.getPath.getName).toSet
    for (late <- parquetFiles() if !snapshotNames.contains(late.getPath.getName))
      if (!fs.rename(late.getPath, new Path(tmp, late.getPath.getName)))
        throw new java.io.IOException(s"compactParquet: adopting ${late.getPath} failed")

    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"compactParquet: rename-aside $dir -> $old failed")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir) // roll back so the directory never stays missing
      throw new java.io.IOException(s"compactParquet: rename-in $tmp -> $dir failed")
    }
    val after = parquetFiles().length
    fs.delete(old, true)
    (before, after)
  }

  /** Compact every hive-style leaf partition under `root` independently —
    * the production shape: compact yesterday's SEALED `date=.../` partition
    * while today's keeps ingesting into a different leaf. Leaf directory
    * names encode the partition values, so rewriting a leaf in place
    * preserves the hive layout for partition-pruned readers. Leaves are
    * compacted concurrently (job submission is thread-safe; each leaf is a
    * small independent scan+write job, so serializing them would pay
    * per-job scheduling latency hundreds of times on a dated table or a
    * 128-cell ANN index). Returns leaf-relative path -> (before, after).
    */
  def compactPartitions(spark: SparkSession, root: String,
                        targetFileBytes: Long = 128L << 20,
                        writerOptions: Map[String, String] = Map.empty,
                        maxConcurrent: Int = 8): Map[String, (Int, Int)] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootPath = fs.makeQualified(new Path(root))
    def leaves(p: Path): Seq[Path] = {
      val children = fs.listStatus(p)
      val dirs = children.filter(_.isDirectory).map(_.getPath)
        .filterNot(_.getName.startsWith(".")) // skip in-flight compaction siblings
      if (children.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))) Seq(p)
      else dirs.toIndexedSeq.flatMap(leaves)
    }
    val found = leaves(rootPath)
    if (found.isEmpty) return Map.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(maxConcurrent, found.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = found.map { leaf =>
        scala.concurrent.Future {
          val rel = leaf.toString.stripPrefix(rootPath.toString).stripPrefix("/")
          rel -> compactParquet(spark, leaf.toString, targetFileBytes, writerOptions)
        }
      }
      scala.concurrent.Await
        .result(scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration.Inf)
        .toMap
    } finally pool.shutdown()
  }
}
