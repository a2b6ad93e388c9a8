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

  /** Compact a FLAT parquet directory of many small files into
    * ~`targetFileBytes` outputs — the small-files problem: a day of
    * micro-batch ingest (e.g. the streaming curate sink's per-batch appends)
    * leaves thousands of KB-size files whose per-file open + footer-read cost
    * comes to dominate every later scan. The output file count is derived
    * from the directory's REAL on-disk byte total (both sides compressed, so
    * the ratio carries over), not from plan estimates. Rewrites to a temp
    * sibling then swaps, so a crash mid-compact leaves the original intact;
    * the swap itself is two FS metadata ops, not atomic — production tables
    * put this behind a transactional table format's commit.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileBytes: Long = 128L << 20): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(dir).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = parts.length
    if (before == 0) return (0, 0)
    val bytes = parts.map(_.getLen).sum
    val after = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new Path(path.stripSuffix("/") + "._compact_tmp")
    spark.read.parquet(path).repartition(after)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(dir, true)
    if (!fs.rename(tmp, dir))
      throw new java.io.IOException(s"compactParquet: rename $tmp -> $dir failed")
    (before, after)
  }

  /** Compact every hive-style leaf partition under `root` independently
    * (the production shape: compact yesterday's `date=.../` partition while
    * today's keeps ingesting). Leaf directory names encode the partition
    * values, so rewriting a leaf in place preserves the hive layout for
    * partition-pruned readers. Returns leaf-relative path -> (before, after).
    */
  def compactPartitions(spark: SparkSession, root: String,
                        targetFileBytes: Long = 128L << 20): Map[String, (Int, Int)] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootPath = fs.makeQualified(new Path(root))
    def leaves(p: Path): Seq[Path] = {
      val children = fs.listStatus(p)
      val dirs = children.filter(_.isDirectory).map(_.getPath)
        .filterNot(_.getName.endsWith("._compact_tmp"))
      if (children.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))) Seq(p)
      else dirs.toIndexedSeq.flatMap(leaves)
    }
    leaves(rootPath).map { leaf =>
      val rel = leaf.toString.stripPrefix(rootPath.toString).stripPrefix("/")
      rel -> compactParquet(spark, leaf.toString, targetFileBytes)
    }.toMap
  }
}
