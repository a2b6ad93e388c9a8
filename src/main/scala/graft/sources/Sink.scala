package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
