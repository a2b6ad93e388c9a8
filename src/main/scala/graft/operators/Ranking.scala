package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Total-order utilities that scale.
  *
  * `row_number() OVER (ORDER BY ...)` with no partition key moves the whole
  * dataset through ONE task — fine at test scale, fatal at 100 TB. The
  * scalable equivalent is: range-repartition on the sort key (so partition
  * i holds globally-smaller keys than partition i+1), sort within
  * partitions, then assign indices as partition-offset + local position.
  * That is exactly RDD.zipWithIndex (one tiny count-per-partition job, one
  * indexing pass) — the legitimate per-partition-imperative use the RDD
  * layer still has.
  *
  * Ties: callers must include a unique tiebreak column, same as any
  * deterministic total order (FIXTURES.md determinism rules).
  */
object Ranking {

  /** Append a 1-based global rank column following the given sort order. */
  def stableRowNumber(df: DataFrame, sortCols: Seq[Column], outCol: String): DataFrame = {
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parallelism, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(StructField(outCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1))
    }
    spark.createDataFrame(indexed, schema)
  }
}
