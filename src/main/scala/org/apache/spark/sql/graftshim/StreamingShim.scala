package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic
import org.apache.spark.sql.connector.read.streaming.SparkDataStream
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Bridges for the V1 Structured Streaming seams (both `private[sql]`):
  *
  *  - a `Source.getBatch` frame must carry `isStreaming = true` on its
  *    logical plan (MicroBatchExecution asserts it) — the sanctioned shape
  *    is the one Spark's own FileStreamSource returns: the batch's
  *    `LogicalRelation` leaves re-flagged streaming, which keeps the full
  *    FileSourceScan pushdown/pruning inside the micro-batch plan;
  *  - a `Sink.addBatch` frame is a view over the engine's already-planned
  *    `IncrementalExecution` — re-planning it through a writer would
  *    reject the embedded streaming sources, so the sink rebuilds a batch
  *    frame over the execution's InternalRow RDD (the established V1-sink
  *    technique; rows are computed once, by the incremental plan itself).
  */
object StreamingShim {

  /** `df` with its plan re-flagged `isStreaming = true` and attributed to
    * `stream` — what `Source.getBatch` must return. Frames with no
    * relation leaf (an empty batch's LocalRelation) fall back to wrapping
    * the executed rows, which is exact for the empty case.
    */
  def asStreamingBatch(df: DataFrame, stream: SparkDataStream): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true, stream = Some(stream))
    }
    if (plan.isStreaming) classic.Dataset.ofRows(spark, plan)
    else spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** A re-plannable BATCH frame over a streaming micro-batch's rows — what
    * a V1 `Sink.addBatch` hands to any code path that re-plans (a writer).
    */
  def freshBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }
}
