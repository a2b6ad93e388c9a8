package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (the UDAF surface from SURVEY §2.11): dim-wise mean of
  * an array<float> column — the centroid computation behind M2's
  * class-mean reconstruction and IVF cell refinement. Buffers are a
  * (sum[dim], count) pair; merge is element-wise, so partial aggregation
  * distributes like any built-in agg. Register with
  * `udaf(VectorMean)` / `spark.udf.register("vector_mean", udaf(VectorMean))`.
  */
object VectorMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
    if (a == null) return b
    val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
    var i = 0
    while (i < a.length) { sums(i) += a(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    val sums = x._1.clone()
    var i = 0
    while (i < sums.length) { sums(i) += y._1(i); i += 1 }
    (sums, x._2 + y._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
