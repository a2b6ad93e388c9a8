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

  /** Grow-to-max buffer combine: ragged inputs (vectors of differing
    * lengths) are treated as zero-padded to the longest seen, instead of
    * crashing mid-aggregation on the first mismatch. Takes a (length,
    * index => Double) accessor so the per-ROW reduce path never allocates
    * a boxed intermediate copy of the input vector (review r9 — this runs
    * once per corpus row).
    */
  private def addInto(base: Array[Double], n: Int, at: Int => Double): Array[Double] = {
    val out = if (n > base.length) {
      val grown = new Array[Double](n)
      System.arraycopy(base, 0, grown, 0, base.length)
      grown
    } else base
    var i = 0
    while (i < n) { out(i) += at(i); i += 1 }
    out
  }

  override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
    if (a == null) return b
    (addInto(if (b._1.isEmpty) new Array[Double](a.length) else b._1,
      a.length, i => a(i).toDouble), b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    // An empty sum array can still carry a nonzero count (a partial that saw
    // only zero-length vectors) — counts must always add or the divisor
    // would depend on partitioning (ADVICE round 2).
    if (x._1.isEmpty) return (y._1, x._2 + y._2)
    if (y._1.isEmpty) return (x._1, x._2 + y._2)
    (addInto(x._1.clone(), y._1.length, y._1), x._2 + y._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
