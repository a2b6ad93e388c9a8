package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency estimation (the heavy-hitters companion to
  * the HLL++ distinct sketch already catalogued as a10_approx_distinct).
  *
  * 100 TB shape: the sketch aggregate is a single map-side-combinable
  * pass — each task folds its rows into a fixed `depth x width` counter
  * grid (a few hundred KB at eps = 1e-4), tasks merge grids pairwise, and
  * ONE grid reaches the driver regardless of corpus size or cardinality.
  * That is the whole point vs the exact path: exact heavy-hitters shuffles
  * the full distinct-key set; the sketch shuffles a constant. Estimates
  * are deterministic (fixed seed, addition is commutative) and one-sided:
  * never below the true count, above it by at most eps * N with
  * probability >= confidence.
  */
object Sketches {

  /** Build a count-min sketch over `colName` (string or integral column)
    * with the standard (eps, confidence) sizing. The returned sketch is a
    * driver-side object a few hundred KB large — the ONE deliberate
    * driver materialization here, same contract as a broadcast build.
    */
  def countMinSketchOf(df: DataFrame, colName: String, eps: Double = 1e-4,
                       confidence: Double = 0.99, seed: Int = 1): CountMinSketch = {
    require(eps > 0 && eps < 1, s"eps must be in (0, 1), got $eps")
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0, 1), got $confidence")
    val bytes = df
      .select(expr(s"count_min_sketch($colName, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("cms"))
      .head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Annotate `df` with the sketch's frequency estimate for a string
    * column — the sketch broadcasts (task-serialized), the frame is never
    * shuffled.
    */
  def withEstimate(df: DataFrame, colName: String, cms: CountMinSketch,
                   as: String): DataFrame = {
    val bcast = df.sparkSession.sparkContext.broadcast(cms)
    val est = udf((v: String) => if (v == null) 0L else bcast.value.estimateCount(v))
    df.withColumn(as, est(col(colName)))
  }
}
