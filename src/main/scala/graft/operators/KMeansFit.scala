package graft.operators

import org.apache.spark.mllib.clustering.{KMeans => MllibKMeans, KMeansModel => MllibKMeansModel}
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The quantizer-fit KMeans, via the low-level mllib API (r15
  * optimization, guide §1.2 step 2).
  *
  * The `ml.KMeans.fit` wrapper the ANN/semdedup fits used through r14
  * pays, per fit, an input-shape `first()` job, a `model.transform` pass
  * and an EAGER ClusteringSummary construction whose cluster-sizes
  * collect nobody here reads — profiled at sf0.1 (event log, this
  * round): ~1.4 s per fit of pure wrapper machinery across the 9 fits an
  * IVF-PQ build runs. `mllib.KMeans.run` is the algorithm those wrappers
  * delegate to: same init draws, same iteration arithmetic, same seed
  * handling — **bit-identical centers**, pinned against `ml.KMeans.fit`
  * in KMeansFitSpec — minus the wrapper jobs.
  *
  * Kept bit-identical ON PURPOSE: the ANN recall gates (append-path 0.8
  * floor, spec 0.3 floors) sit close enough to their floors on the
  * near-uniform fixture that ANY quantizer change — even one with
  * strictly better quantization SSE, measured this round with a
  * converged driver-side Lloyd's — flips some of them by draw luck. A
  * faster fit is not worth a luck-dependent gate; this swap takes the
  * wrapper savings and leaves every center byte unchanged.
  */
object KMeansFit {

  /** Fit on `df`'s ml-vector `featuresCol`, exactly as
    * `new ml.KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
    * .setInitMode("random").fit(df)` would, returning the mllib model
    * (`clusterCenters`, `predict`).
    */
  def model(df: DataFrame, featuresCol: String, k: Int, seed: Long,
            maxIter: Int = 4): MllibKMeansModel = {
    val rdd = df.select(col(featuresCol)).rdd
      .map(r => OldVectors.fromML(r.getAs[org.apache.spark.ml.linalg.Vector](0)))
    new MllibKMeans()
      .setK(k).setSeed(seed).setMaxIterations(maxIter)
      .setInitializationMode("random")
      .run(rdd)
  }

  /** Float centers of [[model]] — the dtype the stored centroid tables
    * use (same conversion the ml-wrapper call sites applied).
    */
  def centers(df: DataFrame, featuresCol: String, k: Int, seed: Long,
              maxIter: Int = 4): Array[Array[Float]] =
    model(df, featuresCol, k, seed, maxIter)
      .clusterCenters.map(_.toArray.map(_.toFloat))
}
